package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.vector.IndexBuilder
import graft.vector.IndexBuilder.RandomHyperplaneLsh

/** ANN query surface over the batch-built index structures (SURVEY.md §2.9
  * V5 + the training-pipeline similarity-search requirement).
  *
  * Random unit vectors are the worst case for LSH (angles concentrate near
  * 90°), so these queries are configured for correctness demonstration —
  * recall quality is asserted relative to the exact path in AnnIndexSpec and
  * documented as data-dependent. The scale path (partitionBy(bucket) index
  * table + partition-pruned scan) is exercised in the spec via
  * IndexBuilder.buildLshIndex.
  *
  * Not SQL-expressible (seeded hyperplanes / KMeans fit) → rows-only driver
  * check; exact-path parity is covered by the spec instead of the oracle.
  */
object AnnIndex extends QueryModule {

  val Dim = 64
  def defaultLsh = new RandomHyperplaneLsh(Dim, nBits = 6, seed = 42L)

  private def queryVec(spark: SparkSession, dir: String, id: Long): Array[Float] =
    Tables.embeddings(spark, dir).filter(col("vec_id") === id)
      .select("embedding").head().getSeq[Float](0).toArray

  /** Deterministic LSH bucket per vector (the index build projection). */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame =
    IndexBuilder.withLshBucket(Tables.embeddings(spark, dir), "embedding", defaultLsh)
      .select(col("vec_id"), col("bucket"))

  /** Bucket histogram — shows the index partitioning is usable (no empty /
    * giant skew buckets at this nBits).
    */
  def lshBucketStats(spark: SparkSession, dir: String): DataFrame =
    lshBuckets(spark, dir).groupBy("bucket")
      .agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("bucket"))

  /** LSH multi-probe pruned top-10 for stored query vec 0. */
  def annLshTopk(spark: SparkSession, dir: String): DataFrame =
    IndexBuilder.lshTopK(Tables.embeddings(spark, dir), "embedding", "vec_id",
      defaultLsh, queryVec(spark, dir, 0L), k = 10, radius = 2)
      .select("vec_id", "score")

  /** IVF (KMeans) pruned top-10 for stored query vec 0. */
  def annIvfTopk(spark: SparkSession, dir: String): DataFrame =
    IndexBuilder.ivfTopK(Tables.embeddings(spark, dir), "embedding", "vec_id",
      queryVec(spark, dir, 0L), k = 10, numClusters = 16, nProbe = 6, seed = 42L)
      .select("vec_id", "score")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lsh_buckets" -> lshBuckets,
    "lsh_bucket_stats" -> lshBucketStats,
    "ann_lsh_topk" -> annLshTopk,
    "ann_ivf_topk" -> annIvfTopk)

  def oracles: Map[String, String] = Map.empty
}
