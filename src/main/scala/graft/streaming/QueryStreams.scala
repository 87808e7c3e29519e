package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.vector.{VectorFunctions, IndexBuilder}
import graft.vector.IndexBuilder.RandomHyperplaneLsh

/** Streaming retrieval — the online-serving analog of the reference's
  * interactive query loop (`query_rag_database.py:441-542`: embed the
  * user's question, search the store, threshold). The reference serves one
  * query at a time in-process; the Spark-native shape is a STREAM of query
  * vectors joined stream-static against the batch-built index:
  *
  *   queries (streaming)  ⋈bucket  corpus+LSH (static, bucketed)
  *     → exact re-score on the joined candidates → threshold (V4/P7)
  *
  * Two shapes, honest about their scan behavior:
  *
  *  - `retrieveStream`: a declarative stream-static equi-join on the
  *    bucket key. The join CO-PARTITIONS on bucket (write the corpus
  *    `bucketBy("bucket")` to avoid re-shuffling the static side per
  *    batch) but does NOT file-prune the corpus — an equi-join pushes no
  *    literal bucket set into the static scan.
  *  - `retrieveMicroBatch`: the scale path, for use inside
  *    `foreachBatch`. Collects the micro-batch's probe-bucket set
  *    (bounded: queries-per-batch × ball size) and applies it as a
  *    literal `isin` filter — the same partition/file pruning the batch
  *    retrieval paths get — before the join.
  *
  * Both are stateless (no watermark): every output row depends on one
  * query row only.
  */
object QueryStreams {

  /** Explode each streaming query row into its multi-probe bucket keys:
    * (query_id, qvec, bucket). Narrow map on the stream side.
    */
  def withProbeBuckets(queries: DataFrame, vecCol: String,
      lsh: RandomHyperplaneLsh, radius: Int): DataFrame = {
    val probesUdf = udf((v: Seq[Float]) =>
      if (v == null) Array.empty[Int]
      else lsh.probes(lsh.signature(v), radius).toArray)
    queries.withColumn("bucket", explode(probesUdf(col(vecCol))))
  }

  /** Stream-static retrieval: candidates from the bucket equi-join, exact
    * cosine re-score, threshold filter.
    *
    * Schema contract: `queries` is a streaming frame with `query_id` and
    * a `qvec array<float>` column; `corpus` is static with `vec_id`,
    * `embedding array<float>`, and the LSH `bucket` column (an index
    * table / withLshBucket frame).
    */
  def retrieveStream(queries: DataFrame, corpus: DataFrame,
      lsh: RandomHyperplaneLsh, threshold: Double,
      radius: Int = 1): DataFrame =
    scoreCandidates(
      withProbeBuckets(queries, "qvec", lsh, radius).join(corpus, Seq("bucket")),
      threshold)
    // no dedup needed (and none wanted — it would be unbounded streaming
    // state): corpus buckets are disjoint, so each (query, vector) pair
    // joins at most once even though the query probes several buckets.

  /** foreachBatch body — same semantics as retrieveStream for one STATIC
    * micro-batch of queries, but the batch's probe buckets are collected
    * (driver-side, bounded by batch size × Hamming-ball size) and applied
    * as a literal isin filter, so a partitioned index table is
    * partition/file-pruned before the join.
    */
  def retrieveMicroBatch(batchQueries: DataFrame, corpus: DataFrame,
      lsh: RandomHyperplaneLsh, threshold: Double,
      radius: Int = 1): DataFrame = {
    val probed = withProbeBuckets(batchQueries, "qvec", lsh, radius)
    val buckets = probed.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    scoreCandidates(
      probed.join(corpus.filter(col("bucket").isin(buckets: _*)), Seq("bucket")),
      threshold)
  }

  private def scoreCandidates(candidates: DataFrame, threshold: Double): DataFrame =
    candidates
      .withColumn("score",
        round(VectorFunctions.cosineUnit(col("embedding"), col("qvec")), 6))
      .filter(col("score") >= threshold)
      .select(col("query_id"), col("vec_id"), col("score"))
}
