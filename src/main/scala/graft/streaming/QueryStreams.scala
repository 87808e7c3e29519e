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
  * The join key is the LSH bucket, so each micro-batch of queries touches
  * only its probe buckets of the corpus — the same pruning the batch path
  * gets from partition filtering, expressed as an equi-join the planner
  * can broadcast (tiny query batch) against the big static side. Stateless
  * (no watermark needed): every output row depends on one query row only,
  * so this scales with corpus size like the batch path does, and the
  * per-batch latency is the probe-bucket scan, not the corpus scan.
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
    * cosine re-score, threshold filter. `corpus` must carry a `bucket`
    * column (an LSH index table / withLshBucket frame).
    */
  def retrieveStream(queries: DataFrame, corpus: DataFrame,
      lsh: RandomHyperplaneLsh, threshold: Double,
      radius: Int = 1): DataFrame = {
    val probed = withProbeBuckets(queries, "qvec", lsh, radius)
    probed.join(corpus, Seq("bucket"))
      .withColumn("score",
        round(VectorFunctions.cosineUnit(col("embedding"), col("qvec")), 6))
      .filter(col("score") >= threshold)
      .select(col("query_id"), col("vec_id"), col("score"))
    // no dedup needed (and none wanted — it would be unbounded streaming
    // state): corpus buckets are disjoint, so each (query, vector) pair
    // joins at most once even though the query probes several buckets.
  }
}
