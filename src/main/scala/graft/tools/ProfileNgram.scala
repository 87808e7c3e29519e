package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev profiler: split dup_ngram_coverage into its stages and try the
  * window-free alternative, to see whether the digest window sort or the
  * shingle materialization dominates.
  */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Dedup
    val docs = graft.Tables.documents(spark, sfDir)
    def sh = docs
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        explode(array_distinct(Dedup.shinglesCol(Dedup.tokensCol(col("text")), 8))).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("h1"),
        xxhash64(lit(1), col("shingle")).as("h2"))
    def time[A](name: String)(f: => A): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[ngram] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("digest-explode only") {
      sh.groupBy("doc_id").count().write.format("noop").mode("overwrite").save()
    }
    time("window form (current)") {
      val w = Window.partitionBy(col("h1"), col("h2"))
      sh.withColumn("n_docs", count(lit(1)).over(w))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_dup"))
        .write.format("noop").mode("overwrite").save()
    }
    time("collect_list form") {
      sh.groupBy("h1", "h2")
        .agg(count(lit(1)).as("n_docs"), collect_list(col("doc_id")).as("ds"))
        .select(explode(col("ds")).as("doc_id"), col("n_docs"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_dup"))
        .write.format("noop").mode("overwrite").save()
    }
    // string-free digest: hash each TOKEN once, then combine each 8-token
    // window of token hashes with two chained-hash lanes — no per-position
    // string materialization, ~1 full-width hash per token instead of
    // ~2 hashes + 1 join per position. MEASURED SLOWER at sf0.1 (r10:
    // explode 5.5-6.0 s vs 4.4-4.6 s; window form 6.5-7.2 s vs ~5.2 s):
    // the aggregate() HOF pays an interpreted-lambda step per element,
    // which costs more than the string join + hash it avoids — the
    // string form IS the fast path, and dup_ngram_coverage's remaining
    // cost is irreducible shingle-explode volume (the window adds only
    // ~0.2-0.4 s over the bare digest explode).
    def shNum = {
      val n = 8
      val toks = Dedup.tokensCol(col("text"))
      val th = transform(toks, t => xxhash64(t))
      def chain(seed: Long)(h: org.apache.spark.sql.Column) =
        aggregate(h, lit(seed), (acc, x) => xxhash64(acc, x))
      val windows = when(size(th) < n, array(th))
        .otherwise(transform(sequence(lit(0), size(th) - n),
          i => slice(th, i + lit(1), lit(n))))
      docs.filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), explode(array_distinct(
          transform(windows, w => struct(
            chain(0L)(w).as("h1"), chain(1L)(w).as("h2"))))).as("d"))
        .select(col("doc_id"), col("d.h1"), col("d.h2"))
    }
    time("string-free digest explode") {
      shNum.groupBy("doc_id").count().write.format("noop").mode("overwrite").save()
    }
    time("string-free window form") {
      val w = Window.partitionBy(col("h1"), col("h2"))
      shNum.withColumn("n_docs", count(lit(1)).over(w))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_dup"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
