package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables}
import graft.ops.Dedup

/** Scratch profiler for the minhash_near_dupes hot path (not a driver query). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warmup
    Tables.documents(spark, sfDir).count()

    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 2000)
    time("docs count")(docs.count())

    val shingled = docs.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        array_distinct(Dedup.shinglesCol(Dedup.tokensCol(col("text")), 3)).as("sh"))
    time("shingles only (HOF)")(shingled.agg(sum(size(col("sh")))).collect())

    val sigs = docs.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), Dedup.minhashSignatureFromText(col("text"), 3).as("sig"))
      .cache()
    time("sigs materialize (fused UDF)")(sigs.count())

    val bands = sigs.select(col("doc_id"), posexplode(
      transform(sequence(lit(0), lit(Dedup.NumBands - 1)),
        b => xxhash64(array_join(
          transform(slice(col("sig"), b * lit(Dedup.RowsPerBand) + lit(1), lit(Dedup.RowsPerBand)), _.cast("string")),
          ",")))).as(Seq("band_id", "band_hash")))
    time("bands")(bands.count())

    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    time("candidates")(cand.count())

    val out = cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .withColumn("est_jaccard", round(
        size(filter(zip_with(col("sig_a"), col("sig_b"), (a, b) => a === b), x => x))
          / lit(Dedup.NumHashes.toDouble), 6))
      .filter(col("est_jaccard") >= 0.5)
      .select("doc_a", "doc_b", "est_jaccard")
      .orderBy("doc_a", "doc_b")
    time("verify+out")(out.count())

    time("full query fresh")(
      graft.SparkEntry.queries("minhash_near_dupes")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}
