package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * All engine queries take an `sfDir` (scale-factor directory) and read the
  * parquet tables from it. Schemas are fixed (FIXTURES.md §B) so we never
  * infer; parquet carries its own schema. Column pruning + predicate pushdown
  * are delegated to Catalyst — callers select only what they need.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    * reader only surfaces as a nanos Long (requires
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set in every session
    * builder). Truncate to micros — exactly what DuckDB's ns→µs TIMESTAMP
    * read does, keeping oracle parity.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Per-(prefix, sfDir) scratch directory under java.io.tmpdir — the ONE
    * place the naming scheme lives (specs reconstruct these paths, and
    * scattered copies of the expression would have to change together).
    */
  def scratchPath(prefix: String, dir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      prefix + "_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
}
