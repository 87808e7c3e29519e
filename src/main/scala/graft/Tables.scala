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
  /** events.parquet has stored ts as TIMESTAMP(NANOS) in some testdata
    * generations (Spark's parquet reader surfaces those only as a nanos
    * Long under `spark.sql.legacy.parquet.nanosAsLong=true`, set in every
    * session builder) and TIMESTAMP(MICROS, ntz) in others. Normalize
    * BOTH to the same session-tz TimestampType micros column: nanos
    * truncate exactly as DuckDB's ns→µs TIMESTAMP read does, and the ntz
    * wall-clock reinterprets in the UTC session tz — identical instants
    * either way, keeping oracle parity across data generations.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType)) // ntz
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Spread a CPU-BOUND stage across the cluster when the scan's natural
    * parallelism is below the available slots. A small curated corpus is
    * often ONE parquet file — one scan split — so an expensive per-row
    * kernel (MaxSim scoring, fingerprint shingling, surprisal) runs
    * single-threaded while every other core idles (guide §2.5 "input
    * skew: one huge unsplittable file — repartition immediately after
    * the read"). The guard makes it scale-correct: at data scale the
    * scan already has ≥ slots partitions and this is the identity — the
    * shuffle is only paid when it buys parallelism, and what it shuffles
    * is by construction small (fewer partitions than cores).
    * Result-neutral: callers aggregate or top-k downstream, so row
    * placement never reaches the answer.
    */
  def spreadCpuBound(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Scan-split probe WITHOUT materializing .rdd: the previous
    // `df.rdd.getNumPartitions` forced a full (pre-AQE) physical
    // planning + RDD lineage build per call just to read a partition
    // count. `inputFiles` only walks the analyzed plan's file indexes
    // (already listed). ≥ target files ⇒ the scan has the parallelism
    // already — identity with zero FS calls. Fewer files ⇒ estimate the
    // scan's split count as Σ ceil(len / maxPartitionBytes) over those
    // (< target) files — a handful of driver FS statuses — so a single
    // LARGE splittable file is still recognized as parallel. Non-file
    // frames (all-LocalRelation inputs) stay untouched: driver-local
    // rows are already at the session's default split count.
    val files = df.inputFiles
    if (files.isEmpty || files.length >= target) return df
    val hconf = spark.sparkContext.hadoopConfiguration
    val maxBytes = math.max(1L,
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")))
    val splits = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val len =
        try p.getFileSystem(hconf).getFileStatus(p).getLen
        catch { case _: java.io.IOException => 0L }
      math.max(1L, (len + maxBytes - 1) / maxBytes)
    }.sum
    if (splits < target) df.repartition(target) else df
  }

  /** Per-(prefix, sfDir) scratch directory under java.io.tmpdir — the ONE
    * place the naming scheme lives (specs reconstruct these paths, and
    * scattered copies of the expression would have to change together).
    */
  def scratchPath(prefix: String, dir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      prefix + "_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
}
