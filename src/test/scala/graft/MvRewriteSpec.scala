package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.graft.{GraftExtensions, MvRewriteRule}

/** MV routing: the rewritten query reads the summary and never the fact
  * table, produces the exact raw answer, and everything outside the
  * strict shape (filters, distinct, other group keys, missing MV)
  * declines untouched.
  */
class MvRewriteSpec extends SparkSpec {

  private val src = s"$sf/events.parquet"
  private val mvPath = new java.io.File(
    System.getProperty("java.io.tmpdir"),
    "graft_mvspec_" + Integer.toHexString(sf.hashCode)).getAbsolutePath

  // sparkPlan, not executedPlan: AQE hides children from collect()
  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s.relation.location.rootPaths.map(_.toString)
    }.flatten

  private def withMv[A](path: String)(f: => A): A = {
    GraftExtensions.register(spark)
    spark.conf.set(MvRewriteRule.SourceKey, src)
    spark.conf.set(MvRewriteRule.PathKey, path)
    spark.conf.set(MvRewriteRule.EnabledKey, "true")
    try f finally {
      spark.conf.set(MvRewriteRule.EnabledKey, "false")
    }
  }

  private def rawCounts = spark.read.parquet(src)
    .groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
    .orderBy("event_type")

  test("routed query scans the MV, not the fact table, and is exact") {
    spark.read.parquet(src).groupBy("event_type")
      .agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(mvPath)
    val direct = rawCounts.collect().toSeq
    withMv(mvPath) {
      val routed = rawCounts
      val paths = scanPaths(routed)
      assert(paths.exists(_.contains(mvPath)), s"MV not read: $paths")
      assert(!paths.exists(_.contains("events.parquet")),
        s"fact table still read: $paths")
      assert(routed.collect().toSeq === direct)
    }
  }

  test("filters, distinct counts, and other group keys decline") {
    withMv(mvPath) {
      val filtered = spark.read.parquet(src)
        .filter(col("user_id") > 100)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      assert(scanPaths(filtered).exists(_.contains("events.parquet")))

      val distinct = spark.read.parquet(src)
        .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      assert(scanPaths(distinct).exists(_.contains("events.parquet")))

      val otherKey = spark.read.parquet(src)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      assert(scanPaths(otherKey).exists(_.contains("events.parquet")))
    }
  }

  test("sum routing: integer-unit sums route to the MV; float sums decline") {
    val unitsSrc = mvPath + "_units_src"
    val sumsMv = mvPath + "_sums"
    spark.read.parquet(src)
      .select(col("event_type"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("value_e6"),
        col("value"))
      .write.mode("overwrite").parquet(unitsSrc)
    spark.read.parquet(unitsSrc).groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("value_e6")).as("sum_value_e6"))
      .write.mode("overwrite").parquet(sumsMv)
    GraftExtensions.register(spark)
    spark.conf.set(MvRewriteRule.SourceKey, unitsSrc)
    spark.conf.set(MvRewriteRule.PathKey, sumsMv)
    spark.conf.set(MvRewriteRule.SumColKey, "value_e6")
    try {
      def q = spark.read.parquet(unitsSrc).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value_e6")).as("t"))
        .orderBy("event_type")
      spark.conf.set(MvRewriteRule.EnabledKey, "false")
      val direct = q.collect().toSeq
      spark.conf.set(MvRewriteRule.EnabledKey, "true")
      val routed = q
      val paths = scanPaths(routed)
      assert(paths.exists(_.contains(sumsMv)), s"MV not read: $paths")
      assert(!paths.exists(_.contains(unitsSrc)), s"fact table still read: $paths")
      assert(routed.collect().toSeq === direct)
      // a FLOAT sum must decline: shuffle-order float addition isn't
      // associative, so stored partials can't answer it exactly
      val floatSum = spark.read.parquet(unitsSrc).groupBy(col("event_type"))
        .agg(sum(col("value")).as("t"))
      assert(scanPaths(floatSum).exists(_.contains(unitsSrc)))
      // a sum of a column OTHER than the registered one must decline too
      val otherSum = spark.read.parquet(unitsSrc)
        .select(col("event_type"), (col("value_e6") * 2).as("doubled"))
        .groupBy(col("event_type")).agg(sum(col("doubled")).as("t"))
      assert(scanPaths(otherSum).exists(_.contains(unitsSrc)))
    } finally {
      spark.conf.set(MvRewriteRule.EnabledKey, "false")
      spark.conf.unset(MvRewriteRule.SumColKey)
      spark.conf.set(MvRewriteRule.SourceKey, src)
      spark.conf.set(MvRewriteRule.PathKey, mvPath)
    }
  }

  test("min/max routing: registered columns route; unregistered and drifted decline") {
    val mmSrc = mvPath + "_mm_src"
    val mmMv = mvPath + "_mm"
    // Tables.events, NOT a raw parquet read: the testdata generation emits
    // ts as TIMESTAMP_NTZ in some generations, on which unix_micros throws
    // DATATYPE_MISMATCH — Tables.events owns the dispatch to session-tz
    // micros (the production mv_rewrite_minmax row routes through it too).
    Tables.events(spark, sf)
      .select(col("event_type"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("value_e6"),
        expr("unix_micros(ts)").as("ts_us"))
      .write.mode("overwrite").parquet(mmSrc)
    spark.read.parquet(mmSrc).groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        min(col("value_e6")).as("min_value_e6"),
        max(col("value_e6")).as("max_value_e6"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us"))
      .write.mode("overwrite").parquet(mmMv)
    GraftExtensions.register(spark)
    spark.conf.set(MvRewriteRule.SourceKey, mmSrc)
    spark.conf.set(MvRewriteRule.PathKey, mmMv)
    spark.conf.set(MvRewriteRule.MinMaxColsKey, "value_e6,ts_us")
    try {
      def q = spark.read.parquet(mmSrc).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("value_e6")).as("lo"), max(col("value_e6")).as("hi"),
          min(col("ts_us")).as("first_us"), max(col("ts_us")).as("last_us"))
        .orderBy("event_type")
      spark.conf.set(MvRewriteRule.EnabledKey, "false")
      val direct = q.collect().toSeq
      spark.conf.set(MvRewriteRule.EnabledKey, "true")
      val routed = q
      val paths = scanPaths(routed)
      assert(paths.exists(_.contains(mmMv)), s"MV not read: $paths")
      assert(!paths.exists(_.contains(mmSrc)), s"fact table still read: $paths")
      assert(routed.collect().toSeq === direct)
      // min over a column NOT in the registration must decline: the MV
      // has no stored extremum for it
      val unregistered = spark.read.parquet(mmSrc)
        .select(col("event_type"), (col("value_e6") * 2).as("doubled"))
        .groupBy(col("event_type")).agg(min(col("doubled")).as("lo"))
      assert(scanPaths(unregistered).exists(_.contains(mmSrc)))
      // a registered column whose MV extremum has a DRIFTED type (the
      // summary stored ints where the fact is long) must decline too
      val driftedMv = mvPath + "_mm_drift"
      spark.read.parquet(mmMv)
        .withColumn("min_value_e6", col("min_value_e6").cast("int"))
        .write.mode("overwrite").parquet(driftedMv)
      spark.conf.set(MvRewriteRule.PathKey, driftedMv)
      val drifted = spark.read.parquet(mmSrc).groupBy(col("event_type"))
        .agg(min(col("value_e6")).as("lo"))
      assert(scanPaths(drifted).exists(_.contains(mmSrc)),
        "drifted MV extremum type must decline, not miscast")
    } finally {
      spark.conf.set(MvRewriteRule.EnabledKey, "false")
      spark.conf.unset(MvRewriteRule.MinMaxColsKey)
      spark.conf.set(MvRewriteRule.SourceKey, src)
      spark.conf.set(MvRewriteRule.PathKey, mvPath)
    }
  }

  test("a missing MV path declines instead of failing the query") {
    withMv(mvPath + "_does_not_exist") {
      val q = rawCounts
      assert(scanPaths(q).exists(_.contains("events.parquet")))
      assert(q.count() > 0)
    }
  }

  test("disabled by default: no conf, no rewrite") {
    GraftExtensions.register(spark)
    assert(scanPaths(rawCounts).exists(_.contains("events.parquet")))
  }
}
