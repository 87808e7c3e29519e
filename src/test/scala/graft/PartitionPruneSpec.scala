package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.graft.{GraftExtensions, PartitionPruneRule => P}

/** Derived partition pruning: a ts-only predicate over the registered
  * day-partitioned table gains inferred day_id partition filters; results
  * never change; unregistered paths and day_id-referencing filters
  * decline.
  */
class PartitionPruneSpec extends SparkSpec {

  private val path = new java.io.File(
    System.getProperty("java.io.tmpdir"),
    "graft_pprspec_" + Integer.toHexString(sf.hashCode)).getAbsolutePath

  private def layout(): Unit =
    Tables.events(spark, sf)
      .withColumn("day_id", expr("unix_micros(ts) DIV 86400000000"))
      .repartition(col("day_id"))
      .write.mode("overwrite").partitionBy("day_id").parquet(path)

  private def tsQuery = spark.read.parquet(path)
    .filter(col("ts") >= lit("2024-01-11").cast("timestamp") &&
      col("ts") < lit("2024-01-14").cast("timestamp"))
    .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    .orderBy("event_type")

  private def partitionFilters(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s.partitionFilters.map(_.toString)
    }.flatten

  private def armed[A](f: => A): A = {
    GraftExtensions.register(spark)
    spark.conf.set(P.SourceKey, path)
    spark.conf.set(P.TsColKey, "ts")
    spark.conf.set(P.PartColKey, "day_id")
    spark.conf.set(P.EnabledKey, "true")
    try f finally spark.conf.set(P.EnabledKey, "false")
  }

  test("ts bounds infer day_id partition filters; results unchanged") {
    layout()
    val direct = tsQuery.collect().toSeq
    armed {
      val pf = partitionFilters(tsQuery)
      assert(pf.exists(_.contains("day_id")),
        s"no inferred day_id partition filter: $pf")
      assert(tsQuery.collect().toSeq === direct)
    }
  }

  test("a filter already referencing day_id declines (idempotence guard)") {
    armed {
      val q = spark.read.parquet(path)
        .filter(col("day_id") === 19733L && col("ts").isNotNull)
      // passes through the rule untouched: exactly the user's one predicate
      val pf = partitionFilters(q)
      assert(pf.exists(_.contains("19733")))
      assert(q.count() > 0)
    }
  }

  test("unregistered paths decline") {
    armed {
      spark.conf.set(P.SourceKey, path + "_other")
      try {
        val pf = partitionFilters(tsQuery)
        assert(!pf.exists(_.contains("day_id")), s"pruned unregistered: $pf")
      } finally spark.conf.set(P.SourceKey, path)
    }
  }

  test("disabled by default: no conf, no inference") {
    GraftExtensions.register(spark)
    assert(!partitionFilters(tsQuery).exists(_.contains("day_id")))
  }

  test("pre-epoch bounds stay sound: trunc-div matches the DIV layout") {
    // a row with ts in (-1 day, 0) stores day_id 0 under the layout's
    // IntegralDivide; an upper bound `ts <= -1h` must therefore infer
    // day_id <= 0 (trunc), NOT <= -1 (floorDiv) — the floorDiv bound
    // would prune the partition this row lives in
    val prePath = path + "_preepoch"
    import spark.implicits._
    Seq(
      ("a", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(-7200L))),
      ("b", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(86400L * 3)))
    ).toDF("id", "ts")
      .withColumn("day_id", expr("unix_micros(ts) DIV 86400000000"))
      .write.mode("overwrite").partitionBy("day_id").parquet(prePath)
    armed {
      spark.conf.set(P.SourceKey, prePath)
      try {
        val q = spark.read.parquet(prePath)
          .filter(col("ts") <= lit(java.sql.Timestamp.from(
            java.time.Instant.ofEpochSecond(-3600L))))
        assert(q.count() === 1L, "pre-epoch row pruned away: unsound bound")
        val pf = partitionFilters(q)
        assert(pf.exists(f => f.contains("day_id") && f.contains("<= 0")),
          s"expected inferred day_id <= 0 (trunc), got: $pf")
      } finally spark.conf.set(P.SourceKey, path)
    }
  }
}
