package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.Temporal

/** As-of + interval join semantics and plan shape (ops/Temporal.scala). */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val clicks = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L),
    (1L, ts("2024-01-01 12:00:00"), 101L),
    (2L, ts("2024-01-01 11:00:00"), 200L))
    .toDF("user_id", "ts", "click_id")

  test("asof: picks the most recent right row at or before the left ts") {
    val purchases = Seq(
      (1L, ts("2024-01-01 11:30:00"), 9000L),
      (1L, ts("2024-01-01 12:00:00"), 9001L), // tie: inclusive
      (1L, ts("2024-01-01 09:00:00"), 9002L)) // before any click
      .toDF("user_id", "ts", "purchase_id")
    val out = Temporal.asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts")
      .select($"purchase_id", $"asof.click_id".as("click_id"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out(9000L) === 100L) // 10:00 click, not the later 12:00 one
    assert(out(9001L) === 101L) // equal timestamps match (inclusive)
    assert(out(9002L) === -1L)  // nothing at or before 09:00
  }

  test("asof: keys isolate users; tolerance nulls stale matches") {
    val purchases = Seq(
      (2L, ts("2024-01-01 11:00:01"), 9100L),
      (2L, ts("2024-01-02 23:00:00"), 9101L)) // 36 h after the only click
      .toDF("user_id", "ts", "purchase_id")
    val out = Temporal.asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
        toleranceSeconds = Some(3600L))
      .select($"purchase_id", $"asof.click_id".as("click_id"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out(9100L) === 200L) // user 2's click, 1 s earlier — never user 1's
    assert(out(9101L) === -1L)  // match exists but exceeds tolerance → null
  }

  test("asof: every left row survives, matched or not") {
    val out = Temporal.asofJoin(
      Tables.events(spark, sf).filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts"),
      Tables.events(spark, sf).filter($"event_type" === "click")
        .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id")),
      Seq("user_id"), "ts", "ts")
    val nLeft = Tables.events(spark, sf).filter($"event_type" === "purchase").count()
    assert(out.count() === nLeft)
  }

  private val windows = Seq(
    (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 1L),
    (1L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"), 2L), // 48 h: spans 3 day-buckets
    (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"), 3L)) // empty
    .toDF("user_id", "w_start", "w_end", "win_id")

  test("interval: end-exclusive bounds, long intervals, empty intervals") {
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00"), 500L), // == start of win 1: included
      (1L, ts("2024-01-01 11:00:00"), 501L), // == end of win 1: excluded (but in win 2)
      (1L, ts("2024-01-02 23:59:59"), 502L), // third bucket of win 2
      (2L, ts("2024-01-01 10:00:00"), 503L)) // empty window matches nothing
      .toDF("user_id", "ts", "point_id")
    val pairs = Temporal.intervalJoin(windows, points, Seq("user_id"),
        "w_start", "w_end", "ts", bucketSeconds = 24L * 3600)
      .select($"win_id", $"point_id").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 500L), (2L, 500L), (2L, 501L), (2L, 502L)))
  }

  test("interval: no duplicate pairs when an interval spans many buckets") {
    val points = Seq((1L, ts("2024-01-01 12:00:00"), 600L))
      .toDF("user_id", "ts", "point_id")
    // 1-hour buckets: the 48 h window explodes to 49 buckets; the point
    // lives in exactly one of them, so win 2 pairs with it exactly once.
    val out = Temporal.intervalJoin(windows, points, Seq("user_id"),
      "w_start", "w_end", "ts", bucketSeconds = 3600L)
    assert(out.count() === 1)
  }

  test("plan: temporal joins stay equi-joins — no nested-loop, no cartesian") {
    for (q <- Seq(Temporal.asofAttribution _, Temporal.intervalClickCounts _)) {
      val plan = q(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        "range predicate must ride an equi-join, not a nested loop")
    }
  }

  test("driver queries agree with their oracle row counts at sf0.001") {
    val asof = Temporal.asofAttribution(spark, sf)
    val nPurchases = Tables.events(spark, sf)
      .filter($"event_type" === "purchase").count()
    assert(asof.count() === nPurchases)
    val iv = Temporal.intervalClickCounts(spark, sf)
    val nSignups = Tables.events(spark, sf)
      .filter($"event_type" === "signup").count()
    assert(iv.count() === nSignups)
  }
}
