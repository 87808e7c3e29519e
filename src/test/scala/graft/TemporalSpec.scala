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

  test("asof randomized: agrees with a brute-force reference across seeds") {
    for (seed <- 0 until 20) {
      val rnd = new scala.util.Random(seed)
      def t(m: Int) = new Timestamp(1704067200000L + m * 60000L) // minutes past epoch-ish base
      val rights = (0 until rnd.nextInt(15))
        .map(i => (rnd.nextInt(3).toLong, t(rnd.nextInt(100)), 100L + i))
        .groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq // unique (key, ts)
      val lefts = (0 until 1 + rnd.nextInt(15))
        .map(i => (rnd.nextInt(3).toLong, t(rnd.nextInt(100)), 900L + i))
      val tol = if (rnd.nextBoolean()) Some(1800L) else None
      val expected = lefts.map { case (k, lts, lid) =>
        val cand = rights.filter(r => r._1 == k && !r._2.after(lts))
          .sortBy(r => (r._2.getTime, r._3)).lastOption
          .filter(r => tol.forall(s => (lts.getTime - r._2.getTime) / 1000 <= s))
        lid -> cand.map(_._3).getOrElse(-1L)
      }.toMap
      val got = Temporal.asofJoin(
          lefts.toDF("user_id", "ts", "left_id"),
          rights.toDF("user_id", "ts", "right_id"),
          Seq("user_id"), "ts", "ts", tol)
        .select($"left_id", $"asof.right_id".as("rid"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      assert(got === expected, s"seed $seed (tol=$tol)")
    }
  }

  test("interval randomized: agrees with a brute-force reference across seeds") {
    for (seed <- 0 until 20) {
      val rnd = new scala.util.Random(seed)
      def t(m: Int) = new Timestamp(1704067200000L + m * 60000L)
      val ivs = (0 until 1 + rnd.nextInt(10)).map { i =>
        val start = rnd.nextInt(100)
        (rnd.nextInt(3).toLong, t(start), t(start + rnd.nextInt(200)), i.toLong)
      }
      val pts = (0 until rnd.nextInt(15))
        .map(i => (rnd.nextInt(3).toLong, t(rnd.nextInt(300)), 500L + i))
      val expected = (for {
        (k, s, e, wid) <- ivs
        (pk, pt0, pid) <- pts
        if pk == k && !pt0.before(s) && pt0.before(e)
      } yield (wid, pid)).toSet
      val got = Temporal.intervalJoin(
          ivs.toDF("user_id", "w_start", "w_end", "win_id"),
          pts.toDF("user_id", "ts", "point_id"),
          Seq("user_id"), "w_start", "w_end", "ts", bucketSeconds = 3600L)
        .select($"win_id", $"point_id").as[(Long, Long)].collect().toSet
      assert(got === expected, s"seed $seed")
    }
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
