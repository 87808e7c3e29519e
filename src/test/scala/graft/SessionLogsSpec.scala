package graft

import graft.ops.SessionLogs
import org.apache.spark.sql.functions._

class SessionLogsSpec extends SparkSpec {

  test("turn numbering is dense per session, ordered by time") {
    val t = SessionLogs.turns(spark, sf).filter(col("session_id") === 1L)
      .orderBy("turn").collect()
    assert(t.nonEmpty)
    assert(t.map(_.getAs[Int]("turn")).toSeq === (1 to t.length))
    val times = t.map(_.getAs[java.sql.Timestamp]("ts").getTime)
    assert(times.sameElements(times.sorted), "turns must follow event time")
  }

  test("session log JSON round-trips through from_json") {
    val logs = SessionLogs.sessionLogs(spark, sf).limit(10)
    val parsed = logs.withColumn("parsed",
      from_json(col("log_json"), SessionLogs.LogSchema))
    val rows = parsed.select(
      col("session_id"),
      col("n_turns"),
      col("parsed.session_summary.session_id").as("rt_session"),
      col("parsed.session_summary.n_turns").as("rt_turns"),
      size(col("parsed.conversation_turns")).as("rt_arr_len")).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("rt_session") === r.getAs[Long]("session_id"))
      assert(r.getAs[Long]("rt_turns") === r.getAs[Long]("n_turns"))
      assert(r.getAs[Int]("rt_arr_len").toLong === r.getAs[Long]("n_turns"))
    }
  }

  test("turn arrays are rank-ordered inside the log and capped") {
    val logs = SessionLogs.sessionLogs(spark, sf)
      .withColumn("parsed", from_json(col("log_json"), SessionLogs.LogSchema))
      .select(col("parsed.conversation_turns.turn").as("turn_seq")).collect()
    logs.foreach { r =>
      val seq = r.getSeq[Int](0)
      assert(seq.length <= SessionLogs.MaxTurnsKept)
      assert(seq === seq.sorted, "turns must be sorted inside the log")
    }
  }

  test("session summaries reconcile with raw events") {
    val total = SessionLogs.sessionSummaries(spark, sf)
      .agg(sum("n_turns")).head().getLong(0)
    assert(total === Tables.events(spark, sf).count())
  }

  test("roundtrip scalars recomputed from the parsed JSON match the turn frame") {
    val rt = SessionLogs.sessionLogRoundtrip(spark, sf)
    val direct = SessionLogs.turns(spark, sf)
      .filter(col("turn") <= SessionLogs.MaxTurnsKept)
      .groupBy(col("session_id"))
      .agg(count(lit(1)).as("n"),
        max(when(col("turn") === 1, col("mode"))).as("m"),
        round(sum(coalesce(col("value"), lit(0.0))), 4).as("v"))
    val joined = rt.join(direct, "session_id")
    assert(joined.count() === rt.count())
    assert(joined.filter(col("n_turns_parsed") =!= col("n") ||
      col("first_mode") =!= col("m") ||
      col("total_value_parsed") =!= col("v")).count() === 0)
  }
}
