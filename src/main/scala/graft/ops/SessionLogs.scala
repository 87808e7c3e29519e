package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryModule, Tables}

/** Session/conversation log analytics (SURVEY.md §1.1d, §2.2 K3, A6):
  * the reference appends one JSON log per session — a summary header plus
  * per-turn entries carrying the full retrieved docs with JSON-stringified
  * metadata (`query_rag_database.py:606-650`,
  * `Auto_query_rag_database.py:196-217,575`).
  *
  * The engine models this as: events = turns, user = session; turn
  * numbering is a rank window per session; the nested log record is built
  * with struct/collect_list and serialized with to_json (F9) — and
  * parsed back with from_json, round-trip-tested in SessionLogsSpec.
  *
  * Scale: one shuffle keyed by session id; per-session turn arrays are
  * bounded by the session cap (top-n caps in the reference guarantee
  * bounded groups — here we cap turns collected per session at 50).
  */
object SessionLogs extends QueryModule {

  val MaxTurnsKept = 50

  /** Turn-level frame: session, turn number, mode, input, value. */
  def turns(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("turn", row_number().over(w))
      .select(col("user_id").as("session_id"), col("turn"),
        col("event_type").as("mode"), col("ts"), col("value"), col("props"))
  }

  /** K3: one nested log record per session, serialized as JSON — summary
    * header + capped turn array with stringified metadata. Rows-only
    * (JSON key ordering is engine-specific); round-trip checked in spec.
    */
  def sessionLogs(spark: SparkSession, dir: String): DataFrame =
    turns(spark, dir)
      .filter(col("turn") <= MaxTurnsKept)
      .groupBy(col("session_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        min(col("ts")).as("started_at"),
        max(col("ts")).as("ended_at"),
        array_sort(collect_list(struct(
          col("turn"), col("mode"),
          col("value"), col("props").as("metadata_json")))).as("conversation_turns"))
      .withColumn("log_json", to_json(struct(
        struct(col("session_id"), col("n_turns"),
          col("started_at").cast("string").as("started_at"),
          col("ended_at").cast("string").as("ended_at")).as("session_summary"),
        col("conversation_turns"))))
      .select("session_id", "n_turns", "log_json")
      .orderBy("session_id")

  /** Schema for parsing the log back (F9 decode side). */
  val LogSchema: StructType = StructType(Seq(
    StructField("session_summary", StructType(Seq(
      StructField("session_id", LongType),
      StructField("n_turns", LongType),
      StructField("started_at", StringType),
      StructField("ended_at", StringType)))),
    StructField("conversation_turns", ArrayType(StructType(Seq(
      StructField("turn", IntegerType),
      StructField("mode", StringType),
      StructField("value", DoubleType),
      StructField("metadata_json", StringType)))))))

  /** Oracle-checked session summary: per-session turn count, modes used,
    * duration, value stats — the A6 summary header as a relational query.
    */
  def sessionSummaries(spark: SparkSession, dir: String): DataFrame =
    turns(spark, dir)
      .groupBy(col("session_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        countDistinct(col("mode")).as("n_modes"),
        round(sum(col("value")), 4).as("total_value"),
        min(col("ts")).as("started_at"),
        max(col("ts")).as("ended_at"))
      .withColumn("duration_sec",
        col("ended_at").cast("long") - col("started_at").cast("long"))
      // naive µs timestamps for the dump (same dtype DuckDB emits); the
      // duration above is computed on the tz-adjusted originals
      .withColumn("started_at", col("started_at").cast("timestamp_ntz"))
      .withColumn("ended_at", col("ended_at").cast("timestamp_ntz"))
      .orderBy("session_id")

  private val sessionSummariesSql =
    """SELECT user_id AS session_id, count(*) AS n_turns,
      |       count(DISTINCT event_type) AS n_modes,
      |       round(sum(value), 4) AS total_value,
      |       min(ts) AS started_at, max(ts) AS ended_at,
      |       CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_sec
      |FROM events GROUP BY user_id ORDER BY session_id""".stripMargin

  /** F9 encode→decode under a real oracle: serialize each session log with
    * to_json, parse it back with from_json, and emit scalars recomputed
    * FROM THE PARSED STRUCT — turn count from the summary header, the
    * first turn's mode, and the value total summed over the parsed turn
    * array. DuckDB computes the same numbers straight from events, so any
    * mangling in the JSON round trip (field order, value formatting, array
    * sort, the 50-turn cap) breaks the compare. The exact log_json STRING
    * stays rows-only (JSON key order is engine-specific); this checks its
    * CONTENT instead.
    */
  /** Identity barrier: Catalyst's JSON-expression optimization rewrites
    * from_json(to_json(x)) to x, which would eliminate the codec and make
    * the round-trip check vacuous (verified in the optimized plan). An
    * opaque UDF forces the serialize → parse to actually execute.
    */
  private val jsonBarrier = udf((s: String) => s)

  def sessionLogRoundtrip(spark: SparkSession, dir: String): DataFrame =
    sessionLogs(spark, dir)
      .withColumn("parsed", from_json(jsonBarrier(col("log_json")), LogSchema))
      .select(
        col("session_id"),
        col("parsed.session_summary.n_turns").as("n_turns_parsed"),
        element_at(col("parsed.conversation_turns"), 1)
          .getField("mode").as("first_mode"),
        round(aggregate(col("parsed.conversation_turns"), lit(0.0),
          (a, t) => a + coalesce(t.getField("value"), lit(0.0))), 4)
          .as("total_value_parsed"))
      .orderBy("session_id")

  private val sessionLogRoundtripSql =
    """WITH t AS (
      |  SELECT user_id, event_type, value,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS turn
      |  FROM events),
      |c AS (SELECT * FROM t WHERE turn <= 50)
      |SELECT user_id AS session_id,
      |       count(*) AS n_turns_parsed,
      |       max(CASE WHEN turn = 1 THEN event_type END) AS first_mode,
      |       round(coalesce(sum(value), 0.0), 4) AS total_value_parsed
      |FROM c GROUP BY user_id ORDER BY session_id""".stripMargin

  /** Driver gate for the serialized log itself (formerly a rows-only dump;
    * the JSON string's exact bytes stay engine-specific, its STRUCTURE
    * does not): parse every log_json back through the typed schema and
    * emit one violation row per breach — oracle = empty set.
    *
    *  - PARSEABLE: from_json must yield a non-null struct with a non-null
    *    summary header (a malformed log is unreadable by the F9 decode
    *    side);
    *  - HEADER CONSISTENCY: parsed session_id and n_turns must equal the
    *    frame's own columns;
    *  - TURN DISCIPLINE: the parsed turn array has exactly n_turns
    *    entries, numbered densely 1..n in array order (array_sort on the
    *    struct guarantees it — a sort-key regression lands here);
    *  - TIME ORDER: started_at <= ended_at in the header.
    */
  def sessionLogsGate(spark: SparkSession, dir: String): DataFrame = {
    // single pass: the five violation checks are row-local predicates
    // over the same parsed struct, so they emit as ONE projected array —
    // each `when` contributes its violation name or null, nulls filter
    // out, and the explode yields exactly the rows the previous five
    // filter branches (plus union) produced, in one evaluation of the
    // log pipeline instead of five (the former .cache() and its five
    // sequential branch jobs are gone). The final (session_id, violation)
    // sort makes branch emission order irrelevant, as before.
    val parsed = sessionLogs(spark, dir)
      .withColumn("p", from_json(jsonBarrier(col("log_json")), LogSchema))
    val flags = array(
      when(col("p").isNull || col("p.session_summary").isNull,
        lit("unparseable")),
      when(col("p.session_summary").isNotNull &&
          (col("p.session_summary.session_id") =!= col("session_id") ||
           col("p.session_summary.n_turns") =!= col("n_turns")),
        lit("header_mismatch")),
      when(col("p").isNotNull &&
          size(col("p.conversation_turns")) =!= col("n_turns"),
        lit("turn_count_mismatch")),
      when(col("p").isNotNull &&
          exists(zip_with(col("p.conversation_turns"),
              sequence(lit(1), greatest(size(col("p.conversation_turns")), lit(1))),
              (t, i) => t.getField("turn") =!= i), x => x),
        lit("turn_numbering")),
      when(col("p.session_summary").isNotNull &&
          col("p.session_summary.started_at") > col("p.session_summary.ended_at"),
        lit("time_order")))
    parsed
      .select(col("session_id"),
        explode(filter(flags, f => f.isNotNull)).as("violation"))
      .orderBy("session_id", "violation")
  }

  private val sessionLogsGateSql =
    """SELECT NULL::BIGINT AS session_id, NULL::VARCHAR AS violation WHERE false""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "session_logs" -> sessionLogsGate,
    "session_summaries" -> sessionSummaries,
    "session_log_roundtrip" -> sessionLogRoundtrip)

  def oracles: Map[String, String] = Map(
    "session_logs" -> sessionLogsGateSql,
    "session_summaries" -> sessionSummariesSql,
    "session_log_roundtrip" -> sessionLogRoundtripSql)
}
