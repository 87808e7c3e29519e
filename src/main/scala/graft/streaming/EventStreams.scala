package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.{QueryModule, Tables}

/** Event-stream analytics (SURVEY.md §2.10: additive — the reference has no
  * streaming; chat memory A5 and incremental logs are its only stateful
  * notions). Batch and streaming share the same event-time semantics:
  * tumbling windows = `window(ts, …)`, sessions = `session_window(ts, gap)`,
  * running state = window functions (batch) / mapGroupsWithState
  * (streaming, exercised in StreamingSpec).
  *
  * Scale: windowed aggregation shuffles once on (window, key) with partial
  * aggregation map-side; sessionization shuffles on user_id only;
  * watermarks bound streaming state. All expressions stay codegen'd.
  */
object EventStreams extends QueryModule {

  /** Tumbling 1-hour windows per event type: count + value sum/avg.
    * Window start for aligned hourly windows equals date_trunc('hour'),
    * which is the oracle formulation.
    */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        round(avg(col("value")), 6).as("avg_value"))
      // timestamp_ntz output: the session TZ is UTC, so the wall-clock
      // value is unchanged, but parquet then carries naive µs — the same
      // pandas dtype (datetime64[us]) DuckDB hands the driver, where the
      // tz-adjusted TimestampType lands as ns or tz-aware and diverges.
      .select(col("w.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"), col("avg_value"))
      .orderBy("window_start", "event_type")

  private val eventsHourlySql =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |       count(*) AS n_events,
      |       round(sum(value), 4) AS sum_value,
      |       round(avg(value), 6) AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Session windows: per-user sessions closed by a 30-minute inactivity
    * gap. Output (user, session_start = first event, last_event, n_events,
    * value sum) — formulated identically in the oracle via the classic
    * lag/flag/cumulative-sum rewrite.
    */
  def eventsSessions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        min(col("ts")).cast("timestamp_ntz").as("session_start"),
        max(col("ts")).cast("timestamp_ntz").as("last_event"))
      .select("user_id", "session_start", "last_event", "n_events", "sum_value")
      .orderBy("user_id", "session_start")

  private val eventsSessionsSql =
    """WITH flagged AS (
      |  SELECT user_id, ts, value,
      |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |                   > INTERVAL 30 MINUTE
      |              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |                                ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS last_event,
      |       count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM sessions GROUP BY user_id, session_id
      |ORDER BY user_id, session_start""".stripMargin

  /** A5-analog running state per user: event history accumulated in order
    * (running count, running value sum, previous event type) — the batch
    * formulation of chat-memory accumulation
    * (`query_rag_database.py:379,602`).
    */
  def userRunningState(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    Tables.events(spark, dir)
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("ts").cast("timestamp_ntz").as("ts"),
        col("event_type"),
        count(lit(1)).over(w).as("n_so_far"),
        round(sum(col("value")).over(w), 4).as("value_so_far"),
        coalesce(lag(col("event_type"), 1).over(wLag), lit("none")).as("prev_event"))
      .orderBy("user_id", "ts")
  }

  private val userRunningStateSql =
    """SELECT user_id, ts, event_type,
      |       count(*) OVER (PARTITION BY user_id ORDER BY ts
      |                      ROWS UNBOUNDED PRECEDING) AS n_so_far,
      |       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
      |                              ROWS UNBOUNDED PRECEDING), 4) AS value_so_far,
      |       coalesce(lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts),
      |                'none') AS prev_event
      |FROM events WHERE user_id < 10 ORDER BY user_id, ts""".stripMargin

  /** Ordered conversion funnel signup → click → purchase: per user, the
    * first signup, the first click strictly after it, the first purchase
    * strictly after that click; emitted as one row per stage with the
    * surviving-user count and the summed stage-transition time (integer
    * seconds, so the compare is exact). The sequential dependency (each
    * stage's window opens at the previous stage's event) is what plain
    * per-type counts can't express.
    *
    * Scale: three aggregations all keyed on user_id — co-partitioned, so
    * the stage joins reuse one shuffle's partitioning; event rows never
    * carry payload beyond (user, ts).
    */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val s = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t_signup"))
    val c = ev.filter(col("event_type") === "click").select(col("user_id"), col("ts"))
      .join(s, "user_id").filter(col("ts") > col("t_signup"))
      .groupBy("user_id")
      .agg(min(col("ts")).as("t_click"), min(col("t_signup")).as("t_signup"))
    val p = ev.filter(col("event_type") === "purchase").select(col("user_id"), col("ts"))
      .join(c.select(col("user_id"), col("t_click")), "user_id")
      .filter(col("ts") > col("t_click"))
      .groupBy("user_id")
      .agg(min(col("ts")).as("t_purchase"), min(col("t_click")).as("t_click"))
    def gapSum(a: String, b: String) = coalesce(
      sum(expr(s"CAST((unix_micros($a) - unix_micros($b)) DIV 1000000 AS BIGINT)")),
      lit(0L)).as("sum_gap_seconds")
    s.agg(count(lit(1)).as("n_users"), lit(0L).as("sum_gap_seconds"))
      .withColumn("stage", lit("1_signup"))
      .unionByName(c.agg(count(lit(1)).as("n_users"), gapSum("t_click", "t_signup"))
        .withColumn("stage", lit("2_click")))
      .unionByName(p.agg(count(lit(1)).as("n_users"), gapSum("t_purchase", "t_click"))
        .withColumn("stage", lit("3_purchase")))
      .select("stage", "n_users", "sum_gap_seconds")
      .orderBy("stage")
  }

  private val funnelStagesSql =
    """WITH s AS (SELECT user_id, min(ts) AS t_signup FROM events
      |           WHERE event_type = 'signup' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS t_click, min(s.t_signup) AS t_signup
      |      FROM events e JOIN s ON e.user_id = s.user_id
      |      WHERE e.event_type = 'click' AND e.ts > s.t_signup
      |      GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS t_purchase, min(c.t_click) AS t_click
      |      FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      |      GROUP BY e.user_id)
      |SELECT '1_signup' AS stage, count(*) AS n_users, 0::BIGINT AS sum_gap_seconds FROM s
      |UNION ALL
      |SELECT '2_click', count(*),
      |       COALESCE(sum((epoch_us(t_click) - epoch_us(t_signup)) // 1000000), 0)::BIGINT FROM c
      |UNION ALL
      |SELECT '3_purchase', count(*),
      |       COALESCE(sum((epoch_us(t_purchase) - epoch_us(t_click)) // 1000000), 0)::BIGINT FROM p
      |ORDER BY stage""".stripMargin

  /** Weekly retention cohorts: users grouped by signup week, counted as
    * active in each subsequent week they emit any event. Week buckets are
    * pure integer day arithmetic (`epoch-day DIV 7`, offset = days since
    * signup DIV 7) rather than calendar `date_trunc` — identical in every
    * engine, no week-start or timezone convention to disagree on.
    *
    * Scale: one shuffle keyed on user_id for the cohort join (events carry
    * only (user, day)), then a (cohort, offset)-keyed count-distinct —
    * bounded by users, not events, after the first aggregation.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min(expr("unix_micros(ts) DIV 86400000000")).as("day0"))
    ev.select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("d"))
      .join(cohorts, "user_id")
      .filter(col("d") >= col("day0"))
      .select(col("user_id"), expr("day0 DIV 7").as("cohort_week"),
        expr("(d - day0) DIV 7").as("offset_week"))
      .groupBy("cohort_week", "offset_week")
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_week", "offset_week")
  }

  private val retentionCohortsSql =
    """WITH c AS (SELECT user_id, min(epoch_us(ts) // 86400000000) AS day0
      |           FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |a AS (SELECT e.user_id, epoch_us(e.ts) // 86400000000 AS d, c.day0
      |      FROM events e JOIN c USING (user_id)
      |      WHERE epoch_us(e.ts) // 86400000000 >= c.day0)
      |SELECT day0 // 7 AS cohort_week, (d - day0) // 7 AS offset_week,
      |       count(DISTINCT user_id) AS n_active
      |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Event-rate anomaly detection: flag hours whose event count exceeds 3×
    * the trailing-24-hour mean for that event type — the ops alarm every
    * event pipeline runs (bot bursts, retry storms, broken clients). The
    * RANGE frame (hour-id units, not rows) keeps the trailing window
    * honest across gap hours, and the spike test is pure integer
    * cross-multiplication (`cnt · win_hours > 3 · win_events`) so the
    * oracle compare is exact; hours with under half the window present
    * never alarm (cold start / sparse types).
    *
    * Scale shape: one shuffle to (event_type, hour) counts — map-side
    * partial — then one window per event type over ~hours rows, thousands
    * of rows per type regardless of corpus size.
    */
  def eventRateAnomaly(spark: SparkSession, dir: String): DataFrame =
    eventRateAnomalyOf(Tables.events(spark, dir))

  /** Frame-level form over any (ts, event_type) frame. */
  def eventRateAnomalyOf(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        expr("unix_micros(ts) DIV 3600000000").as("hour_id"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_id"))
      .rangeBetween(-24, -1)
    hourly
      .withColumn("win_hours", count(lit(1)).over(w))
      .withColumn("win_events", coalesce(sum(col("n_events")).over(w), lit(0L)))
      .withColumn("is_spike",
        col("win_hours") >= 12 &&
          col("n_events") * col("win_hours") > col("win_events") * 3)
      .select("event_type", "hour_id", "n_events", "win_hours", "win_events",
        "is_spike")
      .orderBy("event_type", "hour_id")
  }

  private val eventRateAnomalySql =
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hour_id,
      |         count(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |win AS (
      |  SELECT event_type, hour_id, n_events,
      |         count(*) OVER w AS win_hours,
      |         CAST(coalesce(sum(n_events) OVER w, 0) AS BIGINT) AS win_events
      |  FROM hourly
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
      |               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, hour_id, n_events, win_hours, win_events,
      |       (win_hours >= 12 AND n_events * win_hours > win_events * 3)
      |         AS is_spike
      |FROM win ORDER BY event_type, hour_id""".stripMargin

  /** Streaming builders (driven by StreamingSpec with a memory source;
    * same transforms run on any readStream source in production).
    */

  /** Watermarked tumbling-window counts for a streaming events frame. */
  def hourlyCountsStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))

  /** Streaming exact dedup: keep the first arrival per key, dropping
    * duplicates that arrive in any later micro-batch — the streaming
    * analog of U2/J1 (and the first stage of a streaming training-data
    * pipeline). The watermark bounds the dedup state: keys older than the
    * delay are evicted, so state size is (keys per watermark window), not
    * (all keys ever).
    */
  /** Streaming as-of attribution — the streaming face of
    * `ops.Temporal.asofJoin`. One event stream per user carries both
    * reference rows (clicks) and probe rows (purchases); per-user state is
    * ONLY the most recent click `(tsMicros, clickId)` — constant per key,
    * no event buffering. Each micro-batch's rows are sorted by (event
    * time, click-before-purchase, id) before folding, so on equal
    * timestamps a click attributes to a purchase in the same batch and
    * duplicate click timestamps resolve to the max id — byte-for-byte the
    * batch operator's tie rules. Exact batch parity therefore holds
    * whenever event time is non-decreasing per key ACROSS micro-batches
    * (the per-key-ordered log deployment); a cross-batch late click is
    * simply ignored by the newer-wins state merge, and a purchase always
    * attributes to the newest click seen so far (StreamingSpec asserts the
    * ordered-parity case against the oracled batch query).
    */
  def attributionStream(
      events: Dataset[(Long, Timestamp, String, Long)],
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    def micros(t: Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp, String, Long)],
         state: GroupState[(Long, Long)]) =>
          val sorted = rows.toSeq.sortBy { case (_, t, typ, id) =>
            (micros(t), if (typ == "click") 0 else 1, id)
          }
          val out = Seq.newBuilder[(Long, Long, Option[Long], Option[Long])]
          var last = state.getOption
          sorted.foreach {
            case (_, t, "click", id) =>
              val m = micros(t)
              last match {
                case Some((lm, lid)) if lm > m || (lm == m && lid >= id) => ()
                case _ => last = Some((m, id))
              }
            case (_, t, "purchase", id) =>
              val m = micros(t)
              // compare in MICROS like Temporal.asofJoin's inTolerance —
              // a truncating seconds division would attribute gaps up to
              // ~1s staler than the batch twin
              val hit = last.filter { case (cm, _) =>
                toleranceSeconds.forall(tol => m - cm <= tol * 1000000L)
              }
              out += ((id, user, hit.map(_._2), hit.map(c => (m - c._1) / 1000000L)))
            case _ => () // other event types pass through unattributed
          }
          last.foreach(state.update)
          out.result().iterator
      }
      .toDF("purchase_id", "user_id", "click_id", "gap_seconds")
  }

  /** Stream-stream event-time interval join: every purchase pairs with
    * every same-user click it follows within `windowSeconds` — Spark's
    * native watermarked two-sided join (no custom state). Both sides carry
    * a watermark and the range condition bounds the buffered state: a
    * click can be dropped once the purchase watermark passes
    * click.ts + window, which is exactly the bound Spark derives from the
    * join condition. Batch parity with `graft.ops.Temporal
    * .clickPurchasePairs` (the oracled driver query) is pinned in
    * StreamingSpec.
    *
    * Inputs are pre-projected frames (user_id, click_id, c_ts) and
    * (user_id, purchase_id, p_ts), streaming or batch.
    */
  def clickPurchaseJoinStream(
      clicks: DataFrame,
      purchases: DataFrame,
      windowSeconds: Long = 600L,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("c_ts", watermarkDelay)
    val p = purchases.withWatermark("p_ts", watermarkDelay)
    c.join(p,
      c("user_id") === p("user_id") &&
        p("p_ts") >= c("c_ts") &&
        p("p_ts") < c("c_ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(c("user_id"), col("click_id"), col("purchase_id"),
        expr("(unix_micros(p_ts) - unix_micros(c_ts)) DIV 1000000")
          .as("gap_seconds"))
  }

  /** LEFT OUTER variant of the watermarked interval join: clicks with no
    * purchase inside the window surface with NULL purchase columns — but
    * only once the purchase-side watermark has passed the end of the
    * click's window, because until then a match could still arrive. This
    * is the abandonment/timeout detection the inner join cannot express;
    * state stays bounded by the same watermark + range condition.
    *
    * Output is one row PER (click, purchase) PAIR plus one NULL-marked
    * row per abandoned click (`purchase_id` kept so consumers can see
    * which): a click converting N times emits N matched rows, so
    * conversion metrics must count DISTINCT click_id — streaming
    * append-mode cannot deduplicate after an outer join without
    * unbounded state, and collapsing here would silently undercount
    * multi-purchase attributions.
    */
  def clickAbandonmentStream(
      clicks: DataFrame,
      purchases: DataFrame,
      windowSeconds: Long = 600L,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("c_ts", watermarkDelay)
    val p = purchases.withWatermark("p_ts", watermarkDelay)
    c.join(p,
        c("user_id") === p("user_id") &&
          p("p_ts") >= c("c_ts") &&
          p("p_ts") < c("c_ts") + expr(s"INTERVAL $windowSeconds SECONDS"),
        "left_outer")
      .select(c("user_id"), col("click_id"), col("purchase_id"),
        col("purchase_id").isNull.as("abandoned"))
  }

  def dedupStream(records: DataFrame, keyCol: String, tsCol: String,
      watermarkDelay: String): DataFrame =
    records
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Continuous per-group leaderboard: the bounded top-k contract of the
    * batch aggregate (org.apache.spark.sql.graft.GroupTopK — score DESC,
    * payload ASC total order) maintained incrementally over a stream
    * with `mapGroupsWithState`. State per group is exactly the k-entry
    * list — insertion reuses TopKBuffer, so stream and batch can never
    * disagree on tie semantics — and stays k-bounded no matter how many
    * events flow through (no watermark needed: a leaderboard never
    * expires entries, it only displaces them).
    *
    * Input columns: (group: String, score: Long, payload: String).
    * Output per update: one row per group with the current ranked board.
    */
  def leaderboardStream(events: DataFrame, k: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.unsafe.types.UTF8String
    events.as[(String, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Seq[(Long, String)], (String, Seq[(Long, String)])](
        GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        val buf = new org.apache.spark.sql.graft.TopKBuffer(k)
        state.getOption.getOrElse(Seq.empty).foreach { case (s, p) =>
          buf.insert(s, UTF8String.fromString(p))
        }
        rows.foreach { case (_, s, p) => buf.insert(s, UTF8String.fromString(p)) }
        val board = buf.sorted.map { case (s, p) => (s, p.toString) }.toSeq
        state.update(board)
        (key, board)
      }
      .toDF("group", "board")
  }

  /** Streaming maintenance of the count-by-key materialized view that
    * `MvRewriteRule` routes to: each micro-batch folds its partial counts
    * into the stored summary (counts are mergeable, so merge ≡ recompute
    * — the ivm_event_summary argument), keeping the MV fresh while the
    * optimizer keeps serving grouped counts from it. The merged summary
    * is group-cardinality-bounded (catalog scale, NOT data scale — event
    * types, not events), which is what makes the collect-and-rewrite
    * refresh safe; a billion-group MV would instead write versioned
    * partial files and compact (the Lakehouse manifest pattern).
    * Returns the writer; callers start it with their own trigger.
    */
  def mvMaintenanceWriter(events: DataFrame, groupCol: String, mvPath: String,
      sumCol: Option[String] = None, minMaxCols: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        import org.apache.hadoop.fs.Path
        val spark = batch.sparkSession
        // Hadoop FS API, not java.io.File: Spark resolves mvPath against
        // the default filesystem, and a local-disk marker probe on a
        // cluster would silently disable the replay guard.
        val dir = new Path(mvPath)
        val next = new Path(mvPath + ".next")
        val old = new Path(mvPath + ".old")
        val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
        def marker(base: Path) = new Path(base, "_applied_batch")
        // Read the marker COMPLETELY before parsing: Hadoop streams may
        // return short reads, and a truncated "12" of "123" parses to a
        // smaller batch id — silently disarming the replay guard.
        def readMarker(base: Path): Long =
          if (fs.exists(marker(base)))
            scala.util.Try {
              val in = fs.open(marker(base))
              try {
                val out = new java.io.ByteArrayOutputStream(64)
                val buf = new Array[Byte](64)
                var n = in.read(buf)
                while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
                new String(out.toByteArray, "UTF-8").trim.toLong
              } finally in.close()
            }.getOrElse(-1L)
          else -1L
        // crash recovery: a crash between the two swap renames leaves
        // `dir` missing — complete the swap from a fully-staged `next`
        // (its marker is written last, so presence ⇒ complete), else
        // restore `old`. Without this, a replayed batch would rebuild
        // the summary from itself alone and history would be lost.
        if (!fs.exists(dir)) {
          if (readMarker(next) >= 0L) { fs.rename(next, dir); () }
          else if (fs.exists(old)) { fs.rename(old, dir); () }
        }
        // foreachBatch is AT-LEAST-ONCE: after crash recovery the same
        // micro-batch replays, and a blind merge would double-count it.
        // The applied batch id travels INSIDE the summary dir (swapped
        // with the data), so replay detection can't desync.
        val lastApplied = readMarker(dir)
        if (batchId > lastApplied) {
          // optional integer-units sum partials next to counts — the
          // `sum_<col>` column MvRewriteRule's sum routing reads; both
          // merge by addition. min/max partials (`min_<c>`/`max_<c>`,
          // the rule's third routed shape) merge by re-taking the
          // extremum — so merge ≡ recompute holds for every stored column
          val partialAggs = (count(lit(1)).as("cnt") +:
            sumCol.toSeq.map(c => sum(col(c)).as(s"sum_$c"))) ++
            minMaxCols.flatMap(c => Seq(
              min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
          val partial = batch.groupBy(col(groupCol))
            .agg(partialAggs.head, partialAggs.tail: _*)
          val mergeAggs = (sum(col("cnt")).as("cnt") +:
            sumCol.toSeq.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))) ++
            minMaxCols.flatMap(c => Seq(
              min(col(s"min_$c")).as(s"min_$c"),
              max(col(s"max_$c")).as(s"max_$c")))
          val merged =
            if (fs.exists(dir))
              spark.read.parquet(mvPath).unionByName(partial)
                .groupBy(col(groupCol)).agg(mergeAggs.head, mergeAggs.tail: _*)
            else partial
          // bounded materialization breaks the read-own-path cycle
          val rows = merged.collect().toIndexedSeq
          // stage next to a sibling, then swap via renames. Single-writer
          // protocol: a NEW read resolves the old summary, nothing (the
          // MV rewrite declines gracefully), or the new summary — but a
          // reader holding file handles from a pre-swap listing can see
          // its files vanish mid-scan; concurrent serve-while-refresh
          // needs a manifest/txn-log indirection (timeTravelScan's
          // pattern), not bare renames.
          if (fs.exists(next)) fs.delete(next, true)
          spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), merged.schema)
            .write.mode("overwrite").parquet(next.toString)
          val out = fs.create(marker(next), true)
          try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
          if (fs.exists(old)) fs.delete(old, true)
          if (fs.exists(dir)) fs.rename(dir, old)
          fs.rename(next, dir)
          fs.delete(old, true)
          ()
        }
    }

  /** The streaming-retrieval serving path (QueryStreams.retrieveMicroBatch
    * — the foreachBatch body with probe-bucket partition pruning) made
    * driver-visible under a real oracle. A micro-batch of 5 queries = the
    * stored vectors 0..4 themselves; with threshold 0.9 the only pairs
    * that can pass are exact self-matches (max non-self cosine in the
    * testdata is 0.41), and a query's own bucket is always probed — so the
    * result is provably (i, i, 1.0) for i < 5 regardless of LSH recall,
    * while the real machinery (probe explode, collected-bucket isin
    * pruning, bucket equi-join, re-score, threshold) runs. Stream/batch
    * equivalence of this body is asserted in StreamingSpec against
    * retrieveStream.
    */
  def streamingRetrievalSelfmatch(spark: SparkSession, dir: String): DataFrame = {
    val lsh = graft.ops.AnnIndex.defaultLsh
    val e = Tables.embeddings(spark, dir)
    val corpus = graft.vector.IndexBuilder.withLshBucket(e, "embedding", lsh)
    val batch = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    QueryStreams.retrieveMicroBatch(batch, corpus, lsh, threshold = 0.9, radius = 1)
      .orderBy("query_id")
  }

  private val streamingRetrievalSelfmatchSql =
    """SELECT vec_id AS query_id, vec_id, 1.0::DOUBLE AS score
      |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_hourly" -> eventsHourly,
    "events_sessions" -> eventsSessions,
    "event_rate_anomaly" -> eventRateAnomaly,
    "funnel_stages" -> funnelStages,
    "retention_cohorts" -> retentionCohorts,
    "streaming_retrieval_selfmatch" -> streamingRetrievalSelfmatch,
    "user_running_state" -> userRunningState)

  def oracles: Map[String, String] = Map(
    "events_hourly" -> eventsHourlySql,
    "events_sessions" -> eventsSessionsSql,
    "event_rate_anomaly" -> eventRateAnomalySql,
    "funnel_stages" -> funnelStagesSql,
    "retention_cohorts" -> retentionCohortsSql,
    "streaming_retrieval_selfmatch" -> streamingRetrievalSelfmatchSql,
    "user_running_state" -> userRunningStateSql)
}
