package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Temporal joins — as-of and interval — the two join shapes every
  * event/feature pipeline needs and vanilla equi-join can't express
  * (SURVEY.md §2.4 additive; the reference's only temporal notion is
  * session-log timestamps, `query_rag_database.py:379`).
  *
  * Both operators are built so the range predicate NEVER becomes a
  * BroadcastNestedLoopJoin/CartesianProduct (Spark's default physical plan
  * for inequality-only joins, which is quadratic and driver-bound):
  *
  *  - As-of: union the probe and reference rows into one stream, sort each
  *    key's partition once, and carry the latest reference row forward with
  *    `last(ignoreNulls)` — ONE shuffle on the key, linear scan, no range
  *    lookup. This is the standard distributed as-of shape (same plan
  *    family as Flink temporal joins / pandas merge_asof-at-scale).
  *  - Interval: quantize time into fixed-width buckets, explode each
  *    interval to the buckets it covers (⌈len/width⌉+1, a small constant
  *    when width ≈ the typical interval), and equi-join on (key, bucket)
  *    before re-checking the exact range — the classic binned range join.
  *    A point lands in exactly one bucket so no pair is emitted twice.
  *
  * Scale notes (100 TB): both shuffle once on the join key (+bucket);
  * per-key data is streamed by the sort, never materialized per row. Skewed
  * keys are AQE's problem (both joins are plain sort-merge equi-joins after
  * the rewrite). PlanAuditSpec pins the no-nested-loop property.
  */
object Temporal extends QueryModule {

  /** As-of join: for each left row, the single most recent right row with
    * `right.ts <= left.ts` on the same key (inclusive on ties), optionally
    * within `toleranceSeconds` (a stale match nulls out — the most recent
    * match being stale implies every earlier one is staler).
    *
    * Right rows must be unique per (keys, ts) — pre-aggregate otherwise
    * (a duplicate reference timestamp has no "most recent" winner and
    * would make the result sort-order-dependent).
    *
    * Returns every left row plus the matched right row's payload as a
    * struct column `asof` (null when no match). Callers project fields.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val rightPayload = right.columns.filterNot(keys.contains)
    val l2 = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(1).as("__tag"),
        struct(left.columns.map(col): _*).as("__l")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__tag"),
        struct(rightPayload.map(col): _*).as("__r")): _*)
    // unionByName fills the side-specific struct with null on the other side
    val tagged = l2.unionByName(r2, allowMissingColumns = true)
    // Right rows sort before left on equal ts (__tag 0 < 1) → inclusive
    // right.ts <= left.ts semantics, matching SQL ASOF `ON l.ts >= r.ts`.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = tagged
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val inTolerance: Column = toleranceSeconds match {
      case Some(tol) =>
        when(
          col("__m").isNotNull &&
            unix_micros(col("__ts")) - unix_micros(col(s"__m.$rightTs")) <= tol * 1000000L,
          col("__m"))
      case None => col("__m")
    }
    matched.select(col("__l.*"), inTolerance.as("asof"))
  }

  /** Interval join: all (interval, point) pairs with the same key and
    * `start <= ts < end` (end-exclusive). `bucketSeconds` is a pure
    * performance knob — correctness holds for intervals of ANY length
    * (longer intervals just explode to more buckets); size it near the
    * typical interval length so the explosion factor stays ~2.
    */
  def intervalJoin(
      intervals: DataFrame,
      points: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String,
      tsCol: String,
      bucketSeconds: Long): DataFrame = {
    val width = bucketSeconds * 1000000L // micros
    val iv = intervals
      .filter(col(endCol) > col(startCol)) // empty interval matches nothing
      .withColumn(
        "__bucket",
        explode(sequence(
          floor(unix_micros(col(startCol)) / width).cast("long"),
          // end-exclusive: the last covered instant is end - 1 micro
          floor((unix_micros(col(endCol)) - 1) / width).cast("long"))))
    val pt = points
      .withColumn("__bucket", floor(unix_micros(col(tsCol)) / width).cast("long"))
    iv.join(pt, keys :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }

  // ---- driver queries ----

  /** Last-click attribution: each purchase joined as-of to the user's most
    * recent click, nulled when staler than 7 days. Clicks are pre-deduped
    * to one row per (user, ts) so the as-of winner is deterministic.
    */
  def asofAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val clicks = ev
      .filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
    asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
        toleranceSeconds = Some(7L * 24 * 3600))
      .select(
        col("purchase_id"),
        col("user_id"),
        col("asof.click_id").as("click_id"),
        ((unix_micros(col("ts")) - unix_micros(col("asof.ts"))) / 1000000L)
          .cast("long").as("gap_seconds"))
      .orderBy("purchase_id")
  }

  private val asofAttributionSql =
    """WITH p AS (SELECT event_id AS purchase_id, user_id, ts
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts, max(event_id) AS click_id
      |      FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      |m AS (SELECT p.purchase_id, p.user_id, c.click_id,
      |             (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS gap_seconds
      |      FROM p ASOF LEFT JOIN c
      |        ON p.user_id = c.user_id AND p.ts >= c.ts)
      |SELECT purchase_id, user_id,
      |       CASE WHEN gap_seconds <= 604800 THEN click_id END AS click_id,
      |       CASE WHEN gap_seconds <= 604800 THEN gap_seconds END AS gap_seconds
      |FROM m ORDER BY purchase_id""".stripMargin

  /** Per-signup 24-hour activation window: how many clicks the user made
    * inside it (zero-click windows kept). The binned interval join runs as
    * a sort-merge equi-join on (user, day-bucket); each 24 h window covers
    * at most two 24 h buckets.
    */
  def intervalClickCounts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val wins = ev
      .filter(col("event_type") === "signup")
      .select(col("event_id").as("win_id"), col("user_id"),
        col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 24 HOURS")).as("w_end"))
    val clicks = ev
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val matched = intervalJoin(wins, clicks, Seq("user_id"),
      "w_start", "w_end", "ts", bucketSeconds = 24L * 3600)
    val counts = matched.groupBy(col("win_id"))
      .agg(count(lit(1)).as("n_clicks"))
    wins.join(counts, Seq("win_id"), "left")
      .select(col("win_id"), col("user_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
      .orderBy("win_id")
  }

  private val intervalClickCountsSql =
    """WITH w AS (SELECT event_id AS win_id, user_id, ts AS w_start,
      |                  ts + INTERVAL 24 HOUR AS w_end
      |           FROM events WHERE event_type = 'signup'),
      |c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
      |SELECT w.win_id, w.user_id, count(c.event_id) AS n_clicks
      |FROM w LEFT JOIN c
      |  ON w.user_id = c.user_id AND c.ts >= w.w_start AND c.ts < w.w_end
      |GROUP BY w.win_id, w.user_id
      |ORDER BY w.win_id""".stripMargin

  /** Click→purchase pair attribution: every (click, purchase) pair of the
    * same user with the purchase inside 10 minutes after the click — the
    * batch twin of the stream-stream event-time join
    * (`graft.streaming.EventStreams.clickPurchaseJoinStream`, parity
    * pinned by StreamingSpec). Gap is emitted in exact integer seconds.
    */
  def clickPurchasePairs(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("c_ts"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("c_end"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    intervalJoin(clicks, purchases, Seq("user_id"),
      "c_ts", "c_end", "p_ts", bucketSeconds = 600L)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        expr("(unix_micros(p_ts) - unix_micros(c_ts)) DIV 1000000")
          .as("gap_seconds"))
      .orderBy("user_id", "click_id", "purchase_id")
  }

  private val clickPurchasePairsSql =
    """WITH c AS (SELECT user_id, event_id AS click_id, ts AS c_ts
      |           FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, event_id AS purchase_id, ts AS p_ts
      |      FROM events WHERE event_type = 'purchase')
      |SELECT c.user_id, c.click_id, p.purchase_id,
      |       (epoch_us(p_ts) - epoch_us(c_ts)) // 1000000 AS gap_seconds
      |FROM c JOIN p ON c.user_id = p.user_id
      |  AND p.p_ts >= c.c_ts AND p.p_ts < c.c_ts + INTERVAL 10 MINUTE
      |ORDER BY c.user_id, click_id, purchase_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_attribution" -> asofAttribution,
    "click_purchase_pairs" -> clickPurchasePairs,
    "interval_click_counts" -> intervalClickCounts)

  def oracles: Map[String, String] = Map(
    "asof_attribution" -> asofAttributionSql,
    "click_purchase_pairs" -> clickPurchasePairsSql,
    "interval_click_counts" -> intervalClickCountsSql)
}
