package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Relational breadth queries over the TPC-H-ish star schema.
  *
  * The reference's relational surface is thin (SURVEY.md §2.3–§2.7: filters,
  * anti-joins, counts, top-k); these queries exercise the full
  * join/agg/window/set-op breadth the engine inherits from Catalyst so the
  * oracle can check it. Every double aggregate is rounded in BOTH the Spark
  * plan and the DuckDB oracle SQL: summation order differs between engines,
  * so raw double sums disagree in the last ulp.
  *
  * Scale notes (100 TB): aggregations are partial (map-side combine) by
  * construction; joins against `nation`/`region`/`supplier` dimension tables
  * are explicitly broadcast; fact-fact joins (orders⋈lineitem) shuffle on the
  * join key, which AQE re-plans at runtime.
  */
object Relational extends QueryModule {

  /** TPC-H Q1-style pricing summary (SURVEY §2.5 A1-analog aggregation). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1PricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 2) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_base_price,
      | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      | round(avg(l_quantity), 4) AS avg_qty,
      | round(avg(l_discount), 4) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q5-style revenue by region: fact table joined through the
    * supplier→nation→region dimension chain — all three dims explicitly
    * broadcast (at 100 TB the fact side never shuffles for these joins).
    */
  def q2RevenueByRegion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy($"r_name")
  }

  private val q2RevenueByRegionSql =
    """SELECT r_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |       count(*) AS n_lineitems
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** TPC-H Q3-style top unshipped-revenue orders: fact-fact join
    * (orders⋈lineitem shuffles on the key, AQE-replanned) + broadcast
    * customer filter + global top-10 via TakeOrderedAndProject.
    */
  def q3TopOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir).filter($"c_mktsegment" === "BUILDING")
      .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey")
      .join(Tables.lineitem(spark, dir), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"o_orderkey".asc)
      .limit(10)
  }

  private val q3TopOrdersSql =
    """SELECT o_orderkey, o_orderdate, o_orderpriority,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** Semi join (EXISTS): orders with at least one line item shipped after
    * the order date window start — per-priority counts (TPC-H Q4 shape).
    */
  def q4PriorityCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_orderkey").distinct()
    Tables.orders(spark, dir)
      .join(li, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  private val q4PriorityCountsSql =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Anti join: customers that placed no orders. */
  def customersNoOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  private val customersNoOrdersSql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
      |ORDER BY c_custkey""".stripMargin

  /** Distinct aggregation: per-nation supplier/customer distinct counts
    * plus account-balance stats over a broadcast dim join.
    */
  def nationAccountStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(countDistinct($"c_custkey").as("n_customers"),
        countDistinct($"c_mktsegment").as("n_segments"),
        round(sum($"c_acctbal"), 2).as("total_acctbal"),
        round(avg($"c_acctbal"), 4).as("avg_acctbal"))
      .orderBy($"n_name")
  }

  private val nationAccountStatsSql =
    """SELECT n_name, count(DISTINCT c_custkey) AS n_customers,
      |       count(DISTINCT c_mktsegment) AS n_segments,
      |       round(sum(c_acctbal), 2) AS total_acctbal,
      |       round(avg(c_acctbal), 4) AS avg_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Rollup: revenue at (returnflag, linestatus), per-flag subtotals, and
    * grand total — grouping-set breadth with null-marker parity.
    */
  def revenueRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(round(sum($"l_extendedprice"), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  private val revenueRollupSql =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_extendedprice), 2) AS revenue, count(*) AS n_items
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Per-group top-k via window: highest-balance supplier per nation. */
  def topSupplierPerNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"s_nationkey").orderBy($"s_acctbal".desc, $"s_suppkey".asc)
    Tables.supplier(spark, dir)
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" === 1)
      .join(broadcast(Tables.nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .select($"n_name", $"s_suppkey", $"s_name", round($"s_acctbal", 2).as("acctbal"))
      .orderBy($"n_name")
  }

  private val topSupplierPerNationSql =
    """WITH ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY s_nationkey
      |                               ORDER BY s_acctbal DESC, s_suppkey ASC) AS rnk
      |  FROM supplier)
      |SELECT n_name, s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
      |FROM ranked JOIN nation ON s_nationkey = n_nationkey
      |WHERE rnk = 1 ORDER BY n_name""".stripMargin

  /** T3: sorted distinct list (`query_rag_database.py:80-83` —
    * `sorted(set(models))` for display): distinct (source, lang) pairs in
    * order. distinct() is a hash aggregate on the two columns; at scale
    * only the distinct pairs cross the exchange, never the documents.
    */
  def distinctSources(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("lang"))
      .distinct()
      .orderBy("source", "lang")

  private val distinctSourcesSql =
    "SELECT DISTINCT source, lang FROM documents ORDER BY source, lang"

  /** Sketch-based cardinality estimation — the 100 TB counterpart of exact
    * distinct (an exact countDistinct shuffles every distinct value; the
    * HLL++ sketch shuffles a few KB per group). The query emits the exact
    * count AND a boolean "approx within 5% of exact" computed in-engine;
    * the oracle recomputes the exact count and asserts the boolean
    * literally true, so the driver compare pins the sketch's error bound
    * without requiring DuckDB to replicate Spark's HLL++ (rsd 0.01 on
    * these cardinalities is comfortably inside 5%).
    */
  /** Count-min-sketch heavy-hitter gate. Production shape at 100 TB: the
    * KB-size CMS replaces a full shuffle for frequency estimation, the
    * candidate set it nominates is then verified with exact counts on a
    * bounded join — here the gate checks the property that makes that
    * sound, CMS NEVER undercounts (estimate ≥ true count, always). One
    * violation row per breach on the top-20 users; oracle = empty set. The
    * top-20 collect is the bounded candidate set of the two-pass pattern.
    */
  def cmsOvercountGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select(col("user_id"))
    val sketch = ev.stat.countMinSketch(col("user_id"),
      eps = 0.001, confidence = 0.99, seed = 42)
    val top = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id").asc).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    top.collect { case (uid, exact) if sketch.estimateCount(uid) < exact =>
        ("cms_undercount", uid)
      }.toSeq.toDF("violation", "detail")
      .select(col("violation"), col("detail").cast("long"))
  }

  /** Bloom-filter membership gate — the accelerator for incremental-ingest
    * anti-joins (J1/J2): a doc the filter says is ABSENT can skip the
    * exact index lookup entirely, which is only sound because Bloom
    * filters have no false negatives. The gate bloom-builds over the
    * stored-id set, then emits every stored id the filter fails to claim
    * (must be none). Filter is ~KB and broadcast; the membership test is a
    * narrow map over the corpus.
    */
  def bloomMembershipGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val stored = docs.filter(col("doc_id") < 250).select(col("doc_id"))
    val bloom = stored.stat.bloomFilter(col("doc_id"),
      expectedNumItems = 1000L, fpp = 0.01)
    val mightContain = udf((id: Long) => bloom.mightContainLong(id))
    stored.filter(!mightContain(col("doc_id")))
      .select(lit("bloom_false_negative").as("violation"),
        col("doc_id").cast("long").as("detail"))
  }

  private val emptyViolationsSql =
    """SELECT NULL::VARCHAR AS violation, NULL::BIGINT AS detail WHERE false""".stripMargin

  /** Approximate-quantile gate: `approx_percentile` (Greenwald-Khanna at
    * accuracy 10⁴) must land inside the exact [45th, 55th] discrete
    * percentile band of per-language doc lengths — the contract that lets
    * length-quantile corpus reports run as one sketch pass instead of a
    * per-key rank sort at 100 TB. Violations (must be none) name the
    * language; the exact band comes from the same rank-window construction
    * quality_calibration oracles.
    */
  def approxQuantileGate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir).select(col("lang"), col("n_chars"))
    val approx = docs.groupBy("lang")
      .agg(percentile_approx(col("n_chars"), lit(0.5), lit(10000)).as("approx_med"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"))
    val ranked = docs
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang"))))
    val bounds = ranked
      .filter(col("rk") === expr("(n * 45 + 99) DIV 100") ||
        col("rk") === expr("(n * 55 + 99) DIV 100"))
      .groupBy("lang")
      .agg(min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
    approx.join(bounds, Seq("lang"))
      .filter(col("approx_med") < col("lo") || col("approx_med") > col("hi"))
      .select(concat(lit("quantile_out_of_band_"), col("lang")).as("violation"),
        col("approx_med").cast("long").as("detail"))
  }

  def approxDistinctDocs(spark: SparkSession, dir: String): DataFrame = {
    // ONE scan, NO join: pre-aggregate to the distinct (lang, md5) pairs,
    // then count + HLL-sketch the already-unique hashes. The HLL estimate
    // is identical to sketching the raw multiset (HLL registers are
    // max-merged per value — duplicates cannot move them), and the exact
    // count is a plain count over the deduped keys. This replaces the
    // previous two full-scan aggregations + 5-row join (which themselves
    // replaced the single-agg form whose distinct-rewrite exploded to
    // 1640-field codegen): same answer, one pass, two exchanges, no join.
    Tables.documents(spark, dir)
      .groupBy(col("lang"), md5(col("text")).as("h")).agg(count(lit(1)))
      .groupBy(col("lang"))
      // count(h), not count(*): a null text hashes to a null group that
      // countDistinct never counted, and approx_count_distinct skips
      // nulls natively — the null-text semantics stay exactly the old ones
      .agg(count(col("h")).as("exact_distinct"),
        approx_count_distinct(col("h"), rsd = 0.01).as("approx"))
      .select(col("lang"), col("exact_distinct"),
        (abs(col("approx") - col("exact_distinct")) <=
          col("exact_distinct") * 0.05).as("approx_within_5pct"))
      .orderBy("lang")
  }

  private val approxDistinctDocsSql =
    """SELECT lang, count(DISTINCT md5(text)) AS exact_distinct,
      |       true AS approx_within_5pct
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Salted two-stage distinct aggregation — the skew-proof shape for
    * counting distinct values under a hot grouping key. A plain
    * `groupBy(key).agg(countDistinct(v))` shuffles every (key, v) pair to
    * ONE reducer per key; with few huge groups (exactly this data: a
    * handful of event types over all events) that reducer is the straggler.
    * Salting by hash(v) % nSalts splits each group into disjoint value
    * ranges — distinct counts over hash-disjoint partitions are ADDITIVE,
    * so stage 2 just sums 16 small rows per key. Exact, not approximate,
    * which is why the oracle can be a plain COUNT(DISTINCT).
    */
  def saltedDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"),
        pmod(xxhash64(col("user_id")), lit(16)).as("salt"))
      .agg(countDistinct(col("user_id")).as("d"))
      .groupBy(col("event_type"))
      .agg(sum(col("d")).as("n_distinct_users"))
      .orderBy("event_type")

  private val saltedDistinctUsersSql =
    """SELECT event_type, count(DISTINCT user_id) AS n_distinct_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Salted skew JOIN — the companion technique to the salted aggregation
    * above, for the join a hot key would straggle. Scenario: joining
    * per-source corpus stats back onto every document. At 100 TB the
    * per-domain stats table is ~10⁸ rows (NOT broadcastable) and the doc
    * distribution over domains is Zipf — the hot domain's partition gets
    * ~all the rows of a plain shuffle join. Salting splits each fact key
    * into `nSalts` disjoint slices (deterministic hash of the row id) and
    * replicates only the DIM row per salt, so the hot key spreads over
    * nSalts reducers while every fact row still meets exactly one copy of
    * its dim row. Exact, not approximate — the oracle is the plain join.
    * The shuffle_hash hint pins the shuffle-join plan the technique
    * targets (a broadcast would hide the skew problem AND its fix); AQE's
    * skew-join handles the sort-merge case, salting covers hash joins and
    * pre-AQE engines.
    */
  def saltedSourceJoin(spark: SparkSession, dir: String): DataFrame = {
    val nSalts = 8
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val dim = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("src_docs"), sum(col("n_chars")).as("src_sum_chars"))
      .withColumn("salt", explode(sequence(lit(0L), lit(nSalts - 1L))))
    val fact = docs.withColumn("salt", pmod(xxhash64(col("doc_id")), lit(nSalts)))
    fact.join(dim.hint("shuffle_hash"), Seq("source", "salt"))
      // integer-exact "longer than the source's mean": chars * n >= sum
      .withColumn("above_avg", col("n_chars") * col("src_docs") >= col("src_sum_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("above_avg"), lit(1))).as("n_above_avg"))
      .orderBy("source")
  }

  private val saltedSourceJoinSql =
    """WITH dim AS (
      |  SELECT source, count(*) AS src_docs, sum(n_chars) AS src_sum_chars
      |  FROM documents GROUP BY source)
      |SELECT source, count(*) AS n_docs,
      |       count(*) FILTER (WHERE d.n_chars * src_docs >= src_sum_chars)
      |         AS n_above_avg
      |FROM documents d JOIN dim USING (source)
      |GROUP BY source ORDER BY source""".stripMargin

  /** Incremental view maintenance with mergeable state — the pattern that
    * turns a 100 TB daily-refresh aggregate into a delta-sized job. The
    * materialized summary stores MERGEABLE partials per (event_type, day):
    * count, an exact integer value sum (micro-units via floor — float sums
    * don't merge deterministically), min/max timestamps. Refresh reads the
    * small summary plus ONLY the new days (the day filter pushes to the
    * delta scan — history is never rescanned) and re-merges: count/sum by
    * addition, min/max by min/max. The oracle is the full recompute — the
    * whole point is merge ≡ recompute, which only holds because every
    * stored aggregate is associative; avg is served as sum/count, never
    * stored.
    */
  def ivmEventSummary(spark: SparkSession, dir: String): DataFrame = {
    val cutDay = 19738L // 2024-01-16; testdata spans 2024-01-01..30
    def partials(df: DataFrame): DataFrame = df
      .withColumn("day_id", expr("unix_micros(ts) DIV 86400000000"))
      .groupBy(col("event_type"), col("day_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(floor(value * 1000000) AS BIGINT)")).as("sum_value_e6"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
    val path = Tables.scratchPath("graft_ivm", dir)
    // day-one materialization of history (in production this already exists)
    partials(Tables.events(spark, dir)
      .filter(expr("unix_micros(ts) DIV 86400000000") < cutDay))
      .write.mode("overwrite").parquet(path)
    // the refresh job: stored summary ∪ delta-only partials, re-merged
    val stored = spark.read.parquet(path)
    val delta = partials(Tables.events(spark, dir)
      .filter(expr("unix_micros(ts) DIV 86400000000") >= cutDay))
    stored.unionByName(delta)
      .groupBy(col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_value_e6")).as("sum_value_e6"),
        min(col("first_ts")).as("first_ts"), max(col("last_ts")).as("last_ts"))
      // epoch micros, not timestamps: Spark parquet timestamps land as
      // datetime64[ns] in the driver frame vs DuckDB's [us] — same instant,
      // different dtype, hash-red. BIGINT micros is unit-exact on both sides.
      .select(col("event_type"), col("n_events"), col("sum_value_e6"),
        expr("unix_micros(first_ts)").as("first_ts_us"),
        expr("unix_micros(last_ts)").as("last_ts_us"))
      .orderBy("event_type")
  }

  private val ivmEventSummarySql =
    """SELECT event_type, count(*) AS n_events,
      |       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_e6,
      |       epoch_us(min(ts)) AS first_ts_us, epoch_us(max(ts)) AS last_ts_us
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Incremental maintenance of a JOIN view (fact ⋈ dim) — the enrichment
    * MV every warehouse serves next to the aggregate MV (`ivmEventSummary`
    * covers the agg case; this is the join case). Deltas on BOTH sides
    * stay delta-scoped:
    *  - Δfact (late-arriving orders): only the arriving rows join the
    *    current dim and land as a new commit — cost |Δfact|, history
    *    untouched.
    *  - Δdim (customer corrections): only the AFFECTED KEYS' view rows are
    *    re-derived — the fact side is reduced with a broadcast left-semi
    *    join on the changed custkeys (at scale the fact table's
    *    custkey clustering turns this into a pruned point-lookup, cf.
    *    `zorderScan`) — and lands seq-stamped; readers merge latest-wins
    *    per o_orderkey with ONE max_by aggregation (the MOR discipline,
    *    no window sort). Cost = the changed keys' fan-out, never |fact|.
    * The final snapshot must equal the full recompute on the true tables:
    * the oracle is the plain join, so stale seeds surviving, a missed
    * affected key, or broken latest-wins all diverge.
    */
  def ivmJoinView(spark: SparkSession, dir: String): DataFrame = {
    val path = Tables.scratchPath("graft_ivmjoin", dir)
    val orders = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, dir).select(col("c_custkey"),
      col("c_name"), col("c_nationkey").cast("long").as("c_nationkey"))
    val lateFact = col("o_orderkey") % 10L === 0L
    val staleDim = col("c_custkey") % 7L === 0L
    // day-one dim state: the %7 customers carry a value the later
    // correction must overwrite — if any "(stale)" survives to the
    // snapshot, the dim-delta path failed and the oracle compare is red
    val dim0 = cust.withColumn("c_name",
      when(staleDim, lit("(stale)")).otherwise(col("c_name")))
    def joined(f: DataFrame, d: DataFrame): DataFrame =
      f.join(d, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
          col("c_nationkey"))
    // The three commits are independent transforms of the immutable input
    // tables, so they land in ONE partitioned write (`commit=` directory
    // layout identical to the previous three sequential writes) — one
    // write job instead of three, each with its own scan+commit round.
    // `seq` stays a DATA column exactly as before; latest-wins reads it.
    val deltaDim = cust.filter(staleDim)
    joined(orders.filter(!lateFact), dim0)
      .withColumn("seq", lit(0L)).withColumn("commit", lit(0))
      .unionByName(joined(orders.filter(lateFact), dim0)
        .withColumn("seq", lit(1L)).withColumn("commit", lit(1)))
      .unionByName(joined(orders.join(
          broadcast(deltaDim.select(col("c_custkey").as("o_custkey"))),
          Seq("o_custkey"), "leftsemi"), deltaDim)
        .withColumn("seq", lit(2L)).withColumn("commit", lit(2)))
      .write.mode("overwrite").partitionBy("commit").parquet(path)
    spark.read.parquet(path)
      .groupBy("o_orderkey")
      .agg(max_by(struct(col("o_custkey"), col("c_name"),
        col("c_nationkey")), col("seq")).as("r"))
      .select(col("o_orderkey"), col("r.o_custkey").as("o_custkey"),
        col("r.c_name").as("c_name"), col("r.c_nationkey").as("c_nationkey"))
      .orderBy("o_orderkey")
  }

  private val ivmJoinViewSql =
    """SELECT o_orderkey, o_custkey, c_name,
      |       CAST(c_nationkey AS BIGINT) AS c_nationkey
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  /** Time-partitioned warehouse layout: events land in `day_id=` parquet
    * partitions (the universal time-series layout), so a date-range query
    * prunes to exactly the covered days at PLANNING time — at 100 TB a
    * 3-day report touches 3 days of files, not 3 years. The one-shuffle
    * `repartition(day_id)` before the write keeps it one file per day per
    * writer instead of days × tasks small files (the small-files problem
    * Compaction otherwise mops up). Partition pruning is pinned in
    * PlanAuditSpec; the oracle is the plain filtered aggregate.
    */
  def rangeLayoutScan(spark: SparkSession, dir: String): DataFrame = {
    val path = Tables.scratchPath("graft_daylayout", dir)
    Tables.events(spark, dir)
      .withColumn("day_id", expr("unix_micros(ts) DIV 86400000000"))
      .repartition(col("day_id"))
      .write.mode("overwrite").partitionBy("day_id").parquet(path)
    rangeLayoutRead(spark, path)
  }

  /** The read side, separated so the plan audit can inspect the scan. */
  def rangeLayoutRead(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("day_id").between(19733L, 19735L)) // 2024-01-11..13
      .groupBy(col("day_id").cast("long").as("day_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("day_id", "event_type")

  private val rangeLayoutScanSql =
    """SELECT epoch_us(ts) // 86400000000 AS day_id, event_type,
      |       count(*) AS n_events
      |FROM events
      |WHERE epoch_us(ts) // 86400000000 BETWEEN 19733 AND 19735
      |GROUP BY 1, 2 ORDER BY day_id, event_type""".stripMargin

  /** Pivot (long → wide): the day × event-type count matrix every
    * analytics surface renders. The value list is passed EXPLICITLY so the
    * pivot stays one job — omitting it makes Spark run a distinct-values
    * job first and embed unbounded-width columns; at 100 TB the schema
    * must come from the catalog, not a scan. Unseen (day, type) cells are
    * 0, not null, so the matrix is dense and the compare exact.
    */
  def eventsPivotDaily(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("day_id")

  private val eventsPivotDailySql =
    """SELECT epoch_us(ts) // 86400000000 AS day_id,
      |       count(*) FILTER (WHERE event_type = 'click')    AS click,
      |       count(*) FILTER (WHERE event_type = 'error')    AS error,
      |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |       count(*) FILTER (WHERE event_type = 'signup')   AS signup,
      |       count(*) FILTER (WHERE event_type = 'view')     AS view
      |FROM events GROUP BY 1 ORDER BY day_id""".stripMargin

  /** Derived partition pruning end-to-end (the 4th opt-in rule): the
    * day-partitioned layout is queried with a predicate on the TIMESTAMP
    * column only — no `day_id` anywhere in the query — and
    * `PartitionPruneRule` infers the implied day bounds, which
    * FileSourceStrategy turns into directory pruning (PartitionPruneSpec
    * pins PartitionFilters on `day_id` in the physical scan). The DuckDB
    * oracle recomputes from raw events under the same ts predicate, so
    * an unsound inference (wrong floor, off-by-one day) loses or gains
    * rows and fails the compare.
    */
  def partitionPruneScan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.{GraftExtensions, PartitionPruneRule => P}
    val path = Tables.scratchPath("graft_ppr", dir)
    Tables.events(spark, dir)
      .withColumn("day_id", expr("unix_micros(ts) DIV 86400000000"))
      .repartition(col("day_id"))
      .write.mode("overwrite").partitionBy("day_id").parquet(path)
    GraftExtensions.register(spark)
    withConfsLocalized(spark, Seq(
      P.SourceKey -> path, P.TsColKey -> "ts", P.PartColKey -> "day_id",
      P.EnabledKey -> "true")) {
      spark.read.parquet(path)
        .filter(col("ts") >= lit("2024-01-11").cast("timestamp") &&
          col("ts") < lit("2024-01-14").cast("timestamp"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(expr("CAST(floor(value * 1000000) AS BIGINT)")).as("sum_value_e6"))
        .orderBy("event_type")
    }.orderBy("event_type")
  }

  private val partitionPruneScanSql =
    """SELECT event_type, count(*) AS n_events,
      |       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
      |         AS sum_value_e6
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-11' AND ts < TIMESTAMP '2024-01-14'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** UNPIVOT — the melt that completes the §2.5 reshaping pair: the dense
    * daily matrix goes back to long (day_id, event_type, n_events) rows
    * via Spark's native `unpivot` (stack under the hood, one narrow
    * projection — no shuffle beyond the pivot's own aggregation). Zeros
    * survive the round trip (the dense form is the point of the pivot),
    * and the oracle recomputes the dense long form from raw events with a
    * day×type spine, so a dropped combination or a lost zero fails the
    * compare.
    */
  def eventsUnpivotDaily(spark: SparkSession, dir: String): DataFrame = {
    val pivoted = eventsPivotDaily(spark, dir)
    // value columns come from the pivot's OUTPUT SCHEMA, not a hardcoded
    // type list: the oracle derives its spine from DISTINCT event_type, so
    // a dataset variant with an extra/missing type must track on both
    // sides (and fail loudly on a real divergence) rather than silently
    // zero-fill or drop
    val valueCols = pivoted.columns.filter(_ != "day_id").sorted.map(col)
    pivoted
      .unpivot(Array(col("day_id")), valueCols, "event_type", "n_events")
      .orderBy("day_id", "event_type")
  }

  private val eventsUnpivotDailySql =
    """WITH days AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day_id FROM events),
      |types AS (SELECT DISTINCT event_type FROM events),
      |c AS (SELECT epoch_us(ts) // 86400000000 AS day_id, event_type,
      |             count(*) AS n
      |      FROM events GROUP BY 1, 2)
      |SELECT d.day_id, t.event_type, CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
      |FROM days d CROSS JOIN types t
      |LEFT JOIN c ON c.day_id = d.day_id AND c.event_type = t.event_type
      |ORDER BY d.day_id, t.event_type""".stripMargin

  /** Grouped top-k via the native bounded-buffer aggregate
    * (`org.apache.spark.sql.graft.GroupTopK`): top-3 orders per priority
    * class by price. The window-rank idiom shuffles and sorts EVERY order
    * row; the aggregate ships at most k entries per (group, partition)
    * through a partial→final ObjectHashAggregate — the shape that holds
    * at 100 TB (shuffle volume O(groups·k·partitions), not O(rows)).
    * Total order (price_e2 DESC, okey ASC) makes ties deterministic, so
    * the oracle is the plain `row_number()` window SQL.
    */
  def groupedTopkNative(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.GroupTopK
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(GroupTopK.topK(
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)"),
        col("o_orderkey").cast("string"), 3).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rank"),
        col("col.score").as("price_e2"), col("col.payload").as("okey"))
      .orderBy("o_orderpriority", "rank")
  }

  private val groupedTopkNativeSql =
    """SELECT o_orderpriority, rank, price_e2, okey FROM (
      |  SELECT o_orderpriority,
      |         CAST(floor(o_totalprice * 100) AS BIGINT) AS price_e2,
      |         CAST(o_orderkey AS VARCHAR) AS okey,
      |         row_number() OVER (
      |           PARTITION BY o_orderpriority
      |           ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT) DESC,
      |                    CAST(o_orderkey AS VARCHAR) ASC) AS rank
      |  FROM orders) WHERE rank <= 3
      |ORDER BY o_orderpriority, rank""".stripMargin

  /** Error-safe scalar surface (ANSI-adjacent `try_*` semantics): a
    * malformed cast and a division by zero yield NULL instead of failing
    * the job — at 100 TB one poisoned row must never kill a stage. The
    * oracle mirrors try_divide with an explicit zero guard and try_cast
    * with DuckDB's TRY_CAST.
    */
  def tryFunctions(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("line"),
        round(expr("try_divide(l_quantity, l_linenumber % 3)"), 6).as("per_bucket"),
        expr("try_cast(l_returnflag AS INT)").as("flag_as_int"),
        expr("try_cast(CAST(l_linenumber AS STRING) AS INT)").cast("long").as("roundtrip"))
      .orderBy("l_orderkey", "line")

  private val tryFunctionsSql =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line,
      |       round(CASE WHEN l_linenumber % 3 = 0 THEN NULL
      |                  ELSE l_quantity / (l_linenumber % 3) END, 6) AS per_bucket,
      |       TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
      |       CAST(TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS BIGINT)
      |         AS roundtrip
      |FROM lineitem WHERE l_orderkey < 100
      |ORDER BY l_orderkey, line""".stripMargin

  /** Ordered string aggregation (LISTAGG semantics, §2.5): the
    * distinct-sorted-joined form is the only one that's deterministic
    * under distributed aggregation — collect order varies by partition
    * delivery, so the sort must be explicit before the join.
    */
  def orderedStringAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
        .as("statuses"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  private val orderedStringAggSql =
    """SELECT o_orderpriority,
      |       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
      |         AS statuses,
      |       count(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** FULL OUTER reconciliation (§2.4's last uncovered join type): per
    * customer, orders-side and lineitem-spend-side totals with NULL-safe
    * indicator buckets — the both/left-only/right-only audit every
    * migration runs. Buckets are counted so the output is small and the
    * compare exact.
    */
  def fullOuterReconcile(spark: SparkSession, dir: String): DataFrame = {
    // pre-1998 orders only, so customers active solely after the cutoff
    // appear on the right side alone — all three buckets are real
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("o_custkey").as("ck"))
      .agg(count(lit(1)).as("n_orders"))
    // high-value lineitems only, so the right side genuinely misses keys
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_extendedprice") > 50000)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("ck2"))
      .agg(count(lit(1)).as("n_big_items"))
    o.join(l, col("ck") === col("ck2"), "full_outer")
      .select(
        when(col("ck").isNotNull && col("ck2").isNotNull, "both")
          .when(col("ck").isNotNull, "orders_only")
          .otherwise("bigitems_only").as("bucket"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_big_items"), lit(0L)).as("n_big_items"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("n_orders")).as("sum_orders"),
        sum(col("n_big_items")).as("sum_big_items"))
      .orderBy("bucket")
  }

  private val fullOuterReconcileSql =
    """WITH o AS (SELECT o_custkey AS ck, count(*) AS n_orders
      |           FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
      |           GROUP BY o_custkey),
      |l AS (SELECT o.o_custkey AS ck2, count(*) AS n_big_items
      |      FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey
      |      WHERE li.l_extendedprice > 50000 GROUP BY o.o_custkey)
      |SELECT CASE WHEN ck IS NOT NULL AND ck2 IS NOT NULL THEN 'both'
      |            WHEN ck IS NOT NULL THEN 'orders_only'
      |            ELSE 'bigitems_only' END AS bucket,
      |       count(*) AS n_customers,
      |       CAST(sum(coalesce(n_orders, 0)) AS BIGINT) AS sum_orders,
      |       CAST(sum(coalesce(n_big_items, 0)) AS BIGINT) AS sum_big_items
      |FROM o FULL OUTER JOIN l ON ck = ck2
      |GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Window-function breadth in one oracled pass (§2.10): per-user event
    * sequence with lag gaps, lead lookahead, running ordinal, and
    * quartile bucket — every value integer or exact, ordering totalized
    * by (ts, event_id). Limited to 20 users to keep the compare small.
    */
  def windowBreadth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"),
        row_number().over(w).cast("long").as("seq"),
        coalesce(expr("unix_micros(ts)") -
          lag(expr("unix_micros(ts)"), 1).over(w), lit(-1L)).as("gap_us"),
        coalesce(lead(col("event_id"), 1).over(w), lit(-1L)).as("next_event"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy("user_id", "seq")
  }

  private val windowBreadthSql =
    """SELECT user_id, event_id,
      |       CAST(row_number() OVER w AS BIGINT) AS seq,
      |       coalesce(epoch_us(ts) - lag(epoch_us(ts), 1) OVER w, -1) AS gap_us,
      |       coalesce(lead(event_id, 1) OVER w, -1) AS next_event,
      |       CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM events WHERE user_id < 20
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, seq""".stripMargin

  /** Calendar-spine gap filling: the dense day × type matrix built by
    * joining daily counts onto a generated date spine — missing days
    * become explicit zeros (time-series resampling; every downstream
    * rate/anomaly computation needs the dense form — the RANGE-frame
    * anomaly window is the alternative for hour gaps). The spine comes
    * from sequence()+explode, not a scan.
    */
  def calendarSpineFill(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("day_id", expr("unix_micros(ts) DIV 86400000000"))
    val daily = e.filter(col("event_type") === "purchase")
      .groupBy("day_id").agg(count(lit(1)).as("n"))
    val spine = spark.range(1)
      .select(explode(expr("sequence(19723L, 19752L)")).as("day_id"))
    spine.join(daily, Seq("day_id"), "left")
      .select(col("day_id"), coalesce(col("n"), lit(0L)).as("n_purchases"))
      .orderBy("day_id")
  }

  private val calendarSpineFillSql =
    """WITH spine AS (SELECT unnest(generate_series(19723, 19752)) AS day_id),
      |daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day_id, count(*) AS n
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
      |SELECT s.day_id, coalesce(d.n, 0) AS n_purchases
      |FROM spine s LEFT JOIN daily d USING (day_id)
      |ORDER BY day_id""".stripMargin

  /** Gap-filled LOCF series (last observation carried forward) — the
    * sensor/price panel every time-series surface serves: a dense
    * per-(user, day) spine (cross join against the calendar — users × 30
    * rows, never corpus-sized), the day's observation left-joined on, and
    * gaps filled by `last(_, ignoreNulls)` over an unbounded-preceding
    * running frame — ONE window pass per user, no iterative fill. Value
    * stays in integer micro-units; days before a user's first observation
    * stay NULL → coalesced to -1 (non-null sentinel keeps the driver
    * compare engine-neutral). The daily observation is the day's MAX
    * (deterministic under intra-day ties).
    */
  def locfDailyValues(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val users = spark.range(0, 10).toDF("user_id")
    val spine = users.crossJoin(
      spark.range(1).select(explode(expr("sequence(19723L, 19752L)")).as("day_id")))
    val daily = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase" && col("user_id") < 10L)
      .withColumn("day_id", expr("unix_micros(ts) DIV 86400000000"))
      .groupBy("user_id", "day_id")
      .agg(max(expr("CAST(floor(value * 1000000) AS BIGINT)")).as("obs_e6"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day_id"), "left")
      .withColumn("filled_e6",
        coalesce(last(col("obs_e6"), ignoreNulls = true).over(w), lit(-1L)))
      .select(col("user_id"), col("day_id"), col("filled_e6"))
      .orderBy("user_id", "day_id")
  }

  private val locfDailyValuesSql =
    """WITH spine AS (
      |  SELECT u.user_id, d.day_id
      |  FROM (SELECT unnest(range(10)) AS user_id) u
      |  CROSS JOIN (SELECT unnest(generate_series(19723, 19752)) AS day_id) d),
      |daily AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day_id,
      |         max(CAST(floor(value * 1000000) AS BIGINT)) AS obs_e6
      |  FROM events
      |  WHERE event_type = 'purchase' AND user_id < 10
      |  GROUP BY 1, 2)
      |SELECT s.user_id, s.day_id,
      |       coalesce(last_value(d.obs_e6 IGNORE NULLS) OVER (
      |         PARTITION BY s.user_id ORDER BY s.day_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1)
      |         AS filled_e6
      |FROM spine s LEFT JOIN daily d USING (user_id, day_id)
      |ORDER BY user_id, day_id""".stripMargin

  /** GROUP BY CUBE over (returnflag, linestatus): all four grouping-set
    * combinations in ONE pass (Spark expands the sets below a single
    * shuffle — no 4× rescan), NULL marking the rolled-up dimensions.
    * Completes the §2.5 grouping-set surface next to revenue_rollup.
    */
  def revenueCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")).as("revenue_e2"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val revenueCubeSql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n_items,
      |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |         AS revenue_e2
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** INTERSECT / EXCEPT set semantics (§2.7): users active in BOTH halves
    * of the month vs. first-half-only churners, one row each — set-op
    * deduplication semantics (not UNION ALL arithmetic) is the point.
    */
  def userSetOps(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("day_id", expr("unix_micros(ts) DIV 86400000000"))
    val first = e.filter(col("day_id") < 19738L).select(col("user_id")).distinct()
    val second = e.filter(col("day_id") >= 19738L).select(col("user_id")).distinct()
    val both = first.intersect(second).agg(count(lit(1)).as("n"))
      .select(lit("retained").as("cohort"), col("n"))
    val churned = first.except(second).agg(count(lit(1)).as("n"))
      .select(lit("churned").as("cohort"), col("n"))
    both.unionByName(churned).orderBy("cohort")
  }

  private val userSetOpsSql =
    """WITH f AS (SELECT DISTINCT user_id FROM events
      |           WHERE epoch_us(ts) // 86400000000 < 19738),
      |s AS (SELECT DISTINCT user_id FROM events
      |      WHERE epoch_us(ts) // 86400000000 >= 19738)
      |SELECT 'churned' AS cohort, count(*) AS n
      |FROM (SELECT user_id FROM f EXCEPT SELECT user_id FROM s)
      |UNION ALL
      |SELECT 'retained', count(*)
      |FROM (SELECT user_id FROM f INTERSECT SELECT user_id FROM s)
      |ORDER BY cohort""".stripMargin

  /** TPC-H Q5-shaped local-supplier volume, executed through the PURE SQL
    * surface: temp views + `spark.sql(...)` text — proving the library's
    * query capability is reachable without any DataFrame code (the
    * SparkSessionExtensions story's batch-SQL half). Catalyst plans the
    * text identically to the builder API: dims broadcast, one fact-fact
    * shuffle.
    */
  def q5LocalSupplierSql(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(t))
    spark.sql(
      """SELECT n.n_name AS nation,
        |       sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
        |         AS revenue_e2
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |              AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name IN ('ASIA', 'EUROPE')
        |GROUP BY n.n_name
        |ORDER BY revenue_e2 DESC, nation""".stripMargin)
  }

  private val q5LocalSupplierSqlOracle =
    """SELECT n.n_name AS nation,
      |       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
      |                     AS BIGINT)) AS BIGINT)
      |         AS revenue_e2
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |              AND c.c_nationkey = s.s_nationkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name IN ('ASIA', 'EUROPE')
      |GROUP BY n.n_name
      |ORDER BY revenue_e2 DESC, nation""".stripMargin

  /** Arm session confs, materialize the (group-cardinality-bounded)
    * result WHILE armed, restore the confs, hand back a local frame — so
    * an optimizer-rule registration can never leak past its driver query
    * into the rest of the Verify/Bench session.
    */
  private[ops] def withConfsLocalized(spark: SparkSession,
      confs: Seq[(String, String)])(build: => DataFrame): DataFrame = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = build
      val rows = df.collect().toIndexedSeq
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), df.schema)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** PK-FK join elimination end-to-end: the query JOINS orders to
    * customer but reads no customer column, the registered constraint
    * (verified by dq_constraints: FK-complete, PK-unique, FK-non-null)
    * lets `FkJoinEliminationRule` drop the join, and the DuckDB oracle
    * COMPUTES THE JOIN — so the optimized plan must produce exactly what
    * the unoptimized semantics promise. Conf is restored before
    * returning (the mvRewriteCounts discipline); FkElimSpec pins that
    * the armed plan really has no join operator.
    */
  def fkJoinElimination(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.{FkJoinEliminationRule => R, GraftExtensions}
    GraftExtensions.register(spark)
    withConfsLocalized(spark, Seq(
      R.FactSourceKey -> s"$dir/orders.parquet", R.FkColKey -> "o_custkey",
      R.DimSourceKey -> s"$dir/customer.parquet", R.PkColKey -> "c_custkey",
      R.EnabledKey -> "true")) {
      spark.read.parquet(s"$dir/orders.parquet")
        .join(spark.read.parquet(s"$dir/customer.parquet"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("revenue_e2"))
        .orderBy("o_orderpriority")
    }.orderBy("o_orderpriority")
  }

  private val fkJoinEliminationSql =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |         AS revenue_e2
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Sketch table + range union: per-day HLL sketches of distinct users
    * persisted as a BINARY column (Apache DataSketches via Spark's
    * hll_sketch_agg), then any date range answered by UNIONING the
    * stored sketches — the only way "distinct users last N days" stays
    * sublinear at 100 TB, because distinct counts are not additive but
    * sketches are mergeable. The estimate is gated against the exact
    * in-engine count (approx_distinct_docs' oracle-pinned-bound
    * pattern); the parquet round-trip proves sketches are storable.
    */
  def sketchUnionDistinct(spark: SparkSession, dir: String): DataFrame = {
    val path = Tables.scratchPath("graft_hllsk", dir)
    val e = Tables.events(spark, dir)
      .withColumn("day_id", expr("unix_micros(ts) DIV 86400000000"))
    e.groupBy("day_id")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .write.mode("overwrite").parquet(path)
    val est = spark.read.parquet(path)
      .filter(col("day_id").between(19733L, 19741L)) // 9-day window
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx"))
    val exact = e.filter(col("day_id").between(19733L, 19741L))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    exact.crossJoin(est)
      .select(col("exact_distinct"),
        (abs(col("approx") - col("exact_distinct")) <=
          col("exact_distinct") * 0.05).as("approx_within_5pct"))
  }

  private val sketchUnionDistinctSql =
    """SELECT count(DISTINCT user_id) AS exact_distinct,
      |       true AS approx_within_5pct
      |FROM events
      |WHERE epoch_us(ts) // 86400000000 BETWEEN 19733 AND 19741""".stripMargin

  /** Materialized-view routing end-to-end: build the per-event-type count
    * summary (one aggregation job), register it with the optimizer
    * (`MvRewriteRule`, opt-in conf), then run the ORIGINAL grouped-count
    * query over the raw events scan. The optimizer must answer it from
    * the summary — MvRewriteSpec pins that the executed scan reads the MV
    * parquet and never touches events.parquet — while the DuckDB oracle
    * recomputes from raw events, so the routed answer must be exact.
    * The conf registration is session-level by design (it IS the MV
    * catalog entry); the rule's strict shape match (bare scan of exactly
    * this source, single event_type group, plain counts) keeps every
    * other query untouched.
    */
  def mvRewriteCounts(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.{GraftExtensions, MvRewriteRule}
    val src = s"$dir/events.parquet"
    val mvPath = Tables.scratchPath("graft_mv", dir)
    spark.read.parquet(src).groupBy("event_type")
      .agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(mvPath)
    GraftExtensions.register(spark)
    // materialized WHILE the registration is armed (5 rows — group-
    // cardinality bounded); the conf restore means no later query can be
    // silently routed to a by-then-stale MV
    withConfsLocalized(spark, Seq(
      MvRewriteRule.SourceKey -> src, MvRewriteRule.PathKey -> mvPath,
      MvRewriteRule.EnabledKey -> "true")) {
      spark.read.parquet(src)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy("event_type")
    }.orderBy("event_type")
  }

  private val mvRewriteCountsSql =
    """SELECT event_type, count(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** MV routing for SUMS of integer units (the second registered MV
    * shape): a derived fact table (event_type, value_e6 BIGINT) is
    * summarized per type as (cnt, sum_value_e6); with the summary
    * registered, the ORIGINAL count+sum query over the fact scan is
    * answered from the MV — integer partial sums merge exactly, which is
    * why the rule refuses float sums. MvRewriteSpec pins that the routed
    * plan reads the MV parquet and never the fact table; the DuckDB
    * oracle recomputes from raw events, so the routed answer must be
    * exact end to end.
    */
  def mvRewriteSums(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.{GraftExtensions, MvRewriteRule}
    val srcPath = Tables.scratchPath("graft_mv_units_src", dir)
    Tables.events(spark, dir)
      .select(col("event_type"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("value_e6"))
      .write.mode("overwrite").parquet(srcPath)
    val mvPath = Tables.scratchPath("graft_mv_sums", dir)
    spark.read.parquet(srcPath).groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("value_e6")).as("sum_value_e6"))
      .write.mode("overwrite").parquet(mvPath)
    GraftExtensions.register(spark)
    withConfsLocalized(spark, Seq(
      MvRewriteRule.SourceKey -> srcPath, MvRewriteRule.PathKey -> mvPath,
      MvRewriteRule.SumColKey -> "value_e6",
      MvRewriteRule.EnabledKey -> "true")) {
      spark.read.parquet(srcPath)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("value_e6")).as("total_e6"))
        .orderBy("event_type")
    }.orderBy("event_type")
  }

  private val mvRewriteSumsSql =
    """SELECT event_type, count(*) AS n_events,
      |       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
      |         AS total_e6
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** MV routing for grouped MIN/MAX (the third registered shape): the
    * derived fact table (event_type, value_e6, ts_us — all BIGINT, the
    * cross-engine unit discipline) is summarized per type with min/max
    * partials for BOTH columns; with `minmaxCols` registered, the
    * ORIGINAL count+min+max query over the fact scan is answered from
    * the summary. Extrema of stored extrema are exact for any ordered
    * type — the reason the IVM summary could always store first/last ts
    * partials; this closes the loop by SERVING reads from them.
    * MvRewriteSpec pins the routed scan + declines; the DuckDB oracle
    * recomputes from raw events.
    */
  def mvRewriteMinmax(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.{GraftExtensions, MvRewriteRule}
    val srcPath = Tables.scratchPath("graft_mv_mm_src", dir)
    Tables.events(spark, dir)
      .select(col("event_type"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("value_e6"),
        expr("unix_micros(ts)").as("ts_us"))
      .write.mode("overwrite").parquet(srcPath)
    val mvPath = Tables.scratchPath("graft_mv_minmax", dir)
    spark.read.parquet(srcPath).groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        min(col("value_e6")).as("min_value_e6"),
        max(col("value_e6")).as("max_value_e6"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us"))
      .write.mode("overwrite").parquet(mvPath)
    GraftExtensions.register(spark)
    withConfsLocalized(spark, Seq(
      MvRewriteRule.SourceKey -> srcPath, MvRewriteRule.PathKey -> mvPath,
      MvRewriteRule.MinMaxColsKey -> "value_e6,ts_us",
      MvRewriteRule.EnabledKey -> "true")) {
      spark.read.parquet(srcPath)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          min(col("value_e6")).as("lo_e6"), max(col("value_e6")).as("hi_e6"),
          min(col("ts_us")).as("first_ts_us"), max(col("ts_us")).as("last_ts_us"))
        .orderBy("event_type")
    }.orderBy("event_type")
  }

  private val mvRewriteMinmaxSql =
    """SELECT event_type, count(*) AS n_events,
      |       CAST(min(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS lo_e6,
      |       CAST(max(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS hi_e6,
      |       epoch_us(min(ts)) AS first_ts_us, epoch_us(max(ts)) AS last_ts_us
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "full_outer_reconcile" -> fullOuterReconcile,
    "ordered_string_agg" -> orderedStringAgg,
    "try_functions" -> tryFunctions,
    "window_breadth" -> windowBreadth,
    "calendar_spine_fill" -> calendarSpineFill,
    "locf_daily_values" -> locfDailyValues,
    "revenue_cube" -> revenueCube,
    "user_set_ops" -> userSetOps,
    "q5_local_supplier_sql" -> q5LocalSupplierSql,
    "sketch_union_distinct" -> sketchUnionDistinct,
    "fk_join_elimination" -> fkJoinElimination,
    "mv_rewrite_counts" -> mvRewriteCounts,
    "mv_rewrite_sums" -> mvRewriteSums,
    "mv_rewrite_minmax" -> mvRewriteMinmax,
    "grouped_topk_native" -> groupedTopkNative,
    "events_pivot_daily" -> eventsPivotDaily,
    "events_unpivot_daily" -> eventsUnpivotDaily,
    "partition_prune_scan" -> partitionPruneScan,
    "ivm_event_summary" -> ivmEventSummary,
    "ivm_join_view" -> ivmJoinView,
    "range_layout_scan" -> rangeLayoutScan,
    "salted_distinct_users" -> saltedDistinctUsers,
    "salted_source_join" -> saltedSourceJoin,
    "cms_overcount_gate" -> cmsOvercountGate,
    "bloom_membership_gate" -> bloomMembershipGate,
    "approx_quantile_gate" -> approxQuantileGate,
    "approx_distinct_docs" -> approxDistinctDocs,
    "distinct_sources" -> distinctSources,
    "q1_pricing_summary" -> q1PricingSummary,
    "q2_revenue_by_region" -> q2RevenueByRegion,
    "q3_top_orders" -> q3TopOrders,
    "q4_priority_counts" -> q4PriorityCounts,
    "customers_no_orders" -> customersNoOrders,
    "nation_account_stats" -> nationAccountStats,
    "revenue_rollup" -> revenueRollup,
    "top_supplier_per_nation" -> topSupplierPerNation)

  def oracles: Map[String, String] = Map(
    "full_outer_reconcile" -> fullOuterReconcileSql,
    "ordered_string_agg" -> orderedStringAggSql,
    "try_functions" -> tryFunctionsSql,
    "window_breadth" -> windowBreadthSql,
    "calendar_spine_fill" -> calendarSpineFillSql,
    "locf_daily_values" -> locfDailyValuesSql,
    "revenue_cube" -> revenueCubeSql,
    "user_set_ops" -> userSetOpsSql,
    "q5_local_supplier_sql" -> q5LocalSupplierSqlOracle,
    "sketch_union_distinct" -> sketchUnionDistinctSql,
    "fk_join_elimination" -> fkJoinEliminationSql,
    "mv_rewrite_counts" -> mvRewriteCountsSql,
    "mv_rewrite_sums" -> mvRewriteSumsSql,
    "mv_rewrite_minmax" -> mvRewriteMinmaxSql,
    "grouped_topk_native" -> groupedTopkNativeSql,
    "events_pivot_daily" -> eventsPivotDailySql,
    "events_unpivot_daily" -> eventsUnpivotDailySql,
    "partition_prune_scan" -> partitionPruneScanSql,
    "ivm_event_summary" -> ivmEventSummarySql,
    "ivm_join_view" -> ivmJoinViewSql,
    "range_layout_scan" -> rangeLayoutScanSql,
    "salted_distinct_users" -> saltedDistinctUsersSql,
    "salted_source_join" -> saltedSourceJoinSql,
    "cms_overcount_gate" -> emptyViolationsSql,
    "bloom_membership_gate" -> emptyViolationsSql,
    "approx_quantile_gate" -> emptyViolationsSql,
    "approx_distinct_docs" -> approxDistinctDocsSql,
    "distinct_sources" -> distinctSourcesSql,
    "q1_pricing_summary" -> q1PricingSummarySql,
    "q2_revenue_by_region" -> q2RevenueByRegionSql,
    "q3_top_orders" -> q3TopOrdersSql,
    "q4_priority_counts" -> q4PriorityCountsSql,
    "customers_no_orders" -> customersNoOrdersSql,
    "nation_account_stats" -> nationAccountStatsSql,
    "revenue_rollup" -> revenueRollupSql,
    "top_supplier_per_nation" -> topSupplierPerNationSql)
}
