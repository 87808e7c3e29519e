package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Catalog statistics + cost-based optimization (SURVEY.md §4's "let
  * Catalyst optimize" made concrete with REAL stats).
  *
  * Spark's default join planning is file-size-driven: a table is broadcast
  * iff its on-disk bytes fall under the threshold, and a FILTERED relation
  * keeps a crude estimate, so selective dimension filters don't unlock
  * broadcasts and multi-join orders are taken as written. The fix is the
  * warehouse-standard one, not a custom rule: register the corpus as
  * EXTERNAL catalog tables (metadata only — no data copy; at 100 TB the
  * catalog points at the lake), run `ANALYZE TABLE … COMPUTE STATISTICS
  * FOR ALL COLUMNS` (a one-pass distributed agg producing count / NDV /
  * min-max / null-count per column), and turn on `spark.sql.cbo.enabled`
  * + join reorder so Catalyst's own cost model consumes them. Column
  * stats make filter selectivity real (NDV-based), which cascades into
  * join-size estimates, broadcast decisions, and star-schema join order.
  *
  * ANALYZE cost at scale: one scan per refresh, amortized across every
  * query planned against the table — the same economics as building a
  * zone map. Stats staleness is bounded by the refresh cadence, and a
  * stale rowCount degrades to the pre-CBO plan, never to a wrong answer
  * (cost models affect plan CHOICE only).
  */
object CatalogStats extends QueryModule {

  /** Catalog-safe table name for (table, sfDir) — hex suffix isolates
    * scale factors sharing one warehouse, as scratchPath does for /tmp.
    */
  def tableName(table: String, dir: String): String =
    s"graft_cbo_${table}_" + Integer.toHexString(dir.hashCode)

  /** Register `tables` as external parquet catalog tables over the sfDir
    * files (idempotent; DROP of an external table never touches data) and
    * collect full column statistics.
    *
    * Stats are REUSED within a session: the table name is dir-keyed, the
    * sf data is immutable per version, and ANALYZE output is a pure
    * function of the files — re-ANALYZE per query is exactly the cost
    * this module's own doc amortizes away ("one scan per refresh,
    * amortized across every query planned against the table"; in
    * production the stats live in the metastore). The three CBO rows
    * previously each re-dropped, re-created and re-scanned ALL COLUMNS of
    * their tables per serve — pure duplicated ANALYZE scans, never a plan
    * or answer change (stats over identical files are identical).
    */
  def registerAndAnalyze(spark: SparkSession, dir: String,
      tables: Seq[String]): Unit =
    tables.foreach { t =>
      val name = tableName(t, dir)
      if (!spark.catalog.tableExists(name)) {
        // CREATE+ANALYZE as a unit: if ANALYZE throws (interrupt, FS
        // hiccup), the table must not survive — a later call would see
        // tableExists and silently plan CBO rows without column stats
        spark.sql(
          s"CREATE TABLE $name USING parquet LOCATION '$dir/$t.parquet'")
        try spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR ALL COLUMNS")
        catch { case e: Throwable =>
          try spark.sql(s"DROP TABLE IF EXISTS $name") catch { case _: Throwable => () }
          throw e
        }
      }
    }

  /** Run `body` with the cost-based optimizer (and stats-based join
    * reorder) enabled, forcing physical planning INSIDE the window so the
    * returned DataFrame keeps its CBO-chosen plan after the confs are
    * restored (queryExecution pins lazily-computed plans).
    */
  def withCbo[A <: DataFrame](spark: SparkSession)(body: => A): A = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "true"))
    try {
      val df = body
      df.queryExecution.executedPlan // pin the CBO plan before restoring
      df
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Star join planned by the cost-based optimizer over ANALYZEd catalog
    * tables: fact (orders) against two dims (customer, nation) with a
    * selective dim predicate. With column stats the optimizer KNOWS the
    * nation filter keeps 2-of-25 rows and that customer joins 1:1, so both
    * dim sides broadcast and the fact table is never shuffled — the plan
    * shape is pinned in CatalogStatsSpec; this row pins the ANSWER (plain
    * SQL oracle), because a cost model may only change plans, never
    * results.
    */
  def cboStarJoin(spark: SparkSession, dir: String): DataFrame = {
    registerAndAnalyze(spark, dir, Seq("orders", "customer", "nation"))
    val (o, c, n) = (tableName("orders", dir), tableName("customer", dir),
      tableName("nation", dir))
    withCbo(spark) {
      spark.sql(
        s"""SELECT n.n_name, count(*) AS n_orders
           |FROM $o o JOIN $c c ON o.o_custkey = c.c_custkey
           |JOIN $n n ON c.c_nationkey = n.n_nationkey
           |WHERE n.n_name IN ('NATION_3', 'NATION_7')
           |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)
    }
  }

  private val cboStarJoinSql =
    """SELECT n.n_name, count(*) AS n_orders
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE n.n_name IN ('NATION_3', 'NATION_7')
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin

  /** The eager-aggregation rewrite end-to-end (EagerAggregationRule): the
    * star aggregate's partial is pushed below the customer join, with the
    * dim key's uniqueness proven from the ANALYZE stats this module
    * collected — the fact table reaches the join as one row per
    * (group, custkey) instead of one per order. Money stays in integer
    * e2 units (the cross-engine float discipline). The oracle is the
    * plain join-then-aggregate SQL: a rewrite may only change the plan,
    * never the answer; EagerAggregationSpec pins the plan shape and the
    * decline cases.
    */
  def eagerAggPushdown(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.{EagerAggregationRule, GraftExtensions}
    registerAndAnalyze(spark, dir, Seq("orders", "customer"))
    GraftExtensions.register(spark)
    val (o, c) = (tableName("orders", dir), tableName("customer", dir))
    spark.conf.set(EagerAggregationRule.EnabledKey, "true")
    try withCbo(spark) {
      spark.sql(
        s"""SELECT c.c_nationkey, count(*) AS n_orders,
           |       sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS price_e2,
           |       max(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS max_e2
           |FROM $o o JOIN $c c ON o.o_custkey = c.c_custkey
           |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin)
    } finally spark.conf.unset(EagerAggregationRule.EnabledKey)
  }

  private val eagerAggPushdownSql =
    """SELECT c.c_nationkey, count(*) AS n_orders,
      |       CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_e2,
      |       CAST(max(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_e2
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin

  /** AVG through the eager rewrite — Yan & Larson's sum+count
    * decomposition end-to-end: the partial layer carries the (sum, count)
    * pair per (group, custkey) in exact integers, the top merge divides
    * once. Integer e2 units keep the quotient bit-identical across
    * engines (exact long sum / exact count, one double division); the
    * oracle is the plain join-then-aggregate SQL, because a rewrite may
    * only change the plan, never the answer. EagerAggregationSpec pins
    * the plan shape and the float-input decline.
    */
  def eagerAggAvg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.{EagerAggregationRule, GraftExtensions}
    registerAndAnalyze(spark, dir, Seq("orders", "customer"))
    GraftExtensions.register(spark)
    val (o, c) = (tableName("orders", dir), tableName("customer", dir))
    spark.conf.set(EagerAggregationRule.EnabledKey, "true")
    try withCbo(spark) {
      spark.sql(
        s"""SELECT c.c_nationkey, count(*) AS n_orders,
           |       avg(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS avg_price_e2
           |FROM $o o JOIN $c c ON o.o_custkey = c.c_custkey
           |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin)
    } finally spark.conf.unset(EagerAggregationRule.EnabledKey)
  }

  private val eagerAggAvgSql =
    """SELECT c.c_nationkey, count(*) AS n_orders,
      |       avg(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS avg_price_e2
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cbo_star_join" -> cboStarJoin,
    "eager_agg_pushdown" -> eagerAggPushdown,
    "eager_agg_avg" -> eagerAggAvg)

  def oracles: Map[String, String] = Map(
    "cbo_star_join" -> cboStarJoinSql,
    "eager_agg_pushdown" -> eagerAggPushdownSql,
    "eager_agg_avg" -> eagerAggAvgSql)
}
