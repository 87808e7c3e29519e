package graft

import org.apache.spark.sql.Row

class RelationalSpec extends SparkSpec {

  test("q1_pricing_summary returns grouped rows with expected schema") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    assert(df.columns.toSeq === Seq(
      "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
      "sum_disc_price", "avg_qty", "avg_disc", "count_order"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // counts reconcile with the unaggregated filter
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sf)
      .filter("l_shipdate <= timestamp'1998-09-02'").count()
    assert(total === expected)
  }

  test("every oracleSql key exists in queries and vice-versa names align") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys missing from queries: ${o -- q}")
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("dimension joins plan as broadcast hash joins (no fact-side shuffle)") {
    val plan = SparkEntry.queries("q2_revenue_by_region")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "dim joins must not sort-merge the fact table")
  }

  test("q3 top-10 plans TakeOrderedAndProject, not a global sort") {
    val plan = SparkEntry.queries("q3_top_orders")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("anti/semi join results reconcile") {
    val cust = Tables.customer(spark, sf)
    val ords = Tables.orders(spark, sf)
    val nCust = cust.count()
    val without = SparkEntry.queries("customers_no_orders")(spark, sf).count()
    val withOrders = cust
      .join(ords, cust("c_custkey") === ords("o_custkey"), "left_semi").count()
    assert(without + withOrders === nCust)
  }

  test("rollup row count = detail + per-flag subtotals + grand total") {
    val rows = SparkEntry.queries("revenue_rollup")(spark, sf).collect()
    val detail = rows.count(r => !r.isNullAt(0) && !r.isNullAt(1))
    val subtotal = rows.count(r => !r.isNullAt(0) && r.isNullAt(1))
    val grand = rows.count(r => r.isNullAt(0))
    assert(grand === 1)
    assert(rows.length === detail + subtotal + grand)
    // grand total equals the sum of detail revenues
    val g = rows.filter(_.isNullAt(0)).head.getAs[Double]("revenue")
    val d = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(_.getAs[Double]("revenue")).sum
    assert(math.abs(g - d) < 1.0)
  }

  test("sketch gates: no violations, and the sketches are actually useful") {
    import org.apache.spark.sql.functions.col
    assert(SparkEntry.queries("cms_overcount_gate")(spark, sf).count() === 0)
    assert(SparkEntry.queries("bloom_membership_gate")(spark, sf).count() === 0)
    // utility direction: the bloom filter built on stored ids rejects the
    // vast majority of absent ids (fpp 1%), which is what lets an
    // incremental ingest skip exact index lookups
    val stored = Tables.documents(spark, sf)
      .filter(col("doc_id") < 250).select(col("doc_id"))
    val bloom = stored.stat.bloomFilter(col("doc_id"), 1000L, 0.01)
    val absentHits = (1000000L until 1000200L).count(bloom.mightContainLong)
    assert(absentHits <= 20, s"bloom passed $absentHits of 200 absent ids (fpp 1%)")
  }

  test("locf: dense spine, values persist across gaps, nothing precedes first obs") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("locf_daily_values")(spark, sf).collect()
    assert(rows.length === 10 * 30, "spine must be dense: 10 users × 30 days")
    rows.groupBy(_.getLong(0)).foreach { case (u, days) =>
      val series = days.sortBy(_.getLong(1)).map(_.getLong(2))
      // once a real value appears, no later day may fall back to the sentinel
      val firstObs = series.indexWhere(_ != -1L)
      if (firstObs >= 0)
        assert(series.drop(firstObs).forall(_ != -1L),
          s"user $u: a filled value regressed to the sentinel")
    }
  }

  test("ivm_event_summary: delta merge equals single-pass recompute") {
    import org.apache.spark.sql.functions._
    val merged = SparkEntry.queries("ivm_event_summary")(spark, sf)
      .collect().map(_.toSeq).toSet
    val direct = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(floor(value * 1000000) AS BIGINT)")).as("sum_value_e6"),
        min(expr("unix_micros(ts)")).as("first_ts_us"),
        max(expr("unix_micros(ts)")).as("last_ts_us"))
      .collect().map(_.toSeq).toSet
    assert(merged === direct, "merging stored partials with the delta must " +
      "be indistinguishable from recomputing over all history")
  }

  test("ivm_join_view: incremental commits converge to the full recompute") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("ivm_join_view")(spark, sf)
      .collect().map(_.toSeq).toSet
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sf).select(col("c_custkey"),
      col("c_name"), col("c_nationkey").cast("long").as("c_nationkey"))
    val direct = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "c_name", "c_nationkey")
      .collect().map(_.toSeq).toSet
    assert(got === direct,
      "three incremental commits must equal the one-shot join")
    assert(!got.exists(_.toString.contains("(stale)")),
      "a seeded stale dim value survived the dim-delta commit")
  }

  test("ivm_join_view dim-delta commit is scoped to the affected keys' fan-out") {
    import org.apache.spark.sql.functions._
    SparkEntry.queries("ivm_join_view")(spark, sf).collect()
    val path = Tables.scratchPath("graft_ivmjoin", sf)
    val commit2 = spark.read.parquet(path + "/commit=2").count()
    val affected = Tables.orders(spark, sf)
      .filter(col("o_custkey") % 7L === 0L).count()
    assert(commit2 === affected,
      s"dim-delta rewrote $commit2 rows; the affected-key fan-out is $affected")
  }

  test("events_unpivot_daily: melt round-trips the pivot, totals preserved") {
    import org.apache.spark.sql.functions._
    val long = SparkEntry.queries("events_unpivot_daily")(spark, sf)
    assert(long.columns.toSeq === Seq("day_id", "event_type", "n_events"))
    // dense: every (day, type) combination once, zeros included
    val wide = SparkEntry.queries("events_pivot_daily")(spark, sf)
    assert(long.count() === wide.count() * 5)
    assert(long.agg(sum("n_events")).head().getLong(0) ===
      Tables.events(spark, sf).count())
  }

  test("events_pivot_daily: dense matrix, row sums partition the event count") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("events_pivot_daily")(spark, sf)
    val cols = out.columns.toSeq
    assert(cols === Seq("day_id", "click", "error", "purchase", "signup", "view"))
    val total = out.select(
      sum(expr("click + error + purchase + signup + view"))).head().getLong(0)
    assert(total === Tables.events(spark, sf).count(),
      "pivot cells must partition all events")
    assert(out.collect().forall(r => (1 to 5).forall(!r.isNullAt(_))),
      "unseen cells must be 0, never null")
  }

  test("approx_quantile_gate: empty, and the exact band is genuinely narrow") {
    import org.apache.spark.sql.functions.col
    assert(SparkEntry.queries("approx_quantile_gate")(spark, sf).count() === 0)
    // the gate only means something if the band it checks is tight:
    // per-lang [45th, 55th] discrete percentiles must sit strictly inside
    // the per-lang [min, max]
    val docs = Tables.documents(spark, sf).select("lang", "n_chars")
    val mm = docs.groupBy("lang").agg(
      org.apache.spark.sql.functions.min("n_chars").as("mn"),
      org.apache.spark.sql.functions.max("n_chars").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val med = docs.groupBy("lang")
      .agg(org.apache.spark.sql.functions
        .percentile_approx(col("n_chars"), org.apache.spark.sql.functions.lit(0.5),
          org.apache.spark.sql.functions.lit(10000)).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    med.foreach { case (lang, m) =>
      val (mn, mx) = mm(lang)
      assert(m > mn && m < mx, s"$lang median $m degenerate vs [$mn,$mx]")
    }
  }

  test("revenue_cube: all four grouping sets present, margins sum to the total") {
    val rows = SparkEntry.queries("revenue_cube")(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    val detail = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(detail.map(_.getLong(2)).sum === grand.head.getLong(2))
    val flagMargins = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(flagMargins.map(_.getLong(2)).sum === grand.head.getLong(2))
  }

  test("user_set_ops: retained and churned partition the first-half users") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("user_set_ops")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val firstHalf = Tables.events(spark, sf)
      .filter(expr("unix_micros(ts) DIV 86400000000") < 19738L)
      .select("user_id").distinct().count()
    assert(out("retained") + out("churned") === firstHalf)
  }

  test("q5 via the pure SQL surface plans broadcast dims") {
    val plan = SparkEntry.queries("q5_local_supplier_sql")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast in:\n$plan")
  }

  test("full outer reconcile surfaces all three buckets on sf0.001+") {
    val buckets = SparkEntry.queries("full_outer_reconcile")(spark, sf)
      .collect().map(_.getString(0)).toSet
    assert(buckets.contains("both"))
    assert(buckets.subsetOf(Set("both", "orders_only", "bigitems_only")))
  }

  test("calendar spine: exactly 30 dense days, gaps filled with zero") {
    val rows = SparkEntry.queries("calendar_spine_fill")(spark, sf).collect()
    assert(rows.length === 30)
    assert(rows.map(_.getLong(0)).toSeq === (19723L to 19752L))
    assert(rows.forall(_.getLong(1) >= 0L))
  }

  test("sketch_union_distinct: unioned per-day sketches land within the bound") {
    val row = SparkEntry.queries("sketch_union_distinct")(spark, sf).head()
    assert(row.getLong(0) > 0)
    assert(row.getBoolean(1), "HLL union estimate fell outside 5% of exact")
  }
}
