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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary)

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1PricingSummarySql)
}
