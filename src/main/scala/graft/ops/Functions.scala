package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Scalar-function breadth (SURVEY.md §2.8): one oracle-checked projection
  * exercising the date / string / regexp / formatting surface end to end on
  * the orders and customer tables — every function stays inside
  * whole-stage codegen.
  */
object Functions extends QueryModule {

  /** F8 dates, F13/F14 string ops, F12 formatting, F11 casts, regexp
    * extraction — the reference's scalar surface on relational data.
    */
  def scalarFunctions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderkey" < 2000)
      .select(
        $"o_orderkey",
        // long date/length parts: Spark's year()/datediff()/length() are
        // int32 where DuckDB's EXTRACT/datediff/length are int64
        year($"o_orderdate").cast("long").as("order_year"),
        month($"o_orderdate").cast("long").as("order_month"),
        quarter($"o_orderdate").cast("long").as("order_quarter"),
        dayofweek($"o_orderdate").cast("long").as("order_dow"),
        date_format($"o_orderdate", "yyyy-MM").as("order_ym"),
        datediff(lit("1998-12-31").cast("date"), $"o_orderdate".cast("date"))
          .cast("long").as("days_to_cutoff"),
        regexp_extract($"o_orderpriority", "^(\\d+)", 1).cast("int").as("priority_rank"),
        lower(substring($"o_orderstatus", 1, 1)).as("status_initial"),
        length($"o_orderpriority").cast("long").as("priority_len"),
        concat_ws("|", $"o_orderstatus", $"o_orderpriority").as("status_priority"),
        round($"o_totalprice", 0).cast("long").as("price_rounded"),
        ($"o_totalprice" > 100000.0).as("is_large"),
        coalesce(nullif(trim($"o_orderstatus"), lit("")), lit("UNKNOWN")).as("status_nz"))
      .orderBy($"o_orderkey")
  }

  private val scalarFunctionsSql =
    """SELECT o_orderkey,
      |       EXTRACT(year FROM o_orderdate) AS order_year,
      |       EXTRACT(month FROM o_orderdate) AS order_month,
      |       EXTRACT(quarter FROM o_orderdate) AS order_quarter,
      |       EXTRACT(dow FROM o_orderdate) + 1 AS order_dow,
      |       strftime(o_orderdate, '%Y-%m') AS order_ym,
      |       datediff('day', o_orderdate::DATE, DATE '1998-12-31') AS days_to_cutoff,
      |       CAST(regexp_extract(o_orderpriority, '^(\d+)', 1) AS INTEGER) AS priority_rank,
      |       lower(substr(o_orderstatus, 1, 1)) AS status_initial,
      |       length(o_orderpriority) AS priority_len,
      |       concat_ws('|', o_orderstatus, o_orderpriority) AS status_priority,
      |       CAST(round(o_totalprice, 0) AS BIGINT) AS price_rounded,
      |       o_totalprice > 100000.0 AS is_large,
      |       coalesce(nullif(trim(o_orderstatus), ''), 'UNKNOWN') AS status_nz
      |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scalar_functions" -> scalarFunctions)

  def oracles: Map[String, String] = Map(
    "scalar_functions" -> scalarFunctionsSql)
}
