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
}
