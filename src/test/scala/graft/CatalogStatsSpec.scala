package graft

import graft.ops.CatalogStats
import org.apache.spark.sql.functions._

class CatalogStatsSpec extends SparkSpec {

  test("ANALYZE puts exact row counts and column NDV into the catalog") {
    CatalogStats.registerAndAnalyze(spark, sf, Seq("nation", "customer"))
    // rowCount propagates into plan stats only while CBO is on
    CatalogStats.withCbo(spark) {
      val nation = spark.table(CatalogStats.tableName("nation", sf))
      val stats = nation.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(25)),
        s"catalog rowCount should be 25, got ${stats.rowCount}")
      val cust = spark.table(CatalogStats.tableName("customer", sf))
      val custCount = cust.count()
      assert(cust.queryExecution.optimizedPlan.stats.rowCount
        .contains(BigInt(custCount)))
      nation
    }
  }

  test("column stats make filter selectivity real under CBO") {
    CatalogStats.registerAndAnalyze(spark, sf, Seq("nation"))
    CatalogStats.withCbo(spark) {
      val filtered = spark.table(CatalogStats.tableName("nation", sf))
        .filter(col("n_name") === "NATION_3")
      val est = filtered.queryExecution.optimizedPlan.stats.rowCount
      // NDV(n_name) = 25 → the cost model must estimate ~1 row, not 25
      assert(est.isDefined && est.get <= BigInt(3),
        s"stats-based selectivity should shrink 25 rows to ~1, got $est")
      filtered
    }
  }

  test("cbo_star_join: both dims broadcast, the fact side never shuffles") {
    val df = SparkEntry.queries("cbo_star_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts === 2,
      s"expected both dim joins broadcast under CBO, got $broadcasts:\n$plan")
    val rows = df.collect()
    assert(rows.length === 2 && rows.forall(_.getAs[Long]("n_orders") > 0))
  }
}
