package graft

import graft.ops.CatalogStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{EagerAggregationRule, GraftExtensions}

class EagerAggregationSpec extends SparkSpec {

  private def starAgg(): DataFrame = {
    val (o, c) = (CatalogStats.tableName("orders", sf),
      CatalogStats.tableName("customer", sf))
    spark.sql(
      s"""SELECT c.c_nationkey, count(*) AS n_orders,
         |       sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS price_e2,
         |       max(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS max_e2
         |FROM $o o JOIN $c c ON o.o_custkey = c.c_custkey
         |GROUP BY c.c_nationkey""".stripMargin)
  }

  private def withRule[A](body: => A): A = {
    GraftExtensions.register(spark)
    spark.conf.set(EagerAggregationRule.EnabledKey, "true")
    try CatalogStats.withCbo(spark) {
      val r = body
      r match { case df: DataFrame => df.queryExecution.optimizedPlan; case _ => }
      r.asInstanceOf[A with DataFrame]
    } finally spark.conf.unset(EagerAggregationRule.EnabledKey)
  }

  private def hasEagerPartial(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.left.isInstanceOf[Aggregate] &&
        j.left.asInstanceOf[Aggregate].aggregateExpressions
          .exists(_.name.startsWith("_eager_")) => j
    }.nonEmpty

  test("eager aggregation fires under stats and preserves the answer exactly") {
    CatalogStats.registerAndAnalyze(spark, sf, Seq("orders", "customer"))
    val plain = starAgg().collect().map(_.toSeq).toSet
    val rewritten = withRule(starAgg())
    assert(hasEagerPartial(rewritten),
      s"expected a pushed partial aggregate:\n${rewritten.queryExecution.optimizedPlan}")
    assert(rewritten.collect().map(_.toSeq).toSet === plain,
      "eager aggregation changed the answer")
  }

  test("eager_agg_pushdown driver row carries the pushed partial in its plan") {
    val df = SparkEntry.queries("eager_agg_pushdown")(spark, sf)
    assert(hasEagerPartial(df),
      s"driver row lost the rewrite:\n${df.queryExecution.optimizedPlan}")
  }

  test("declines without catalog stats proving the dim key unique") {
    // same shape over RAW parquet paths: no catalog stats → no proof → no rewrite
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    val df = withRule {
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("s"))
    }
    assert(!hasEagerPartial(df), "must not rewrite without a uniqueness proof")
  }

  test("declines when the join key is not unique on the dim side") {
    CatalogStats.registerAndAnalyze(spark, sf, Seq("orders"))
    val o = CatalogStats.tableName("orders", sf)
    // self-join on o_custkey: the key repeats, stats cannot prove uniqueness
    val df = withRule(spark.sql(
      s"""SELECT a.o_orderstatus, count(*) AS n
         |FROM $o a JOIN $o b ON a.o_custkey = b.o_custkey
         |GROUP BY a.o_orderstatus""".stripMargin))
    assert(!hasEagerPartial(df), "non-unique key must decline")
  }

  test("avg over an integral input rewrites via sum+count and is exact") {
    CatalogStats.registerAndAnalyze(spark, sf, Seq("orders", "customer"))
    val (o, c) = (CatalogStats.tableName("orders", sf),
      CatalogStats.tableName("customer", sf))
    def q(): DataFrame = spark.sql(
      s"""SELECT c.c_nationkey,
         |       avg(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS avg_e2,
         |       count(*) AS n
         |FROM $o o JOIN $c c ON o.o_custkey = c.c_custkey
         |GROUP BY c.c_nationkey""".stripMargin)
    val plain = q().collect().map(_.toSeq).toSet
    val rewritten = withRule(q())
    assert(hasEagerPartial(rewritten),
      s"avg must decompose and push:\n${rewritten.queryExecution.optimizedPlan}")
    assert(rewritten.collect().map(_.toSeq).toSet === plain,
      "decomposed avg changed the answer")
  }

  test("avg over a float input stays declined — the sum is not re-associable") {
    CatalogStats.registerAndAnalyze(spark, sf, Seq("orders", "customer"))
    val (o, c) = (CatalogStats.tableName("orders", sf),
      CatalogStats.tableName("customer", sf))
    val df = withRule(spark.sql(
      s"""SELECT c.c_nationkey, avg(o.o_totalprice) AS a
         |FROM $o o JOIN $c c ON o.o_custkey = c.c_custkey
         |GROUP BY c.c_nationkey""".stripMargin))
    assert(!hasEagerPartial(df), "float-input avg must not rewrite")
  }

  test("count semantics survive when the join drops whole fact groups") {
    CatalogStats.registerAndAnalyze(spark, sf, Seq("orders", "customer"))
    val (o, c) = (CatalogStats.tableName("orders", sf),
      CatalogStats.tableName("customer", sf))
    def q(): DataFrame = spark.sql(
      s"""SELECT c.c_nationkey, count(*) AS n
         |FROM $o o JOIN (SELECT * FROM $c WHERE c_custkey % 3 = 0) c
         |  ON o.o_custkey = c.c_custkey
         |GROUP BY c.c_nationkey""".stripMargin)
    val plain = q().collect().map(_.toSeq).toSet
    val rewritten = withRule(q())
    assert(rewritten.collect().map(_.toSeq).toSet === plain)
  }
}
