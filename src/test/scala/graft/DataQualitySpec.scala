package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Constraint-suite shape: one row per named check, clean testdata passes
  * the structural checks, and a planted violation is actually counted
  * (the suite must not be vacuously green).
  */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("dq_constraints: one row per check, PK/FK checks clean on testdata") {
    val rows = SparkEntry.queries("dq_constraints")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows.size === 11)
    assert(rows("orders_custkey_complete") === 0L)
    assert(rows("orders_pk_unique") === 0L)
    assert(rows("customer_pk_unique") === 0L)
    assert(rows("orders_custkey_fk") === 0L)
    assert(rows("lineitem_orderkey_fk") === 0L)
  }

  test("a planted FK orphan is counted, not swallowed") {
    // same anti-join shape as the suite, against a registry missing key 1
    val facts = Seq((10L, 1L), (11L, 2L), (12L, 999L)).toDF("id", "ref")
    val dim = Seq(Tuple1(1L), Tuple1(2L)).toDF("key")
    val orphans = facts.join(dim, facts("ref") === dim("key"), "left_anti")
    assert(orphans.count() === 1L)
    assert(orphans.head().getLong(0) === 12L)
  }

  test("suite plan has no cartesian products") {
    val plan = SparkEntry.queries("dq_constraints")(spark, sf)
      .queryExecution.sparkPlan
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
  }
}
