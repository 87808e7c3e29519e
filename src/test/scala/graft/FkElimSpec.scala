package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{FkJoinEliminationRule => R, GraftExtensions}

/** PK-FK join elimination: the armed plan contains no join operator yet
  * produces the joined answer; every looser shape declines.
  */
class FkElimSpec extends SparkSpec {

  private def withFkElim[A](f: => A): A = {
    GraftExtensions.register(spark)
    val keys = Seq(
      R.FactSourceKey -> s"$sf/orders.parquet", R.FkColKey -> "o_custkey",
      R.DimSourceKey -> s"$sf/customer.parquet", R.PkColKey -> "c_custkey",
      R.EnabledKey -> "true")
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally spark.conf.set(R.EnabledKey, "false")
  }

  private def joined = spark.read.parquet(s"$sf/orders.parquet")
    .join(spark.read.parquet(s"$sf/customer.parquet"),
      col("o_custkey") === col("c_custkey"))
    .groupBy("o_orderpriority")
    .agg(count(lit(1)).as("n"))
    .orderBy("o_orderpriority")

  private def hasJoin(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.nonEmpty

  test("armed: the join disappears and the answer is the joined answer") {
    val expected = joined.collect().toSeq // unarmed reference
    withFkElim {
      val q = joined
      assert(!hasJoin(q), s"join survived:\n${q.queryExecution.optimizedPlan}")
      assert(q.collect().toSeq === expected)
    }
  }

  test("reading a dim column declines the rewrite") {
    withFkElim {
      val q = spark.read.parquet(s"$sf/orders.parquet")
        .join(spark.read.parquet(s"$sf/customer.parquet"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(hasJoin(q), "dim column is read; elimination would be wrong")
    }
  }

  test("left joins and unregistered dims decline") {
    withFkElim {
      val outer = spark.read.parquet(s"$sf/orders.parquet")
        .join(spark.read.parquet(s"$sf/customer.parquet"),
          col("o_custkey") === col("c_custkey"), "left")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      assert(hasJoin(outer))
      val wrongDim = spark.read.parquet(s"$sf/orders.parquet")
        .join(spark.read.parquet(s"$sf/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      assert(hasJoin(wrongDim))
    }
  }

  test("disabled by default") {
    GraftExtensions.register(spark)
    assert(hasJoin(joined))
  }
}
