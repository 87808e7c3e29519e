package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Declarative data-quality constraint suite (the Deequ/Great-Expectations
  * layer): uniqueness, referential integrity, completeness, and domain/
  * range checks evaluated in one batch pass, emitting a violation count
  * per named check — the gate a production pipeline runs before
  * publishing a table version (Lakehouse manifest commit) or admitting a
  * batch to training data.
  *
  * Scale shapes per check: PK uniqueness is one key aggregation
  * (map-side partial); FK checks are anti-joins (broadcast when the
  * referenced side is dimension-sized, shuffle otherwise — Catalyst
  * picks); completeness/domain/range checks are pure filtered counts
  * that fuse into one scan per table. Nothing wide ever moves.
  */
object DataQuality extends QueryModule {

  def dqConstraints(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val documents = Tables.documents(spark, dir)
    val events = Tables.events(spark, dir)

    def check(name: String, violations: DataFrame): DataFrame =
      violations.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))

    val checks = Seq(
      check("customer_pk_unique", customer.groupBy("c_custkey")
        .agg(count(lit(1)).as("n")).filter(col("n") > 1)),
      check("orders_pk_unique", orders.groupBy("o_orderkey")
        .agg(count(lit(1)).as("n")).filter(col("n") > 1)),
      check("orders_custkey_fk", orders
        .join(broadcast(customer.select("c_custkey")),
          orders("o_custkey") === customer("c_custkey"), "left_anti")),
      // together with orders_custkey_fk and customer_pk_unique this is
      // the full contract FkJoinEliminationRule relies on
      check("orders_custkey_complete", orders.filter(col("o_custkey").isNull)),
      check("lineitem_orderkey_fk", lineitem
        .join(orders.select("o_orderkey"),
          lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")),
      check("orders_totalprice_positive", orders.filter(col("o_totalprice") <= 0)),
      check("orders_status_domain", orders
        .filter(!col("o_orderstatus").isin("O", "F", "P"))),
      check("lineitem_quantity_range", lineitem
        .filter(col("l_quantity") < 1 || col("l_quantity") > 50)),
      check("lineitem_discount_range", lineitem
        .filter(col("l_discount") < 0 || col("l_discount") > 1)),
      check("documents_text_complete", documents
        .filter(col("text").isNull || length(trim(col("text"))) === 0)),
      check("events_user_complete", events.filter(col("user_id").isNull)))

    checks.reduce(_ unionByName _).orderBy("check_name")
  }

  private val dqConstraintsSql =
    """SELECT * FROM (
      |  SELECT 'customer_pk_unique' AS check_name, count(*) AS n_violations
      |  FROM (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING count(*) > 1)
      |  UNION ALL
      |  SELECT 'orders_pk_unique', count(*)
      |  FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
      |  UNION ALL
      |  SELECT 'orders_custkey_fk', count(*) FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |  UNION ALL
      |  SELECT 'orders_custkey_complete', count(*) FROM orders WHERE o_custkey IS NULL
      |  UNION ALL
      |  SELECT 'lineitem_orderkey_fk', count(*) FROM lineitem l
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |  UNION ALL
      |  SELECT 'orders_totalprice_positive', count(*) FROM orders WHERE o_totalprice <= 0
      |  UNION ALL
      |  SELECT 'orders_status_domain', count(*) FROM orders
      |  WHERE o_orderstatus NOT IN ('O', 'F', 'P')
      |  UNION ALL
      |  SELECT 'lineitem_quantity_range', count(*) FROM lineitem
      |  WHERE l_quantity < 1 OR l_quantity > 50
      |  UNION ALL
      |  SELECT 'lineitem_discount_range', count(*) FROM lineitem
      |  WHERE l_discount < 0 OR l_discount > 1
      |  UNION ALL
      |  SELECT 'documents_text_complete', count(*) FROM documents
      |  WHERE text IS NULL OR length(trim(text)) = 0
      |  UNION ALL
      |  SELECT 'events_user_complete', count(*) FROM events WHERE user_id IS NULL)
      |ORDER BY check_name""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_constraints" -> dqConstraints)

  def oracles: Map[String, String] = Map(
    "dq_constraints" -> dqConstraintsSql)
}
