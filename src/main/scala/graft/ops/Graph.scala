package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Iterative graph analytics over a derived link graph — weighted
  * PageRank (Page et al. 1999) on the nation-level trade digraph
  * (customer nation → supplier nation, weight = order-line count). The
  * domain-authority signal web-corpus pipelines feed into quality
  * scoring, built join-first like the dedup component resolver: each
  * iteration is one equi-join on the edge source + one aggregation on
  * the destination — rank mass shuffles by node id, nothing else moves.
  *
  * Determinism contract: ALL arithmetic is integer micro-units — rank
  * r_e6 starts at 1000000 DIV n; each step is
  * `base + (850000 · Σ (r·w DIV W_src)) DIV 1000000` with
  * `base = (150000 · (1000000 DIV n)) DIV 1000000` — so a DuckDB chain
  * of unrolled-iteration CTEs reproduces every rank bit-for-bit (no
  * float damping to diverge in the last ulp). Truncation bleeds a few
  * micro-units of mass per step; both engines bleed identically.
  *
  * Scale: the fixed iteration count is the production shape (10 sweeps);
  * per-iteration `localCheckpoint` keeps the logical plan constant-size
  * (the iterative-Spark lineage trap, see connectedComponents). Inflow
  * to nodes with no out-edges is dropped on both sides (documented
  * dangling-mass simplification).
  */
object Graph extends QueryModule {

  private val Iters = 10

  /** (src, dst, w) edge list + per-source total out-weight. */
  private def tradeEdges(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .filter(c("c_nationkey") =!= s("s_nationkey"))
      .groupBy(c("c_nationkey").cast("long").as("src"),
        s("s_nationkey").cast("long").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** The aggregated edge matrix is CATALOG-scale: ≤ |nation|² rows by
    * construction (both endpoints are nation keys — 25 in this schema at
    * every SF), however large lineitem grows. A matrix this size iterated
    * as 10 rounds of Spark joins + per-round localCheckpoints cost ~89
    * jobs of pure scheduling (measured: 2.2 s at sf0.1 for a 25-node
    * graph); the guide's "decide with small rows" rule (§8) says run the
    * DATA-scale work (the lineitem⋈orders⋈customer⋈supplier edge
    * aggregation) distributed and the rank sweeps on the bounded
    * aggregate. The loud bound check keeps the collect honest if the
    * node domain ever stops being catalog-scale. Arithmetic is the same
    * integer micro-unit recurrence, term for term (Long sums are exact
    * and order-free), so ranks are bit-identical to the join-chain's and
    * the unrolled-CTE oracle's. */
  private val MaxCollectedEdges = 100000

  def pagerankNations(spark: SparkSession, dir: String): DataFrame = {
    val edges = tradeEdges(spark, dir)
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("tw"))
    val edgeRows = edges.join(outw, "src")
      .select(col("src"), col("dst"), col("w"), col("tw"))
      .collect() // bounded by |nation|² (see doc comment), never data-scale
    require(edgeRows.length <= MaxCollectedEdges,
      s"pagerank_nations: aggregated edge matrix has ${edgeRows.length} " +
        s"rows (> $MaxCollectedEdges) — node domain is no longer " +
        "catalog-scale; refuse rather than collect a data-scale frame")
    val es = edgeRows.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nodes = es.map(_._1).distinct
    val n = nodes.length.toLong
    val initE6 = 1000000L / n
    val baseE6 = 150000L * initE6 / 1000000L
    var ranks: Map[Long, Long] = nodes.map(_ -> initE6).toMap
    for (_ <- 1 to Iters) {
      // Σ_dst (r_src · w) DIV tw — same truncating integer division and
      // exact Long sum as the SQL `(r * w) DIV tw` (all terms positive)
      val inflow = new scala.collection.mutable.HashMap[Long, Long]()
      es.foreach { case (src, dst, w, tw) =>
        inflow(dst) = inflow.getOrElse(dst, 0L) + ranks(src) * w / tw
      }
      ranks = nodes.map(nd =>
        nd -> (baseE6 + 850000L * inflow.getOrElse(nd, 0L) / 1000000L)).toMap
    }
    import spark.implicits._
    val rankDf = ranks.toSeq.toDF("node", "r")
    val nation = Tables.nation(spark, dir)
    rankDf.join(broadcast(nation), rankDf("node") === nation("n_nationkey"))
      .select(col("n_name").as("nation"), col("r").cast("long").as("rank_e6"))
      .orderBy(col("rank_e6").desc, col("nation"))
  }

  private val pagerankNationsSql: String = {
    val sb = new StringBuilder
    sb.append(
      """WITH edges AS (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
        |         CAST(s.s_nationkey AS BIGINT) AS dst, count(*) AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey != s.s_nationkey
        |  GROUP BY 1, 2),
        |outw AS (SELECT src, sum(w) AS tw FROM edges GROUP BY src),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |cnt AS (SELECT count(*) AS n FROM nodes),
        |pr0 AS (SELECT node, 1000000 // n AS r FROM nodes CROSS JOIN cnt)""".stripMargin)
    for (t <- 1 to Iters) {
      sb.append(s""",
        |pr$t AS (
        |  SELECT nd.node,
        |         (150000 * (1000000 // c.n)) // 1000000
        |           + (850000 * COALESCE(sub.inflow, 0)) // 1000000 AS r
        |  FROM nodes nd CROSS JOIN cnt c
        |  LEFT JOIN (
        |    SELECT e.dst AS node, sum((p.r * e.w) // o.tw) AS inflow
        |    FROM edges e
        |    JOIN pr${t - 1} p ON p.node = e.src
        |    JOIN outw o ON o.src = e.src
        |    GROUP BY e.dst) sub ON sub.node = nd.node)""".stripMargin)
    }
    sb.append(s"""
      |SELECT nt.n_name AS nation, CAST(p.r AS BIGINT) AS rank_e6
      |FROM pr$Iters p JOIN nation nt ON nt.n_nationkey = p.node
      |ORDER BY rank_e6 DESC, nation""".stripMargin)
    sb.toString
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pagerank_nations" -> pagerankNations)

  def oracles: Map[String, String] = Map(
    "pagerank_nations" -> pagerankNationsSql)
}
