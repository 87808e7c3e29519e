package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Fuzzy record linkage / entity resolution: blocking → bounded edit
  * distance within blocks → connected-component entity clusters. The
  * relational cousin of the near-dup text pipeline (same
  * candidates-by-equi-join discipline, SURVEY.md §8): at 100 TB the
  * quadratic comparator runs only INSIDE blocks, and the cluster step
  * reuses the dedup component resolver — ids shuffle, payloads don't.
  *
  * The dirty registry is planted deterministically from `customer` (every
  * 40th key gets a one-character-typo variant under a salted id), so the
  * DuckDB oracle replays the identical construction — levenshtein is
  * exact integer edit distance in both engines, nothing float-shaped in
  * the compare.
  */
object Linkage extends QueryModule {

  /** Base ∪ typo variants: variant id = key + 1,000,000, name's last
    * char swapped to 'X' (edit distance exactly 1), block columns kept.
    */
  private def registry(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"))
    val variants = c.filter(col("id") % 40 === 0)
      .select((col("id") + 1000000L).as("id"),
        concat(substring(col("name"), 1, 17), lit("X")).as("name"),
        col("nat"), col("seg"))
    c.unionByName(variants)
  }

  private val registrySql =
    """SELECT c_custkey AS id, c_name AS name,
      |       c_nationkey AS nat, c_mktsegment AS seg FROM customer
      |UNION ALL
      |SELECT c_custkey + 1000000, substr(c_name, 1, 17) || 'X',
      |       c_nationkey, c_mktsegment
      |FROM customer WHERE c_custkey % 40 = 0""".stripMargin

  /** Candidate pairs: equi-join on the blocking key (nation, segment,
    * name prefix-16) — NEVER all-pairs — then exact levenshtein ≤ 1 as a
    * post-join filter. Block cardinality is what bounds the quadratic
    * term; the prefix block survives the planted last-char typo by
    * construction (multi-pass blocking on other keys is the production
    * recall lever, same join shape per pass).
    */
  def linkagePairs(spark: SparkSession, dir: String): DataFrame = {
    val reg = registry(spark, dir)
    val a = reg.as("a")
    val b = reg.as("b")
    a.join(b,
        col("a.nat") === col("b.nat") && col("a.seg") === col("b.seg") &&
          substring(col("a.name"), 1, 16) === substring(col("b.name"), 1, 16) &&
          col("a.id") < col("b.id"))
      .filter(levenshtein(col("a.name"), col("b.name")) <= 1)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.name"), col("b.name")).cast("long").as("lev"))
      .orderBy("id_a", "id_b")
  }

  private val linkagePairsSql =
    s"""WITH reg AS ($registrySql)
       |SELECT a.id AS id_a, b.id AS id_b,
       |       CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev
       |FROM reg a JOIN reg b
       |  ON a.nat = b.nat AND a.seg = b.seg
       | AND substr(a.name, 1, 16) = substr(b.name, 1, 16)
       | AND a.id < b.id
       |WHERE levenshtein(a.name, b.name) <= 1
       |ORDER BY id_a, id_b""".stripMargin

  /** Match pairs → entities via the dedup component resolver (min-label
    * propagation); entity id = the component's minimum member id. Only
    * ids travel; the oracle resolves reachability independently with a
    * recursive CTE.
    */
  def linkageEntities(spark: SparkSession, dir: String): DataFrame = {
    val edges = linkagePairs(spark, dir)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    Dedup.connectedComponents(edges)
      .select(col("node").as("id"), col("label").as("entity"))
      .withColumn("entity_size",
        count(lit(1)).over(Window.partitionBy(col("entity"))))
      .orderBy("id")
  }

  private val linkageEntitiesSql =
    s"""WITH RECURSIVE
       |reg AS ($registrySql),
       |pairs AS (
       |  SELECT a.id AS id_a, b.id AS id_b
       |  FROM reg a JOIN reg b
       |    ON a.nat = b.nat AND a.seg = b.seg
       |   AND substr(a.name, 1, 16) = substr(b.name, 1, 16)
       |   AND a.id < b.id
       |  WHERE levenshtein(a.name, b.name) <= 1),
       |sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |        UNION SELECT id_b, id_a FROM pairs),
       |walk(node, reach) AS (
       |  SELECT src, src FROM sym
       |  UNION
       |  SELECT w.node, s.dst FROM walk w JOIN sym s ON s.src = w.reach),
       |comp AS (SELECT node, min(reach) AS entity FROM walk GROUP BY node)
       |SELECT node AS id, entity,
       |       count(*) OVER (PARTITION BY entity) AS entity_size
       |FROM comp ORDER BY id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "linkage_pairs" -> linkagePairs,
    "linkage_entities" -> linkageEntities)

  def oracles: Map[String, String] = Map(
    "linkage_pairs" -> linkagePairsSql,
    "linkage_entities" -> linkageEntitiesSql)
}
