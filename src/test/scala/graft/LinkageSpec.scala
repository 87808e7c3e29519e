package graft

import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import graft.ops.Linkage

/** Record linkage: every planted typo variant links back to its base row,
  * entities cluster base+variant under the base id, and the candidate
  * join is an equi-join on the blocking key — never a cross product.
  */
class LinkageSpec extends SparkSpec {

  test("every planted variant pairs with its base record at lev 1") {
    val pairs = Linkage.linkagePairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = pairs.filter { case (a, b, _) => b == a + 1000000L }
    // sf0.001: custkeys 0..149 → 0,40,80,120 planted (custkey 0 included)
    assert(planted.length >= 3, s"planted matches missing: ${planted.length}")
    assert(planted.forall(_._3 == 1L), "planted typo must be edit distance 1")
  }

  test("entities merge base and variant under the base id") {
    val ents = Linkage.linkageEntities(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byEntity = ents.groupBy(_._2)
    val plantedClusters = byEntity.filter { case (label, ms) =>
      ms.exists(_._1 >= 1000000L) && label < 1000000L
    }
    assert(plantedClusters.nonEmpty)
    plantedClusters.foreach { case (label, ms) =>
      assert(ms.exists(_._1 == label + 1000000L),
        s"entity $label missing its variant member")
      assert(ms.forall(_._3 == ms.length.toLong), "entity_size mismatch")
    }
  }

  test("candidate generation is an equi-join, never a cross product") {
    val plan = Linkage.linkagePairs(spark, sf).queryExecution.sparkPlan
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      s"cartesian product in linkage plan:\n$plan")
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"nested-loop join in linkage plan:\n$plan")
  }
}
