package graft

import graft.ops.Graph

/** Weighted integer-arithmetic PageRank: structural properties on the
  * driver query plus conservation/ordering sanity. Exact values are the
  * DuckDB oracle's job (unrolled-iteration CTE chain).
  */
class GraphSpec extends SparkSpec {

  test("pagerank_nations: one rank per nation, positive, mass near 1e6") {
    val rows = SparkEntry.queries("pagerank_nations")(spark, sf).collect()
    assert(rows.length === 25)
    assert(rows.map(_.getString(0)).distinct.length === 25)
    val ranks = rows.map(_.getLong(1))
    assert(ranks.forall(_ > 0))
    val mass = ranks.sum
    // integer truncation bleeds a little mass per step, never adds any
    assert(mass <= 1000000L, s"mass grew: $mass")
    assert(mass > 900000L, s"too much mass lost: $mass")
    // sorted output contract: rank desc, then nation asc
    val sorted = rows.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(sorted === sorted.sorted)
  }

  test("ranks differentiate on the weighted trade graph") {
    val ranks = SparkEntry.queries("pagerank_nations")(spark, sf)
      .collect().map(_.getLong(1))
    assert(ranks.distinct.length > 1,
      "weighted PageRank should not be exactly uniform on skewed trade volumes")
  }
}
