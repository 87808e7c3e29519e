package graft

import graft.ops.AnnIndex
import org.apache.spark.sql.functions._

/** The scatter-gather invariant at a NON-default shard count: the driver
  * rows run at the conf default (N=2); these run the SAME row bodies at
  * N=4 and assert the planted enumerable answer — the invariant argument
  * (every global top-k member is in its own shard's top-k) is N-generic,
  * and this pins that the CODE is too (cache tags carry N, hash routing
  * covers all residues, the gather re-tops across all N shards).
  */
class ShardedSpec extends SparkSpec {

  /** {0, 100000..100008} all at cosine 1.0 — the planted self-query set. */
  private val expected = (Seq(0L) ++ (100000L to 100008L)).map(_ -> 1.0)

  private def withShardCount[A](n: Int)(f: => A): A = {
    spark.conf.set("spark.graft.ann.shardCount", n.toString)
    try f finally spark.conf.unset("spark.graft.ann.shardCount")
  }

  test("shardCount reads the conf and defaults to 2") {
    assert(AnnIndex.shardCount(spark) === 2)
    withShardCount(4) { assert(AnnIndex.shardCount(spark) === 4) }
    assert(AnnIndex.shardCount(spark) === 2)
  }

  test("LSH scatter-gather serves the planted answer at N=4") {
    val got = withShardCount(4) {
      SparkEntry.queries("ann_sharded_topk")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1).toSeq
    }
    assert(got === expected, s"N=4 LSH scatter-gather diverged: $got")
  }

  test("IVF scatter-gather serves the planted answer at N=4") {
    val got = withShardCount(4) {
      SparkEntry.queries("ann_ivf_sharded_topk")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1).toSeq
    }
    assert(got === expected, s"N=4 IVF scatter-gather diverged: $got")
  }

  test("graph scatter-gather serves the planted answer at N=4") {
    val got = withShardCount(4) {
      SparkEntry.queries("ann_graph_sharded_topk")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1).toSeq
    }
    assert(got === expected, s"N=4 graph scatter-gather diverged: $got")
  }

  test("N=4 actually spreads the planted family over >2 shards") {
    // the invariant test above would vacuously pass if every copy hashed
    // to one residue; pin that the fixture exercises the fan-out
    val residues = (Seq(0L) ++ (100000L to 100008L))
      .map(id => java.lang.Long.remainderUnsigned(
        // xxhash64 via a 1-row frame — same function the rows route by
        spark.range(1).select(xxhash64(lit(id))).head().getLong(0), 4L))
      .distinct
    assert(residues.size > 2, s"planted ids cover only residues $residues")
  }
}
