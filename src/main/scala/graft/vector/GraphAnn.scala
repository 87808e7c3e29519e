package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based ANN — the NSW shape (Malkov et al. 2014; HNSW's layer 0,
  * and the index family behind DiskANN/Vamana): each vector keeps edges
  * to its ~M nearest neighbors, and a query walks the graph greedily
  * from fixed entry points, converging to its true neighborhood in a
  * handful of hops. Complements the LSH/IVF/PQ families: no bucketing
  * or training, recall comes from connectivity.
  *
  * Scale shape, build (a batch job):
  *  - Candidate pairs come from an LSH-bucket EQUI-JOIN (multi-probe,
  *    plus extra seed rounds at scale — the NN-Descent discipline),
  *    never all-pairs: only bucket-mates ever meet, text/vector payloads
  *    join on 8-byte ids.
  *  - Per-node top-M edges via a window over the node partitioning
  *    (score desc, id asc — bit-deterministic ties).
  *  - Reverse edges are unioned in and re-topped (the HNSW symmetrizing
  *    heuristic), keeping out-degree ≤ 2M while guaranteeing the graph
  *    has no in-only sinks.
  *  - Adjacency persists as (node_id, neighbors array<long>) parquet,
  *    hash-clustered on node_id so frontier fetches prune.
  *
  * Scale shape, query (the serving path):
  *  - E entry points = hash-min sample of the corpus (deterministic,
  *    query-independent — the fixed entry of HNSW generalized).
  *  - H bounded hops; each hop fetches the frontier's adjacency rows and
  *    the new candidates' embeddings by pushed `id IN` point lookups
  *    (partition/row-group pruning at the source), scores them against
  *    the query, and keeps the global best B.
  *  - Driver-side state is (B + E + H·B·M) (id, score) entries — a few
  *    hundred rows, the MMR/pagination serving-path bound, documented
  *    at each collect. Nothing corpus-sized ever moves.
  *
  * Determinism: seeded hyperplanes, windowed ties by id, fixed E/B/H —
  * identical data in, identical graph and identical search result out.
  */
object GraphAnn {

  /** Build and persist the NSW adjacency for (idCol, embCol) rows.
    * Candidate generation probes each vector's LSH bucket plus its
    * radius-1 neighbors — the equi-join form of "likely near" — so edge
    * scoring is bounded by bucket occupancy, not corpus size.
    */
  def buildNswGraph(df: DataFrame, embCol: String, idCol: String,
      lsh: IndexBuilder.RandomHyperplaneLsh, m: Int, path: String): Unit = {
    val probeUdf = udf { (v: Seq[Float]) =>
      lsh.probes(lsh.signature(v), radius = 1)
    }
    val nodes = df.select(col(idCol).as("id"), col(embCol).as("emb"))
    val home = nodes.withColumn("bucket",
      udf { (v: Seq[Float]) => lsh.signature(v) }.apply(col("emb")))
    val probed = nodes.select(col("id"), col("emb"),
      explode(probeUdf(col("emb"))).as("bucket"))
    // directed candidate pairs: a probes the buckets its near-misses can
    // live in; join against each bucket's HOME residents only (probe ×
    // home, not probe × probe — keeps the pair count ~ball × occupancy)
    val pairs = probed.as("a")
      .join(home.as("b"), col("a.bucket") === col("b.bucket") &&
        col("a.id") =!= col("b.id"))
      .select(col("a.id").as("src"), col("b.id").as("dst"),
        VectorFunctions.cosineUnit(col("a.emb"), col("b.emb")).as("score"))
      .groupBy("src", "dst").agg(max("score").as("score")) // dedup multi-probe hits
    val wSrc = Window.partitionBy("src")
      .orderBy(col("score").desc, col("dst").asc)
    val topM = pairs.withColumn("rn", row_number().over(wSrc))
      .filter(col("rn") <= m).select("src", "dst", "score")
    // symmetrize then re-top at 2M: reverse edges guarantee every node
    // is reachable FROM its neighbors, not only pointed at by them
    val sym = topM.unionByName(
        topM.select(col("dst").as("src"), col("src").as("dst"), col("score")))
      .groupBy("src", "dst").agg(max("score").as("score"))
    val adj = sym.withColumn("rn", row_number().over(wSrc))
      .filter(col("rn") <= 2 * m)
      .groupBy(col("src").as("node_id"))
      .agg(sort_array(collect_list(struct(
        (-col("score")).as("neg"), col("dst"))))
        .getField("dst").as("neighbors"))
    adj.repartition(8, col("node_id"))
      .write.mode("overwrite").parquet(path)
  }

  /** Merged adjacency view: the base build (seq 0) overlaid by append
    * deltas at `<path>_delta`, latest-wins per node — the MOR discipline
    * applied to the graph, so appends never rewrite the base files.
    */
  def readNswAdjacency(spark: SparkSession, path: String): DataFrame = {
    val base = spark.read.parquet(path).withColumn("seq", lit(0L))
    val all =
      if (new java.io.File(path + "_delta").exists())
        base.unionByName(spark.read.parquet(path + "_delta"))
      else base
    all.groupBy("node_id")
      .agg(max_by(col("neighbors"), col("seq")).as("neighbors"))
  }

  /** Add vectors to a persisted NSW graph without a rebuild — the HNSW
    * insert generalized to batches. New nodes link through the SAME LSH
    * candidate equi-join (against existing + new home buckets); existing
    * nodes touched by a reverse edge get their adjacency row RECOMPUTED
    * (current edges re-scored by point lookups + the new in-edges,
    * re-topped at 2M) and re-landed as a delta row — without this in-edge
    * maintenance, appended vectors would be unreachable out-only sinks.
    * Cost scales with |new|·M affected rows, never the graph. Deltas are
    * seq-stamped (prior max + 1 — deterministic); readers merge
    * latest-wins via readNswAdjacency.
    */
  def appendToNswGraph(spark: SparkSession, newNodes: DataFrame,
      embCol: String, idCol: String, lsh: IndexBuilder.RandomHyperplaneLsh,
      m: Int, path: String, corpus: DataFrame): Unit = {
    import spark.implicits._
    val probeUdf = udf { (v: Seq[Float]) =>
      lsh.probes(lsh.signature(v), radius = 1)
    }
    val sigUdf = udf { (v: Seq[Float]) => lsh.signature(v) }
    val newN = newNodes.select(col(idCol).as("id"), col(embCol).as("emb"))
    val nodesAll = corpus.select(col(idCol).as("id"), col(embCol).as("emb"))
      .unionByName(newN)
    val home = nodesAll.withColumn("bucket", sigUdf(col("emb")))
    val probedNew = newN.select(col("id"), col("emb"),
      explode(probeUdf(col("emb"))).as("bucket"))
    val pairs = probedNew.as("a")
      .join(home.as("b"), col("a.bucket") === col("b.bucket") &&
        col("a.id") =!= col("b.id"))
      .select(col("a.id").as("src"), col("b.id").as("dst"),
        VectorFunctions.cosineUnit(col("a.emb"), col("b.emb")).as("score"))
      .groupBy("src", "dst").agg(max("score").as("score"))
    val wSrc = Window.partitionBy("src")
      .orderBy(col("score").desc, col("dst").asc)
    val topM = pairs.withColumn("rn", row_number().over(wSrc))
      .filter(col("rn") <= m).select("src", "dst", "score")
    val newAdj = topM
      .groupBy(col("src").as("node_id"))
      .agg(sort_array(collect_list(struct(
        (-col("score")).as("neg"), col("dst"))))
        .getField("dst").as("neighbors"))
    // reverse edges into EXISTING nodes: recompute those nodes' rows
    val existingIds = corpus.select(col(idCol).as("id"))
    val rev = topM.join(existingIds.withColumnRenamed("id", "dst"), Seq("dst"))
      .select(col("dst").as("src"), col("src").as("dst"), col("score"))
    val affected = rev.select(col("src").as("node_id")).distinct()
    val cur = readNswAdjacency(spark, path)
      .join(affected, Seq("node_id"))
      .select(col("node_id").as("src"), explode(col("neighbors")).as("dst"))
      .join(nodesAll.select(col("id").as("src"), col("emb").as("src_emb")), Seq("src"))
      .join(nodesAll.select(col("id").as("dst"), col("emb").as("dst_emb")), Seq("dst"))
      .select(col("src"), col("dst"),
        VectorFunctions.cosineUnit(col("src_emb"), col("dst_emb")).as("score"))
    val mergedRows = cur.unionByName(rev)
      .groupBy("src", "dst").agg(max("score").as("score"))
      .withColumn("rn", row_number().over(wSrc))
      .filter(col("rn") <= 2 * m)
      .groupBy(col("src").as("node_id"))
      .agg(sort_array(collect_list(struct(
        (-col("score")).as("neg"), col("dst"))))
        .getField("dst").as("neighbors"))
    val deltaDir = new java.io.File(path + "_delta")
    val nextSeq =
      if (deltaDir.exists())
        spark.read.parquet(path + "_delta")
          .agg(max(col("seq"))).head().getLong(0) + 1L
      else 1L
    newAdj.unionByName(mergedRows)
      .withColumn("seq", lit(nextSeq))
      .repartition(2, col("node_id"))
      .write.mode("append").parquet(path + "_delta")
  }

  /** Deterministic entry points: the E graph ids with the smallest
    * xxhash64 — a fixed, query-independent sample (catalog-scale read of
    * id + hash only).
    */
  private def entryPoints(spark: SparkSession, adj: DataFrame, e: Int): Seq[Long] =
    adj.select(col("node_id"), xxhash64(col("node_id")).as("h"))
      .orderBy(col("h").asc, col("node_id").asc).limit(e)
      .collect().map(_.getLong(0)).toIndexedSeq // serving-path: E rows

  /** Beam search over the persisted graph: H hops, global beam B.
    * `corpus` supplies (idCol, embCol) for scoring — at scale the same
    * table the graph indexes, fetched by pushed id IN point lookups.
    * Returns (idCol, score) rows for the k best visited, exact-scored.
    */
  def nswSearch(spark: SparkSession, path: String, corpus: DataFrame,
      embCol: String, idCol: String, queryVec: Array[Float], k: Int,
      beam: Int = 32, hops: Int = 4, entries: Int = 16): DataFrame = {
    import spark.implicits._
    def scoreOf(ids: Seq[Long]): Map[Long, Double] =
      if (ids.isEmpty) Map.empty
      else corpus.filter(col(idCol).isin(ids: _*)) // pushed point lookup
        .select(col(idCol),
          VectorFunctions.cosineUnit(col(embCol), typedlit(queryVec.toSeq)))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // no cache: the frontier isin filter is on the merge's GROUPING key,
    // so Catalyst pushes it below the latest-wins aggregate into both the
    // base and delta scans — each hop reads only the frontier's rows
    val adj = readNswAdjacency(spark, path)
    var visited = scoreOf(entryPoints(spark, adj, entries)) // ≤ E entries
    var expanded = Set.empty[Long]
    var hop = 0
    while (hop < hops) {
      // frontier: the beam-best visited nodes not yet expanded
      val frontier = visited.toSeq
        .sortBy { case (id, s) => (-s, id) }.take(beam)
        .map(_._1).filterNot(expanded.contains)
      if (frontier.isEmpty) hop = hops
      else {
        val nbrs = adj.filter(col("node_id").isin(frontier: _*))
          .select(explode(col("neighbors")).as("id")).distinct()
          .collect().map(_.getLong(0)) // ≤ B·2M rows per hop
          .filterNot(visited.contains)
        visited ++= scoreOf(nbrs.toIndexedSeq)
        expanded ++= frontier
        hop += 1
      }
    }
    visited.toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
      .map { case (id, s) =>
        (id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .toDF(idCol, "score")
      .orderBy(col("score").desc, col(idCol).asc)
  }
}
