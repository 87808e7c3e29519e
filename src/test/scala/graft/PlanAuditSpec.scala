package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Plan-shape audit: the properties that make these queries survive a
  * 100 TB scale-up — filters reaching the parquet scan, scans reading only
  * referenced columns, no accidental cartesian products, AQE enabled.
  */
class PlanAuditSpec extends SparkSpec {

  // sparkPlan, not executedPlan: AQE wraps execution in
  // AdaptiveSparkPlanExec whose children are not visible to collect()
  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }

  test("predicate pushdown: q1 shipdate filter reaches the lineitem scan") {
    val s = scans(SparkEntry.queries("q1_pricing_summary")(spark, sf))
    assert(s.nonEmpty)
    val pushed = s.head.metadata("PushedFilters")
    assert(pushed.contains("LessThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed: $pushed")
  }

  test("column pruning: dedup_exact reads only doc_id and text") {
    val s = scans(SparkEntry.queries("dedup_exact")(spark, sf))
    val cols = s.head.requiredSchema.fieldNames.toSet
    assert(cols === Set("doc_id", "text"),
      s"scan reads more than needed: $cols")
  }

  test("column pruning: knn_exact_topk never reads the label column") {
    val all = scans(SparkEntry.queries("knn_exact_topk")(spark, sf))
    all.foreach { s =>
      assert(!s.requiredSchema.fieldNames.contains("label"),
        s"label read but unused: ${s.requiredSchema.fieldNames.mkString(",")}")
    }
  }

  test("pushdown: vec_id point filter reaches the embeddings scan") {
    val s = scans(SparkEntry.queries("knn_exact_topk")(spark, sf))
    val pushed = s.map(_.metadata("PushedFilters")).mkString(" ")
    assert(pushed.contains("EqualTo(vec_id,0)"), s"point filter not pushed: $pushed")
  }

  test("no real cartesian products: query-vector joins are broadcast, 1-row side") {
    // the only cross joins in the surface broadcast a <=10-row query side
    val plan = SparkEntry.queries("knn_batch_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query-side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "a CartesianProduct here would shuffle the corpus against itself")
  }

  test("byte-BPE pair stats aggregate partially before the exchange and never shuffle text") {
    // the one corpus-scale stage of byte tokenizer training: pre-token
    // counts must collapse map-side (HashAggregate before the first
    // Exchange), and nothing wider than the pre-token strings crosses it
    val plan = SparkEntry.queries("bpe_pair_counts")(spark, sf)
      .queryExecution.executedPlan.toString
    val firstHashAgg = plan.indexOf("HashAggregate")
    val firstExchange = plan.indexOf("Exchange")
    assert(firstHashAgg >= 0 && firstExchange >= 0 &&
      firstHashAgg < firstExchange,
      s"pair counts must partial-aggregate before the shuffle:\n$plan")
  }

  test("aggregations are partial (map-side combine before the exchange)") {
    val plan = SparkEntry.queries("events_hourly")(spark, sf)
      .queryExecution.executedPlan.toString
    val firstHashAgg = plan.indexOf("HashAggregate")
    val firstExchange = plan.indexOf("Exchange")
    assert(firstHashAgg >= 0 && firstExchange >= 0)
    // plan prints top-down: final agg, exchange, partial agg — a partial
    // HashAggregate must appear BELOW (after) the exchange in the tree
    assert(plan.lastIndexOf("HashAggregate") > firstExchange,
      s"no partial aggregate below the exchange:\n$plan")
  }

  test("AQE is on in the test session (runtime re-planning at scale)") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
  }

  test("column pruning: lang_id and doc_fingerprints read only doc_id and text") {
    // doc_fingerprints the raw projection (the driver row is now its gate)
    val frames = Seq(
      "lang_id" -> SparkEntry.queries("lang_id")(spark, sf),
      "doc_fingerprints" -> ops.TextAnalysis.docFingerprints(spark, sf))
    frames.foreach { case (q, df) =>
      val s = scans(df)
      val cols = s.head.requiredSchema.fieldNames.toSet
      assert(cols === Set("doc_id", "text"), s"$q scan reads more than needed: $cols")
    }
  }

  test("rerank_zip: the count guard broadcasts, candidate top-k is TakeOrdered") {
    val plan = SparkEntry.queries("rerank_zip")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"candidate stage should plan a top-k, not a global sort:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the 1-row count guard must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), "count guard must not shuffle-cartesian")
  }

  test("planted near-dup joins stay equi-joins (never all-pairs)") {
    Seq("simhash_planted_dupes", "fingerprint_planted_containment",
      "lsh_planted_near_dupes").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$q candidate generation must be a hash equi-join:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
        plan.contains("BroadcastHashJoin"), s"$q expected a hash/merge equi-join:\n$plan")
    }
  }

  test("minhash near-dup: only compact keys shuffle, text never does") {
    val df = ops.Dedup.minhashNearDupesQ(spark, sf)
    val exchanges = df.queryExecution.sparkPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges.foreach { e =>
      val shuffled = e.child.output.map(_.name).toSet
      assert(!shuffled.contains("text"),
        s"document text crossed an exchange: ${shuffled.mkString(",")}")
    }
  }

  test("temporal video near-dup: payloads never cross an exchange, only frame hashes do") {
    // AQE off so executedPlan carries the real Exchange nodes (sparkPlan
    // predates EnsureRequirements and shows none). BOTH exchange kinds
    // are audited: at test scale the band self-join broadcasts, at
    // 100 TB it shuffles — no exchange of either kind may carry the
    // binary payload column.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("video_phash_near_dupes")(spark, sf)
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }
      assert(exchanges.nonEmpty,
        "the band join must exchange SOMETHING (hashes)")
      exchanges.foreach { e =>
        val moved = e.child.output.map(_.name).toSet
        assert(!moved.contains("content"),
          s"a video payload crossed an exchange: ${moved.mkString(",")}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("bucketed tables co-locate: the fact-fact join plans with zero exchanges") {
    // The 100 TB answer to the orders⋈lineitem shuffle: write both sides
    // bucketed+sorted on the join key, and the sort-merge join reads
    // co-located buckets with NO Exchange on either side.
    val wh = java.nio.file.Files.createTempDirectory("bucketed").toString
    val orders = Tables.orders(spark, sf)
    val lineitem = Tables.lineitem(spark, sf)
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").mode("overwrite").saveAsTable("orders_b")
    lineitem.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").mode("overwrite").saveAsTable("lineitem_b")
    try {
      val joined = spark.table("orders_b").join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      // disable broadcast so the join strategy is genuinely sort-merge
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        // String check, not .collect{ShuffleExchangeExec}: under AQE the
        // executed plan is an AdaptiveSparkPlanExec LEAF, so collect never
        // descends and an exchange-bearing plan would pass vacuously.
        val planStr = joined.queryExecution.executedPlan.toString
        assert(planStr.contains("SortMergeJoin"), s"expected SMJ:\n$planStr")
        assert(!planStr.contains("Exchange"),
          s"bucketed join still shuffles:\n$planStr")
        assert(joined.count() === lineitem.count()) // every lineitem has its order
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("persisted LSH index: probe filter becomes partition pruning at the scan") {
    val df = SparkEntry.queries("ann_lsh_index_topk")(spark, sf)
    val s = scans(df)
    assert(s.nonEmpty)
    val partFilters = s.head.partitionFilters.mkString(" ")
    assert(partFilters.contains("bucket"),
      s"probe set must prune bucket partitions, got: $partFilters")
    // pruned scan must NOT read the bucket column as data (it's a
    // partition key) nor carry a data-level bucket filter
    assert(!s.head.requiredSchema.fieldNames.contains("bucket"),
      "bucket must be a partition column, not data")
  }

  test("mmr_rerank_indexed: candidate generation partition-prunes on probe buckets") {
    val cand = ops.VectorSearch.mmrIndexedCandidates(spark, sf)
    // the index scan (bucket partition column) must carry partition
    // filters — the serving path reads probe directories, not the corpus
    val idxScan = scans(cand).find(_.relation.partitionSchema.fieldNames.contains("bucket"))
    assert(idxScan.isDefined, "no bucket-partitioned scan in the candidate plan")
    val partFilters = idxScan.get.partitionFilters.mkString(" ")
    assert(partFilters.contains("bucket"),
      s"probe set must prune bucket partitions, got: $partFilters")
    assert(!idxScan.get.requiredSchema.fieldNames.contains("bucket"),
      "bucket must be a partition column, not data")
  }

  test("hybrid_weighted_indexed: semantic side partition-prunes on probe buckets") {
    val sem = ops.Rag.semIndexedTop(spark, sf)
    val idxScan = scans(sem).find(_.relation.partitionSchema.fieldNames.contains("bucket"))
    assert(idxScan.isDefined, "no bucket-partitioned scan in the semantic plan")
    val partFilters = idxScan.get.partitionFilters.mkString(" ")
    assert(partFilters.contains("bucket"),
      s"probe set must prune bucket partitions, got: $partFilters")
  }

  test("pre-quantized index: the coarse scan reads codes only, no float column") {
    val dir = java.nio.file.Files.createTempDirectory("qindex_audit").toString
    graft.vector.Quantization.buildQuantizedIndex(
      Tables.embeddings(spark, sf), "embedding", dir)
    val index = spark.read.parquet(dir)
    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    // the cutoff branch of quantizedKnn: coarse scores projected alone
    val coarse = graft.vector.Quantization.coarseScores(index, qv).select("q_score")
    val cols = scans(coarse).head.requiredSchema.fieldNames.toSet
    assert(cols === Set("q_scale", "q_codes"),
      s"coarse pass must read only the quantized columns, got: $cols")
  }

  test("persisted IVF-SQ8 index: partition-pruned probe scan, codes-only coarse branch") {
    val dir = java.nio.file.Files.createTempDirectory("sq8idx_audit").toString + "/idx"
    graft.vector.Quantization.buildIvfSq8Index(
      Tables.embeddings(spark, sf), "embedding", numClusters = 16, seed = 42L, dir)
    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    val probes = graft.vector.IndexBuilder.nearestClusters(
      graft.vector.IndexBuilder.loadIvfCentroids(dir), qv, 6)
    val pruned = spark.read.parquet(dir)
      .filter(col("cluster_id").isin(probes: _*))
    val physical = pruned.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
      !physical.contains("PartitionFilters: []"),
      s"cluster filter must partition-prune:\n$physical")
    val coarse = graft.vector.Quantization.coarseScores(pruned, qv).select("q_score")
    val cols = scans(coarse).head.requiredSchema.fieldNames.toSet
    assert(cols === Set("q_scale", "q_codes"),
      s"stored-codes coarse pass must not read floats, got: $cols")
  }

  test("ivf-pq delete: tombstones are excluded BEFORE the overscan cutoff") {
    // the pre-filter placement is semantics, not just perf: with a tight
    // overscan the coarse cutoff is taken over the top-(k·overscan) ADC
    // scores, and if DELETED rows still occupied those slots (post-filter
    // implementation) the emitted set shrinks below k. Delete the true
    // ADC-top neighbors and pin that k results still come back — a plan
    // reorder can push the cutoff filter around freely (the optimizer
    // does), but the cutoff VALUE must be computed from live rows only.
    val dir = java.nio.file.Files.createTempDirectory("pqdel_audit").toString + "/idx"
    graft.vector.ProductQuantization.buildIvfPqIndex(
      Tables.embeddings(spark, sf), "embedding", numClusters = 16, seed = 42L, dir)
    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    val books = graft.vector.ProductQuantization.loadPqCodebooks(dir)
    val index = spark.read.parquet(dir)
    def topIds(frame: org.apache.spark.sql.DataFrame, k: Int, overscan: Int) =
      graft.vector.ProductQuantization.pqSearchEncoded(
        frame, "embedding", "vec_id", books, qv, k, overscan)
        .collect().map(_.getLong(0)).toSeq
    // the 4 best non-self answers under the full stack become tombstones
    val doomed = topIds(index, 5, 16).filter(_ != 0L).take(4)
    import spark.implicits._
    doomed.toDF("vec_id").write.mode("overwrite").parquet(dir + "_tomb")
    val live = index.join(broadcast(spark.read.parquet(dir + "_tomb")),
      Seq("vec_id"), "left_anti")
    val got = topIds(live, 5, overscan = 1)
    assert(got.length === 5,
      s"deleted rows consumed overscan slots (post-filter bug): $got")
    assert(got.intersect(doomed).isEmpty, s"served a deleted row: $got")
  }

  test("ivf-sq8 delete: tombstones are excluded BEFORE the quantized cutoff") {
    // same semantics pin as the PQ test: the tie-inclusive quantized
    // cutoff must be computed over LIVE rows only — with overscan 1, a
    // post-filter implementation would let deleted rows eat the coarse
    // slots and shrink the emitted set below k
    val dir = java.nio.file.Files.createTempDirectory("sq8del_audit").toString + "/idx"
    graft.vector.Quantization.buildIvfSq8Index(
      Tables.embeddings(spark, sf), "embedding", numClusters = 16, seed = 42L, dir)
    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    val index = spark.read.parquet(dir)
    def topIds(frame: org.apache.spark.sql.DataFrame, k: Int, overscan: Int) =
      graft.vector.Quantization.quantizedKnn(
        frame, "embedding", "vec_id", qv, k, overscan)
        .collect().map(_.getLong(0)).toSeq
    val doomed = topIds(index, 5, 16).filter(_ != 0L).take(4)
    import spark.implicits._
    doomed.toDF("vec_id").write.mode("overwrite").parquet(dir + "_tomb")
    val live = index.join(broadcast(spark.read.parquet(dir + "_tomb")),
      Seq("vec_id"), "left_anti")
    val got = topIds(live, 5, overscan = 1)
    assert(got.length === 5,
      s"deleted rows consumed quantized-cutoff slots (post-filter bug): $got")
    assert(got.intersect(doomed).isEmpty, s"served a deleted row: $got")
  }

  test("graph walks never leak serving confs into the caller's session") {
    // walks run on a dedicated cloned session (AQE off, 8 shuffle
    // partitions); the caller's session must keep its own confs DURING
    // and after a walk — the set/restore-on-shared-session design this
    // replaced leaked them to concurrent queries
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val dir = java.nio.file.Files.createTempDirectory("walkconf_audit").toString + "/g"
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    graft.vector.GraphAnn.buildNswGraph(
      e, "embedding", "vec_id", graft.ops.AnnIndex.defaultLsh, m = 8, dir)
    val qv = e.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    val got = graft.vector.GraphAnn.nswSearch(
      spark, dir, e, "embedding", "vec_id", qv, k = 5).collect()
    assert(got.nonEmpty)
    assert(spark.conf.get("spark.sql.adaptive.enabled") === aqeBefore,
      "walk leaked AQE conf into the caller's session")
    assert(spark.conf.get("spark.sql.shuffle.partitions") === partsBefore,
      "walk leaked shuffle partitions into the caller's session")
  }

  test("quality filters: line_filter_c4 and pii_redaction plan zero exchanges") {
    // pure narrow projections — the 100 TB contract is no shuffle at all
    // (the final orderBy is presentation-only; audit the pre-sort plan)
    Seq("line_filter_c4", "pii_redaction").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      // executedPlan: exchanges exist only after EnsureRequirements
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange (?!SinglePartition)".r.findAllIn(plan)
        .count(_ => true)
      // one rangepartitioning exchange for the output orderBy is allowed;
      // nothing else may shuffle
      assert(exchanges <= 1, s"$q shuffles beyond the output sort:\n$plan")
    }
  }

  test("repetition_metrics: doc-local metrics, one range exchange, scan prunes to doc_id+text") {
    // r21: the bigram explode → count → max → join pipeline became ONE
    // per-row sorted-run-length HOF (the max bigram multiplicity is
    // doc-local), so the ONLY exchange left is the output range sort —
    // no corpus-bigram-scale shuffle, no aggregate, no join.
    val df = SparkEntry.queries("repetition_metrics")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length === 1,
      s"repetition_metrics must shuffle only for the output order:\n$plan")
    assert(plan.contains("rangepartitioning(doc_id"),
      s"the one exchange must be the doc_id range sort:\n$plan")
    assert(!plan.contains("HashAggregate") && !plan.contains("SortMergeJoin"),
      s"bigram stats must stay doc-local (no agg/join):\n$plan")
    val cols = scans(df).map(_.requiredSchema.fieldNames.toSet)
    cols.foreach(c => assert(c.subsetOf(Set("doc_id", "text")),
      s"repetition scan reads more than needed: $c"))
  }

  test("url_domains and pack_sequences: partial aggs / single window exchange") {
    val ud = SparkEntry.queries("url_domains")(spark, sf)
      .queryExecution.executedPlan.toString
    val firstExchange = ud.indexOf("Exchange")
    assert(firstExchange >= 0 && ud.lastIndexOf("HashAggregate") > firstExchange,
      s"url_domains: no partial aggregate below the exchange:\n$ud")
    val ps = SparkEntry.queries("pack_sequences")(spark, sf)
      .queryExecution.executedPlan.toString
    // one hashpartitioning exchange feeds the window; the rest is the
    // presentation sort
    assert("Exchange hashpartitioning".r.findAllIn(ps).length === 1,
      s"pack_sequences must shuffle exactly once for the window:\n$ps")
  }

  test("interactive_replay: context reuse broadcasts, turns are TakeOrdered") {
    val plan = SparkEntry.queries("interactive_replay")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"turn-2 context must broadcast its single row:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"per-turn top-k must plan TakeOrdered, not a full sort:\n$plan")
  }

  test("corpus_curation evaluates the fused metrics UDF exactly once per row") {
    // Regression guard: filter pushdown once substituted the struct fields
    // and evaluated the UDF (and its tokenize) SEVEN times per row; the
    // UDF is non-deterministic-flagged precisely to prevent that.
    val plan = SparkEntry.queries("corpus_curation")(spark, sf)
      .queryExecution.sparkPlan.toString
    val calls = "UDF\\(".r.findAllIn(plan).length
    assert(calls === 1, s"expected exactly 1 UDF call in the plan, got $calls:\n$plan")
  }

  test("range_layout_scan: day filter prunes partitions, one file per day") {
    // materialize the layout, then audit the read side
    SparkEntry.queries("range_layout_scan")(spark, sf).collect()
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_daylayout_" + Integer.toHexString(sf.hashCode)).getAbsolutePath
    val s = scans(graft.ops.Relational.rangeLayoutRead(spark, path))
    assert(s.nonEmpty)
    val partFilters = s.head.partitionFilters.mkString(" ")
    assert(partFilters.contains("day_id"),
      s"date range must prune day partitions, got: $partFilters")
    assert(!s.head.requiredSchema.fieldNames.contains("day_id"),
      "day_id must be a partition column, not data")
    // repartition(day_id) before the write: each day dir holds ONE part file
    val dayDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day_id="))
    assert(dayDirs.length === 30, s"expected 30 day partitions, ${dayDirs.length}")
    dayDirs.foreach { d =>
      val parts = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(parts === 1, s"${d.getName}: $parts part files (small-files leak)")
    }
  }

  test("pagerank: dimension sides broadcast; lineitem scan is pruned to 2 columns") {
    val plan = SparkEntry.queries("pagerank_nations")(spark, sf)
      .queryExecution.sparkPlan
    // the final nation join must broadcast the 25-row dim
    assert(plan.toString.contains("BroadcastHashJoin"),
      s"nation join should broadcast:\n$plan")
  }

  test("surprisal_scores: documents scan reads only doc_id and text") {
    val s = scans(SparkEntry.queries("surprisal_scores")(spark, sf))
    assert(s.nonEmpty)
    assert(s.head.requiredSchema.fieldNames.toSet === Set("doc_id", "text"),
      s"read: ${s.head.requiredSchema.fieldNames.mkString(",")}")
  }

  test("grouped_topk_native: orders scan reads only the 3 needed columns") {
    val s = scans(SparkEntry.queries("grouped_topk_native")(spark, sf))
    assert(s.head.requiredSchema.fieldNames.toSet ===
      Set("o_orderpriority", "o_totalprice", "o_orderkey"))
  }

  test("linkage_pairs: customer scan never reads c_acctbal") {
    val s = scans(graft.ops.Linkage.linkagePairs(spark, sf))
    s.foreach { sc =>
      assert(!sc.requiredSchema.fieldNames.contains("c_acctbal"),
        s"unused column read: ${sc.requiredSchema.fieldNames.mkString(",")}")
    }
  }

  test("salted_source_join: shuffle join on (source, salt), never broadcast") {
    val plan = SparkEntry.queries("salted_source_join")(spark, sf)
      .queryExecution.sparkPlan
    val planStr = plan.toString
    assert(planStr.contains("ShuffledHashJoin"),
      s"salting targets the shuffle join; plan was:\n$planStr")
    assert(!planStr.contains("BroadcastHashJoin"),
      "a broadcast would defeat the skew-spread demonstration")
    val joinKeys = plan.collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        j.leftKeys.map(_.sql).mkString(",")
    }
    assert(joinKeys.exists(k => k.contains("salt") && k.contains("source")),
      s"salt must be part of the join key: $joinKeys")
  }

  test("streaming-staged roots: probe scans partition-prune across batch directories") {
    // the batch=<id>/bucket=<b> layout must keep the probe-pruning
    // guarantee of the flat index: a bucket filter prunes matching
    // bucket dirs under EVERY batch leaf, and neither partition column
    // is read as data
    val root = java.nio.file.Files.createTempDirectory("streamroot_audit").toString + "/idx"
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    graft.vector.IndexBuilder.stageLshBatch(
      e.filter(col("vec_id") < 200L), "embedding", graft.ops.AnnIndex.defaultLsh, root, 0L)
    graft.vector.IndexBuilder.stageLshBatch(
      e.filter(col("vec_id") >= 200L && col("vec_id") < 300L),
      "embedding", graft.ops.AnnIndex.defaultLsh, root, 1L)
    val probed = spark.read.parquet(root).filter(col("bucket").isin(1, 2, 3))
    val s = scans(probed)
    assert(s.nonEmpty)
    val partFilters = s.head.partitionFilters.mkString(" ")
    assert(partFilters.contains("bucket"),
      s"bucket filter must prune partitions across batches, got: $partFilters")
    assert(!s.head.requiredSchema.fieldNames.contains("bucket") &&
      !s.head.requiredSchema.fieldNames.contains("batch"),
      "bucket/batch must stay partition columns, not data")
  }

  test("batched IVF-PQ serving: the coarse window input excludes the float column") {
    // the batch path must keep the per-query persisted path's codes-only
    // guarantee: the scan feeding the ADC explode + rank window reads
    // pq_codes (+ id), never the embedding column — floats enter only on
    // the bounded-survivor broadcast-join scan
    val dir = java.nio.file.Files.createTempDirectory("pqbatch_audit").toString + "/idx"
    graft.vector.ProductQuantization.buildIvfPqIndex(
      Tables.embeddings(spark, sf), "embedding", numClusters = 16, seed = 42L, dir)
    val qs = Tables.embeddings(spark, sf).filter(col("vec_id") < 3L)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val df = graft.vector.ProductQuantization.ivfPqBatchIndexTopK(
      spark, dir, "embedding", "vec_id", qs, k = 5, nProbe = 6)
    val idxScans = scans(df).map(_.requiredSchema.fieldNames.toSet)
      .filter(c => c.contains("pq_codes") || c.contains("embedding"))
    val coarse = idxScans.filter(_.contains("pq_codes"))
    assert(coarse.nonEmpty, s"no codes scan in the batch plan: $idxScans")
    coarse.foreach(c => assert(!c.contains("embedding"),
      s"batch coarse pass leaks the float column: $c"))
    assert(idxScans.exists(c => c.contains("embedding") && !c.contains("pq_codes")),
      s"rescore scan should fetch floats without codes: $idxScans")
    assert(df.count() === 15, "3 queries x k=5")
  }

  test("batched IVF-SQ8 serving: the coarse window input excludes the float column") {
    val dir = java.nio.file.Files.createTempDirectory("sq8batch_audit").toString + "/idx"
    graft.vector.Quantization.buildIvfSq8Index(
      Tables.embeddings(spark, sf), "embedding", numClusters = 16, seed = 42L, dir)
    val qs = Tables.embeddings(spark, sf).filter(col("vec_id") < 3L)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val df = graft.vector.Quantization.ivfSq8BatchIndexTopK(
      spark, dir, "embedding", "vec_id", qs, k = 5, nProbe = 6)
    val idxScans = scans(df).map(_.requiredSchema.fieldNames.toSet)
      .filter(c => c.contains("q_codes") || c.contains("embedding"))
    val coarse = idxScans.filter(_.contains("q_codes"))
    assert(coarse.nonEmpty, s"no codes scan in the batch plan: $idxScans")
    coarse.foreach(c => assert(!c.contains("embedding"),
      s"batch coarse pass leaks the float column: $c"))
    assert(idxScans.exists(c => c.contains("embedding") && !c.contains("q_codes")),
      s"rescore scan should fetch floats without codes: $idxScans")
    assert(df.count() === 15, "3 queries x k=5")
  }

  test("forget ledger exclusion is a broadcast anti-join: the corpus never shuffles for it") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // warm the fixture+ledger, then audit: every LeftAnti in the plan is
    // broadcast (the ledger is KB-scale), so the exclusion adds no
    // exchange to any surface — the property that keeps forget O(ids)
    val df = SparkEntry.queries("forget_propagated_topk")(spark, sf)
    df.collect()
    val antis = df.queryExecution.sparkPlan.collect {
      case j if j.nodeName.contains("Join") &&
        j.toString.contains("LeftAnti") => j
    }
    assert(antis.nonEmpty, "the serve must carry the ledger anti-join")
    antis.foreach(j => assert(j.isInstanceOf[BroadcastHashJoinExec],
      s"ledger exclusion must broadcast, got ${j.nodeName}"))
  }

  test("maxsim posting probe partition-prunes after compaction too") {
    SparkEntry.queries("maxsim_compacted_topk")(spark, sf).collect()
    val path = Tables.scratchPath("maxsim_postings_cmp", sf)
    val probe = spark.read.parquet(path).filter(col("wb").isin(0, 1))
    val s = scans(probe)
    assert(s.nonEmpty && s.head.metadata("PartitionFilters").contains("wb"),
      "compaction must preserve the wb= partition layout the probe prunes on")
  }

  test("bpe_pair_counts: partial agg collapses pairs before the exchange; top-k is TakeOrdered") {
    val plan = SparkEntry.queries("bpe_pair_counts")(spark, sf)
      .queryExecution.executedPlan.toString
    val firstExchange = plan.indexOf("Exchange")
    assert(firstExchange >= 0 &&
      plan.lastIndexOf("HashAggregate") > firstExchange,
      s"pair counting must partial-aggregate map-side (the key space is " +
        s"alphabet-bounded; shipping raw pairs would ship the corpus):\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the top-20 must be a TakeOrdered, never a global sort:\n$plan")
  }

  test("text_normalize: only the oracle's output-order exchange — the normalize stage is a pure map") {
    // AQE off so executedPlan carries real Exchange nodes — collect on
    // the AdaptiveSparkPlanExec leaf never descends and would pass
    // vacuously (the temporal-video audit's documented hazard)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("text_normalize")(spark, sf)
        .queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty,
        "the output-order witness must plan its range exchange")
      // the final orderBy("doc_id") (the oracle's row-order witness)
      // plans ONE rangepartitioning exchange; any hashpartitioning
      // exchange means an agg/join leaked into the pure-map stage
      exchanges.foreach(e => assert(
        e.outputPartitioning.toString.toLowerCase.contains("range"),
        s"normalize+clean must be a pure map — non-range exchange:\n$plan"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("dataset_shuffle_shards: one hash exchange on the shard key feeds the rank window") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("dataset_shuffle_shards")(spark, sf)
        .queryExecution.executedPlan
      val all = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(all.nonEmpty, "the rank window must plan its shard exchange")
      val hashEx = all.filter(
        _.outputPartitioning.toString.toLowerCase.contains("hash"))
      assert(hashEx.size <= 1,
        s"the epoch shuffle must shuffle ONCE (by shard):\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
