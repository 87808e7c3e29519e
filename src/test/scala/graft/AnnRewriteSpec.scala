package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{AnnRewriteRule, GraftExtensions}
import graft.vector.{IndexBuilder, VectorFunctions}
import graft.vector.IndexBuilder.RandomHyperplaneLsh

/** The opt-in ANN optimizer rewrite: ORDER BY graft_dot(emb, qvec) DESC
  * LIMIT k over a bucket-carrying plan becomes a multi-probe bucket-pruned
  * scan (partition pruning on a partitioned index table).
  */
class AnnRewriteSpec extends SparkSpec {

  GraftExtensions.register(spark)

  private val nBits = 6
  private val seed = 42L
  private val lsh = new RandomHyperplaneLsh(64, nBits, seed)

  private def corpus: DataFrame = Tables.embeddings(spark, sf)

  private lazy val qvec: Array[Float] = corpus
    .filter(col("vec_id") === 0L)
    .select("embedding").head().getSeq[Float](0).toArray

  private def knnQuery(indexed: DataFrame, k: Int = 10): DataFrame =
    indexed
      .withColumn("score",
        round(VectorFunctions.cosineUnit(col("embedding"), typedlit(qvec.toSeq)), 6))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)

  private def withAnnRewrite(radius: Int = 1)(body: => Unit): Unit = {
    spark.conf.set(AnnRewriteRule.EnabledKey, "true")
    spark.conf.set(AnnRewriteRule.NBitsKey, nBits.toString)
    spark.conf.set(AnnRewriteRule.SeedKey, seed.toString)
    spark.conf.set(AnnRewriteRule.RadiusKey, radius.toString)
    try body
    finally spark.conf.set(AnnRewriteRule.EnabledKey, "false")
  }

  private def optimizedPlan(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private val BucketIn = """bucket#\d+ IN \(""".r

  test("off by default: the k-NN plan keeps its full scan") {
    val plan = optimizedPlan(knnQuery(
      IndexBuilder.withLshBucket(corpus, "embedding", lsh)))
    assert(BucketIn.findFirstIn(plan).isEmpty, s"unexpected rewrite:\n$plan")
  }

  test("enabled: bucket IN filter is injected and matches lshTopK exactly") {
    withAnnRewrite(radius = 1) {
      val indexed = IndexBuilder.withLshBucket(corpus, "embedding", lsh)
      val df = knnQuery(indexed)
      val plan = optimizedPlan(df)
      assert(BucketIn.findFirstIn(plan).isDefined, s"no bucket filter injected:\n$plan")
      // identical semantics to the hand-written pruned path
      val expected = IndexBuilder
        .lshTopK(corpus, "embedding", "vec_id", lsh, qvec, k = 10, radius = 1)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
      val got = df.collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
      assert(got === expected)
    }
  }

  test("enabled: top-1 self-match survives pruning (query's own bucket probed)") {
    withAnnRewrite() {
      val indexed = IndexBuilder.withLshBucket(corpus, "embedding", lsh)
      val top = knnQuery(indexed, k = 1).select("vec_id").head().getLong(0)
      assert(top === 0L) // cosine(q, q) = 1.0 is unbeatable
    }
  }

  test("malformed conf values disable the rewrite instead of breaking queries") {
    spark.conf.set(AnnRewriteRule.EnabledKey, "true")
    spark.conf.set(AnnRewriteRule.NBitsKey, "not-a-number")
    try {
      val indexed = IndexBuilder.withLshBucket(corpus, "embedding", lsh)
      val df = knnQuery(indexed)
      assert(BucketIn.findFirstIn(optimizedPlan(df)).isEmpty)
      assert(df.count() === 10) // and unrelated queries still run
      assert(corpus.count() > 0)
    } finally {
      spark.conf.set(AnnRewriteRule.EnabledKey, "false")
      spark.conf.set(AnnRewriteRule.NBitsKey, nBits.toString)
    }
  }

  test("enabled: a sort without a literal query vector is left alone") {
    withAnnRewrite() {
      val indexed = IndexBuilder.withLshBucket(corpus, "embedding", lsh)
      // sort on a non-dot column
      val p1 = optimizedPlan(indexed.orderBy(col("vec_id").desc).limit(5))
      assert(BucketIn.findFirstIn(p1).isEmpty, s"false-positive rewrite:\n$p1")
      // dot of two column references (no literal to derive a probe set from)
      val p2 = optimizedPlan(indexed
        .withColumn("score", VectorFunctions.cosineUnit(col("embedding"), col("embedding")))
        .orderBy(col("score").desc).limit(5))
      assert(BucketIn.findFirstIn(p2).isEmpty, s"false-positive rewrite:\n$p2")
      // a DECREASING function of the dot (a distance): descending sort means
      // farthest-first — pruning to near buckets would invert the semantics
      val p3 = optimizedPlan(indexed
        .withColumn("dist", lit(1.0) -
          VectorFunctions.cosineUnit(col("embedding"), typedlit(qvec.toSeq)))
        .orderBy(col("dist").desc, col("vec_id").asc).limit(5))
      assert(BucketIn.findFirstIn(p3).isEmpty, s"farthest-first query was rewritten:\n$p3")
      // but a monotonic affine transform of the dot still rewrites
      val p4 = optimizedPlan(indexed
        .withColumn("relevance", (VectorFunctions.cosineUnit(col("embedding"),
          typedlit(qvec.toSeq)) + lit(1.0)) / lit(2.0))
        .orderBy(col("relevance").desc, col("vec_id").asc).limit(5))
      assert(BucketIn.findFirstIn(p4).isDefined, s"monotonic score not rewritten:\n$p4")
    }
  }

  test("enabled: rewrite is idempotent over an already-pruned plan") {
    withAnnRewrite() {
      val indexed = IndexBuilder.withLshBucket(corpus, "embedding", lsh)
      val handPruned = knnQuery(
        indexed.filter(col("bucket").isin(lsh.probes(lsh.signature(qvec.toSeq), 1): _*)))
      val plan = optimizedPlan(handPruned)
      // exactly one bucket membership predicate, not a stacked second one
      val hits = "bucket".r.findAllIn(plan).length
      assert(hits >= 1 && plan.split("Filter").length <= 3, s"stacked filters:\n$plan")
    }
  }

  test("contains rewrite: the armed plan carries the posting-gate semi-join; off by default; answers match the plain scan") {
    import org.apache.spark.sql.graft.{ContainsRewriteRule => C}
    import graft.ops.{VectorSearch => VS}
    // run the driver row once: it builds BOTH fixtures (corpus parquet +
    // posting index) and proves the oracle answer end-to-end
    SparkEntry.queries("knn_where_contains_rewritten")(spark, sf).collect()
    val corpusPath = VS.whereContainsRuleCorpus(spark, sf)
    val naive = VS.whereContainsRuleUserQuery(spark, corpusPath)
    // OFF by default: no join anywhere in the naive plan
    val coldPlan = naive.queryExecution.optimizedPlan.toString
    assert(!coldPlan.contains("Join"),
      s"the rule must be opt-in; disarmed plan grew a join:\n$coldPlan")
    val want = naive.select("doc_id").collect().map(_.getLong(0)).toSet
    val postingsPath = Tables.scratchPath("trigram_postings_wc", sf)
    spark.conf.set(C.EnabledKey, "true")
    spark.conf.set(C.SourceKey, corpusPath)
    spark.conf.set(C.PostingsKey, postingsPath)
    try {
      val armed = VS.whereContainsRuleUserQuery(spark, corpusPath)
      val plan = armed.queryExecution.optimizedPlan.toString
      assert(plan.contains("LeftSemi"),
        s"the armed plan must carry the posting-gate semi-join:\n$plan")
      assert(plan.contains("tg"),
        s"the semi-join's right side must be the posting gate:\n$plan")
      // EXACT rewrite: identical rows to the disarmed scan (the verify
      // conjunct stays; the gate is a superset of matches)
      val got = armed.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === want, s"the rewrite changed the answer: $got vs $want")
      // a needle too short for a trigram gate declines, never throws
      val short = spark.read.parquet(corpusPath)
        .filter(col("text").contains("zz"))
      assert(!short.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
        "a sub-trigram needle must decline the rewrite")
      // a scan of a DIFFERENT path never routes (the source contract)
      val other = Tables.documents(spark, sf)
        .select("doc_id", "text").filter(col("text").contains("zzbb"))
      assert(!other.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
        "an unregistered table must not route to a posting index that " +
          "does not cover it")
      // MULTI-NEEDLE conjunct: both clauses gate in ONE aggregation and
      // the injected plan must PLAN AND EXECUTE — a distinct-aggregate
      // formulation built after the planner's distinct rewrite batch
      // would fail physical planning with an internal error here
      val both = spark.read.parquet(corpusPath)
        .filter(col("text").contains("zzaa") && col("text").contains("zzbb"))
      val bothPlan = both.queryExecution.optimizedPlan.toString
      assert(bothPlan.contains("LeftSemi"),
        s"the conjunct must still route:\n$bothPlan")
      val bothIds = both.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(bothIds === (320000L to 320004L).toSet,
        s"the gated conjunct changed the answer: $bothIds")
      // COLUMN GUARD: a contains over a NON-indexed string column of the
      // registered source must not route — the posting gate covers one
      // column, and gating a title filter on text trigrams drops rows
      val spark2 = spark
      import spark2.implicits._
      val twoColPath = java.nio.file.Files
        .createTempDirectory("wcrule_twocol").toString + "/t"
      Seq((1L, "has zzqq here", "nothing"), (2L, "plain", "zzqq in text"))
        .toDF("doc_id", "title", "text")
        .write.mode("overwrite").parquet(twoColPath)
      spark.conf.set(C.SourceKey, twoColPath)
      val titleQ = spark.read.parquet(twoColPath)
        .filter(col("title").contains("zzqq"))
      assert(!titleQ.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
        "a filter on a non-indexed column must never gate on the index")
      assert(titleQ.select("doc_id").collect().map(_.getLong(0)).toSeq
        === Seq(1L), "the unrouted title filter must serve its own rows")
      spark.conf.set(C.SourceKey, corpusPath)
    } finally {
      spark.conf.unset(C.EnabledKey)
      spark.conf.unset(C.SourceKey)
      spark.conf.unset(C.PostingsKey)
    }
  }

  test("contains rewrite OR: a disjunction of contains gates through the ANY-gate; a partial disjunction declines; registry conf routes") {
    import org.apache.spark.sql.graft.{ContainsRewriteRule => C}
    import graft.ops.{VectorSearch => VS}
    // run the driver row once: it builds corpus + lifecycle postings and
    // proves the oracle answer end-to-end (registered via the REGISTRY)
    SparkEntry.queries("knn_where_contains_or_rewritten")(spark, sf).collect()
    val corpusPath = VS.whereContainsAndRuleCorpus(spark, sf)
    val postingsPath = Tables.scratchPath("trigram_postings_wca", sf)
    val naive = VS.whereContainsOrRuleUserQuery(spark, corpusPath)
    assert(!naive.queryExecution.optimizedPlan.toString.contains("Join"),
      "the rule must be opt-in")
    val want = naive.select("doc_id").collect().map(_.getLong(0)).toSet
    spark.conf.set(C.EnabledKey, "true")
    spark.conf.set(C.RegistryKey,
      s"""{"$corpusPath": {"postings": "$postingsPath"}}""")
    try {
      val armed = VS.whereContainsOrRuleUserQuery(spark, corpusPath)
      val plan = armed.queryExecution.optimizedPlan.toString
      assert(plan.contains("LeftSemi"),
        s"the armed OR plan must carry the posting-gate semi-join:\n$plan")
      val got = armed.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === want, s"the OR rewrite changed the answer: $got")
      // B (zzbb) ∪ D (zzcc) — both clauses load-bearing: a gate that
      // dropped either branch loses one whole planted group
      assert((320000L to 320004L).forall(got.contains) &&
        (340000L to 340004L).forall(got.contains),
        s"both OR branches must survive the gate: $got")
      // a disjunction with a NON-gateable branch must decline wholesale:
      // gating only the gateable branch would drop the other's rows
      val partial = spark.read.parquet(corpusPath)
        .filter(col("text").contains("zzbb") || col("text").contains("zz"))
      assert(!partial.queryExecution.optimizedPlan.toString
        .contains("LeftSemi"),
        "a partially-gateable disjunction must stay on the scan route")
      assert(partial.count() > 0L)
    } finally {
      spark.conf.unset(C.EnabledKey)
      spark.conf.unset(C.RegistryKey)
    }
  }

  test("contains rewrite: per-scan idempotency gates BOTH scans of a union of filtered scans") {
    import org.apache.spark.sql.graft.{ContainsRewriteRule => C}
    import graft.ops.{VectorSearch => VS}
    SparkEntry.queries("knn_where_contains_rewritten")(spark, sf).collect()
    val corpusPath = VS.whereContainsRuleCorpus(spark, sf)
    val postingsPath = Tables.scratchPath("trigram_postings_wc", sf)
    spark.conf.set(C.EnabledKey, "true")
    spark.conf.set(C.SourceKey, corpusPath)
    spark.conf.set(C.PostingsKey, postingsPath)
    try {
      // two INDEPENDENT filtered scans of the registered source — the
      // r19 whole-plan guard gated only the first and permanently left
      // the second on the scan route
      val union = spark.read.parquet(corpusPath)
        .filter(col("text").contains("zzaa"))
        .unionByName(spark.read.parquet(corpusPath)
          .filter(col("text").contains("zzbb")))
      val plan = union.queryExecution.optimizedPlan.toString
      val gates = "LeftSemi".r.findAllIn(plan).length
      assert(gates === 2,
        s"both union arms must carry their own posting gate, got $gates:\n$plan")
      // and fixed-point re-entry still cannot stack a second gate on an
      // already-gated scan: counts per arm stay at one
      val ids = union.select("doc_id").collect().map(_.getLong(0))
      // A∪B carry zzaa (10 rows incl. B's 5), B carries zzbb (5 rows)
      assert(ids.length === 15, s"union answer changed: ${ids.length}")
    } finally {
      spark.conf.unset(C.EnabledKey)
      spark.conf.unset(C.SourceKey)
      spark.conf.unset(C.PostingsKey)
    }
  }

  test("contains rewrite registry: two sources route through their OWN postings; a third unregistered source never routes") {
    import org.apache.spark.sql.graft.{ContainsRewriteRule => C}
    import graft.ops.{VectorSearch => VS}
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("wcrule_registry").toString
    def writeCorpus(path: String, token: String): Unit =
      (0L until 20L).map(i =>
          (i, if (i % 4 == 0) s"doc $i with $token marker" else s"doc $i plain"))
        .toDF("doc_id", "text").write.mode("overwrite").parquet(path)
    val (c1, c2, c3) = (s"$base/c1", s"$base/c2", s"$base/c3")
    writeCorpus(c1, "zzqq"); writeCorpus(c2, "zzrr"); writeCorpus(c3, "zzss")
    val (p1, p2) = (s"$base/p1", s"$base/p2")
    VS.trigramPostingsFrame(spark.read.parquet(c1))
      .write.mode("overwrite").parquet(p1)
    VS.trigramPostingsFrame(spark.read.parquet(c2))
      .write.mode("overwrite").parquet(p2)
    spark.conf.set(C.EnabledKey, "true")
    spark.conf.set(C.RegistryKey,
      s"""{"$c1": {"postings": "$p1"}, "$c2": "$p2"}""")
    try {
      def armed(c: String, token: String) =
        spark.read.parquet(c).filter(col("text").contains(token))
      val q1 = armed(c1, "zzqq"); val q2 = armed(c2, "zzrr")
      val (pl1, pl2) = (q1.queryExecution.executedPlan.toString,
        q2.queryExecution.executedPlan.toString)
      assert(pl1.contains("LeftSemi") && pl1.contains(p1) &&
        !pl1.contains(p2),
        s"c1 must gate through ITS posting table p1:\n$pl1")
      assert(pl2.contains("LeftSemi") && pl2.contains(p2) &&
        !pl2.contains(p1),
        s"c2 must gate through ITS posting table p2:\n$pl2")
      assert(q1.select("doc_id").collect().map(_.getLong(0)).sorted
        === Array(0L, 4L, 8L, 12L, 16L))
      assert(q2.select("doc_id").collect().map(_.getLong(0)).sorted
        === Array(0L, 4L, 8L, 12L, 16L))
      // the unregistered third source never routes
      val q3 = armed(c3, "zzss")
      assert(!q3.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
        "an unregistered source must not route")
      assert(q3.count() === 5L)
      // a malformed registry declines wholesale, queries still run
      spark.conf.set(C.RegistryKey, "{not json")
      val q4 = armed(c1, "zzqq")
      assert(!q4.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
      assert(q4.count() === 5L)
    } finally {
      spark.conf.unset(C.EnabledKey)
      spark.conf.unset(C.RegistryKey)
    }
  }

  test("contains rewrite cache: a PARTITIONED posting table overwrite invalidates the content-addressed relation cache") {
    import org.apache.spark.sql.graft.{ContainsRewriteRule => C}
    import graft.ops.{VectorSearch => VS}
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("wcrule_cache").toString
    val (c, p) = (s"$base/corpus", s"$base/postings")
    (0L until 10L).map(i => (i, s"doc $i zzvv marker"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(c)
    def writePostings(upTo: Long): Unit =
      VS.trigramPostingsFrame(
          spark.read.parquet(c).filter(col("doc_id") < upTo))
        .withColumn("tb", pmod(xxhash64(col("tg")), lit(16L)).cast("int"))
        .repartition(1).write.mode("overwrite").partitionBy("tb").parquet(p)
    // v1: postings cover only docs 0-4 — an INCOMPLETE index (the
    // registration-contract violation this test needs to observe the
    // cache with: the gate drops the unindexed half)
    writePostings(5L)
    spark.conf.set(C.EnabledKey, "true")
    spark.conf.set(C.SourceKey, c)
    spark.conf.set(C.PostingsKey, p)
    try {
      def q() = spark.read.parquet(c).filter(col("text").contains("zzvv"))
      assert(q().queryExecution.optimizedPlan.toString.contains("LeftSemi"))
      assert(q().count() === 5L, "v1 postings gate to the indexed half")
      // v2: overwrite IN PLACE with the complete postings — the r19
      // TOP-LEVEL listing signature saw only _SUCCESS under a
      // partitioned layout and would keep serving the v1 relation
      writePostings(10L)
      assert(q().count() === 10L,
        "the partitioned overwrite must invalidate the cached relation")
    } finally {
      spark.conf.unset(C.EnabledKey)
      spark.conf.unset(C.SourceKey)
      spark.conf.unset(C.PostingsKey)
    }
  }

  test("IVF route: cluster_id pruning from the centroid sidecar matches ivfTopK") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    IndexBuilder.buildIvfIndex(corpus, "embedding", numClusters = 16, seed = 42L, dir)
    spark.conf.set(AnnRewriteRule.EnabledKey, "true")
    spark.conf.set(AnnRewriteRule.IvfCentroidsPathKey, dir)
    spark.conf.set(AnnRewriteRule.IvfNProbeKey, "6")
    try {
      val indexed = spark.read.parquet(dir)
      val df = knnQuery(indexed).select("vec_id", "score")
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("PartitionFilters") && !physical.contains("PartitionFilters: []"),
        s"cluster filter did not reach partition pruning:\n$physical")
      val expected = IndexBuilder
        .ivfTopK(corpus, "embedding", "vec_id", qvec, k = 10,
          numClusters = 16, nProbe = 6, seed = 42L)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
      val got = df.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
      assert(got === expected)

      // missing sidecar path → IVF route declines, plan unchanged
      spark.conf.set(AnnRewriteRule.IvfCentroidsPathKey, dir + "/nonexistent")
      val p2 = optimizedPlan(knnQuery(spark.read.parquet(dir)))
      assert("""cluster_id#\d+ IN \(""".r.findFirstIn(p2).isEmpty, s"should decline:\n$p2")
    } finally {
      spark.conf.set(AnnRewriteRule.EnabledKey, "false")
      spark.conf.unset(AnnRewriteRule.IvfCentroidsPathKey)
      spark.conf.unset(AnnRewriteRule.IvfNProbeKey)
    }
  }

  test("driver ann_rewrite_ivf_topk frame: the injected cluster filter reaches partition pruning") {
    // run the row once: builds its index, and its answer is oracle-checked
    // by the driver — here we audit that the rule actually FIRED on the
    // row's own frame (a silently non-firing rule would still pass the
    // oracle via brute force)
    SparkEntry.queries("ann_rewrite_ivf_topk")(spark, sf).collect()
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_ivfrw_" + Integer.toHexString(sf.hashCode)).getAbsolutePath
    spark.conf.set(AnnRewriteRule.EnabledKey, "true")
    spark.conf.set(AnnRewriteRule.IvfCentroidsPathKey, path)
    spark.conf.set(AnnRewriteRule.IvfNProbeKey, "6")
    try {
      val physical = ops.AnnIndex.annRewriteIvfFrame(spark, path, qvec)
        .queryExecution.executedPlan.toString
      assert(physical.contains("PartitionFilters") &&
        !physical.contains("PartitionFilters: []"),
        s"row frame did not partition-prune:\n$physical")
    } finally {
      spark.conf.set(AnnRewriteRule.EnabledKey, "false")
      spark.conf.unset(AnnRewriteRule.IvfCentroidsPathKey)
      spark.conf.unset(AnnRewriteRule.IvfNProbeKey)
    }
  }

  test("IVF route composes with the persisted IVF-PQ index table unchanged") {
    // the PQ index carries the same cluster_id partition layout, so the
    // SAME rewrite rule routes the natural exact query through it — the
    // optimizer needs no PQ awareness for partition pruning, and the
    // float rescore over probed clusters equals the plain-IVF result
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_rw").toString + "/idx"
    graft.vector.ProductQuantization.buildIvfPqIndex(
      corpus, "embedding", numClusters = 16, seed = 42L, dir)
    spark.conf.set(AnnRewriteRule.EnabledKey, "true")
    spark.conf.set(AnnRewriteRule.IvfCentroidsPathKey, dir)
    spark.conf.set(AnnRewriteRule.IvfNProbeKey, "6")
    try {
      val df = knnQuery(spark.read.parquet(dir)).select("vec_id", "score")
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("PartitionFilters") && !physical.contains("PartitionFilters: []"),
        s"cluster filter did not prune the PQ index partitions:\n$physical")
      val expected = IndexBuilder
        .ivfTopK(corpus, "embedding", "vec_id", qvec, k = 10,
          numClusters = 16, nProbe = 6, seed = 42L)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
      val got = df.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
      assert(got === expected)
    } finally {
      spark.conf.set(AnnRewriteRule.EnabledKey, "false")
      spark.conf.unset(AnnRewriteRule.IvfCentroidsPathKey)
      spark.conf.unset(AnnRewriteRule.IvfNProbeKey)
    }
  }

  test("filtered-ANN shape: rewrite descends through the tier predicate; " +
      "partition filters AND pushed data filter on one scan") {
    val path = ops.AnnIndex.buildFilteredTierIndex(spark, sf)
    withAnnRewrite(radius = 2) {
      val df = ops.AnnIndex.annRewriteFilteredFrame(spark, path, qvec)
      // the injected probe filter must land despite the user's tier Filter
      // sitting between the sort and the relation
      val optimized = optimizedPlan(df)
      assert(BucketIn.findFirstIn(optimized).isDefined,
        s"no bucket filter injected through the tier predicate:\n$optimized")
      val scan = df.queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head
      val partFilters = scan.partitionFilters.mkString(" ")
      assert(partFilters.contains("bucket"),
        s"probe set must prune bucket partitions, got: $partFilters")
      val pushed = scan.metadata("PushedFilters")
      assert(pushed.contains("tier"),
        s"tier predicate must push to the scan as a data filter: $pushed")
      // and the pruned result is the hand-enumerable gold set
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === Seq(100000L, 100002L, 100004L, 100006L, 100008L).map((_, 1.0)))
    }
  }

  test("enabled on a partitioned index table: the filter becomes partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("lsh_index").toString
    IndexBuilder.buildLshIndex(corpus, "embedding", lsh, dir)
    withAnnRewrite() {
      val indexed = spark.read.parquet(dir)
      val df = knnQuery(indexed)
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("PartitionFilters") && !physical.contains("PartitionFilters: []"),
        s"bucket filter did not reach partition pruning:\n$physical")
      // pruned result still finds the self-match
      assert(df.select("vec_id").head().getLong(0) === 0L)

      // A projection that drops the bucket column must NOT defeat the
      // rewrite: column pruning removes bucket from the Project, but the
      // partition column still exists on the relation, where the rule
      // injects the probe filter.
      val prunedProjection = knnQuery(indexed).select("vec_id", "score")
      val plan2 = prunedProjection.queryExecution.executedPlan.toString
      assert(plan2.contains("PartitionFilters") && !plan2.contains("PartitionFilters: []"),
        s"rewrite defeated by column pruning:\n$plan2")
      val expected = IndexBuilder
        .lshTopK(corpus, "embedding", "vec_id", lsh, qvec, k = 10, radius = 1)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
      val got = prunedProjection.collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
      assert(got === expected)
    }
  }
}
