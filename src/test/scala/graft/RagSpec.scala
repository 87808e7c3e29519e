package graft

import graft.ops.Rag
import org.apache.spark.sql.functions._

class RagSpec extends SparkSpec {
  import spark.implicits._

  test("lexicalScore: hand-computed overlap cosine") {
    // q = {spark, shuffle}; d = {spark, join, shuffle, fast} → inter = 2
    // score = 2 / sqrt(2*4) = 0.707107
    val r = Seq(("spark shuffle", "spark join shuffle fast spark")).toDF("q", "t")
      .select(Rag.lexicalScore(col("q"), col("t")).as("s")).head()
    assert(r.getDouble(0) === 0.707107)
  }

  test("lexicalScore: no overlap → 0, identical distinct sets → 1") {
    val rows = Seq(
      ("alpha beta", "gamma delta"),
      ("alpha beta", "beta alpha alpha")).toDF("q", "t")
      .select(Rag.lexicalScore(col("q"), col("t")).as("s")).collect()
    assert(rows(0).getDouble(0) === 0.0)
    assert(rows(1).getDouble(0) === 1.0)
  }

  test("rag_pipeline_planted: top-5 is exactly the self-query group at 1.0/1.0") {
    // sf0.001 is the adversarial case: most docs have planted token-set
    // twins (e.g. 0/82); the construction's margin claim must hold here too.
    val out = SparkEntry.queries("rag_pipeline_planted")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq ===
      Seq(308L, 900000L, 900001L, 900002L, 900003L))
    assert(out.forall(_.getAs[Double]("similarity") === 1.0))
    assert(out.forall(_.getAs[Double]("relevance_score") === 1.0))
    assert(out.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3, 4, 5))
  }

  test("interactive_replay: three turns, ranks dense per turn, follow-up nonempty") {
    val out = SparkEntry.queries("interactive_replay")(spark, sf).collect()
    val byTurn = out.groupBy(_.getAs[Int]("turn"))
    assert(byTurn.keySet === Set(1, 2, 3))
    byTurn.foreach { case (turn, rows) =>
      assert(rows.nonEmpty && rows.length <= 3, s"turn $turn: ${rows.length} rows")
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to rows.length))
    }
  }

  test("rerank_topn is ordered desc with id tiebreak and capped at 20") {
    val out = SparkEntry.queries("rerank_topn")(spark, sf).collect()
    assert(out.length <= 20 && out.nonEmpty)
    val pairs = out.map(r => (r.getAs[Double]("relevance_score"), r.getAs[Long]("doc_id")))
    pairs.sliding(2).foreach {
      case Array((s1, d1), (s2, d2)) =>
        assert(s1 > s2 || (s1 == s2 && d1 < d2), "ordering violated")
      case _ =>
    }
  }

  test("rag_context assembles exactly the top-5 in rank order") {
    val row = SparkEntry.queries("rag_context")(spark, sf).head()
    val ctx = row.getAs[String]("context")
    assert(row.getAs[Long]("n_docs") === 5)
    val headers = "Source (\\d+) ".r.findAllMatchIn(ctx).map(_.group(1).toInt).toList
    assert(headers === List(1, 2, 3, 4, 5), s"headers out of order: $headers")
    assert(ctx.split("\n\n").length === 5)
  }

  test("rag_pipeline_topk: end-to-end slice returns ranked, thresholded chunks") {
    val out = SparkEntry.entry(spark)
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 5)
    assert(rows.map(_.getAs[Int]("rank")).toList === (1 to rows.length).toList)
    rows.foreach { r =>
      assert(r.getAs[Double]("relevance_score") > 0.0)
      assert(r.getAs[Int]("chunk_number") >= 1)
      assert(r.getAs[Int]("chunk_number") <= r.getAs[Int]("total_chunks"))
      assert(r.getAs[String]("chunk_text").length <= 200)
    }
  }

  test("rerank_zip: positions align docs with independently-staged scores") {
    val out = SparkEntry.queries("rerank_zip")(spark, sf).collect()
    assert(out.length === 20)
    assert(out.map(_.getAs[Int]("rank")).toList === (1 to 20).toList)
    out.foreach(r => assert(!r.isNullAt(r.fieldIndex("relevance_score")),
      "equal-length lists must zip fully scored"))
  }

  test("rerank_zip: length mismatch falls back to unscored docs (J3 guard)") {
    // a scores stage that emits one fewer row than the candidate list
    val shortScores = SparkEntry.queries("rerank_zip")(spark, sf)
      .filter(col("rank") <= 19)
      .select((col("rank") - 1).as("pos"), col("relevance_score"))
    val out = Rag.rerankZip(spark, sf, scores = Some(shortScores)).collect()
    assert(out.length === 20, "docs list wins: all docs survive")
    out.foreach(r => assert(r.isNullAt(r.fieldIndex("relevance_score")),
      "mismatched lengths must unscore every doc, not just the tail"))
  }

  test("pipeline candidate stage plans a TakeOrderedAndProject (no full sort)") {
    val plan = SparkEntry.queries("rerank_topn")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k should not plan a global sort:\n$plan")
  }

  test("bm25: positive scores, bounded match counts, tf saturation holds") {
    val rows = SparkEntry.queries("bm25_scores")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) > 0.0)
      val m = r.getLong(2)
      assert(m >= 1 && m <= 5) // 5 query terms
    }
    // saturation/idf sanity: no score exceeds sum of all idf*(k1+1) caps
    // (tf term is < k1+1 = 2.2; idf < ln(N+1) with N = corpus size)
    val n = Tables.documents(spark, sf).count()
    val cap = 5 * 2.2 * math.log(n + 1.0)
    assert(rows.forall(_.getDouble(1) < cap))
  }

  test("hybrid_rrf_fusion: both retrievers contribute, scores bounded by RRF caps") {
    val rows = SparkEntry.queries("hybrid_rrf_fusion")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getAs[Long]("rrf_e6"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "sorted desc")
    // max possible: rank 1 on both sides = 2 * (1000000 / 61)
    assert(scores.head <= 2 * (1000000L / 61L))
    // each side has a rank-1 doc scoring 1e6/61 alone, so the fused
    // maximum can never fall below that floor
    assert(scores.head >= 1000000L / 61L)
  }

  test("hybrid_weighted_topk: blended scores bounded, normalized maxima present") {
    val rows = SparkEntry.queries("hybrid_weighted_topk")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getAs[Long]("hybrid_e7"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "sorted desc")
    // weights are 7 + 3 over [0, 1e6]-normalized sides
    assert(scores.forall(s => s >= 0L && s <= 10000000L))
    // each side's best doc is normalized to exactly 1e6, so the fused
    // max can never fall below the larger single-side weight
    assert(scores.head >= 7000000L)
  }

  test("bm25_selfrank_mrr: one row per query, ranks valid, rr exact-integer") {
    val rows = SparkEntry.queries("bm25_selfrank_mrr")(spark, sf).collect()
    assert(rows.nonEmpty)
    val corpus = Tables.documents(spark, sf).filter("doc_id < 500").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("query_doc") % 50 === 0)
      val rank = r.getAs[Long]("self_rank")
      assert(rank >= 1 && rank <= corpus)
      assert(r.getAs[Long]("rr_e6") === 1000000L / rank)
      assert(r.getAs[Boolean]("hit_at_10") === (rank <= 10))
    }
  }

  test("trigram_search equals the direct LIKE scan (no candidate lost)") {
    import org.apache.spark.sql.functions._
    val viaIndex = SparkEntry.queries("trigram_search")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    val direct = Tables.documents(spark, sf)
      .filter(lower(col("text")).contains("customer stream"))
      .select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(viaIndex === direct)
    assert(direct === direct.sorted)
  }

  test("bm25 index: serving equals the from-scratch scorer; term filter pushes") {
    import org.apache.spark.sql.functions._
    val served = SparkEntry.queries("bm25_indexed_topn")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val scratch = SparkEntry.queries("bm25_topn")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(served === scratch, "index path diverged from from-scratch BM25")
    // the probe reads k posting lists, not the corpus: term IN pushes to
    // the postings scan and no documents-table scan appears in the plan
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25idx_" + Integer.toHexString(sf.hashCode)).getAbsolutePath
    val q = graft.ops.Rag.bm25IndexedScores(spark, path, Seq("hash", "join"))
    val scans = q.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.forall(!_.relation.location.rootPaths.exists(
      _.toString.contains("documents"))), "corpus text read at query time")
    val postingsScan = scans.find(_.relation.location.rootPaths
      .exists(_.toString.endsWith("/postings"))).get
    assert(postingsScan.metadata("PushedFilters").contains("In(term"),
      s"term probe not pushed: ${postingsScan.metadata("PushedFilters")}")
  }

  test("bm25 segments: append equals rebuild, replay idempotent, base files untouched") {
    val served = SparkEntry.queries("bm25_appended_topn")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val scratch = SparkEntry.queries("bm25_topn")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(served === scratch, "segment merge diverged from from-scratch BM25")
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25seg_" + Integer.toHexString(sf.hashCode)).getAbsolutePath
    def seg0Files(): Map[String, Long] =
      new java.io.File(path + "/postings/segment=0").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    val before = seg0Files()
    assert(before.nonEmpty)
    // replay the append: segment 1 rewrites its own directory only
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 500)
    Rag.writeBm25Segment(docs.filter(col("doc_id") >= 300), path, 1L)
    assert(seg0Files() === before, "append touched the base segment's files")
    val replayed = Rag.bm25SegmentedScores(spark, path,
        Seq("hash", "join", "merge", "sort", "window"))
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(20)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(replayed === served, "a replayed append changed the answer")
  }

  test("bm25 compaction: one segment remains, scores unchanged") {
    val served = SparkEntry.queries("bm25_compacted_topn")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val scratch = SparkEntry.queries("bm25_topn")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(served === scratch, "compaction changed scores")
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25cpt_" + Integer.toHexString(sf.hashCode)).getAbsolutePath
    val segs = new java.io.File(path + "/postings").listFiles()
      .filter(_.getName.startsWith("segment=")).map(_.getName).toSeq
    assert(segs === Seq("segment=0"), s"expected one folded segment, got $segs")
  }

  test("bm25 delete: targets vanish, untouched segments byte-identical, replay no-op") {
    val served = SparkEntry.queries("bm25_deleted_topn")(spark, sf).collect()
    assert(served.forall(_.getLong(0) % 50 != 0), "a deleted doc was served")
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25del_" + Integer.toHexString(sf.hashCode)).getAbsolutePath
    assert(spark.read.parquet(path + "/docs")
      .filter(col("doc_id") % 50 === 0).count() === 0, "roster kept a target")
    def files(sub: String): Map[String, (Long, Long)] =
      new java.io.File(s"$path/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    // deletion targets hit BOTH segments here (0,...,250 and 300,...,450),
    // so prove replay-idempotence instead of an untouched segment: a second
    // identical delete finds no affected segment and rewrites nothing
    val before = (files("postings/segment=0"), files("postings/segment=1"))
    Rag.deleteFromBm25Segments(spark, path, (0L until 500L by 50L).toSeq)
    assert((files("postings/segment=0"), files("postings/segment=1")) === before,
      "replayed delete must be a no-op")
  }

  test("bm25 delete leaves segments without targets byte-identical") {
    val dir = java.nio.file.Files.createTempDirectory("bm25del").toString + "/idx"
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 200)
    Rag.buildBm25SegmentedIndex(spark, docs.filter(col("doc_id") < 100), dir)
    Rag.writeBm25Segment(docs.filter(col("doc_id") >= 100), dir, 1L)
    def seg0(): Map[String, (Long, Long)] =
      new java.io.File(dir + "/postings/segment=0").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    val before = seg0()
    Rag.deleteFromBm25Segments(spark, dir, Seq(150L)) // lives in segment 1 only
    assert(seg0() === before, "delete touched a segment without targets")
    assert(spark.read.parquet(dir + "/docs")
      .filter(col("doc_id") === 150L).count() === 0)
  }

  test("bm25 upsert: new versions serve, old versions gone, 'hash' matches all targets") {
    val served = SparkEntry.queries("bm25_upserted_topn")(spark, sf).collect()
    assert(served.nonEmpty)
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25ups_" + Integer.toHexString(sf.hashCode)).getAbsolutePath
    // every upserted doc must appear exactly once in the roster (no
    // old+new double-presence) and its new version must contain 'hash'
    val targets = (0L until 500L by 50L).toSeq
    val roster = spark.read.parquet(path + "/docs")
      .filter(col("doc_id").isin(targets: _*))
      .groupBy("doc_id").count().collect()
    assert(roster.forall(_.getLong(1) === 1L), "a doc serves two versions")
    val hashDocs = spark.read.parquet(path + "/postings")
      .filter(col("term") === "hash")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(targets.toSet.subsetOf(hashDocs),
      "an upserted version is missing its new term")
  }

  test("bm25 index: out-of-vocabulary terms yield an empty result") {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25idx_" + Integer.toHexString(sf.hashCode)).getAbsolutePath
    SparkEntry.queries("bm25_indexed_topn")(spark, sf) // ensure built
    assert(graft.ops.Rag.bm25IndexedScores(spark, path,
      Seq("zzzz_not_a_term")).count() === 0)
  }

  test("rag_sql_topk: the chunk generator runs over the semi-joined hits, not the corpus") {
    // the scale shape: chunk_split must sit ABOVE the hit-id semi-join
    // (the IN-subquery), so at 100 TB the generator chunks ≤10 documents
    // instead of every document in the table
    val plan = SparkEntry.queries("rag_sql_topk")(spark, sf)
      .queryExecution.optimizedPlan
    val gens = plan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.nonEmpty, "no Generate (chunk_split) node in the plan")
    gens.foreach { g =>
      val semiBelow = g.child.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
      }
      assert(semiBelow.nonEmpty,
        "chunk_split generates over the un-pruned documents table")
    }
  }
}
