package graft

import graft.ops.LateInteraction
import org.apache.spark.sql.functions._

class LateInteractionSpec extends SparkSpec {

  test("tokenWindows: boundary positions take one-sided windows; interiors three tokens") {
    val w = LateInteraction.tokenWindows("Alpha beta, gamma delta")
    assert(w.toSeq === Seq(
      "alpha beta", "alpha beta gamma", "beta gamma delta", "gamma delta"))
    assert(LateInteraction.tokenWindows("one").toSeq === Seq("one"))
    assert(LateInteraction.tokenWindows("").isEmpty)
    assert(LateInteraction.tokenWindows(null).isEmpty)
  }

  test("windowVecs: bit-identical to embedding each window string (the scorer fast path)") {
    for (t <- Seq("Alpha beta, gamma delta", "one", "", null,
        "repeat repeat repeat", "Mixed CASE tokens, with 7 digits 42")) {
      val viaStrings = LateInteraction.tokenWindows(t)
        .map(w => graft.vector.Embedding.hashingEmbed(w, 64))
      val direct = LateInteraction.windowVecs(t)
      assert(direct.length === viaStrings.length)
      direct.zip(viaStrings).foreach { case (a, b) =>
        assert(a.toSeq === b.toSeq,
          "token-slice embedding must reproduce the window-string " +
            "embedding bit-for-bit (same feature stream, same accumulation)")
      }
    }
  }

  test("maxsim_topk: top-10 is exactly doc 0 + the 9 planted copies, each at |Q| micro-units") {
    val out = SparkEntry.queries("maxsim_topk")(spark, sf).collect()
    val qLen = graft.vector.Embedding.tokenize(
      Tables.documents(spark, sf).filter(col("doc_id") === 0L)
        .select("text").head().getString(0)).length
    assert(out.map(_.getAs[Long]("doc_id")).toSeq ===
      (0L +: (100000L until 100009L)).sorted,
      "the planted tie set must saturate the top-10")
    assert(out.forall(_.getAs[Long]("score_micro") === qLen * 1000000L),
      "every full-tie doc scores exactly |Q| (each query window's max " +
        "dot is its identical twin at 1.0)")
  }

  test("maxsim_indexed_topk: the pruned two-stage result equals the brute force row") {
    val brute = SparkEntry.queries("maxsim_topk")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"))).toSeq
    val indexed = SparkEntry.queries("maxsim_indexed_topk")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"))).toSeq
    assert(indexed === brute,
      "candidates share ALL query windows for full-tie docs, so the " +
        "pruned rescore must reproduce the exact top-10")
  }

  test("maxsim_indexed_topk: the posting probe partition-prunes to the query's buckets") {
    // warm the fixture, then audit the candidate scan's plan: the
    // posting read must carry wb partition filters (the |Q|-bucket
    // probe), never a full posting scan
    SparkEntry.queries("maxsim_indexed_topk")(spark, sf).collect()
    val path = Tables.scratchPath("maxsim_postings", sf)
    val probe = spark.read.parquet(path).filter(col("wb").isin(0, 1))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      !plan.replaceAll("(?s).*PartitionFilters: \\[", "")
        .startsWith("]"),
      s"posting probe must push wb partition filters, plan:\n$plan")
  }

  test("maxsim_appended_topk: the tie set is served entirely through appended postings") {
    val appended = SparkEntry.queries("maxsim_appended_topk")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"))).toSeq
    val indexed = SparkEntry.queries("maxsim_indexed_topk")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"))).toSeq
    assert(appended === indexed,
      "the incrementally-maintained index must serve the same top-10 " +
        "as the built-at-once one — the copies exist only via the append")
  }

  test("maxsim_deleted_topk: the tombstoned copy never surfaces; the remaining ties saturate k") {
    val out = SparkEntry.queries("maxsim_deleted_topk")(spark, sf).collect()
    val ids = out.map(_.getAs[Long]("doc_id")).toSeq
    assert(!ids.contains(100000L),
      "the tombstoned doc must be excluded at the candidate stage")
    assert(ids === (0L +: (100001L to 100009L)).sorted,
      "deleting one of ten copies leaves exactly the k-sized tie set")
    val qLen = graft.vector.Embedding.tokenize(
      Tables.documents(spark, sf).filter(col("doc_id") === 0L)
        .select("text").head().getString(0)).length
    assert(out.forall(_.getAs[Long]("score_micro") === qLen * 1000000L))
  }

  test("maxsim_compacted_topk: compaction rewrites each bucket to one file and serves the identical top-10") {
    val compacted = SparkEntry.queries("maxsim_compacted_topk")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"))).toSeq
    val indexed = SparkEntry.queries("maxsim_indexed_topk")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"))).toSeq
    assert(compacted === indexed,
      "the compacted index must serve the build-at-once answer")
    // the small-files claim: every wb= leaf holds exactly ONE parquet
    // file after compaction (the append path had left several)
    val root = new java.io.File(Tables.scratchPath("maxsim_postings_cmp", sf))
    val leaves = root.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("wb="))
    assert(leaves.nonEmpty)
    leaves.foreach { leaf =>
      val parts = leaf.listFiles().count(_.getName.endsWith(".parquet"))
      assert(parts === 1,
        s"${leaf.getName} holds $parts parquet files after compaction")
    }
  }

  test("maxsim_time_travel_topk: versions are isolated — v1 never sees the appended low-id copies") {
    val out = SparkEntry.queries("maxsim_time_travel_topk")(spark, sf)
      .collect()
    val v1 = out.filter(_.getAs[Long]("version") == 1L)
      .map(_.getAs[Long]("doc_id")).toSeq
    val v2 = out.filter(_.getAs[Long]("version") == 2L)
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(v1 === Seq(0L, 100000L, 100001L, 100002L, 100003L),
      "v1 must serve only the manifest-v1 files (high-id copies)")
    assert(v2 === Seq(0L, 99000L, 99001L, 99002L, 99003L),
      "v2's appended low-id copies must displace the high-id ones")
    // the version read keeps the wb partition column, so the probe still
    // partition-prunes among the version's files
    import graft.ingest.ManifestLog
    val path = Tables.scratchPath("maxsim_postings_tt", sf)
    val files = ManifestLog.read(spark, path + "/log", 1L).get
    val probe = spark.read.option("basePath", path + "/data")
      .parquet(files: _*).filter(col("wb").isin(0, 1))
    val plan = probe.queryExecution.sparkPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      !plan.replaceAll("(?s).*PartitionFilters: \\[", "").startsWith("]"),
      s"manifest-resolved reads must keep wb pruning:\n$plan")
  }

  test("maxsim_vacuumed_topk: only the compacted generation's files survive, and they serve the full answer") {
    val out = SparkEntry.queries("maxsim_vacuumed_topk")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq ===
      Seq(0L, 99000L, 99001L, 99002L, 99003L),
      "the vacuumed index must still serve v2's complete answer")
    // physical: every file on disk is referenced by the surviving manifest
    import graft.ingest.ManifestLog
    val path = Tables.scratchPath("maxsim_postings_vac", sf)
    val v = ManifestLog.currentVersion(spark, path + "/log")
    val referenced = ManifestLog.read(spark, path + "/log", v).get.toSet
    // list in the manifests' own form: qualified URIs through the
    // shared Hadoop listing (scheme preserved)
    val onDisk = new java.io.File(path + "/data").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("wb="))
      .flatMap(d => ManifestLog.listParquetLeaves(spark, d.getAbsolutePath))
      .toSet
    assert(onDisk === referenced,
      "vacuum must delete exactly the pre-compaction generations: " +
        s"${(onDisk -- referenced).size} orphans, ${
          (referenced -- onDisk).size} missing")
  }

  test("maxsim_snapshot_forget_topk: one composed commit publishes files AND forgets; v1 pinned, v2 excluded") {
    val out = SparkEntry.queries("maxsim_snapshot_forget_topk")(spark, sf)
      .collect()
    val v1 = out.filter(_.getAs[Long]("version") == 1L)
      .map(_.getAs[Long]("doc_id")).toSeq
    val v2 = out.filter(_.getAs[Long]("version") == 2L)
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(v1.contains(100000L),
      "the composed forget must NOT retro-apply to the pinned v1")
    assert(!v1.exists(id => id >= 99000L && id <= 99004L),
      "v1 must not see the files the composed commit published")
    assert(!v2.contains(99000L) && !v2.contains(100000L),
      "v2 must exclude BOTH forgotten ids — appended and v1-resident")
    assert((99001L to 99004L).forall(v2.contains) &&
      (100001L to 100004L).forall(v2.contains),
      s"v2 must serve every surviving copy of both generations: $v2")
    // the manifest really is ONE composed version carrying both halves
    val log = Tables.scratchPath("maxsim_postings_sf", sf) + "/log"
    val (files1, forgotten1) =
      graft.ops.Forget.readSnapshotForget(spark, log, 1L)
    val (files2, forgotten2) =
      graft.ops.Forget.readSnapshotForget(spark, log, 2L)
    assert(forgotten1.isEmpty && files1.nonEmpty)
    assert(forgotten2 === Set(99000L, 100000L))
    assert(files1.toSet.subsetOf(files2.toSet) &&
      files2.size > files1.size,
      "v2 must carry v1's files plus the appended generation")
  }

  test("maxsim_auto_route_topk: the routed serve equals the indexed row, and the route inputs are sane") {
    val routed = SparkEntry.queries("maxsim_auto_route_topk")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"))).toSeq
    val indexed = SparkEntry.queries("maxsim_indexed_topk")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"))).toSeq
    assert(routed === indexed,
      "both route targets provably serve the planted answer — the " +
        "router may pick either but must not change the result")
  }

  test("maxsim_batch_topk: each query's top-4 is its own planted tie group at |Q_q| micro-units") {
    val out = SparkEntry.queries("maxsim_batch_topk")(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") < 3L).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 3L).foreach { q =>
      val rows = out.filter(_.getAs[Long]("q_id") == q)
      val qLen = graft.vector.Embedding.tokenize(docs(q)).length
      assert(rows.map(_.getAs[Long]("doc_id")).toSeq ===
        (q +: (0 until 3).map(j => 100000L + q * 100L + j)),
        s"query $q: top-4 must be its source doc + its 3 planted copies")
      assert(rows.forall(_.getAs[Long]("score_micro") === qLen * 1000000L),
        s"query $q: every tie row scores exactly |Q_$q|")
    }
  }

  test("maxsim_batch_indexed_topk: the indexed batch serve equals the brute batch row") {
    def rows(name: String) = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("score_micro"))).toSeq
    assert(rows("maxsim_batch_indexed_topk") === rows("maxsim_batch_topk"),
      "every query's full-tie docs share ALL its windows, so the pruned " +
        "batch rescore must reproduce the brute frame exactly")
  }

  test("maxsim_batch_auto_route_topk: the routed batch serve equals the indexed one") {
    def rows(name: String) = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("score_micro"))).toSeq
    assert(rows("maxsim_batch_auto_route_topk") ===
      rows("maxsim_batch_indexed_topk"),
      "both batch routes provably serve the planted frame — the router " +
        "may pick either but must not change the result")
  }

  test("batch posting probe partition-prunes to the frame's bucket union") {
    // warm the fixture, then audit the probe scan's plan: the posting
    // read must carry wb partition filters, never a full posting scan
    SparkEntry.queries("maxsim_batch_indexed_topk")(spark, sf).collect()
    val path = Tables.scratchPath("maxsim_postings_batch", sf)
    val probe = spark.read.parquet(path).filter(col("wb").isin(0, 1))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      !plan.replaceAll("(?s).*PartitionFilters: \\[", "").startsWith("]"),
      s"batch posting probe must push wb partition filters, plan:\n$plan")
  }

  test("maxsim_upserted_topk: the stale version never serves; the replacement serves through appended postings") {
    val out = SparkEntry.queries("maxsim_upserted_topk")(spark, sf).collect()
    val q0 = out.filter(_.getAs[Long]("q_id") == 0L)
      .map(_.getAs[Long]("doc_id")).toSeq
    val q1 = out.filter(_.getAs[Long]("q_id") == 1L)
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(q0 === (0L +: (100001L to 100009L)),
      "the watermark must kill the upserted doc's OLD postings — its " +
        "stale version may not tie for the old text's query")
    assert(q1 === Seq(1L, 100000L),
      "the replacement must be FOUND through its appended (seq-1) " +
        "postings and rescore as a full tie for the new text's query")
  }

  test("maxsim_streaming_ingest_topk: replayed batch lands exactly once; the audit column counts real postings") {
    val out = SparkEntry.queries("maxsim_streaming_ingest_topk")(spark, sf)
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq ===
      (0L +: (100000L to 100008L)),
      "the tie set must serve entirely through streamed batch directories")
    // exactly-once: the copy's posting count equals doc 0's DISTINCT
    // window count — an append-mode replay would double it
    val srcText = Tables.documents(spark, sf)
      .filter(col("doc_id") === 0L).select("text").head().getString(0)
    val expected = LateInteraction.tokenWindows(srcText).distinct.length
    assert(out.map(_.getAs[Long]("copy_postings")).distinct.toSeq ===
      Seq(expected.toLong),
      "the replayed micro-batch must rewrite its directory, not append")
  }

  test("maxsim_sharded_topk: scatter-gather over independent shard posting tables equals the brute row") {
    def rows(name: String) = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"))).toSeq
    assert(rows("maxsim_sharded_topk") === rows("maxsim_topk"),
      "the re-topped union of per-shard top-ks must equal the global " +
        "answer (every global top-k member is in its own shard's top-k)")
    // the construction is shard-sensitive: the planted ids really do
    // split across both shards
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val residues = (100000L to 100008L)
      .map(id => math.floorMod(XXH64.hashLong(id, 42L), 2L)).toSet
    assert(residues === Set(0L, 1L),
      "the planted copies must hash across both shards")
  }

  test("batch auto-route tombstone parity: the brute arm excludes the id-level sidecar like the indexed arm") {
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("batchroutetomb").toString
    val path = base + "/postings"
    // every doc shares the query's windows, so after the sidecar kills
    // doc 2 the resolved candidates are {1, 3}: 2·2 ≥ 3 docs → the
    // measured route picks BRUTE, exactly the arm under test
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    LateInteraction.writePostings(docs, path, "overwrite")
    Seq(2L).toDF("doc_id")
      .write.mode("overwrite").parquet(path + "/_tombstones")
    val srcs = Seq((1L, "alpha beta gamma"))
    val routed = LateInteraction.batchAutoRoute(spark, docs, srcs, path, 3)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("score_micro"))).toSeq
    assert(!routed.exists(_._2 == 2L),
      "the brute arm must honor the id-level sidecar — route symmetry " +
        "on tombstoned tables")
    assert(routed.map(_._2).toSet === Set(1L, 3L))
    val indexed = LateInteraction.serveBatchPostings(spark, docs, srcs,
        LateInteraction.resolvedPostings(spark, path), 3)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("score_micro"))).toSeq
    assert(routed === indexed,
      "both routes must answer identically on a tombstoned table")
  }

  test("a mixed-schema tombstone sidecar fails loudly instead of silently resurrecting deletes") {
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("mixedsidecar").toString
    val path = base + "/postings"
    LateInteraction.writePostings(
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), path, "overwrite")
    // the composition defect: a delete's id rows APPENDED onto an upsert
    // watermark — the union schema's null watermark rows would null the
    // anti-join condition and resurrect the delete
    Seq(1L).toDF("doc_id")
      .write.mode("overwrite").parquet(path + "/_tombstones")
    Seq((2L, 0L)).toDF("t_doc_id", "upto_seq")
      .write.mode("append").parquet(path + "/_tombstones")
    val err = intercept[IllegalStateException] {
      LateInteraction.resolvedPostings(spark, path).collect()
    }
    assert(err.getMessage.contains("mixed/unknown _tombstones schema"),
      s"unexpected error: ${err.getMessage}")
  }

  test("composeDelete merges shape-preservingly: fresh, id-level, and watermark sidecars") {
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("composedel").toString
    // fresh table → id-level sidecar; repeat delete is idempotent
    val p1 = base + "/p1"
    LateInteraction.writePostings(
      Seq((1L, "alpha beta"), (2L, "alpha beta")).toDF("doc_id", "text"),
      p1, "overwrite")
    LateInteraction.composeDelete(spark, p1, Seq(2L))
    LateInteraction.composeDelete(spark, p1, Seq(2L, 1L))
    val (s1, wm1) = LateInteraction.tombstoneSidecar(spark, p1).get
    assert(!wm1 && s1.columns.toSeq === Seq("doc_id"),
      "a fresh table's composed deletes resolve id-level")
    assert(!new java.io.File(p1 + "/_tombstones").exists(),
      "composeDelete must never materialize the parquet sidecar — the " +
        "CAS log is the representation")
    assert(LateInteraction.resolvedPostings(spark, p1).count() === 0L)
    // watermark sidecar → the delete merges INTO the watermark shape at
    // upto_seq = MaxValue (the strict shape check must still pass), and
    // kills the replacement postings ABOVE the old mark
    val p2 = base + "/p2"
    LateInteraction.writePostings(
      Seq((1L, "alpha beta"), (2L, "alpha beta")).toDF("doc_id", "text"),
      p2, "overwrite", seq = 0L)
    Seq((1L, 0L)).toDF("t_doc_id", "upto_seq")
      .write.mode("overwrite").parquet(p2 + "/_tombstones")
    LateInteraction.writePostings(Seq((1L, "gamma delta"))
      .toDF("doc_id", "text"), p2, "append", seq = 1L)
    // pre-delete: the replacement serves above the watermark
    assert(LateInteraction.resolvedPostings(spark, p2)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L))
    LateInteraction.composeDelete(spark, p2, Seq(1L))
    val (s2, wm2) = LateInteraction.tombstoneSidecar(spark, p2).get
    assert(wm2 && s2.columns.toSet === Set("t_doc_id", "upto_seq"),
      "the composed delete must resolve watermark-shaped on a " +
        "watermark table")
    assert(spark.read.parquet(p2 + "/_tombstones").columns.toSet ===
      Set("t_doc_id", "upto_seq") &&
      spark.read.parquet(p2 + "/_tombstones").count() === 1L,
      "the parquet watermark sidecar must be untouched — the lift to " +
        "MaxValue happens at read time, not by rewrite")
    assert(LateInteraction.resolvedPostings(spark, p2)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet ===
      Set(2L),
      "the composed delete must kill the replacement above the old mark")
  }

  test("composeDelete is multi-writer: racing composers CAS-merge, no delete is lost") {
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("composedelrace").toString
    val path = base + "/postings"
    val n = 8
    LateInteraction.writePostings(
      (1L to (n + 1L)).map(i => (i, "alpha beta")).toDF("doc_id", "text"),
      path, "overwrite")
    // n threads each compose a DISTINCT id concurrently; the old staged
    // swap lost all but the last merge here — the CAS log must keep all
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val futures = (1 to n).map { i =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit =
            LateInteraction.composeDelete(spark, path, Seq(i.toLong))
        })
      }
      futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    assert(LateInteraction.resolvedPostings(spark, path)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet ===
      Set(n + 1L),
      s"all $n racing deletes must survive the merge — a lost CAS " +
        "update would resurrect one")
  }

  test("an orphaned pre-log compose stage refuses to serve instead of resurrecting its deletes") {
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("composedelorphan").toString
    val path = base + "/postings"
    LateInteraction.writePostings(
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), path, "overwrite")
    // the prior generation's crash shape: a _SUCCESS-marked stage, no
    // live sidecar, no log — its deletes are encoded ONLY in the stage
    val stage = java.nio.file.Paths.get(path, ".tombstones.compose")
    java.nio.file.Files.createDirectories(stage)
    java.nio.file.Files.write(stage.resolve("_SUCCESS"), Array.empty[Byte])
    val err = intercept[IllegalStateException] {
      LateInteraction.resolvedPostings(spark, path).collect()
    }
    assert(err.getMessage.contains("orphaned pre-log compose stage"),
      s"unexpected error: ${err.getMessage}")
    // the guard must NOT disarm when the log becomes non-empty (the
    // r17-ADVICE bypass): a post-upgrade composeDelete covers only its
    // own re-applied ids — the stage's OTHER deletes would still
    // resurrect, and a later reclaim would swap-destroy them
    LateInteraction.composeDelete(spark, path, Seq(1L))
    val err2 = intercept[IllegalStateException] {
      LateInteraction.resolvedPostings(spark, path).collect()
    }
    assert(err2.getMessage.contains("orphaned pre-log compose stage"),
      "a non-empty tombstone log silently disarmed the orphan guard")
    // an orphaned stage is tombstone STATE: reclaim must route into the
    // fold (which refuses loudly) instead of early-returning into a
    // swap that destroys the stage
    assert(LateInteraction.hasTombstoneState(spark, path),
      "reclaim's early return would swap-destroy the orphaned stage")
    val root = base + "/ledger"
    val err3 = intercept[IllegalStateException] {
      graft.ops.Forget.reclaimTable(spark, root, path,
        partitionCols = Seq("wb"))
    }
    assert(err3.getMessage.contains("orphaned pre-log compose stage"))
    // recovery: the operator resolves the stage (here: already applied,
    // so it is removed) — serve resumes honoring the log's delete
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    rmTree(stage)
    assert(LateInteraction.resolvedPostings(spark, path).count() === 0L)
  }

  test("one table resolution pays exactly one directory listing and no exists probes when no tombstone state exists") {
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("probecount").toString
    val path = base + "/postings"
    LateInteraction.writePostings(
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), path, "overwrite")
    val l0 = LateInteraction.FsProbes.listings.get()
    val e0 = LateInteraction.FsProbes.exists.get()
    LateInteraction.resolvedPostings(spark, path)
    assert(LateInteraction.FsProbes.listings.get() - l0 === 1L,
      "the sidecar/log/orphan dispatch must ride ONE listStatus")
    assert(LateInteraction.FsProbes.exists.get() - e0 === 0L,
      "no stage directory in the listing means no _SUCCESS probe")
    // with a live log the same single listing dispatches the log read
    LateInteraction.composeDelete(spark, path, Seq(1L))
    val l1 = LateInteraction.FsProbes.listings.get()
    val e1 = LateInteraction.FsProbes.exists.get()
    LateInteraction.resolvedPostings(spark, path)
    assert(LateInteraction.FsProbes.listings.get() - l1 === 1L)
    assert(LateInteraction.FsProbes.exists.get() - e1 === 0L)
  }

  test("a torn tombstone-log head is invisible; a corrupted line fails loudly") {
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("composedeltorn").toString
    val path = base + "/postings"
    LateInteraction.writePostings(
      Seq((1L, "alpha beta"), (2L, "alpha beta")).toDF("doc_id", "text"),
      path, "overwrite")
    LateInteraction.composeDelete(spark, path, Seq(1L))
    // a sentinel-less (torn) version above the head must be invisible —
    // the reader scans down to the last VALID version, still excluding 1
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path + "/_tombstones_log/v2.manifest"),
      "d:2\n".getBytes("UTF-8")) // no `end` sentinel
    assert(LateInteraction.resolvedPostings(spark, path)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet ===
      Set(2L), "a torn head must not serve (nor hide the valid v1)")
    // a corrupted LINE in a valid head must fail loudly — skipping it
    // would silently resurrect whatever the line encoded
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path + "/_tombstones_log/v3.manifest"),
      "garbage\nend\n".getBytes("UTF-8"))
    val err = intercept[IllegalStateException] {
      LateInteraction.resolvedPostings(spark, path).collect()
    }
    assert(err.getMessage.contains("corrupted _tombstones_log"),
      s"unexpected error: ${err.getMessage}")
  }

  test("route symmetry on a composed delete: the brute arm drops the MaxValue-watermarked doc") {
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("composedelroute").toString
    val path = base + "/postings"
    // the batch-route-tomb construction, but through upsert + compose:
    // all docs share the query windows, so the route picks BRUTE
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    LateInteraction.writePostings(docs, path, "overwrite", seq = 0L)
    Seq((2L, 0L)).toDF("t_doc_id", "upto_seq")
      .write.mode("overwrite").parquet(path + "/_tombstones")
    LateInteraction.writePostings(Seq((2L, "alpha beta gamma"))
      .toDF("doc_id", "text"), path, "append", seq = 1L)
    LateInteraction.composeDelete(spark, path, Seq(2L))
    val srcs = Seq((1L, "alpha beta gamma"))
    val routed = LateInteraction.batchAutoRoute(spark, docs, srcs, path, 3)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(!routed.contains(2L),
      "the brute arm must drop a composed full delete exactly as the " +
        "indexed arm's postings do")
    assert(routed.toSet === Set(1L, 3L))
    val indexed = LateInteraction.serveBatchPostings(spark, docs, srcs,
        LateInteraction.resolvedPostings(spark, path), 3)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(routed === indexed,
      "both routes must answer identically on a compose-deleted table")
  }

  test("maxsim_upsert_delete_topk: the composed delete reaches above the upsert watermark") {
    val out = SparkEntry.queries("maxsim_upsert_delete_topk")(spark, sf)
      .collect()
    val q0 = out.filter(_.getAs[Long]("q_id") == 0L)
      .map(_.getAs[Long]("doc_id")).toSeq
    val q1 = out.filter(_.getAs[Long]("q_id") == 1L)
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(q0 === (0L +: (100001L to 100009L)),
      "q0 serves the surviving ties — the deleted doc's ORIGINAL " +
        "postings are gone")
    assert(q1 === Seq(1L),
      "q1 serves doc 1 alone — the deleted doc's REPLACEMENT postings " +
        "above the watermark are gone too")
  }

  test("a containing (non-equal) document cannot reach the full-tie score") {
    // the boundary-window property the oracle's token-sequence-equality
    // criterion rests on: text2 CONTAINS text1's token stream, but its
    // boundary windows differ, so at least one query window maxes < 1.0
    val w1 = LateInteraction.tokenWindows("spark shuffle join").toSet
    val w2 = LateInteraction.tokenWindows("big spark shuffle join fast").toSet
    assert(!w1.subsetOf(w2),
      "one-sided boundary windows must distinguish containment from equality")
  }
}
