package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec
import graft.ops.Lakehouse

/** Merge-on-read snapshots and zone-map file skipping: merge semantics,
  * base immutability (the point of MOR), real file pruning (the point of
  * zone maps), and the plan shape (aggregation, not a window sort).
  */
class LakehouseSpec extends SparkSpec {
  import spark.implicits._

  test("mor: latest-wins merge updates, deletes, and passes through") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mor_spec").toString
    Seq((1L, "O", 100L), (2L, "O", 200L), (3L, "F", 300L))
      .toDF("o_orderkey", "status", "price_e2")
      .write.parquet(tmp + "/base")
    Seq((2L, "U", 250L, false, 1L), (3L, "", -1L, true, 2L))
      .toDF("o_orderkey", "status", "price_e2", "tombstone", "seq")
      .write.parquet(tmp + "/delta")
    val out = Lakehouse.morRead(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out === Seq((1L, "O", 100L), (2L, "U", 250L))) // 3 tombstoned
  }

  test("mor: the delta write leaves every base file byte-identical") {
    val tmp = Lakehouse.morSnapshot(spark, sf) // builds base then delta
    val baseDir = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      "graft_mor_" + Integer.toHexString(sf.hashCode) + "/base")
    def listing = baseDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length, f.lastModified)).toSet
    val before = listing
    // a second delta-only write cycle must not touch base files
    val n = Lakehouse.morRead(spark,
      baseDir.getParentFile.getAbsolutePath).count()
    assert(n > 0)
    assert(listing === before, "base files changed under a MOR read")
  }

  test("mor: snapshot plan merges via aggregation, not a window sort") {
    val plan = SparkEntry.queries("mor_snapshot")(spark, sf)
      .queryExecution.sparkPlan
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"latest-wins should be max_by aggregation, found a window:\n$plan")
  }

  test("zonemap: prunes files and the pruned result matches the full scan") {
    SparkEntry.queries("zonemap_pruned_scan")(spark, sf) // builds layout+stats
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_zonemap_" + Integer.toHexString(sf.hashCode)).getAbsolutePath
    val (pruned, nSel, nTotal) =
      Lakehouse.zonemapRead(spark, tmp, "1996-01-01", "1996-06-30")
    assert(nTotal >= 8, s"expected >=8 range-clustered files, got $nTotal")
    assert(nSel < nTotal, s"no pruning: $nSel of $nTotal files selected")
    val full = spark.read.parquet(tmp + "/data")
      .filter(col("o_orderdate").between(
        lit("1996-01-01").cast("timestamp"), lit("1996-06-30").cast("timestamp")))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("revenue_e2"))
      .orderBy("o_orderstatus")
    assert(pruned.collect().toSeq === full.collect().toSeq)
  }

  test("zvalue: bit interleave puts a-bits even, b-bits odd") {
    import graft.ops.Lakehouse.zValue
    val df = Seq((3L, 0L), (0L, 3L), (1L, 1L)).toDF("a", "b")
      .select(zValue(col("a"), col("b")).as("z"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(5L, 10L, 3L))
  }

  test("zorder prunes BOTH dimensions; 1-D date clustering cannot prune custkey") {
    SparkEntry.queries("zorder_pruned_scan")(spark, sf) // builds layout+stats
    val ztmp = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_zorder_" + Integer.toHexString(sf.hashCode)).getAbsolutePath
    val (zOut, zSel, zTotal) =
      Lakehouse.zorderReadByCustkey(spark, ztmp, 10L, 40L)
    assert(zTotal >= 8)
    assert(zSel < zTotal, s"z-order did not prune custkey range: $zSel/$zTotal")
    // correctness under pruning
    val expect = spark.read.parquet(ztmp + "/data")
      .filter(col("o_custkey").between(10L, 40L))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("revenue_e2"))
      .orderBy("o_orderstatus")
    assert(zOut.collect().toSeq === expect.collect().toSeq)
    // the date dimension still prunes too (Z keeps both locally bounded)
    val stats = spark.read.parquet(ztmp + "/stats")
    val dSel = stats.filter(
      col("min_d") <= lit("1995-06-30").cast("timestamp") &&
        col("max_d") >= lit("1995-01-01").cast("timestamp")).count()
    assert(dSel < zTotal, "date range should prune some z-ordered files")
    // CONTRAST: the 1-D date-clustered layout gives custkey full range in
    // every file — its per-file custkey bounds all overlap the range
    SparkEntry.queries("zonemap_pruned_scan")(spark, sf)
    val dtmp = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_zonemap_" + Integer.toHexString(sf.hashCode)).getAbsolutePath
    val ckBounds = spark.read.parquet(dtmp + "/data")
      .groupBy(col("_metadata.file_path"))
      .agg(min("o_custkey").as("mn"), max("o_custkey").as("mx"))
      .filter(col("mn") <= 40L && col("mx") >= 10L).count()
    assert(ckBounds === spark.read.parquet(dtmp + "/stats").count(),
      "date-clustered files should ALL overlap the custkey range (no skipping)")
  }

  test("time travel: v1 never sees the append; v2 sees base + append") {
    val rows = SparkEntry.queries("time_travel_scan")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L))
    val base = Tables.orders(spark, sf).count()
    val appended = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 10 === 0).count()
    assert(rows(0)._2 === base)
    assert(rows(1)._2 === base + appended)
    assert(rows(1)._3 > rows(0)._3) // appended rows carry the price bump
  }

  test("vacuum deletes only unreferenced files; both manifest versions still read") {
    val before = SparkEntry.queries("time_travel_scan")(spark, sf).collect().toSeq
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_tt_" + Integer.toHexString(sf.hashCode)).getAbsolutePath
    // plant an orphan data file no manifest references (a failed write)
    val orphan = new java.io.File(tmp + "/base/part-orphan-deadbeef.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    val deleted = Lakehouse.vacuumUnreferenced(spark, tmp)
    // manifest lines and vacuum listings are QUALIFIED URIs (scheme
    // preserved — /x alone would resolve against defaultFS on a remote
    // store); compare in that form
    val hfs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def qualified(f: java.io.File) =
      hfs.makeQualified(new org.apache.hadoop.fs.Path(f.getAbsolutePath))
        .toString
    assert(deleted === Seq(qualified(orphan)), s"deleted: $deleted")
    assert(!orphan.exists())
    // re-read both versions through manifests: identical results
    Seq(1L, 2L).foreach { v =>
      val fs = graft.ingest.ManifestLog
        .read(spark, tmp + "/manifest_log", v)
        .getOrElse(fail(s"manifest v$v missing or torn"))
      assert(fs.forall(f => hfs.exists(new org.apache.hadoop.fs.Path(f))),
        s"vacuum deleted a referenced v$v file")
    }
    val after = SparkEntry.queries("time_travel_scan")(spark, sf).collect().toSeq
    assert(after === before)
  }

  test("mor compaction changes layout, never content") {
    val snapshot = SparkEntry.queries("mor_snapshot")(spark, sf).collect().toSeq
    val compacted = SparkEntry.queries("mor_compact")(spark, sf).collect().toSeq
    assert(compacted === snapshot)
  }

  test("zonemap append: sidecar covers every file; appended range prunes to new files") {
    SparkEntry.queries("zonemap_append_scan")(spark, sf) // build + append + stats
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_zmappend_" + Integer.toHexString(sf.hashCode)).getAbsolutePath
    val nFiles = new java.io.File(tmp + "/data").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val nStats = spark.read.parquet(tmp + "/stats").count()
    assert(nStats === nFiles.toLong, s"sidecar rows $nStats != files $nFiles")
    val (out, nSel, nTotal) =
      Lakehouse.zonemapRead(spark, tmp, "1998-02-01", "2002-12-31")
    assert(nTotal === nFiles)
    assert(nSel < nTotal, s"appended-range query did not prune: $nSel/$nTotal")
    assert(out.collect().map(_.getLong(1)).sum ===
      Tables.orders(spark, sf)
        .filter(col("o_orderdate").between(
          lit("1998-02-01").cast("timestamp"), lit("2002-12-31").cast("timestamp")))
        .count())
  }

  test("backfill: dynamic overwrite corrects target days, siblings untouched") {
    SparkEntry.queries("backfill_partitions")(spark, sf)
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_backfill_" + Integer.toHexString(sf.hashCode)).getAbsolutePath
    val byDay = spark.read.parquet(tmp)
      .groupBy("day_id").agg(collect_set("corrected").as("flags"))
      .collect() // day_id comes back int-typed from partition-dir inference
      .map(r => (r.getAs[Number](0).longValue, r.getSeq[Boolean](1).toSet)).toMap
    byDay.foreach { case (day, flags) =>
      val expected = if (day >= 19733L && day <= 19735L) Set(true) else Set(false)
      assert(flags === expected, s"day $day flags $flags")
    }
    assert(byDay.keys.exists(d => d >= 19733L && d <= 19735L))
    assert(byDay.keys.exists(d => d < 19733L || d > 19735L))
  }

  test("schema evolution: merged read unifies generations, old rows get NULLs") {
    val rows = SparkEntry.queries("schema_evolution_scan")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val total = Tables.orders(spark, sf).count()
    assert(rows.keySet === Set("tracked", "untracked"))
    assert(rows.values.sum === total, "generations must partition all orders")
  }

  test("format interchange: ORC and CSV round-trips preserve every text byte") {
    val viaParquet = Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        countDistinct(md5(col("text"))).as("n_distinct_texts"))
      .orderBy("source").collect().toSeq
    assert(SparkEntry.queries("orc_interchange")(spark, sf).collect().toSeq === viaParquet)
    assert(SparkEntry.queries("csv_interchange")(spark, sf).collect().toSeq === viaParquet)
  }

  test("zonemap: a range outside all file bounds reads zero files") {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_zonemap_" + Integer.toHexString(sf.hashCode)).getAbsolutePath
    val (out, nSel, _) =
      Lakehouse.zonemapRead(spark, tmp, "2030-01-01", "2030-12-31")
    assert(nSel === 0)
    assert(out.count() === 0)
  }

  test("bloom: prunes to the containing file and never misses a present key") {
    SparkEntry.queries("bloom_pruned_lookup")(spark, sf) // builds data+bloom
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bloom_" + Integer.toHexString(sf.hashCode)).getAbsolutePath
    val all = spark.read.parquet(tmp + "/data")
      .select("o_orderkey").collect().map(_.getLong(0))
    // probe an arbitrary present key: found, and from a pruned file set
    val key = all(all.length / 2)
    val (out, nSel, nTotal) = Lakehouse.bloomLookup(spark, tmp, Seq(key))
    assert(nTotal >= 8, s"expected >=8 date-clustered files, got $nTotal")
    assert(nSel < nTotal, s"no pruning: $nSel of $nTotal files selected")
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(key), "present key missed")
  }

  test("bloom: an absent key prunes every file and returns no rows") {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bloom_" + Integer.toHexString(sf.hashCode)).getAbsolutePath
    val (out, nSel, _) = Lakehouse.bloomLookup(spark, tmp, Seq(-987654321L))
    assert(nSel === 0, s"absent key selected $nSel files")
    assert(out.count() === 0)
  }

  test("bloom: an empty key list selects no files and returns no rows") {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bloom_" + Integer.toHexString(sf.hashCode)).getAbsolutePath
    val (out, nSel, _) = Lakehouse.bloomLookup(spark, tmp, Seq.empty)
    assert(nSel === 0)
    assert(out.count() === 0)
  }

  test("cdc: an empty commit delta produces an empty change feed") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdc_empty").toString
    Seq((1L, "O", 100L)).toDF("o_orderkey", "status", "price_e2")
      .write.parquet(tmp + "/base")
    Seq.empty[(Long, String, Long, Boolean, Long)]
      .toDF("o_orderkey", "status", "price_e2", "tombstone", "seq")
      .coalesce(1).write.parquet(tmp + "/delta")
    assert(Lakehouse.cdcRead(spark, tmp).count() === 0)
  }

  test("cdc: classifies insert/delete/update and nets multi-change keys") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdc_spec").toString
    Seq((1L, "O", 100L), (2L, "O", 200L), (3L, "F", 300L))
      .toDF("o_orderkey", "status", "price_e2")
      .write.parquet(tmp + "/base")
    Seq(
      (2L, "U", 250L, false, 1L),  // update of an existing key
      (3L, "U", 350L, false, 1L),  // upsert then tombstone: nets to delete
      (3L, "", -1L, true, 2L),
      (9L, "N", 900L, false, 1L),  // brand-new key: insert
      (7L, "", -1L, true, 2L))     // tombstone for a missing key: no-op
      .toDF("o_orderkey", "status", "price_e2", "tombstone", "seq")
      .write.parquet(tmp + "/delta")
    val out = Lakehouse.cdcRead(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(out === Seq(
      (2L, "update_postimage", "U", 250L),
      (2L, "update_preimage", "O", 200L),
      (3L, "delete", "F", 300L),
      (9L, "insert", "N", 900L)))
  }

  test("cdc apply: replica after apply equals the post-commit snapshot") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdc_apply").toString
    Seq((1L, "O", 100L), (2L, "O", 200L), (3L, "F", 300L))
      .toDF("o_orderkey", "status", "price_e2")
      .write.parquet(tmp + "/base")
    Seq(
      (2L, "U", 250L, false, 1L),  // update
      (3L, "", -1L, true, 2L),     // delete
      (9L, "N", 900L, false, 1L),  // insert
      (7L, "", -1L, true, 2L))     // no-op tombstone for a missing key
      .toDF("o_orderkey", "status", "price_e2", "tombstone", "seq")
      .write.parquet(tmp + "/delta")
    val replica = Lakehouse.cdcApply(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(replica === Seq((1L, "O", 100L), (2L, "U", 250L), (9L, "N", 900L)))
  }

  test("multi_table_snapshot: every version audits consistent, and a torn writer's files are invisible and vacuumable") {
    import graft.ops.Lakehouse
    import graft.ingest.ManifestLog
    val rows = SparkEntry.queries("multi_table_snapshot")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("version")).toSeq === Seq(1L, 2L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dangling") === 0L,
        s"version ${r.getAs[Long]("version")}: dangling ids — a reader " +
          "saw one member table's commit without the other's")
      assert(r.getAs[Long]("n_docs") === r.getAs[Long]("n_stats"))
    }
    assert(rows(0).getAs[Long]("n_docs") < rows(1).getAs[Long]("n_docs"),
      "v1 is the half-corpus snapshot, v2 the full one")
    // TORN WRITER: new docs-table files land with NO commit — the head
    // must not move, the head's audit must be unchanged, and the files
    // must be unreferenced (vacuum-eligible), exactly like a writer
    // that died between its table writes and its CAS commit
    val tmp = Tables.scratchPath("graft_mtx", sf)
    val logDir = tmp + "/mtx_log"
    val headBefore = ManifestLog.currentVersion(spark, logDir)
    spark.range(5).selectExpr("id AS doc_id")
      .write.mode("overwrite").parquet(s"$tmp/docs/torn")
    assert(ManifestLog.currentVersion(spark, logDir) === headBefore,
      "uncommitted table files must never advance the head")
    val audit = Lakehouse
      .readMultiTableVersion(spark, logDir, headBefore).collect().head
    assert(audit.getAs[Long]("n_dangling") === 0L &&
      audit.getAs[Long]("n_docs") === rows(1).getAs[Long]("n_docs"),
      "the head's audit must be unchanged by a torn writer")
    val referenced = ManifestLog.allReferenced(spark, logDir)
    val tornFiles = new java.io.File(s"$tmp/docs/torn").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(tornFiles.nonEmpty)
    tornFiles.foreach(f => assert(!referenced.exists(_.contains(f)),
      s"torn file $f must be unreferenced (vacuum-eligible)"))
    // single-version consistency is STRUCTURAL: each version's lines
    // name both member tables, and all of a version's files come from
    // the same atomic writeTables call (same v<N> directory)
    Seq(1L, 2L).foreach { v =>
      val lines = ManifestLog.read(spark, logDir, v).get
      assert(lines.exists(_.startsWith("docs:")) &&
        lines.exists(_.startsWith("stats:")),
        s"v$v must list BOTH member tables")
      assert(lines.forall(_.contains(s"/v$v/")),
        s"v$v mixes table generations: $lines")
    }
  }

  test("columnMappedScan: a renamed column reads across generations by field id") {
    val spark2 = spark
    import spark2.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("colmap").toString + "/t"
    Seq((1L, 10L)).toDF("k", "v_old")
      .write.parquet(tmp + "/gen=1")
    Seq((2L, 20L, "x")).toDF("k", "v_new", "tag")
      .write.parquet(tmp + "/gen=2")
    Lakehouse.commitColumnMapping(spark, tmp, 1L,
      Seq(1 -> "k", 2 -> "v_old"))
    Lakehouse.commitColumnMapping(spark, tmp, 2L,
      Seq(1 -> "k", 2 -> "v_new", 3 -> "tag"))
    val out = Lakehouse.columnMappedScan(spark, tmp)
      .orderBy("k").collect()
    assert(out.map(_.getAs[Long]("v_new")).toSeq === Seq(10L, 20L),
      "generation 1's v_old must read under the latest name v_new")
    assert(out.map(r => Option(r.getAs[String]("tag"))).toSeq ===
      Seq(None, Some("x")),
      "a column added later surfaces NULL for older generations")
  }

  test("columnMappedScan: a MAPPING-ONLY generation is the pure rename the catalog advertises") {
    val spark2 = spark
    import spark2.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("colmapren").toString + "/t"
    Seq((1L, 10L)).toDF("k", "v_old").write.parquet(tmp + "/gen=1")
    Lakehouse.commitColumnMapping(spark, tmp, 1L,
      Seq(1 -> "k", 2 -> "v_old"))
    // the rename: ONE catalog row set, ZERO data written for gen 2
    Lakehouse.commitColumnMapping(spark, tmp, 2L,
      Seq(1 -> "k", 2 -> "v_new"))
    val out = Lakehouse.columnMappedScan(spark, tmp).collect()
    assert(out.length === 1 && out.head.getAs[Long]("v_new") === 10L,
      "gen 1's data must read under the mapping-only latest generation's " +
        "name — a rename is one catalog commit, zero data rewrites")
    // duplicate (gen, field_id) mappings decline instead of resolving by
    // collect ordering
    Lakehouse.commitColumnMapping(spark, tmp, 2L, Seq(2 -> "v_other"))
    val dup = intercept[IllegalArgumentException] {
      Lakehouse.columnMappedScan(spark, tmp).collect()
    }
    assert(dup.getMessage.contains("multiple names"),
      s"unexpected decline: ${dup.getMessage}")
  }

  test("columnMappedScan declines an UNEXPLAINED drop and an unmapped physical column") {
    val spark2 = spark
    import spark2.implicits._
    // field id 2 vanishes from the latest mapping with NO retirement row
    // — indistinguishable from a catalog bug, so it declines
    val t1 = java.nio.file.Files
      .createTempDirectory("colmapdrop").toString + "/t"
    Seq((1L, 10L)).toDF("k", "v").write.parquet(t1 + "/gen=1")
    Seq(2L).toDF("k").write.parquet(t1 + "/gen=2")
    Lakehouse.commitColumnMapping(spark, t1, 1L, Seq(1 -> "k", 2 -> "v"))
    Lakehouse.commitColumnMapping(spark, t1, 2L, Seq(1 -> "k"))
    val drop = intercept[IllegalStateException] {
      Lakehouse.columnMappedScan(spark, t1).collect()
    }
    assert(drop.getMessage.contains("NO retirement row"),
      s"unexpected decline message: ${drop.getMessage}")
    // the SAME table scans fine once the drop is committed explicitly
    Lakehouse.retireColumnMapping(spark, t1, 2L, Seq(2))
    val served = Lakehouse.columnMappedScan(spark, t1)
    assert(served.columns.toSeq === Seq("k"),
      "a retired field id projects away from every generation")
    assert(served.orderBy("k").collect().map(_.getLong(0)).toSeq ===
      Seq(1L, 2L))
    // UNMAPPED: a physical column with no field id in its generation
    val t2 = java.nio.file.Files
      .createTempDirectory("colmapguess").toString + "/t"
    Seq((1L, 10L)).toDF("k", "mystery").write.parquet(t2 + "/gen=1")
    Lakehouse.commitColumnMapping(spark, t2, 1L, Seq(1 -> "k"))
    val guess = intercept[IllegalArgumentException] {
      Lakehouse.columnMappedScan(spark, t2).collect()
    }
    assert(guess.getMessage.contains("unmapped physical"),
      s"unexpected decline message: ${guess.getMessage}")
  }

  test("columnMappedScan: re-adding a dropped NAME mints a new field id; the old id never resurrects") {
    val spark2 = spark
    import spark2.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("colmapreadd").toString + "/t"
    // gen 1: poison score under field id 2
    Seq((1L, -1L)).toDF("k", "score").write.parquet(tmp + "/gen=1")
    Lakehouse.commitColumnMapping(spark, tmp, 1L, Seq(1 -> "k", 2 -> "score"))
    // gen 2: the drop
    Lakehouse.dropColumns(spark, tmp, 2L, Seq(1 -> "k"),
      droppedFieldIds = Seq(2))
    // re-adding the NAME under the OLD field id declines loudly
    Lakehouse.commitColumnMapping(spark, tmp, 3L, Seq(1 -> "k", 2 -> "score"))
    val res = intercept[IllegalStateException] {
      Lakehouse.columnMappedScan(spark, tmp).collect()
    }
    assert(res.getMessage.contains("retired field ids") &&
      res.getMessage.contains("NEW field id"),
      s"unexpected decline message: ${res.getMessage}")
    // under a NEW field id the re-add serves, and gen 1's poison stays
    // NULL — the retired id's data never resurrects under the new name
    val t2 = java.nio.file.Files
      .createTempDirectory("colmapreadd2").toString + "/t"
    Seq((1L, -1L)).toDF("k", "score").write.parquet(t2 + "/gen=1")
    Seq((2L, 7L)).toDF("k", "score").write.parquet(t2 + "/gen=3")
    Lakehouse.commitColumnMapping(spark, t2, 1L, Seq(1 -> "k", 2 -> "score"))
    Lakehouse.dropColumns(spark, t2, 2L, Seq(1 -> "k"),
      droppedFieldIds = Seq(2))
    Lakehouse.commitColumnMapping(spark, t2, 3L, Seq(1 -> "k", 3 -> "score"))
    val out = Lakehouse.columnMappedScan(spark, t2).orderBy("k").collect()
    assert(out.map(r => if (r.isNullAt(1)) None else Some(r.getLong(1)))
      .toSeq === Seq(None, Some(7L)),
      "gen 1's retired score must surface NULL, never the poison −1")
  }

  test("columnMappedScan: a data generation with no catalog rows declines instead of vanishing") {
    val spark2 = spark
    import spark2.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("colmaporphan").toString + "/t"
    Seq((1L, 10L)).toDF("k", "v").write.parquet(tmp + "/gen=1")
    // the crashed writer: gen 2's DATA landed, its mapping commit didn't
    Seq((2L, 20L)).toDF("k", "v").write.parquet(tmp + "/gen=2")
    Lakehouse.commitColumnMapping(spark, tmp, 1L, Seq(1 -> "k", 2 -> "v"))
    val orphan = intercept[IllegalArgumentException] {
      Lakehouse.columnMappedScan(spark, tmp).collect()
    }
    assert(orphan.getMessage.contains("no catalog rows"),
      s"unexpected decline message: ${orphan.getMessage}")
    // cataloguing the generation heals the scan
    Lakehouse.commitColumnMapping(spark, tmp, 2L, Seq(1 -> "k", 2 -> "v"))
    assert(Lakehouse.columnMappedScan(spark, tmp).count() === 2L)
  }

  test("cdc: the base reaches its broadcast join without an exchange") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // AQE off for this one plan walk: under AQE the executed plan is an
    // AdaptiveSparkPlanExec leaf that collect() cannot descend into
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("cdc_change_feed")(spark, sf)
        .queryExecution.executedPlan
      // the delta-sized net agg and the final sort may shuffle, but the
      // base scan must feed its (preimage-harvesting) broadcast join with
      // no ShuffleExchange in between
      val ok = plan.collect { case j: BroadcastHashJoinExec => j }.exists {
        _.children.exists { c =>
          c.collect {
            case s: FileSourceScanExec if s.relation.location.rootPaths
              .exists(p => p.toString.contains("graft_cdc") &&
                p.toString.endsWith("/base")) => s
          }.nonEmpty &&
          c.collect { case e: ShuffleExchangeExec => e }.isEmpty
        }
      }
      assert(ok,
        s"base scan must reach its broadcast join without an exchange:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
