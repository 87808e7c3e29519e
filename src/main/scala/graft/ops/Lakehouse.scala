package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Lakehouse table-maintenance patterns: merge-on-read snapshots and
  * file-level zone-map skipping. Neither exists in the reference (its
  * vector store rewrites the whole collection on update — SURVEY.md §2.2
  * K2); both are what make a 100 TB table updatable and scannable without
  * rewriting or reading all of it.
  */
object Lakehouse extends QueryModule {

  private def tmpPath(prefix: String, dir: String): String =
    Tables.scratchPath(prefix, dir)

  // ---- merge-on-read snapshot ----

  /** Merge-on-read upsert/delete (the Hudi/Iceberg MOR shape): the base
    * table is IMMUTABLE; changes land as a small seq-stamped delta log
    * (upserts carry new values, deletes are tombstones); a snapshot read
    * merges latest-wins per key at query time. At 100 TB the write cost
    * scales with the delta, never the base — the alternative
    * (copy-on-write) rewrites every touched file.
    *
    * The planted delta is derived deterministically from the data (10% of
    * keys upserted with a price bump, 4% tombstoned) so the DuckDB oracle
    * can replay the identical merge. Tombstones use non-null sentinels
    * ('' / -1) — both engines' arg/max_by null semantics stay out of the
    * compare.
    */
  def morSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val tmp = tmpPath("graft_mor", dir)
    val base = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderstatus").as("status"),
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("price_e2"))
    base.write.mode("overwrite").parquet(tmp + "/base")
    val upserts = base.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), lit("U").as("status"),
        (col("price_e2") + 10000L).as("price_e2"),
        lit(false).as("tombstone"), lit(1L).as("seq"))
    val deletes = base.filter(col("o_orderkey") % 25 === 0)
      .select(col("o_orderkey"), lit("").as("status"),
        lit(-1L).as("price_e2"), lit(true).as("tombstone"), lit(2L).as("seq"))
    upserts.unionByName(deletes).write.mode("overwrite").parquet(tmp + "/delta")
    morRead(spark, tmp)
  }

  /** The snapshot read, separated so specs can drive it against a base
    * whose files they can prove untouched. Latest-wins is ONE max_by
    * aggregation (map-side partials, no window sort): per key the highest
    * seq's row survives, tombstones drop. seq is unique per key by
    * construction (base 0, upsert 1, delete 2), so max_by is total.
    */
  def morRead(spark: SparkSession, tmp: String): DataFrame = {
    val base = spark.read.parquet(tmp + "/base")
      .withColumn("tombstone", lit(false)).withColumn("seq", lit(0L))
    val delta = spark.read.parquet(tmp + "/delta")
    base.unionByName(delta)
      .groupBy("o_orderkey")
      .agg(max_by(struct(col("status"), col("price_e2"), col("tombstone")),
        col("seq")).as("r"))
      .filter(!col("r.tombstone"))
      .select(col("o_orderkey"), col("r.status").as("status"),
        col("r.price_e2").as("price_e2"))
      .orderBy("o_orderkey")
  }

  private val morSnapshotSql =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus AS status,
      |         CAST(floor(o_totalprice * 100) AS BIGINT) AS price_e2,
      |         FALSE AS tombstone, 0 AS seq
      |  FROM orders),
      |delta AS (
      |  SELECT o_orderkey, 'U' AS status, price_e2 + 10000 AS price_e2,
      |         FALSE AS tombstone, 1 AS seq
      |  FROM base WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey, '', -1, TRUE, 2 FROM base WHERE o_orderkey % 25 = 0),
      |merged AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
      |  FROM (SELECT * FROM base UNION ALL SELECT * FROM delta))
      |SELECT o_orderkey, status, price_e2
      |FROM merged WHERE rn = 1 AND NOT tombstone
      |ORDER BY o_orderkey""".stripMargin

  // ---- zone-map file skipping ----

  /** File-level data skipping below partition granularity (the
    * Delta/Iceberg manifest-stats pattern): data is range-clustered on
    * the filter column at write time so each file covers a tight value
    * slice, and a per-file min/max sidecar (the "manifest") lets the
    * query prune to overlapping files BEFORE any data is read. At 100 TB
    * the sidecar is catalog-scale (one row per file), so the driver-side
    * file-list filter is bounded by file count, not data size.
    *
    * Here the sidecar is backfilled with one scan over `_metadata
    * .file_path`; in production it is written from parquet footer stats
    * at commit time. The oracle is the plain filtered aggregate —
    * pruning must be invisible to results (spec pins that files ARE
    * skipped).
    */
  def zonemapScan(spark: SparkSession, dir: String): DataFrame = {
    val tmp = tmpPath("graft_zonemap", dir)
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .repartitionByRange(8, col("o_orderdate"))
      .write.mode("overwrite").parquet(tmp + "/data")
    spark.read.parquet(tmp + "/data")
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min("o_orderdate").as("min_d"), max("o_orderdate").as("max_d"))
      .write.mode("overwrite").parquet(tmp + "/stats")
    zonemapRead(spark, tmp, "1996-01-01", "1996-06-30")._1
  }

  /** The pruned read: returns (result, prunedFiles, totalFiles) so the
    * spec can assert real skipping. The collect is over the sidecar —
    * file-count-bounded, the same cardinality a catalog lookup returns.
    */
  def zonemapRead(spark: SparkSession, tmp: String, lo: String, hi: String)
      : (DataFrame, Int, Int) = {
    // ONE sidecar pass: the sidecar is file-count-bounded (catalog-scale),
    // so total + overlap filter fold into a single collect instead of a
    // count job plus a filter job
    val statRows = spark.read.parquet(tmp + "/stats")
      .select(col("file"),
        (col("min_d") <= lit(hi).cast("timestamp") &&
          col("max_d") >= lit(lo).cast("timestamp")).as("hit"))
      .collect()
    val total = statRows.length
    // null-guard: an all-null/empty file group's min/max make `hit` null —
    // a null predicate means "no overlap proven", same as the previous
    // filter() semantics that silently dropped it
    val files = statRows
      .filter(r => !r.isNullAt(1) && r.getBoolean(1)).map(_.getString(0))
    val pruned =
      if (files.isEmpty) spark.read.parquet(tmp + "/data").limit(0)
      else spark.read.parquet(files.toIndexedSeq: _*)
    val out = pruned
      .filter(col("o_orderdate").between(
        lit(lo).cast("timestamp"), lit(hi).cast("timestamp")))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("revenue_e2"))
      .orderBy("o_orderstatus")
    (out, files.length, total)
  }

  // CAST the sum: DuckDB sum(BIGINT) returns HUGEINT, which the driver's
  // pandas frame widens to float64 against Spark's int64 — hash-red on
  // identical values (the r4 lesson, applied everywhere).
  private val zonemapScanSql =
    """SELECT o_orderstatus, count(*) AS n_orders,
      |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_e2
      |FROM orders
      |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-06-30'
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- bloom-filter file skipping (point lookups below zone maps) ----

  /** Bits per file-level bloom filter (2^21 = 32768 words) and hash
    * count. At ~20k keys/file the fill is ~5%, so a point probe's
    * false-positive rate is ~0.05^6 — effectively one data file read
    * per present key, zero for absent keys.
    */
  private val BloomBitsLog2 = 21
  private val BloomSeeds = 6

  /** The k bloom positions of a key — ONE expression shared by the index
    * build and the probe, so the two can never disagree on hashing.
    */
  private def bloomPositions(key: Column): Column =
    transform(sequence(lit(0), lit(BloomSeeds - 1)),
      s => pmod(xxhash64(key, s), lit(1L << BloomBitsLog2)))

  /** File-level bloom sidecar for point lookups (the Iceberg Puffin /
    * Parquet bloom pattern lifted to the manifest): zone maps prune
    * RANGE predicates on the clustering column, but a point lookup on a
    * non-clustered key overlaps every file's min/max — a bloom sidecar
    * prunes those. Complementary to `zonemapScan` over the SAME
    * date-clustered layout: dates prune by range, keys by bloom.
    *
    * The build is one distributed scan: each row explodes to k (file,
    * bit-position) pairs, folded per (file, word) with `bit_or` — no
    * driver-side bitmap ever materializes. The sidecar stores occupied
    * 64-bit words as rows clustered by word_idx, so a probe reads only
    * the k words it needs (pushed `word_idx IN` filter → row-group
    * pruning), not the whole bitmap: probe cost is k·files ROWS even
    * when the sidecar holds millions of words.
    *
    * The driver row looks up the 3 smallest orderkeys through the index;
    * the oracle is the plain IN-subquery lookup — like zone maps,
    * pruning must be invisible to results (the spec pins that files are
    * actually skipped and absent keys read nothing).
    */
  def bloomScan(spark: SparkSession, dir: String): DataFrame = {
    val tmp = tmpPath("graft_bloom", dir)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus").as("status"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("price_e2"),
        col("o_orderdate"))
      .repartitionByRange(8, col("o_orderdate"))
      .write.mode("overwrite").parquet(tmp + "/data")
    spark.read.parquet(tmp + "/data")
      .select(col("_metadata.file_path").as("file"),
        explode(bloomPositions(col("o_orderkey"))).as("pos"))
      .select(col("file"), expr("pos DIV 64").as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("mask"))
      .groupBy("file", "word_idx")
      .agg(expr("bit_or(mask)").as("word"))
      .sortWithinPartitions("word_idx") // cluster for probe row-group pruning
      .write.mode("overwrite").parquet(tmp + "/bloom")
    val needles = spark.read.parquet(tmp + "/data")
      .select("o_orderkey").orderBy("o_orderkey").limit(3)
      .collect().map(_.getLong(0)).toIndexedSeq // serving-path: 3 rows
    bloomLookup(spark, tmp, needles)._1
  }

  /** The pruned point lookup: returns (result, candidateFiles,
    * totalFiles) so the spec can assert real skipping. Collects are the
    * needles' bit positions (≤ k·|keys| rows) and the candidate file
    * list (catalog-scale) — never data or sidecar bulk.
    */
  def bloomLookup(spark: SparkSession, tmp: String, keys: Seq[Long])
      : (DataFrame, Int, Int) = {
    import spark.implicits._
    val total = graft.ingest.ManifestLog
      .listParquetLeaves(spark, tmp + "/data").size
    // the needles' positions, computed by the SAME Spark expression as
    // the build, then pinned driver-side for the pushable IN filter
    val probeRows = keys.toDF("needle")
      .select(col("needle"),
        explode(array_distinct(bloomPositions(col("needle")))).as("pos"))
      .select(col("needle"), expr("pos DIV 64").as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("mask"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nReq = probeRows.groupBy(_._1).view.mapValues(_.length).toMap
    val wordIdxs = probeRows.map(_._2).distinct
    val probe = probeRows.toIndexedSeq.toDF("needle", "word_idx", "mask")
    val candFiles = spark.read.parquet(tmp + "/bloom")
      .filter(col("word_idx").isin(wordIdxs: _*)) // pushed: k·files rows read
      .join(broadcast(probe), Seq("word_idx"))
      .filter((col("word").bitwiseAND(col("mask"))) =!= 0L)
      .groupBy("needle", "file").agg(count(lit(1)).as("n_hit"))
      .join(broadcast(nReq.toSeq.toDF("needle", "n_req")), Seq("needle"))
      .filter(col("n_hit") === col("n_req"))
      .select("file").distinct()
      .collect().map(_.getString(0)) // catalog-scale candidate list
    val out =
      if (candFiles.isEmpty)
        spark.read.parquet(tmp + "/data").limit(0)
          .select("o_orderkey", "status", "price_e2")
      else
        spark.read.parquet(candFiles.toIndexedSeq: _*)
          .filter(col("o_orderkey").isin(keys: _*))
          .select("o_orderkey", "status", "price_e2")
          .orderBy("o_orderkey")
    (out, candFiles.length, total)
  }

  private val bloomScanSql =
    """SELECT o_orderkey, o_orderstatus AS status,
      |       CAST(floor(o_totalprice * 100) AS BIGINT) AS price_e2
      |FROM orders
      |WHERE o_orderkey IN (
      |  SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 3)
      |ORDER BY o_orderkey""".stripMargin

  // ---- Z-order clustering (multi-dimensional zone maps) ----

  /** Bit-interleave two 16-bit column values into one Z-value — a pure
    * codegen'd shift/or expression chain, no UDF. Z-ordering is WHY
    * multi-dimensional data skipping works: linear clustering on one
    * column gives the other column full-range min/max in every file, so
    * its predicates prune nothing; interleaved bits keep BOTH columns
    * locally bounded per file.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Z-order layout over (order date, customer key) + a two-column
    * min/max sidecar; the driver row filters on a CUSTOMER-KEY range —
    * the dimension the 1-D date clustering cannot skip on (the spec
    * shows exactly that contrast) — and must still prune files. Oracle =
    * the plain filtered aggregate; pruning is invisible to results.
    */
  def zorderScan(spark: SparkSession, dir: String): DataFrame = {
    val tmp = tmpPath("graft_zorder", dir)
    // NTZ-safe epoch day (session TZ is UTC everywhere)
    val day = expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000")
    // Normalize BOTH dimensions to the full 16-bit range before
    // interleaving: with raw values a wide dimension's high bits dominate
    // the curve and the narrow dimension never partitions across files
    // (observed: ~14-bit day vs ~8-bit custkey → zero custkey pruning).
    // Production z-writers do the same via sampled rank normalization;
    // the one-row min/max aggregate is its linear equivalent here.
    val bounds = Tables.orders(spark, dir)
      .agg(min(day).as("d0"), max(day).as("d1"),
        min(col("o_custkey")).as("c0"), max(col("o_custkey")).as("c1"))
      .head()
    val (d0, d1) = (bounds.getLong(0), bounds.getLong(1))
    val (c0, c1) = (bounds.getLong(2), bounds.getLong(3))
    def norm(c: Column, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else (c - lit(lo)) * lit(65535L) / lit(hi - lo)
    val z = zValue(norm(day.cast("long"), d0, d1).cast("long"),
      norm(col("o_custkey"), c0, c1).cast("long"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), z.as("zv"))
      .repartitionByRange(8, col("zv"))
      .sortWithinPartitions(col("zv"))
      .drop("zv")
      .write.mode("overwrite").parquet(tmp + "/data")
    spark.read.parquet(tmp + "/data")
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min("o_orderdate").as("min_d"), max("o_orderdate").as("max_d"),
        min("o_custkey").as("min_ck"), max("o_custkey").as("max_ck"))
      .write.mode("overwrite").parquet(tmp + "/stats")
    zorderReadByCustkey(spark, tmp, 100L, 400L)._1
  }

  /** Pruned read on the customer-key dimension; returns (result,
    * prunedFiles, totalFiles) for the spec.
    */
  def zorderReadByCustkey(spark: SparkSession, tmp: String, lo: Long, hi: Long)
      : (DataFrame, Int, Int) = {
    // ONE sidecar pass (see zonemapRead)
    val statRows = spark.read.parquet(tmp + "/stats")
      .select(col("file"),
        (col("min_ck") <= hi && col("max_ck") >= lo).as("hit"))
      .collect()
    val total = statRows.length
    // null-guard — see zonemapRead
    val files = statRows
      .filter(r => !r.isNullAt(1) && r.getBoolean(1)).map(_.getString(0))
    val pruned =
      if (files.isEmpty) spark.read.parquet(tmp + "/data").limit(0)
      else spark.read.parquet(files.toIndexedSeq: _*)
    val out = pruned.filter(col("o_custkey").between(lo, hi))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("revenue_e2"))
      .orderBy("o_orderstatus")
    (out, files.length, total)
  }

  private val zorderScanSql =
    """SELECT o_orderstatus, count(*) AS n_orders,
      |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_e2
      |FROM orders WHERE o_custkey BETWEEN 100 AND 400
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- versioned manifests: time travel + compaction invariance ----

  /** Manifest-driven versioned reads (the Iceberg/Delta snapshot model):
    * each table version is a MANIFEST row set listing its data files —
    * readers never list directories (at 100 TB listing is the scaling
    * pain and gives no isolation), they read the manifest for version v
    * and open exactly those files. Version 1 = base files; version 2 =
    * base + delta files (an append commits by writing files THEN adding
    * manifest rows, so readers of v1 never see a torn append).
    *
    * The driver row reads BOTH versions through manifests and emits
    * per-version totals; the oracle recomputes them from the logical
    * construction. The manifest read is file-count-bounded (catalog
    * scale), same contract as the zone-map sidecar.
    *
    * Commits go through `ManifestLog` — the optimistic-CAS versioned log
    * (exclusive create of `v<N>.manifest`, sentinel-guarded content), so
    * the commit path is MULTI-WRITER safe: two racing committers resolve
    * to consecutive versions with both updates applied, and readers never
    * see a torn version (ManifestLogSpec pins the interleaving).
    */
  def timeTravelScan(spark: SparkSession, dir: String): DataFrame = {
    val tmp = tmpPath("graft_tt", dir)
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("price_e2"))
    base.write.mode("overwrite").parquet(tmp + "/base")
    // the appended commit: every 10th key re-landed with a price bump
    base.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), (col("price_e2") + 10000L).as("price_e2"))
      .write.mode("overwrite").parquet(tmp + "/append")
    // the shared qualified-URI listing, never java.io: these lists
    // become MANIFEST lines, and an empty listing would commit a
    // version that serves nothing
    def files(sub: String): Seq[String] = {
      val listed = graft.ingest.ManifestLog
        .listParquetLeaves(spark, tmp + "/" + sub)
      require(listed.nonEmpty, s"manifest commit for $sub listed no files")
      listed
    }
    // fresh log per rebuild (the data dirs above were just overwritten)
    val logDir = tmp + "/manifest_log"
    val logP = new org.apache.hadoop.fs.Path(logDir)
    logP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(logP, true)
    // v1: the base files; v2: the append commits ON TOP of the head it
    // read — exactly the optimistic-writer shape (files first, then the
    // CAS manifest claim, so a v1 reader never sees a torn append)
    graft.ingest.ManifestLog.commit(spark, logDir, _ => files("base"))
    graft.ingest.ManifestLog.commit(spark, logDir, head => head ++ files("append"))
    def readVersion(v: Long): DataFrame = {
      val fs = graft.ingest.ManifestLog.read(spark, logDir, v)
        .getOrElse(throw new java.io.IOException(s"missing manifest v$v"))
      spark.read.parquet(fs: _*)
        .agg(lit(v).as("version"), count(lit(1)).as("n_rows"),
          sum(col("price_e2")).as("total_e2"))
    }
    readVersion(1L).unionByName(readVersion(2L))
      .select(col("version"), col("n_rows"), col("total_e2"))
      .orderBy("version")
  }

  private val timeTravelScanSql =
    """WITH base AS (
      |  SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS price_e2
      |  FROM orders),
      |v2 AS (
      |  SELECT * FROM base
      |  UNION ALL
      |  SELECT o_orderkey, price_e2 + 10000 FROM base WHERE o_orderkey % 10 = 0)
      |SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_rows,
      |       CAST(sum(price_e2) AS BIGINT) AS total_e2 FROM base
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(price_e2) AS BIGINT) FROM v2
      |ORDER BY version""".stripMargin

  /** ATOMIC MULTI-TABLE snapshot commit — snapshot isolation ACROSS
    * tables, the transaction shape single-table logs (Delta, Iceberg
    * HadoopTables) only get from an external catalog: one ManifestLog
    * version lists EVERY member table's data files (namespaced
    * `<table>:<path>` lines), so a reader that resolves a version reads
    * a consistent table SET by construction — docs-v2 joined with
    * stats-v1 is unrepresentable; there is no interleaving in which a
    * reader sees one table's commit without the other's. Files land
    * first; the CAS commit publishes both tables at once; a writer
    * dying between its table writes and the commit is invisible
    * (unreferenced files, vacuumable — LakehouseSpec pins it).
    *
    * The row reads BOTH versions back through the manifest and emits a
    * per-version consistency audit: each table's row count, the token
    * total, and the count of DANGLING ids (rows present in one member
    * table but not the other — atomicity makes it identically 0).
    */
  def multiTableSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val tmp = tmpPath("graft_mtx", dir)
    // the engine tokenizer replayed natively (codegen'd, no UDF); the
    // oracle replays the same regex in DuckDB — the maxsim rows' parity
    val nTok = size(filter(split(lower(col("text")), "[^\\p{L}\\p{N}]+"),
      t => length(t) > 0))
    val full = Tables.documents(spark, dir)
      .select(col("doc_id"), nTok.cast("long").as("n_tokens"))
    val hconf = spark.sparkContext.hadoopConfiguration
    def writeTables(sub: String, d: DataFrame): Seq[String] = {
      d.select("doc_id").write.mode("overwrite").parquet(s"$tmp/docs/$sub")
      d.select("doc_id", "n_tokens").write.mode("overwrite")
        .parquet(s"$tmp/stats/$sub")
      // the shared qualified-URI listing, never java.io (which lists
      // NOTHING on a non-local filesystem — the snapshot would commit an
      // EMPTY manifest over live tables); an empty member list aborts
      val lines = Seq("docs", "stats").flatMap { t =>
        graft.ingest.ManifestLog.listParquetLeaves(spark, s"$tmp/$t/$sub")
          .map(f => s"$t:$f")
      }
      require(lines.nonEmpty,
        s"multi-table snapshot $sub listed no member data files")
      lines
    }
    val v1Lines = writeTables("v1", full.filter(col("doc_id") % 2 === 0))
    val v2Lines = writeTables("v2", full)
    val logDir = tmp + "/mtx_log"
    val logP = new org.apache.hadoop.fs.Path(logDir)
    logP.getFileSystem(hconf).delete(logP, true)
    // each version's line set is the full multi-table snapshot (replace,
    // not accumulate): resolving a version resolves every member table
    graft.ingest.ManifestLog.commit(spark, logDir, _ => v1Lines)
    graft.ingest.ManifestLog.commit(spark, logDir, _ => v2Lines)
    readMultiTableVersion(spark, logDir, 1L)
      .unionByName(readMultiTableVersion(spark, logDir, 2L))
      .orderBy("version")
  }

  /** Resolve ONE manifest version into its member tables and audit
    * their cross-table consistency in a single job. */
  private[graft] def readMultiTableVersion(spark: SparkSession,
      logDir: String, v: Long): DataFrame = {
    val lines = graft.ingest.ManifestLog.read(spark, logDir, v)
      .getOrElse(throw new java.io.IOException(s"missing manifest v$v"))
    def tableFiles(t: String) = lines.filter(_.startsWith(t + ":"))
      .map(_.stripPrefix(t + ":"))
    val docs = spark.read.parquet(tableFiles("docs"): _*)
      .select(col("doc_id"), lit(1).as("in_docs"))
    val stats = spark.read.parquet(tableFiles("stats"): _*)
      .select(col("doc_id"), col("n_tokens"), lit(1).as("in_stats"))
    docs.join(stats, Seq("doc_id"), "full_outer")
      .agg(
        lit(v).as("version"),
        sum("in_docs").cast("long").as("n_docs"),
        sum("in_stats").cast("long").as("n_stats"),
        count(when(col("in_docs").isNull || col("in_stats").isNull, 1))
          .as("n_dangling"),
        sum("n_tokens").cast("long").as("total_tokens"))
      .select("version", "n_docs", "n_stats", "n_dangling", "total_tokens")
  }

  private val multiTableSnapshotSql =
    """WITH tok AS (
      |  SELECT doc_id, len(list_filter(
      |    string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
      |    x -> length(x) > 0))::BIGINT AS n_tokens
      |  FROM documents)
      |SELECT CAST(1 AS BIGINT) AS version, count(*)::BIGINT AS n_docs,
      |       count(*)::BIGINT AS n_stats, CAST(0 AS BIGINT) AS n_dangling,
      |       sum(n_tokens)::BIGINT AS total_tokens
      |FROM tok WHERE doc_id % 2 = 0
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), count(*)::BIGINT, count(*)::BIGINT,
      |       CAST(0 AS BIGINT), sum(n_tokens)::BIGINT FROM tok
      |ORDER BY version""".stripMargin

  /** Manifest vacuum: delete data files referenced by NO version in the
    * manifest — the garbage left behind by failed writes and expired
    * versions. Readers resolve files through manifests alone, so a
    * vacuum can never break a registered version; the spec proves both
    * version reads survive while a planted orphan disappears. Returns
    * the deleted paths (catalog-scale).
    */
  def vacuumUnreferenced(spark: SparkSession, tmp: String): Seq[String] = {
    val referenced =
      graft.ingest.ManifestLog.allReferenced(spark, tmp + "/manifest_log")
    val hconf = spark.sparkContext.hadoopConfiguration
    // the SAME qualified-URI listing the manifest commits use — a
    // different path form here (java.io absolute vs qualified URI)
    // would match nothing and delete every LIVE file
    Seq("base", "append").flatMap { s =>
      graft.ingest.ManifestLog.listParquetLeaves(spark, tmp + "/" + s)
        .filterNot(referenced.contains)
        .map { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          require(p.getFileSystem(hconf).delete(p, false),
            s"vacuum could not delete unreferenced file $f")
          f
        }
    }
  }

  /** Major compaction of the MOR table: fold the delta into a NEW base
    * (latest-wins materialized once) and read the compacted copy back.
    * The invariant that makes compaction safe to run online — it changes
    * LAYOUT, never CONTENT — is pinned by reusing the uncompacted
    * snapshot's oracle verbatim: both must hash identically.
    */
  def morCompact(spark: SparkSession, dir: String): DataFrame = {
    morSnapshot(spark, dir) // ensure base + delta exist
    val tmp = tmpPath("graft_mor", dir)
    val compacted = tmpPath("graft_mor_compacted", dir)
    morRead(spark, tmp).write.mode("overwrite").parquet(compacted)
    spark.read.parquet(compacted).orderBy("o_orderkey")
  }

  // ---- CDC change feed (Delta CDF / Debezium row-level changes) ----

  /** Change-data-capture feed for one MOR commit: classify the commit's
    * delta into `insert` / `delete` / `update_preimage` /
    * `update_postimage` rows (the Delta Lake CDF vocabulary), so
    * downstream consumers (index maintenance, replication, IVM) see
    * row-level changes without diffing snapshots.
    *
    * Scale shape: snapshot-diff CDC (v2 FULL OUTER JOIN v1) shuffles the
    * whole table twice; here the base NEVER crosses an exchange — the
    * only touch is one broadcast-hash inner join against the commit's
    * net keys to harvest preimages (map-side, delta-sized output), and
    * every join after that is between delta-sized frames. Multiple
    * changes to one key inside the commit net to the highest-seq row
    * first (a tombstone after an upsert is just a delete), matching how
    * Delta CDF nets per-version changes.
    *
    * The commit is derived deterministically from the data (10% of keys
    * upserted, 4% tombstoned — tombstone wins where both land, brand-new
    * keys re-landed at +10_000_000 for the insert class) so the DuckDB
    * oracle replays the identical classification via a LEFT JOIN.
    */
  def cdcChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    val tmp = tmpPath("graft_cdc", dir)
    val base = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderstatus").as("status"),
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("price_e2"))
    base.write.mode("overwrite").parquet(tmp + "/base")
    val upserts = base.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), lit("U").as("status"),
        (col("price_e2") + 10000L).as("price_e2"),
        lit(false).as("tombstone"), lit(1L).as("seq"))
    val inserts = base.filter(col("o_orderkey") % 40 === 7)
      .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
        lit("N").as("status"), col("price_e2"),
        lit(false).as("tombstone"), lit(1L).as("seq"))
    val deletes = base.filter(col("o_orderkey") % 25 === 0)
      .select(col("o_orderkey"), lit("").as("status"),
        lit(-1L).as("price_e2"), lit(true).as("tombstone"), lit(2L).as("seq"))
    upserts.unionByName(inserts).unionByName(deletes)
      .write.mode("overwrite").parquet(tmp + "/delta")
    cdcRead(spark, tmp)
  }

  /** The classification read, separated so specs can drive it against
    * planted base/delta files (tombstone-for-missing-key no-op, one key
    * netting upsert→tombstone into a single delete).
    */
  def cdcRead(spark: SparkSession, tmp: String): DataFrame = {
    val base = spark.read.parquet(tmp + "/base")
    val net = spark.read.parquet(tmp + "/delta")
      .groupBy("o_orderkey")
      .agg(max_by(struct(col("status"), col("price_e2"), col("tombstone")),
        col("seq")).as("d"))
      .select(col("o_orderkey"), col("d.status").as("status"),
        col("d.price_e2").as("price_e2"), col("d.tombstone").as("tombstone"))
    // preimages: the base's single touch — broadcast the net keys, no
    // base-side exchange; output is delta-sized
    val pre = base.join(broadcast(net.select("o_orderkey")), Seq("o_orderkey"))
      .select(col("o_orderkey"), col("status").as("pre_status"),
        col("price_e2").as("pre_price_e2"))
    val j = net.join(pre, Seq("o_orderkey"), "left")
    val ins = j.filter(col("pre_status").isNull && !col("tombstone"))
      .select(col("o_orderkey"), lit("insert").as("change_type"),
        col("status"), col("price_e2"))
    val del = j.filter(col("pre_status").isNotNull && col("tombstone"))
      .select(col("o_orderkey"), lit("delete").as("change_type"),
        col("pre_status").as("status"), col("pre_price_e2").as("price_e2"))
    val updPre = j.filter(col("pre_status").isNotNull && !col("tombstone"))
      .select(col("o_orderkey"), lit("update_preimage").as("change_type"),
        col("pre_status").as("status"), col("pre_price_e2").as("price_e2"))
    val updPost = j.filter(col("pre_status").isNotNull && !col("tombstone"))
      .select(col("o_orderkey"), lit("update_postimage").as("change_type"),
        col("status"), col("price_e2"))
    // a tombstone for a key absent from the base nets to nothing
    ins.unionByName(del).unionByName(updPre).unionByName(updPost)
      .orderBy("o_orderkey", "change_type")
  }

  /** The consuming half of CDC — apply the feed to a replica (the
    * Debezium-sink / Delta MERGE shape): survivors = base rows whose key
    * carries no change, plus insert/update postimages. The replica after
    * apply must equal the source's post-commit snapshot — feed and apply
    * are inverses around the commit, which the oracle replays
    * independently. Same exchange discipline as the feed: the base's
    * only touch is a broadcast anti-join on the feed's delta-sized key
    * set; nothing corpus-sized shuffles.
    */
  def cdcApplyReplica(spark: SparkSession, dir: String): DataFrame = {
    cdcChangeFeed(spark, dir) // materialize base + commit delta
    cdcApply(spark, tmpPath("graft_cdc", dir))
  }

  /** The apply itself, over any base/delta pair (spec-driveable).
    * The feed is referenced twice (changed-key anti-join + landed
    * postimages); localCheckpoint materializes its delta-sized rows once
    * instead of re-running the whole classification DAG (net aggregate +
    * preimage broadcast join) per reference.
    */
  def cdcApply(spark: SparkSession, tmp: String): DataFrame = {
    val feed = cdcRead(spark, tmp).localCheckpoint(true)
    val base = spark.read.parquet(tmp + "/base")
    val changedKeys = feed.select("o_orderkey").distinct()
    val untouched = base.join(broadcast(changedKeys), Seq("o_orderkey"), "left_anti")
    val landed = feed
      .filter(col("change_type").isin("insert", "update_postimage"))
      .select("o_orderkey", "status", "price_e2")
    untouched.unionByName(landed).orderBy("o_orderkey")
  }

  private val cdcApplyReplicaSql =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus AS status,
      |         CAST(floor(o_totalprice * 100) AS BIGINT) AS price_e2
      |  FROM orders),
      |delta AS (
      |  SELECT o_orderkey, 'U' AS status, price_e2 + 10000 AS price_e2,
      |         FALSE AS tombstone, 1 AS seq
      |  FROM base WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, 'N', price_e2, FALSE, 1
      |  FROM base WHERE o_orderkey % 40 = 7
      |  UNION ALL
      |  SELECT o_orderkey, '', CAST(-1 AS BIGINT), TRUE, 2
      |  FROM base WHERE o_orderkey % 25 = 0),
      |net AS (
      |  SELECT o_orderkey, arg_max(status, seq) AS status,
      |         arg_max(price_e2, seq) AS price_e2,
      |         arg_max(tombstone, seq) AS tombstone
      |  FROM delta GROUP BY 1)
      |SELECT b.o_orderkey, b.status, b.price_e2
      |FROM base b LEFT JOIN net n USING (o_orderkey)
      |WHERE n.o_orderkey IS NULL
      |UNION ALL
      |SELECT o_orderkey, status, price_e2 FROM net WHERE NOT tombstone
      |ORDER BY o_orderkey""".stripMargin

  private val cdcChangeFeedSql =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus AS status,
      |         CAST(floor(o_totalprice * 100) AS BIGINT) AS price_e2
      |  FROM orders),
      |delta AS (
      |  SELECT o_orderkey, 'U' AS status, price_e2 + 10000 AS price_e2,
      |         FALSE AS tombstone, 1 AS seq
      |  FROM base WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, 'N', price_e2, FALSE, 1
      |  FROM base WHERE o_orderkey % 40 = 7
      |  UNION ALL
      |  SELECT o_orderkey, '', CAST(-1 AS BIGINT), TRUE, 2
      |  FROM base WHERE o_orderkey % 25 = 0),
      |net AS (
      |  SELECT o_orderkey, arg_max(status, seq) AS status,
      |         arg_max(price_e2, seq) AS price_e2,
      |         arg_max(tombstone, seq) AS tombstone
      |  FROM delta GROUP BY 1),
      |j AS (
      |  SELECT n.o_orderkey, n.status, n.price_e2, n.tombstone,
      |         b.status AS pre_status, b.price_e2 AS pre_price_e2
      |  FROM net n LEFT JOIN base b USING (o_orderkey))
      |SELECT o_orderkey, 'insert' AS change_type, status, price_e2
      |FROM j WHERE pre_status IS NULL AND NOT tombstone
      |UNION ALL
      |SELECT o_orderkey, 'delete', pre_status, pre_price_e2
      |FROM j WHERE pre_status IS NOT NULL AND tombstone
      |UNION ALL
      |SELECT o_orderkey, 'update_preimage', pre_status, pre_price_e2
      |FROM j WHERE pre_status IS NOT NULL AND NOT tombstone
      |UNION ALL
      |SELECT o_orderkey, 'update_postimage', status, price_e2
      |FROM j WHERE pre_status IS NOT NULL AND NOT tombstone
      |ORDER BY o_orderkey, change_type""".stripMargin

  // ---- partition-scoped backfill (dynamic partition overwrite) ----

  /** Idempotent backfill of a slice of a partitioned table with DYNAMIC
    * partition overwrite: rewriting days 11–13 replaces exactly those
    * `day_id=` directories and cannot touch siblings (static overwrite
    * mode would drop the whole table — the classic backfill disaster).
    * The backfill here recomputes the same data plus a correction marker
    * column, so the oracle can verify corrected days carry the marker
    * and untouched days don't, all from raw events.
    */
  def backfillPartitions(spark: SparkSession, dir: String): DataFrame = {
    val tmp = tmpPath("graft_backfill", dir)
    val daily = Tables.events(spark, dir)
      .withColumn("day_id", expr("unix_micros(ts) DIV 86400000000"))
      .groupBy("day_id", "event_type").agg(count(lit(1)).as("n_events"))
      .withColumn("corrected", lit(false))
    daily.repartition(col("day_id"))
      .write.mode("overwrite").partitionBy("day_id").parquet(tmp)
    // the backfill job: recompute ONLY the target days, marker set
    val target = col("day_id").between(19733L, 19735L)
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      daily.filter(target).withColumn("corrected", lit(true))
        .repartition(col("day_id"))
        .write.mode("overwrite").partitionBy("day_id").parquet(tmp)
    } finally {
      // restore what the session had — forcing "static" would arm the
      // whole-table-drop behavior on a user who had chosen dynamic
      prevMode match {
        case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    spark.read.parquet(tmp)
      .groupBy(col("corrected"))
      .agg(countDistinct(col("day_id")).as("n_days"),
        sum(col("n_events")).as("n_events"))
      .orderBy("corrected")
  }

  private val backfillPartitionsSql =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day_id, count(*) AS n
      |  FROM events GROUP BY 1, event_type)
      |SELECT day_id BETWEEN 19733 AND 19735 AS corrected,
      |       count(DISTINCT day_id) AS n_days, CAST(sum(n) AS BIGINT) AS n_events
      |FROM daily GROUP BY 1 ORDER BY corrected""".stripMargin

  // ---- incremental zone-map maintenance ----

  /** Zone-map stats maintained INCREMENTALLY under append: the initial
    * layout covers pre-1998 orders; a later commit appends 1998+ files;
    * the stats job then reads ONLY the not-yet-covered files (set
    * difference of actual files vs sidecar rows — both catalog-scale)
    * and appends their min/max rows. A date query over the appended
    * range prunes to the new files through the updated sidecar, and the
    * oracle recomputes from raw orders — stale or missing stats rows
    * would surface as lost rows. Mirrors the LSH/IVF index-append
    * discipline: maintenance cost scales with the delta, never the
    * table.
    */
  def zonemapAppendScan(spark: SparkSession, dir: String): DataFrame = {
    val tmp = tmpPath("graft_zmappend", dir)
    val orders = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val cut = lit("1998-01-01").cast("timestamp")
    // initial build + stats
    orders.filter(col("o_orderdate") < cut)
      .repartitionByRange(6, col("o_orderdate"))
      .write.mode("overwrite").parquet(tmp + "/data")
    def statsOf(df: DataFrame): DataFrame = df
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min("o_orderdate").as("min_d"), max("o_orderdate").as("max_d"))
    statsOf(spark.read.parquet(tmp + "/data"))
      .write.mode("overwrite").parquet(tmp + "/stats")
    // the append commit: new files land, history untouched
    orders.filter(col("o_orderdate") >= cut)
      .repartitionByRange(2, col("o_orderdate"))
      .write.mode("append").parquet(tmp + "/data")
    // incremental stats: only files the sidecar has no row for
    val covered = spark.read.parquet(tmp + "/stats")
      .select("file").collect().map(_.getString(0)).toSet
    // the shared Hadoop listing (java.io sees nothing on a non-local
    // store — the incremental stats would silently under-cover appended
    // files and the zonemap would stop pruning them correctly)
    val newFiles = graft.ingest.ManifestLog
      .listParquetLeaves(spark, tmp + "/data")
      .filterNot(f => covered.exists(_.endsWith(f.substring(f.lastIndexOf('/')))))
    if (newFiles.nonEmpty)
      statsOf(spark.read.parquet(newFiles.toIndexedSeq: _*))
        .write.mode("append").parquet(tmp + "/stats")
    zonemapRead(spark, tmp, "1998-02-01", "2002-12-31")._1
  }

  private val zonemapAppendScanSql =
    """SELECT o_orderstatus, count(*) AS n_orders,
      |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_e2
      |FROM orders
      |WHERE o_orderdate BETWEEN TIMESTAMP '1998-02-01' AND TIMESTAMP '2002-12-31'
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- schema evolution ----

  /** Additive schema evolution: generation 1 files lack a column that
    * generation 2 adds (the only evolution safe WITHOUT a catalog;
    * renames read through [[columnMappedScan]]'s field-id mapping below,
    * and drops decline there pending a rewrite). A `mergeSchema` read unifies the
    * generations — old rows surface NULL for the new column — and the
    * aggregate proves values land in the right generation. At 100 TB
    * schema-per-file merging is why appends never rewrite history.
    * Oracle: the same union computed logically from `orders`.
    */
  def schemaEvolutionScan(spark: SparkSession, dir: String): DataFrame = {
    val tmp = tmpPath("graft_schemaevo", dir)
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("price_e2"))
    base.filter(col("o_orderkey") % 2 === 0)
      .write.mode("overwrite").parquet(tmp + "/gen=1")
    base.filter(col("o_orderkey") % 2 === 1)
      .withColumn("priority_class", lit("tracked"))
      .write.mode("overwrite").parquet(tmp + "/gen=2")
    spark.read.option("mergeSchema", "true").parquet(tmp)
      .groupBy(coalesce(col("priority_class"), lit("untracked")).as("priority_class"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price_e2")).as("total_e2"))
      .orderBy("priority_class")
  }

  private val schemaEvolutionScanSql =
    """WITH u AS (
      |  SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS price_e2,
      |         CASE WHEN o_orderkey % 2 = 1 THEN 'tracked' ELSE 'untracked' END
      |           AS priority_class
      |  FROM orders)
      |SELECT priority_class, count(*) AS n_orders,
      |       CAST(sum(price_e2) AS BIGINT) AS total_e2
      |FROM u GROUP BY priority_class ORDER BY priority_class""".stripMargin

  // ---- column-mapping catalog (rename-safe schema evolution) ----

  /** Append one generation's field-id → name mapping to the table's
    * `_column_mapping` sidecar (underscore-prefixed — data scans ignore
    * it). The Iceberg column-mapping discipline: a column's IDENTITY is
    * its field id, its NAME is per-generation metadata, so a rename is
    * one catalog row and zero data rewrites. */
  def commitColumnMapping(spark: SparkSession, path: String, gen: Long,
      mapping: Seq[(Int, String)]): Unit = {
    import spark.implicits._
    mapping.map { case (fid, n) => (gen, fid, n) }
      .toDF("gen", "field_id", "name")
      .repartition(1)
      .write.mode("append").parquet(path + "/_column_mapping")
  }

  /** RETIRE field ids — the catalog half of a column DROP (the Iceberg
    * drop-column discipline): a retired field id is projected away from
    * every generation at scan time, and can never be re-mapped — re-
    * adding the same NAME must mint a NEW field id, so old data never
    * resurrects under a re-added name. Retirement is an EXPLICIT sidecar
    * row, not a mapping omission: an id that is merely absent from the
    * latest mapping still declines loudly (the accidental-omission
    * silent-data-loss class the scan has always refused). The data
    * bytes stay on disk until a rewrite (the reclaim discipline) —
    * retirement governs the SCAN, exactly like a ledger forget. */
  def retireColumnMapping(spark: SparkSession, path: String, gen: Long,
      fieldIds: Seq[Int]): Unit = {
    import spark.implicits._
    fieldIds.map(fid => (gen, fid)).toDF("gen", "field_id")
      .repartition(1)
      .write.mode("append").parquet(path + "/_column_mapping_retired")
  }

  /** The DROP commit, as one helper: a new mapping generation WITHOUT
    * the dropped field ids plus their retirement rows. Two sidecar
    * appends (each tiny), MAPPING FIRST: a crash between them leaves
    * mapping-without-retire, which the scan declines as an unexplained
    * drop with a message steering the operator to exactly the right
    * recovery (commit the retirement). The other order would leave
    * retire-with-the-OLD-mapping-latest, which trips the resurrection
    * check and misdiagnoses a half-committed drop as an illegal re-add. */
  def dropColumns(spark: SparkSession, path: String, gen: Long,
      mapping: Seq[(Int, String)], droppedFieldIds: Seq[Int]): Unit = {
    require(droppedFieldIds.forall(fid => !mapping.exists(_._1 == fid)),
      s"dropColumns: ${droppedFieldIds.mkString(", ")} cannot be both " +
        "mapped and dropped in one generation")
    commitColumnMapping(spark, path, gen, mapping)
    retireColumnMapping(spark, path, gen, droppedFieldIds)
  }

  /** The retired-field-id set (empty when the sidecar is absent). */
  private def retiredFieldIds(spark: SparkSession, path: String): Set[Int] = {
    val p = new org.apache.hadoop.fs.Path(path + "/_column_mapping_retired")
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      Set.empty
    else spark.read.parquet(path + "/_column_mapping_retired")
      .select("field_id").collect().map(_.getInt(0)).toSet
  }

  /** Read every generation under `path/gen=N` through the column-mapping
    * catalog: each generation's physical columns rename to the LATEST
    * generation's names by field id, names the latest schema added
    * surface as NULL for older generations (the additive mergeSchema
    * semantics, now rename-safe), and RETIRED field ids (explicit drop
    * commits, [[retireColumnMapping]]) are projected away from every
    * generation — a re-added name serves ONLY its new field id's data.
    * Declines LOUDLY on:
    *   - a field id absent from the latest mapping WITHOUT a retirement
    *     row (mapped in an older generation, silently omitted from the
    *     latest): an unexplained omission is indistinguishable from a
    *     catalog bug, and either shipping or hiding that data silently
    *     would be wrong — a drop is an explicit retire commit;
    *   - a RETIRED field id appearing in the latest mapping: re-adding
    *     a dropped column must mint a NEW field id (resurrecting the
    *     old id would serve data whose deletion the caller believes
    *     complete);
    *   - a physical column with NO field id in its generation's mapping:
    *     positional/name guessing is how rename-reuse corrupts tables;
    *   - a `gen=N` DATA directory with no catalog rows: the mapping and
    *     data commits are separate, so a writer crash between them must
    *     surface as an error, never as rows silently missing from every
    *     mapped read.
    */
  def columnMappedScan(spark: SparkSession, path: String): DataFrame = {
    val catalog = spark.read.parquet(path + "/_column_mapping")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    require(catalog.nonEmpty, s"no _column_mapping catalog under $path")
    // one name per (gen, field id) and one field id per (gen, name):
    // duplicates would resolve by driver-collect ordering across part
    // files — silently nondeterministic — so they decline instead
    catalog.groupBy(t => (t._1, t._2)).foreach { case ((g, fid), rows) =>
      require(rows.map(_._3).distinct.size == 1,
        s"columnMappedScan: field id $fid maps to multiple names in " +
          s"generation $g (${rows.map(_._3).distinct.mkString(", ")}) — " +
          "re-mapping a generation needs a new generation, not an edit")
    }
    catalog.groupBy(t => (t._1, t._3)).foreach { case ((g, n), rows) =>
      require(rows.map(_._2).distinct.size == 1,
        s"columnMappedScan: name '$n' carries multiple field ids in " +
          s"generation $g — name reuse across ids is the corruption the " +
          "catalog exists to prevent")
    }
    val gens = catalog.map(_._1).distinct.sorted
    val latestGen = gens.max
    val latest: Map[Int, String] =
      catalog.filter(_._1 == latestGen).map(t => t._2 -> t._3).toMap
    val retired = retiredFieldIds(spark, path)
    val resurrected = latest.keySet.intersect(retired)
    if (resurrected.nonEmpty) throw new IllegalStateException(
      s"columnMappedScan: retired field ids " +
        s"${resurrected.toSeq.sorted.mkString(", ")} appear in the " +
        "latest mapping — re-adding a dropped column must mint a NEW " +
        "field id; re-mapping the old one would resurrect data whose " +
        "deletion the caller believes complete")
    val dropped = catalog.filter(_._1 != latestGen).map(_._2)
      .distinct.filterNot(fid => latest.contains(fid) || retired(fid))
    if (dropped.nonEmpty) throw new IllegalStateException(
      s"columnMappedScan: field ids ${dropped.sorted.mkString(", ")} are " +
        "absent from the latest mapping with NO retirement row — an " +
        "unexplained omission is a catalog bug, not a drop; commit the " +
        "drop explicitly (retireColumnMapping) or restore the mapping")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a MAPPING-ONLY generation (no gen=N data dir) is the pure-rename
    // commit the catalog advertises — its mapping participates (it may
    // BE the latest, defining the names) but it contributes no rows.
    // The CONVERSE is an error: a gen=N data directory with no catalog
    // rows would silently vanish from every mapped read (the mapping
    // and data commits are separate non-atomic writes), so the on-disk
    // generations are enumerated and each must be catalogued.
    val GenDir = "gen=(\\d+)".r
    val diskGens =
      if (!fs.exists(new org.apache.hadoop.fs.Path(path))) Seq.empty[Long]
      else fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
        .filter(_.isDirectory).flatMap(_.getPath.getName match {
          case GenDir(n) => Some(n.toLong)
          case _ => None
        })
    val uncatalogued = diskGens.filterNot(gens.contains)
    require(uncatalogued.isEmpty,
      s"columnMappedScan: data generations " +
        s"${uncatalogued.sorted.mkString(", ")} under $path have no " +
        "catalog rows — their rows would silently vanish from every " +
        "mapped read; commit their mapping (or remove the orphan data)")
    val dataGens = gens.filter(diskGens.contains)
    require(dataGens.nonEmpty,
      s"columnMappedScan: no generation under $path has data")
    dataGens.map { g =>
      val byName: Map[String, Int] =
        catalog.filter(_._1 == g).map(t => t._3 -> t._2).toMap
      val df = spark.read.parquet(s"$path/gen=$g")
      val unmapped = df.columns.filterNot(byName.contains)
      require(unmapped.isEmpty,
        s"columnMappedScan: generation $g carries unmapped physical " +
          s"columns ${unmapped.mkString(", ")} — refusing to guess")
      // retired field ids project AWAY (the drop, applied at scan time);
      // everything else renames to the latest generation's name
      val kept = df.columns.filterNot(c => retired(byName(c)))
      df.select(kept.map(c => col(c).as(latest(byName(c)))): _*)
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** The RENAME round-trip row: generation 1 writes (o_orderkey,
    * price_e2); generation 2 RENAMES price_e2 → amount_e2 (same field
    * id — one catalog row, zero data rewrites) and adds priority_class.
    * The mapped scan reads BOTH generations under the latest names, so
    * the aggregate sums a column that lives under two physical names —
    * exactly what the doc on [[schemaEvolutionScan]] scoped out before
    * the catalog existed. */
  def schemaRenameScan(spark: SparkSession, dir: String): DataFrame = {
    val tmp = tmpPath("graft_schemaren", dir)
    val p = new org.apache.hadoop.fs.Path(tmp)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("price_e2"))
    base.filter(col("o_orderkey") % 2 === 0)
      .write.mode("overwrite").parquet(tmp + "/gen=1")
    base.filter(col("o_orderkey") % 2 === 1)
      .withColumnRenamed("price_e2", "amount_e2")
      .withColumn("priority_class", lit("tracked"))
      .write.mode("overwrite").parquet(tmp + "/gen=2")
    commitColumnMapping(spark, tmp, 1L,
      Seq(1 -> "o_orderkey", 2 -> "price_e2"))
    commitColumnMapping(spark, tmp, 2L,
      Seq(1 -> "o_orderkey", 2 -> "amount_e2", 3 -> "priority_class"))
    columnMappedScan(spark, tmp)
      .groupBy(coalesce(col("priority_class"), lit("untracked"))
        .as("priority_class"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("amount_e2")).as("total_e2"))
      .orderBy("priority_class")
  }

  /** The DROP + RE-ADD round-trip row: generation 1 writes (o_orderkey,
    * price_e2, score) where `score` is POISON data (−1 everywhere, field
    * id 3); generation 2 DROPS score (one retire commit — zero data
    * rewrites); generation 3 RE-ADDS the name `score` under a NEW field
    * id (4) with real data. The mapped scan must serve gen 1's score as
    * NULL (the retired id projected away — re-adding the name never
    * resurrects the poison) and gen 3's score under the re-added id;
    * any resurrection shifts `sum_score` by the planted −1s. */
  def schemaDropScan(spark: SparkSession, dir: String): DataFrame = {
    val tmp = tmpPath("graft_schemadrop", dir)
    val p = new org.apache.hadoop.fs.Path(tmp)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("price_e2"))
    base.filter(col("o_orderkey") % 2 === 0)
      .withColumn("score", lit(-1L))
      .write.mode("overwrite").parquet(tmp + "/gen=1")
    base.filter(col("o_orderkey") % 2 === 1)
      .withColumn("score", col("price_e2") % 7)
      .write.mode("overwrite").parquet(tmp + "/gen=3")
    commitColumnMapping(spark, tmp, 1L,
      Seq(1 -> "o_orderkey", 2 -> "price_e2", 3 -> "score"))
    // gen 2: the DROP (mapping-only generation — no data dir)
    dropColumns(spark, tmp, 2L,
      Seq(1 -> "o_orderkey", 2 -> "price_e2"), droppedFieldIds = Seq(3))
    // gen 3: the RE-ADD under a NEW field id
    commitColumnMapping(spark, tmp, 3L,
      Seq(1 -> "o_orderkey", 2 -> "price_e2", 4 -> "score"))
    columnMappedScan(spark, tmp)
      .groupBy(col("score").isNotNull.as("has_score"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("price_e2")).as("total_e2"),
        sum(coalesce(col("score"), lit(0L))).as("sum_score"))
      .orderBy("has_score")
  }

  private val schemaDropScanSql =
    """WITH u AS (
      |  SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS price_e2,
      |         CASE WHEN o_orderkey % 2 = 1
      |              THEN CAST(floor(o_totalprice * 100) AS BIGINT) % 7
      |              ELSE NULL END AS score
      |  FROM orders)
      |SELECT score IS NOT NULL AS has_score, count(*) AS n_orders,
      |       CAST(sum(price_e2) AS BIGINT) AS total_e2,
      |       CAST(sum(coalesce(score, 0)) AS BIGINT) AS sum_score
      |FROM u GROUP BY 1 ORDER BY has_score""".stripMargin

  private val schemaRenameScanSql =
    """WITH u AS (
      |  SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS amount_e2,
      |         CASE WHEN o_orderkey % 2 = 1 THEN 'tracked' ELSE 'untracked' END
      |           AS priority_class
      |  FROM orders)
      |SELECT priority_class, count(*) AS n_orders,
      |       CAST(sum(amount_e2) AS BIGINT) AS total_e2
      |FROM u GROUP BY priority_class ORDER BY priority_class""".stripMargin

  // ---- storage-format interchange ----

  /** Fidelity aggregate used on both sides of a format round-trip: if any
    * row, column value, or text byte was damaged in transit the md5
    * distinct-count or the sums shift. Computed over the round-tripped
    * copy in Spark and over the original parquet in DuckDB.
    */
  private def fidelitySummary(df: DataFrame): DataFrame = df
    .groupBy(col("source"))
    .agg(count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("sum_chars"),
      countDistinct(md5(col("text"))).as("n_distinct_texts"))
    .orderBy("source")

  private val fidelitySql =
    """SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       count(DISTINCT md5(text)) AS n_distinct_texts
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** ORC round-trip: the other columnar warehouse format Spark reads and
    * writes natively (same pushdown/pruning machinery as parquet). The
    * oracle never sees the ORC copy — it recomputes from the original
    * parquet, so a pass proves the transit was lossless.
    */
  def orcInterchange(spark: SparkSession, dir: String): DataFrame = {
    val tmp = tmpPath("graft_orc", dir)
    Tables.documents(spark, dir).write.mode("overwrite").orc(tmp)
    fidelitySummary(spark.read.orc(tmp))
  }

  /** CSV round-trip with the hostile parts of real CSV: multi-line text
    * fields, embedded quotes and commas. RFC 4180 quote-doubling
    * (escape = quote) on BOTH sides plus multiLine read — the asymmetric-
    * escape default is the classic corruption source this pins down.
    * CSV carries no types, so the read declares the schema explicitly
    * (at scale the catalog owns it; inference would be a second full
    * scan and a type lottery).
    */
  def csvInterchange(spark: SparkSession, dir: String): DataFrame = {
    val tmp = tmpPath("graft_csv", dir)
    Tables.documents(spark, dir).write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(tmp)
    val back = spark.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      .option("header", "true").option("multiLine", "true").option("escape", "\"")
      .csv(tmp)
      // empty string and NULL are the same thing in CSV; normalize like
      // the writer did (non-null text in, so read-side nulls are '')
      .na.fill("", Seq("text"))
    fidelitySummary(back)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mor_snapshot" -> morSnapshot,
    "mor_compact" -> morCompact,
    "time_travel_scan" -> timeTravelScan,
    "zonemap_pruned_scan" -> zonemapScan,
    "zorder_pruned_scan" -> zorderScan,
    "schema_evolution_scan" -> schemaEvolutionScan,
    "schema_rename_scan" -> schemaRenameScan,
    "schema_drop_scan" -> schemaDropScan,
    "zonemap_append_scan" -> zonemapAppendScan,
    "backfill_partitions" -> backfillPartitions,
    "orc_interchange" -> orcInterchange,
    "csv_interchange" -> csvInterchange,
    "cdc_change_feed" -> cdcChangeFeed,
    "bloom_pruned_lookup" -> bloomScan,
    "multi_table_snapshot" -> multiTableSnapshot,
    "cdc_apply_replica" -> cdcApplyReplica)

  def oracles: Map[String, String] = Map(
    "mor_snapshot" -> morSnapshotSql,
    "mor_compact" -> morSnapshotSql, // compaction changes layout, never content
    "time_travel_scan" -> timeTravelScanSql,
    "zonemap_pruned_scan" -> zonemapScanSql,
    "zorder_pruned_scan" -> zorderScanSql,
    "schema_evolution_scan" -> schemaEvolutionScanSql,
    "schema_rename_scan" -> schemaRenameScanSql,
    "schema_drop_scan" -> schemaDropScanSql,
    "zonemap_append_scan" -> zonemapAppendScanSql,
    "backfill_partitions" -> backfillPartitionsSql,
    "orc_interchange" -> fidelitySql,
    "csv_interchange" -> fidelitySql,
    "cdc_change_feed" -> cdcChangeFeedSql,
    "bloom_pruned_lookup" -> bloomScanSql,
    "multi_table_snapshot" -> multiTableSnapshotSql,
    "cdc_apply_replica" -> cdcApplyReplicaSql)
}
