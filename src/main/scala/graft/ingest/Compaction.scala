package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit}

/** Small-file compaction for append-mode sinks (SURVEY.md §2.2 K1, §7.5).
  *
  * The reference appends one JSONL line per chunk to a single file
  * (`chunk_cisa_kev.py:157-158`); the Spark analog appends a part-file per
  * task per batch, and many incremental runs leave a directory of small
  * files whose open/footer cost dominates the scan at 100 TB. Compaction
  * is itself a Spark job — read, repartition to the byte-budgeted file
  * count, rewrite — followed by a directory swap, so it scales with the
  * cluster like any other batch job and never buffers data on the driver.
  *
  * Swap protocol: write to `<dir>.compact.tmp`, rename `<dir>` →
  * `<dir>.compact.bak`, tmp → dir, delete bak. Readers racing the two
  * renames can see a missing directory (same window any overwrite-mode
  * Spark write has); a crash leaves either the original or the `.bak` to
  * recover from — data is never deleted before the rewrite is complete.
  */
object Compaction {

  final case class CompactionStats(
    filesBefore: Int, filesAfter: Int, rows: Long, bytes: Long) {
    def +(o: CompactionStats): CompactionStats = CompactionStats(
      filesBefore + o.filesBefore, filesAfter + o.filesAfter,
      rows + o.rows, bytes + o.bytes)
  }

  /** Spark's hidden-file convention: names starting with `_` or `.` are
    * invisible to readers and partition discovery. One definition, used by
    * every listing below AND for naming the scratch directories.
    */
  private def isData(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  /** Compact a FLAT parquet (default) or json directory to roughly
    * `targetFileBytes` per output file. Returns before/after stats.
    *
    * Partitioned layouts (`partitionBy` subdirectories, e.g. the LSH
    * index table) are REJECTED loudly: a flat rewrite would both funnel
    * them through one task and destroy the partition pruning their
    * readers depend on — compact those per partition directory instead.
    *
    * Concurrent appends: files that land AFTER the snapshot listing are
    * swept aside by the directory swap but NOT lost — before deleting the
    * `.bak` directory, any data file not in the compacted snapshot is
    * moved back into the live directory (part-file names are unique, so
    * this cannot collide). Appends racing the two renames themselves can
    * still fail on a transiently-missing directory, so prefer quiescing
    * writers; the guarantee here is no silent data loss, not lock-free
    * concurrency.
    */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      format: String = "parquet"): CompactionStats = {
    val hadoopPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def dataFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.filter(st => st.isFile && isData(st.getPath.getName))

    val entries = fs.listStatus(hadoopPath).toSeq
    val partitionDirs = entries.filter(st => st.isDirectory && isData(st.getPath.getName))
    require(partitionDirs.isEmpty,
      s"compaction: $dir has partition subdirectories " +
        s"(${partitionDirs.take(3).map(_.getPath.getName).mkString(", ")}…) — " +
        "compact each partition directory instead of flattening the layout")

    val before = dataFiles(hadoopPath)
    val beforeNames = before.map(_.getPath.getName).toSet
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)

    val df = spark.read.format(format).load(dir)
    // DOT-PREFIXED scratch names: when `dir` is a partition leaf inside a
    // table root, the siblings must stay invisible to partition discovery
    // (a crash-left 'bucket=5.compact.bak' would otherwise be read as a
    // duplicate string-typed partition — '.bucket=5.compact.bak' is not)
    val parent = hadoopPath.getParent
    val tmp = new org.apache.hadoop.fs.Path(parent, s".${hadoopPath.getName}.compact.tmp")
    val bak = new org.apache.hadoop.fs.Path(parent, s".${hadoopPath.getName}.compact.bak")
    fs.delete(tmp, true); fs.delete(bak, true)
    df.repartition(nOut).write.format(format).mode("overwrite").save(tmp.toString)
    // row count from the COMPACTED output, not a second input scan
    // (parquet answers this from footer metadata)
    val rows = spark.read.format(format).load(tmp.toString).count()

    if (!fs.rename(hadoopPath, bak))
      throw new java.io.IOException(s"compaction: cannot move $dir aside")
    if (!fs.rename(tmp, hadoopPath)) {
      fs.rename(bak, hadoopPath) // roll back
      throw new java.io.IOException(s"compaction: cannot install compacted $dir")
    }
    // rescue late-arriving appends (present in bak, absent from snapshot)
    dataFiles(bak).filterNot(st => beforeNames(st.getPath.getName)).foreach { st =>
      fs.rename(st.getPath,
        new org.apache.hadoop.fs.Path(hadoopPath, st.getPath.getName))
    }
    fs.delete(bak, true)
    // refresh any cached file listings for this path
    spark.catalog.refreshByPath(dir)
    CompactionStats(before.size, dataFiles(hadoopPath).size, rows, bytes)
  }

  /** Compact a `partitionBy` table (e.g. the LSH/IVF index) partition by
    * partition: each `key=value` subdirectory is a flat leaf compacted
    * independently, so the partition layout — and the file pruning that
    * depends on it — is preserved. The loop is driver-side but bounded by
    * the partition count (64 LSH buckets / k IVF clusters), and each
    * partition's rewrite is its own Spark job. Skips partitions already
    * at one file. Returns summed stats over compacted partitions.
    */
  def compactPartitioned(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      format: String = "parquet"): CompactionStats = {
    val hadoopPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def partitionDirs(p: org.apache.hadoop.fs.Path) =
      fs.listStatus(p).toSeq.filter { st =>
        val n = st.getPath.getName
        st.isDirectory && isData(n) && n.contains("=")
      }

    // Recurse through multi-level partitioning (partitionBy("a","b") nests
    // a=…/b=… directories); only a LEAF — a dir with data files and no
    // key=value children — is compacted. Silently skipping a non-leaf
    // would report "nothing to compact" on nested tables.
    def walk(p: org.apache.hadoop.fs.Path): Seq[CompactionStats] = {
      val children = partitionDirs(p)
      if (children.nonEmpty) children.flatMap(c => walk(c.getPath))
      else {
        val files = fs.listStatus(p).count(st => st.isFile && isData(st.getPath.getName))
        if (files <= 1) Seq.empty
        else Seq(compact(spark, p.toString, targetFileBytes, format))
      }
    }

    require(partitionDirs(hadoopPath).nonEmpty,
      s"compactPartitioned: $dir has no key=value partition directories — use compact()")
    val stats = walk(hadoopPath)
    spark.catalog.refreshByPath(dir)
    stats.foldLeft(CompactionStats(0, 0, 0L, 0L))(_ + _)
  }

  final case class FoldStats(
    partitionsRewritten: Int, rowsDeleted: Long, tombstonesFolded: Long)

  /** Fold the delete/upsert tombstone sidecar into a `partitionBy` index
    * table (the promised second half of the MOR delete lifecycle in
    * `graft.ops.AnnIndex`: deletes land as a sidecar so the commit is one
    * tiny write; THIS job folds them in on its own schedule so sidecars
    * don't accumulate forever and queries stop paying the anti-join).
    *
    * Two sidecar shapes, distinguished by schema:
    *   - plain ids (`<idCol>`): kill every index row with that id;
    *   - watermark (`t_<idCol>`, `upto_seq`): kill rows with
    *     `id = t_id AND seq <= upto_seq` — the upsert shape, which must
    *     NOT kill the appended replacement (its seq is above the mark).
    *
    * Scale shape: only AFFECTED partitions are rewritten — a semi-join of
    * the index against the broadcast sidecar (column-pruned to the id/seq
    * columns, so the scan never materializes embeddings) yields the
    * partition values to touch; every other partition directory is never
    * read for rewrite and stays byte-identical. The rewrite itself is ONE
    * Spark job over the union of affected partitions (a partition-pruned
    * scan + anti-join written `partitionBy` under the reader-invisible
    * `<index>/.fold.tmp` staging), NOT a driver-side per-leaf loop — job
    * count is independent of how many partitions the sidecar touches, so
    * steady deletes across hundreds of IVF clusters fold in constant jobs
    * instead of serializing one rewrite job per leaf.
    *
    * Crash discipline: a `_FOLD_STAGED` marker inside the staging dir
    * commits the per-leaf outcome list (keep → staged leaf renames over
    * the live one; drop → the fully-deleted leaf is removed); the next
    * fold first completes a marker-committed interrupted swap or discards
    * a marker-less (aborted) staging. The sidecar is truncated
    * (overwritten empty, schema kept) only after every affected leaf is
    * installed — a crash mid-fold leaves tombstones in place and the next
    * fold redoes the (idempotent) work; rows are anti-joined away, never
    * double-deleted.
    */
  def foldTombstones(spark: SparkSession, indexPath: String,
      tombstonePath: String, idCol: String = "vec_id"): FoldStats = {
    val hadoopPath = new org.apache.hadoop.fs.Path(indexPath)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(hadoopPath, FoldStaging)
    recoverTombstoneFold(fs, hadoopPath) // finish or discard a prior swap
    val tombPath = new org.apache.hadoop.fs.Path(tombstonePath)
    if (!fs.exists(tombPath)) return FoldStats(0, 0L, 0L)
    val tomb = spark.read.parquet(tombstonePath)
    val nTomb = tomb.count()
    if (nTomb == 0L) return FoldStats(0, 0L, nTomb)
    val watermark = tomb.columns.contains("upto_seq")

    val partDirs = fs.listStatus(hadoopPath).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isDirectory && isData(n) && n.contains("=")
    }
    require(partDirs.nonEmpty,
      s"foldTombstones: $indexPath has no key=value partition directories")
    val partitionCol = partDirs.head.getPath.getName.split("=", 2)(0)

    def killed(part: DataFrame, joinType: String): DataFrame =
      if (watermark)
        part.join(broadcast(tomb),
          part(idCol) === tomb(s"t_$idCol") && part("seq") <= tomb("upto_seq"),
          joinType)
      else
        part.join(broadcast(tomb.select(col(idCol))), Seq(idCol), joinType)

    // which partitions hold doomed rows — id/seq columns only (pruned scan)
    val probeCols = Seq(idCol, partitionCol) ++ (if (watermark) Seq("seq") else Nil)
    val idx = spark.read.parquet(indexPath).select(probeCols.map(col): _*)
    // TYPED partition values (not .toString) so the pruning filter below
    // compares like-with-like and prunes at the source listing
    val affected = killed(idx, "left_semi")
      .select(col(partitionCol)).distinct()
      .collect().map(_.get(0)) // bounded by the partition count (≤ 2^nBits buckets)

    var deleted = 0L
    if (affected.nonEmpty) {
      // ONE partition-pruned scan of the affected leaves; untouched leaves
      // are never read and stay byte-identical. isin() never matches a
      // NULL partition value, so an affected null leaf
      // (__HIVE_DEFAULT_PARTITION__) needs its own isNull arm — without
      // it the null leaf is never staged, classifies 'drop' below, and
      // the swap would delete its live survivors.
      val nonNullAffected = affected.filter(_ != null).toSeq
      val affectedPred = {
        val in =
          if (nonNullAffected.nonEmpty) col(partitionCol).isin(nonNullAffected: _*)
          else lit(false)
        if (affected.contains(null)) in || col(partitionCol).isNull else in
      }
      val affectedDf = spark.read.parquet(indexPath).filter(affectedPred)
      val beforeRows = affectedDf.count() // parquet footer metadata
      fs.delete(staging, true)
      // ONE rewrite job for every affected leaf: anti-join + partitionBy
      // write under the dot-prefixed staging (invisible to readers and to
      // partition discovery until the per-leaf renames below)
      killed(affectedDf, "left_anti")
        .write.mode("overwrite").partitionBy(partitionCol)
        .parquet(staging.toString)
      val stagedLeaves = fs.listStatus(staging).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .map(_.getPath.getName).toSet
      val afterRows =
        if (stagedLeaves.isEmpty) 0L
        else spark.read.parquet(staging.toString).count()
      deleted = beforeRows - afterRows
      // commit: the marker pins each affected leaf's outcome, then the
      // (idempotent, resumable) swap installs them. Leaf names are built
      // the way the staging write itself builds them — Hive path escaping,
      // null -> __HIVE_DEFAULT_PARTITION__ — so a value whose toString
      // differs from the WRITER's directory encoding (escaped special
      // characters, nulls) still matches its staged dir instead of being
      // misclassified as 'drop'.
      val expectedLeaves = affected.toSeq.map { v =>
        v -> (s"$partitionCol=" + (if (v == null)
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .DEFAULT_PARTITION_NAME
        else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .escapePathName(v.toString)))
      }
      // Two loud-failure gates, because a name mismatch here DELETES live
      // data. (1) Every expected leaf must exist as a LIVE directory:
      // this catches discovery type round-trips (an externally-written
      // 'bucket=01' discovered as int 1 would expect 'bucket=1', which is
      // not on disk — the swap would no-op the delete and leave doomed
      // rows in the orphaned '01' leaf while the sidecar truncates).
      // (2) Every staged dir must be an expected leaf: this catches
      // toString-vs-writer encoding divergences the escaping above
      // doesn't cover. Both abort BEFORE the marker — staging is
      // dot-prefixed, so readers and the live layout are untouched.
      val liveLeaves = partDirs.map(_.getPath.getName).toSet
      val missingLive = expectedLeaves.map(_._2).filterNot(liveLeaves)
      require(missingLive.isEmpty,
        s"foldTombstones: expected partition directories $missingLive " +
          s"not found among live leaves $liveLeaves — partition value/" +
          "directory-name scheme diverged; aborting before the swap marker")
      val unexpected = stagedLeaves -- expectedLeaves.map(_._2).toSet
      require(unexpected.isEmpty,
        s"foldTombstones: staged leaves $unexpected do not match any " +
          s"expected partition directory name (expected: " +
          s"${expectedLeaves.map(_._2).toSet}); aborting before the swap " +
          "marker — live leaves untouched")
      val outcomes = expectedLeaves.map { case (_, leaf) =>
        leaf -> stagedLeaves.contains(leaf)
      }
      val marker = fs.create(
        new org.apache.hadoop.fs.Path(staging, FoldMarker), true)
      try marker.write((outcomes.map { case (l, keep) =>
          s"$l\t${if (keep) "keep" else "drop"}"
        }.mkString("\n") + "\nend")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally marker.close()
      finishTombstoneFold(fs, hadoopPath, outcomes)
    }
    // truncate the sidecar LAST (crash-safe ordering), keeping its schema
    // so the query path's anti-join keeps planning against an empty set
    spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), tomb.schema)
      .write.mode("overwrite").parquet(tombstonePath)
    spark.catalog.refreshByPath(indexPath)
    spark.catalog.refreshByPath(tombstonePath)
    FoldStats(affected.length, deleted, nTomb)
  }

  private val FoldStaging = ".fold.tmp"
  private val FoldMarker = "_FOLD_STAGED"

  /** The swap half of `foldTombstones`: per affected leaf, `keep` deletes
    * the live leaf and renames the staged one in; `drop` (no survivors)
    * deletes the live leaf. Resumable at any point: a staged leaf missing
    * under `keep` means its rename already happened; deletes are
    * idempotent. The staging dir (and with it the marker) is removed last.
    */
  private def finishTombstoneFold(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      outcomes: Seq[(String, Boolean)]): Unit = {
    val staging = new org.apache.hadoop.fs.Path(root, FoldStaging)
    outcomes.foreach { case (leafName, keep) =>
      val live = new org.apache.hadoop.fs.Path(root, leafName)
      val staged = new org.apache.hadoop.fs.Path(staging, leafName)
      if (keep) {
        if (fs.exists(staged)) {
          fs.delete(live, true)
          if (!fs.rename(staged, live))
            throw new java.io.IOException(
              s"foldTombstones: cannot install $live")
        } // else: already renamed by an interrupted pass
      } else fs.delete(live, true)
    }
    fs.delete(staging, true)
  }

  /** Complete a marker-committed interrupted fold swap; discard an
    * aborted (marker-less or torn-marker) staging. Same torn-write rule
    * as the staged-swap protocol below: leaf mutations only ever start
    * after the marker is fully written, so an unparseable marker proves
    * the swap never began.
    */
  private def recoverTombstoneFold(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit = {
    val staging = new org.apache.hadoop.fs.Path(root, FoldStaging)
    if (!fs.exists(staging)) return
    val marker = new org.apache.hadoop.fs.Path(staging, FoldMarker)
    if (!fs.exists(marker)) { fs.delete(staging, true); return }
    val in = fs.open(marker)
    val outcomes =
      try {
        val lines = scala.io.Source.fromInputStream(in).getLines()
          .filter(_.nonEmpty).toSeq
        val entry = "([^\t]+=[^\t]*)\t(keep|drop)".r
        if (lines.length >= 2 && lines.last == "end" &&
            lines.init.forall(entry.matches(_)))
          Some(lines.init.map { case entry(l, o) => (l, o == "keep") })
        else None
      } finally in.close()
    outcomes match {
      case Some(os) => finishTombstoneFold(fs, root, os)
      case None => fs.delete(staging, true)
    }
  }

  /** RETENTION for streaming-staged index roots — the reclamation half
    * of the `stageLshBatch`/`stageIvfBatch` exactly-once discipline:
    * continuous ingestion lands one `batch=<id>/<partCol>=…` directory
    * per micro-batch forever, so the root's file count grows without
    * bound even though each leaf is tiny. Folds every COMMITTED batch
    * directory (one with a `_SUCCESS` marker) older than `minAgeMs` into
    * one consolidated `batch=0` leaf re-clustered on `partCol` (one file
    * per partition value), leaving younger batches in place.
    *
    * `minAgeMs` is the REPLAY HORIZON, as in the minhash store fold
    * (`Dedup.compactMinhashStore`): a batch directory is the idempotence
    * key for at-least-once delivery — a redelivered batch overwrites its
    * own directory, so a replay arriving after the fold consumed that
    * directory would re-admit its rows beside the folded copy. Since
    * r13 that hazard is CLOSED by the [[BatchRoster]]: the fold
    * CAS-commits the consumed batch ids (and the destination leaf id)
    * through the multi-writer ManifestLog BEFORE the swap marker, and
    * the stagers decline a roster-consumed id — so a post-fold replay
    * is a no-op, not a duplicate (CompactionSpec "horizon boundary"
    * pins the decline; through r12 it pinned the duplicate). A stray
    * directory re-landed by a stager that crashed between its write and
    * its post-write roster re-check is reconciled (deleted) at the next
    * fold. The age floor remains as an OPTIMIZATION — it keeps folds off
    * directories hot enough to still be receiving overwrites (the
    * in-flight overlap the maintenance-window contract excludes) — not
    * a correctness requirement. Crash discipline is the same staged swap: fold
    * written under the reader-invisible `<root>/_compact`, a `_STAGED`
    * marker commits the target list, then targets are deleted and the
    * staged leaf renamed in; re-running the fold first completes or
    * discards any interrupted one. Returns the batch leaves folded.
    *
    * SINGLE-WRITER / MAINTENANCE-WINDOW CONTRACT (same as
    * `Dedup.compactMinhashStore`): between the target-leaf deletes and
    * the final rename, a concurrent reader can see a partial root, and a
    * concurrent stage/serve against the same root during the fold is
    * unprotected — run folds in the ingestion pipeline's maintenance
    * window, or quiesce writers for the swap.
    */
  def foldStagedBatches(spark: SparkSession, root: String, partCol: String,
      minAgeMs: Long = 0L): Int = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tables = Seq(SwapTable("/_compact/data", b => s"/batch=$b"))
    recoverStagedSwap(spark, root, tables)
    if (!fs.exists(rootPath)) return 0
    def batchDir(b: Long) = new org.apache.hadoop.fs.Path(root + s"/batch=$b")
    // a previous fold may have died between its swap and its roster
    // flip: pending ids whose directories are gone were swapped — flip
    // them to folded so re-landed copies become reconcilable
    BatchRoster.sweepStalePending(spark, root, b => fs.exists(batchDir(b)))
    // reconcile stray re-landings BEFORE target selection: a directory
    // whose id the roster marks FOLDED (not pending, not the leaf) is a
    // late replay's garbage — its rows already live in the folded leaf,
    // and folding it AGAIN would duplicate them inside the leaf
    val stray = BatchRoster.reconcilablePred(spark, root)
    fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .filter(st => stray(
        st.getPath.getName.stripPrefix("batch=").toLong))
      .foreach { st =>
        // a failed delete must abort, not proceed: the very next listing
        // selects fold targets, and a surviving stray dir would be folded
        // AGAIN — duplicating rows the leaf already holds, silently
        if (!fs.delete(st.getPath, true) && fs.exists(st.getPath))
          throw new java.io.IOException(
            s"could not reconcile stray folded batch dir ${st.getPath}; " +
              "aborting the fold rather than re-folding its rows")
      }
    val now = System.currentTimeMillis()
    val targets = fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .filter(st => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .filter(st => now - st.getModificationTime >= minAgeMs)
      .map(_.getPath.getName.stripPrefix("batch=").toLong).sorted
    if (targets.size < 2) return 0
    val folded = spark.read.parquet(root)
      .filter(col("batch").isin(targets: _*))
      .drop("batch")
    folded.repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol)
      .parquet(root + "/_compact/data")
    // phase 1 — the commit point against replays: once these ids are
    // pending, a redelivery of any of them declines; committed BEFORE
    // the marker, so no directory is ever deleted while replays could
    // still re-land it, and pending never authorizes reclamation (a
    // crash here leaves the directories as the durable truth)
    BatchRoster.commitPending(spark, root, targets)
    commitStagedSwap(spark, root, tables, targets)
    // phase 2 — the swap completed: non-destination targets flip to
    // folded (their rows live in the consolidated leaf; a re-landed
    // directory is now reclaimable garbage), the destination becomes
    // the leaf
    BatchRoster.finishFold(spark, root, targets, targets.min)
    targets.size
  }

  // ---- the shared marker-committed staged-swap protocol --------------
  //
  // ONE implementation of the crash discipline both retention folds use
  // (this staged-batch fold and Dedup.compactMinhashStore): fold content
  // is written under the reader-invisible `<root>/_compact`, a `_STAGED`
  // marker commits the target-leaf list, target leaves are deleted
  // (tables in declared order), and the staged dirs rename onto the
  // DESTINATION leaf `targets.min` (tables in REVERSE order). Declare
  // the layout's commit-point table FIRST: it is then deleted first
  // (interrupted states look like the layout's own torn shape) and
  // renamed last (its rename is the commit).
  // The destination is always a member of the target set, so its old
  // directory is always deleted before the rename: a fixed destination
  // (epoch/batch 0) could pre-exist OUTSIDE an age-floored target set
  // and the rename would nest into or clobber it, losing the staged
  // fold. Re-running any fold first completes a marker-committed
  // interrupted swap or discards a marker-less (aborted) staging.

  /** One staged table: where its fold is staged, and how a leaf id maps
    * to its live directory (both relative to the root).
    */
  private[graft] final case class SwapTable(staged: String, leaf: Long => String)

  /** Write the marker, then run the swap. Call after every staged dir in
    * `tables` has been written.
    */
  private[graft] def commitStagedSwap(spark: SparkSession, root: String,
      tables: Seq[SwapTable], targets: Seq[Long]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = fs.create(
      new org.apache.hadoop.fs.Path(root + "/_compact/_STAGED"), true)
    // trailing sentinel makes truncation detectable: a torn write could
    // otherwise clip the LAST epoch id to a shorter-but-valid number
    try marker.write((targets.mkString("\n") + "\nend")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally marker.close()
    finishStagedSwap(spark, root, tables, targets)
  }

  private def finishStagedSwap(spark: SparkSession, root: String,
      tables: Seq[SwapTable], targets: Seq[Long]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(root + s)
    val dest = targets.min
    // per table: a missing staging dir means its rename already happened
    // (recovery replay) — the destination leaf then IS the folded result
    val staged = tables.map(t => t -> fs.exists(p(t.staged))).toMap
    tables.foreach { t =>
      targets.foreach(e =>
        if (staged(t) || e != dest) fs.delete(p(t.leaf(e)), true))
    }
    tables.reverse.foreach { t =>
      if (staged(t) && !fs.rename(p(t.staged), p(t.leaf(dest))))
        throw new java.io.IOException(
          s"staged fold: cannot install ${t.leaf(dest)} under $root")
    }
    fs.delete(p("/_compact"), true)
    spark.catalog.refreshByPath(root)
  }

  /** Complete a marker-committed interrupted swap; discard an aborted
    * (marker-less) staging.
    */
  private[graft] def recoverStagedSwap(spark: SparkSession, root: String,
      tables: Seq[SwapTable]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(root + s)
    if (!fs.exists(p("/_compact"))) return
    if (fs.exists(p("/_compact/_STAGED"))) {
      val in = fs.open(p("/_compact/_STAGED"))
      // a TORN marker (crash mid-write) parses to None: target deletes
      // only ever run after the marker is fully written and closed, so
      // an unparseable marker proves the swap never started — discard
      // the staging like any other aborted write (a throwing parse here
      // would instead wedge every future fold on the same store)
      val targets =
        try {
          val lines = scala.io.Source.fromInputStream(in).getLines()
            .filter(_.nonEmpty).toSeq
          if (lines.length >= 2 && lines.last == "end" &&
              lines.init.forall(l => l.nonEmpty && l.forall(_.isDigit)))
            Some(lines.init.map(_.toLong))
          else None
        } finally in.close()
      targets match {
        case Some(ts) => finishStagedSwap(spark, root, tables, ts)
        case None => fs.delete(p("/_compact"), true)
      }
    } else fs.delete(p("/_compact"), true)
  }
}
