package graft.ingest

import org.apache.spark.sql.SparkSession

/** Optimistic MULTI-WRITER commit for versioned manifest logs — the one
  * structural piece of the Iceberg snapshot model the engine's
  * single-writer staged swaps don't cover: N writers race to commit
  * version v+1 and exactly ONE wins; losers re-read the new head and
  * retry their update on top (so the loser's retry lands as v+2 with
  * BOTH updates applied — optimistic concurrency, not lost updates).
  *
  * Layout: `<dir>/v<N>.manifest` — plain text, one data-file path per
  * line, closed by an `end` sentinel line (the torn-write discipline the
  * staged-swap markers use). The CAS primitive publishes CONTENT-FIRST:
  * the full manifest is written to a writer-unique dot-prefixed temp,
  * then installed under the version name by an atomic NO-OVERWRITE
  * publish — a hard link on the local FS (link(2) fails if the name
  * exists), HDFS `rename` (which refuses an existing destination) on
  * cluster filesystems. There is NO claim-then-install window: a version
  * file either exists fully-formed or not at all, so a committer can
  * never observe a claimed-but-empty head and derive its update from a
  * stale base (the lost-update TOCTOU a claim-first protocol has), and
  * a commit claims exactly head+1 — losing the race to that name means
  * re-reading the winner's content and retrying on top. A sentinel-less
  * version file (only a truly non-atomic filesystem can produce one) is
  * INVISIBLE to readers and permanently consumes its number — the next
  * commit derives from the latest valid version below it and publishes
  * above it. Readers therefore never see a torn version, ever.
  *
  * This is the HadoopTableOperations rename-commit model (Iceberg spec
  * §Metastore-less catalogs); the reference's single-process vector
  * store (`ingest_chunks_to_chromadb.py` — one writer by construction)
  * needs none of this, but a 100 TB lakehouse deployment of the
  * manifest rows (`time_travel_scan`, index manifests) does.
  */
object ManifestLog {
  private val VersionName = "v(\\d+)\\.manifest".r
  private val Sentinel = "end"

  /** Closing-sentinel check: a bare `end` (pre-salt logs) or `end:<pad>`
    * — the pad is the INCARNATION SALT, a variable-length tail that
    * makes two same-numbered heads with identical CONTENT differ in
    * file length, so the listing-only fingerprint (length × mtime)
    * distinguishes a recycled root even when the rewrite lands inside
    * the filesystem's mtime granularity with equal content.
    *
    * FORMAT COMPATIBILITY: salted readers accept both forms, so
    * upgrade is seamless — but a PRE-SALT binary reading a salted head
    * sees a "torn" version and silently resolves the version below it
    * (for a forget/tombstone log that serves pre-delete state,
    * resurrecting deletes). That hazard is OPERATIONAL, not a doc
    * comment: a mixed-binary rollout sets
    * `spark.graft.manifest.compatSentinel=true` on the NEW binaries,
    * which makes their commits write the bare pre-salt `end` (old
    * readers stay correct; the only cost is the incarnation-salt
    * fingerprint hardening, suspended for the rollout window), and
    * unsets it once the fleet is rolled forward. The default stays
    * salted: a single-binary deployment — this repo's — should not
    * silently lose the recycled-root fingerprint protection to guard
    * against binaries it does not run. */
  private def isSentinel(line: String): Boolean =
    line == Sentinel || line.startsWith(Sentinel + ":")

  /** See [[isSentinel]]'s FORMAT COMPATIBILITY note — the mixed-binary
    * rollout escape hatch. */
  private[graft] val CompatSentinelKey = "spark.graft.manifest.compatSentinel"

  /** Pad-length source: a per-JVM counter seeded from nanoTime. Within
    * a JVM, successive commits always draw different pad lengths
    * (mod [[SaltRange]]), so an in-process delete-and-recreate of a
    * root changes the head length DETERMINISTICALLY; across processes
    * the nanoTime seed makes a same-length collision ~1/[[SaltRange]]
    * instead of certain. A true content hash would need the body read
    * the fingerprint exists to avoid — this narrows the residual, it
    * does not close it. */
  private val SaltRange = 61
  private val saltCounter =
    new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
  private def saltLine(): String =
    Sentinel + ":" + "x" * (((saltCounter.incrementAndGet() % SaltRange)
      + SaltRange) % SaltRange).toInt

  private def hfs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** List a directory's parquet leaves through the path's OWN FileSystem
    * as FULLY-QUALIFIED URI strings — the one listing every manifest
    * committer and vacuum uses. java.io listings see nothing on a
    * non-local filesystem, and stripping to `toUri.getPath` drops
    * scheme+authority (s3a://bucket/x → /x), so committed lines would
    * resolve against defaultFS and read/vacuum the wrong store. Empty
    * on a missing directory; NON-empty requirements stay with callers
    * (only they know whether empty means "torn write" or "fine"). */
  def listParquetLeaves(spark: SparkSession, dir: String): Seq[String] = {
    val (fs, p) = hfs(spark, dir)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toIndexedSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => fs.makeQualified(s.getPath).toString).sorted
  }

  private def versionPath(dir: String, v: Long) =
    new org.apache.hadoop.fs.Path(dir, s"v$v.manifest")

  /** Highest CLAIMED version number in the log (valid or torn) — the
    * number the next commit must go above. 0 on an empty log. */
  def claimedVersion(spark: SparkSession, dir: String): Long = {
    val (fs, p) = hfs(spark, dir)
    if (!fs.exists(p)) return 0L
    fs.listStatus(p).toSeq.flatMap(st => st.getPath.getName match {
      case VersionName(n) => Some(n.toLong)
      case _ => None
    }).maxOption.getOrElse(0L)
  }

  /** The file list of one version, or None if that version is absent or
    * torn (no trailing sentinel — a crashed claim, never served). */
  def read(spark: SparkSession, dir: String, version: Long): Option[Seq[String]] = {
    val (fs, _) = hfs(spark, dir)
    val vp = versionPath(dir, version)
    if (!fs.exists(vp)) return None
    val in = fs.open(vp)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
      finally in.close()
    if (lines.nonEmpty && isSentinel(lines.last)) Some(lines.init)
    else None
  }

  /** Latest VALID (sentineled) version — what readers resolve. Scans
    * down from the claimed head (bounded by the crash count, not the
    * log length, since only crashes leave torn claims). 0 = empty. */
  def currentVersion(spark: SparkSession, dir: String): Long = {
    var v = claimedVersion(spark, dir)
    while (v > 0L && read(spark, dir, v).isEmpty) v -= 1
    v
  }

  /** [[currentVersion]] plus a head-file FINGERPRINT (length mixed with
    * modification time) from the SAME directory listing — no extra RPC
    * over the bare probe. A snapshot cache keyed by version number alone
    * cannot tell a deleted-and-recreated log's same-NUMBERED head from
    * the one it cached (version numbers restart when another process
    * recycles the root out-of-band); the fingerprint distinguishes
    * incarnations: content of a different length OR a later write time
    * misses the cache and re-reads. (0, 0) on an empty log. If the head
    * file mutates between the listing and a subsequent body read, the
    * stale fingerprint fails the NEXT probe's comparison and re-reads —
    * the race degrades to one extra read, never a stale serve.
    *
    * RESIDUAL: a recycled root whose same-numbered head has the SAME
    * byte length and lands within the filesystem's mtime granularity
    * still collides — and that granularity is a FULL SECOND on several
    * real filesystems (ext3, HFS+, FAT, some NFS servers), not the
    * 1 ms of ext4/HDFS, so equal length carries real weight. The
    * variable-length incarnation salt each commit appends to its
    * sentinel (see [[isSentinel]]) makes equal length itself unlikely:
    * an in-JVM recycle ALWAYS differs (counter-sequenced pads), a
    * cross-process one collides ~1/61. A content hash would need the
    * body read the fingerprint exists to avoid; the salt narrows the
    * residual, it does not close it. */
  def currentVersionFingerprinted(spark: SparkSession,
      dir: String): (Long, Long) = {
    val (fs, p) = hfs(spark, dir)
    if (!fs.exists(p)) return (0L, 0L)
    val statuses = fs.listStatus(p).toSeq.flatMap(st =>
      st.getPath.getName match {
        case VersionName(n) => Some(n.toLong -> st)
        case _ => None
      }).toMap
    var v = statuses.keys.maxOption.getOrElse(0L)
    while (v > 0L && read(spark, dir, v).isEmpty) v -= 1
    if (v == 0L) (0L, 0L)
    else statuses.get(v)
      .map(st => (v, st.getLen * 1000003L ^ st.getModificationTime))
      .getOrElse((v, versionFingerprint(spark, dir, v)))
  }

  /** The current head's lines with probe/read retry — the ONE
    * "resolve the latest valid head, retry when an expiry races the
    * read, THROW rather than serve empty" discipline for log readers
    * that must never mistake a vanished head for an empty log (serving
    * a tombstone/forget log as empty silently resurrects deletes).
    * None = genuinely empty log. Cache-keeping readers (the forget
    * ledger) interleave a version probe with their cache and cannot use
    * this directly — see Forget.forgottenIds. */
  def headLines(spark: SparkSession, dir: String): Option[Seq[String]] = {
    var attempt = 0
    while (attempt < 5) {
      val v = currentVersion(spark, dir)
      if (v == 0L) return None
      read(spark, dir, v) match {
        case some @ Some(_) => return some
        case None => attempt += 1
      }
    }
    throw new IllegalStateException(
      s"manifest head vanished mid-read 5x under $dir — refusing to " +
        "treat it as empty")
  }

  /** The fingerprint of one version file (same mix as
    * [[currentVersionFingerprinted]]) — what a committer stamps its own
    * just-installed head with. 0 if the file is already gone (an expiry
    * racing the stat); a 0 stamp can never serve stale, because a probe
    * of a vanished head resolves a DIFFERENT version number. */
  def versionFingerprint(spark: SparkSession, dir: String,
      version: Long): Long = {
    val (fs, _) = hfs(spark, dir)
    try {
      val st = fs.getFileStatus(versionPath(dir, version))
      st.getLen * 1000003L ^ st.getModificationTime
    } catch { case _: java.io.FileNotFoundException => 0L }
  }

  /** One CAS attempt: publish `files` as `version`, content-first, via an
    * atomic no-overwrite install. Returns false iff the version name was
    * already taken (the caller lost the race — re-read the winner's
    * content and retry on top). */
  def tryCommit(spark: SparkSession, dir: String, version: Long,
      files: Seq[String]): Boolean = {
    val (fs, p) = hfs(spark, dir)
    fs.mkdirs(p)
    val vp = versionPath(dir, version)
    if (fs.exists(vp)) return false // fast path; the install below is the gate
    // content first, to a WRITER-UNIQUE temp (two racers must never share
    // a staging file)
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".v$version.${System.nanoTime()}.t${Thread.currentThread().getId}.tmp")
    val sentinel =
      if (spark.conf.get(CompatSentinelKey, "false").toBoolean) Sentinel
      else saltLine()
    val out = fs.create(tmp, true)
    try out.write((files.mkString("\n") +
        (if (files.isEmpty) "" else "\n") + sentinel + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val published =
      if ("file" == fs.getScheme)
        // local FS: POSIX rename OVERWRITES an existing destination, so it
        // cannot be the CAS — link(2) atomically fails on an existing name
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(vp.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      else if (NoOverwriteRenameSchemes(fs.getScheme))
        // these filesystems' rename refuses an existing destination
        // atomically (HDFS in the NN; viewfs delegates to HDFS mounts)
        fs.rename(tmp, vp)
      else
        // Object stores (s3a, abfs, gs, …) either overwrite on rename or
        // rename non-atomically — two racers could BOTH "win" and one
        // commit would be silently lost. Refusing loudly preserves the
        // multi-writer contract; those stores need a conditional-put or
        // DynamoDB-style lock layer this engine doesn't ship.
        throw new UnsupportedOperationException(
          s"ManifestLog: filesystem scheme '${fs.getScheme}' has no " +
            "atomic no-overwrite rename; the CAS commit would silently " +
            "lose races. Use HDFS/local, or front the log with a " +
            "conditional-put catalog.")
    fs.delete(tmp, false)
    published
  }

  /** Filesystems whose FileSystem.rename is atomic AND refuses an
    * existing destination — the property the CAS install needs. */
  private val NoOverwriteRenameSchemes = Set("hdfs", "viewfs", "webhdfs")

  /** Optimistic commit loop: derive the update from the latest VALID
    * version at/below the claimed head and publish it as claimed+1; on a
    * lost race, re-read the winner's head and retry on top. Returns the
    * committed version. Claiming exactly claimed+1 (never skipping
    * ahead) is what makes updates serializable: a commit can only win
    * the name directly above the head it derived from. */
  def commit(spark: SparkSession, dir: String,
      update: Seq[String] => Seq[String], maxRetries: Int = 50): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val claimed = claimedVersion(spark, dir)
      var baseV = claimed
      while (baseV > 0L && read(spark, dir, baseV).isEmpty) baseV -= 1
      val base = if (baseV == 0L) Seq.empty[String]
        else read(spark, dir, baseV).getOrElse(Seq.empty)
      val next = claimed + 1L
      if (tryCommit(spark, dir, next, update(base))) return next
      attempt += 1
    }
    throw new java.io.IOException(
      s"manifest commit: lost $maxRetries CAS races under $dir")
  }

  /** Every valid version's file list, for vacuum-style liveness sweeps. */
  def allReferenced(spark: SparkSession, dir: String): Set[String] = {
    (1L to claimedVersion(spark, dir))
      .flatMap(v => read(spark, dir, v).getOrElse(Seq.empty)).toSet
  }

  /** Iceberg-style snapshot EXPIRY: drop every version strictly below
    * `keepFrom` from the log, so their exclusively-referenced data files
    * become vacuum-eligible (`allReferenced` no longer sees them).
    * Version numbers are never reclaimed — `claimedVersion` is the max
    * surviving name, and `keepFrom` must not exceed the current valid
    * head (an empty log would un-serialize the next CAS claim). Returns
    * the expired version numbers. Safe against racing committers: they
    * claim ABOVE the head, never below it.
    */
  def expire(spark: SparkSession, dir: String, keepFrom: Long): Seq[Long] = {
    val head = currentVersion(spark, dir)
    require(keepFrom <= head,
      s"expire(keepFrom=$keepFrom) would drop the valid head v$head")
    val (fs, p) = hfs(spark, dir)
    if (!fs.exists(p)) return Seq.empty
    // one listing, then delete only the versions actually present — a
    // caller that expires on every commit (the batch roster) must pay
    // O(versions expired), not O(head) blind delete RPCs per call
    fs.listStatus(p).toSeq.flatMap(st => st.getPath.getName match {
      case VersionName(n) => Some(n.toLong)
      case _ => None
    }).filter(_ < keepFrom).sorted.filter { v =>
      fs.delete(versionPath(dir, v), false)
    }
  }
}
