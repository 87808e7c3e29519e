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
  * staged-swap markers use). The CAS primitive is an exclusive create of
  * the version file: atomic O_CREAT|O_EXCL on the local FS, atomic
  * `create(path, overwrite = false)` on HDFS — a claimed version number
  * can never be claimed again, so two committers can never both install
  * the same version. Content lands via a dot-prefixed temp + rename
  * AFTER the claim (the committer owns the claimed number, so the
  * overwrite-rename races nobody); a crash between claim and rename
  * leaves a sentinel-less file that is INVISIBLE to readers and
  * permanently consumes its number — the next commit simply claims the
  * next one. Readers therefore never see a torn version, ever.
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

  private def hfs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
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
    if (lines.nonEmpty && lines.last == Sentinel) Some(lines.init)
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

  /** One CAS attempt: claim `version` exclusively, then install the
    * content. Returns false iff the number was already claimed (the
    * caller lost the race — re-read and retry on the new head). */
  def tryCommit(spark: SparkSession, dir: String, version: Long,
      files: Seq[String]): Boolean = {
    val (fs, p) = hfs(spark, dir)
    fs.mkdirs(p)
    val vp = versionPath(dir, version)
    val claimed =
      if ("file" == vp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getScheme)
        // local FS: Hadoop's create(overwrite=false) is check-then-create;
        // java.io's createNewFile is the atomic O_CREAT|O_EXCL claim
        new java.io.File(vp.toUri.getPath).createNewFile()
      else
        try { fs.create(vp, false).close(); true }
        catch { case _: java.io.IOException => false }
    if (!claimed) return false
    // the number is ours: write content to an invisible temp, rename over
    // the claimed (empty, sentinel-less, reader-invisible) file — readers
    // flip from "torn" to "valid" atomically
    val tmp = new org.apache.hadoop.fs.Path(dir, s".v$version.manifest.tmp")
    val out = fs.create(tmp, true)
    try out.write((files.mkString("\n") +
        (if (files.isEmpty) "" else "\n") + Sentinel + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(vp, false)
    if (!fs.rename(tmp, vp))
      throw new java.io.IOException(s"manifest commit: cannot install $vp")
    true
  }

  /** Optimistic commit loop: read the current head, apply `update` to
    * its file list, claim the next free number; on a lost race, re-read
    * and retry on the winner's head. Returns the committed version. */
  def commit(spark: SparkSession, dir: String,
      update: Seq[String] => Seq[String], maxRetries: Int = 20): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, dir)
      val base = if (head == 0L) Seq.empty[String]
        else read(spark, dir, head).getOrElse(Seq.empty)
      val next = math.max(head, claimedVersion(spark, dir)) + 1L
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
}
