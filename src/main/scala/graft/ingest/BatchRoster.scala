package graft.ingest

import org.apache.spark.sql.SparkSession

/** Admission ledger for streaming-staged index roots — the piece that
  * turns the retention fold's replay-horizon age floor from a
  * CORRECTNESS requirement into an optimization.
  *
  * The hazard (CompactionSpec pinned it as a live duplicate through
  * r12): `stageLshBatch`/`stageClusteredBatch` are idempotent because a
  * redelivered micro-batch overwrites its own deterministic
  * `batch=<id>` directory — but once `foldStagedBatches` has consumed
  * that directory into the consolidated leaf, a late replay has no copy
  * left to overwrite and RE-ADMITS its rows beside the folded copy.
  * The age floor excludes this only while the delivery system's max
  * redelivery delay stays strictly below it — an operational guess.
  *
  * The roster replaces the guess with a commit: a fold CAS-commits the
  * consumed batch ids through the multi-writer [[ManifestLog]] (at
  * `<root>/_roster` — underscore-prefixed, so table scans never see it)
  * BEFORE the swap marker that starts deleting directories. Stagers
  * consult the roster and DECLINE a batch id the log has consumed —
  * declining is always safe, because `folded:`/`leaf:` ids are only
  * ever committed for directories that existed with `_SUCCESS`, i.e.
  * batches whose rows are durably admitted (in their own directory or
  * in the folded leaf). Two line kinds:
  *
  *   - `folded:<id>` — consumed by a fold; the id's rows live in the
  *     consolidated leaf. A re-landed `batch=<id>` directory is a late
  *     replay's garbage and is reconciled (deleted) by the next fold.
  *   - `leaf:<id>`   — the consolidated destination itself (always
  *     `targets.min`). Stagers must decline it too — a replay carrying
  *     only its own batch's rows would CLOBBER the leaf and lose every
  *     other folded batch — but its directory is live and must never be
  *     reconciled away.
  *
  * What this closes: any replay arriving AFTER the fold's roster commit
  * declines, forever — no duplicate, no clobbered leaf, no horizon
  * arithmetic. What it narrows but cannot close: a stager whose
  * overwrite is IN FLIGHT across the fold's swap can re-create the
  * directory between the swap's delete and rename; the stagers re-check
  * the roster after writing and self-delete on a lost race, and fold
  * reconciliation heals a crash between those two steps, but the
  * instant of overlap itself remains excluded by the fold's documented
  * maintenance-window contract (which the age floor provides in
  * practice — hot directories are simply not fold targets).
  */
object BatchRoster {
  private def rosterDir(root: String) = root + "/_roster"

  private def parse(lines: Seq[String]): (Set[Long], Set[Long]) = {
    val folded = lines.collect {
      case s if s.startsWith("folded:") => s.stripPrefix("folded:").toLong
    }.toSet
    val leaf = lines.collect {
      case s if s.startsWith("leaf:") => s.stripPrefix("leaf:").toLong
    }.toSet
    (folded, leaf)
  }

  private def current(spark: SparkSession, root: String): Seq[String] = {
    val dir = rosterDir(root)
    val v = ManifestLog.currentVersion(spark, dir)
    if (v == 0L) Seq.empty
    else ManifestLog.read(spark, dir, v).getOrElse(Seq.empty)
  }

  /** Ids a stager must decline: consumed by a fold (`folded:`) or the
    * live consolidated leaf (`leaf:`). */
  def consumed(spark: SparkSession, root: String): Set[Long] = {
    val (folded, leaf) = parse(current(spark, root))
    folded ++ leaf
  }

  /** Ids whose re-landed directories are reconciliation garbage —
    * `folded:` but not `leaf:` (the leaf's directory is live). */
  def reconcilable(spark: SparkSession, root: String): Set[Long] = {
    val (folded, leaf) = parse(current(spark, root))
    folded -- leaf
  }

  /** The fold's commit point against replays: record `targets` as
    * consumed, with `dest` (always a member) as the new consolidated
    * leaf. CAS-retries on concurrent committers; idempotent — a re-run
    * of an interrupted fold commits the same state again. */
  def commitFold(spark: SparkSession, root: String, targets: Seq[Long],
      dest: Long): Unit = {
    require(targets.contains(dest), s"fold destination $dest not in targets")
    ManifestLog.commit(spark, rosterDir(root), { base =>
      val (folded, leaf) = parse(base)
      // a previous leaf consumed by THIS fold is superseded (its dir is
      // renamed away by the swap); a leaf outside the target set stays live
      val newFolded = folded ++ targets.filterNot(_ == dest)
      val newLeaf = (leaf -- targets) + dest
      newFolded.toSeq.sorted.map(i => s"folded:$i") ++
        newLeaf.toSeq.sorted.map(i => s"leaf:$i")
    })
  }
}
