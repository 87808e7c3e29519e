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
  * The roster replaces the guess with a TWO-PHASE commit through the
  * multi-writer [[ManifestLog]] (at `<root>/_roster` — underscore-
  * prefixed, so table scans never see it). Three id states:
  *
  *   - `pending:<id>` — committed by the fold BEFORE its swap marker.
  *     Stagers decline the id (its rows are durable in its own
  *     directory), but the directory is NOT reclaimable: if the fold
  *     dies before its swap commits, the directory is still the only
  *     copy of those rows.
  *   - `folded:<id>` — flipped AFTER the swap completed; the id's rows
  *     live in the consolidated leaf. Stagers decline, and a re-landed
  *     `batch=<id>` directory is a late replay's garbage the next fold
  *     reconciles (deletes).
  *   - `leaf:<id>`   — the consolidated destination (always
  *     `targets.min`). Stagers decline it too — a replay carrying only
  *     its own batch's rows would CLOBBER the leaf — and its directory
  *     is live and never reconciled away.
  *
  * Why two phases: a single pre-marker `folded:` commit (the first cut
  * of this ledger) let a crash between the roster commit and the swap
  * marker mark batches as folded whose staged fold output was then
  * DISCARDED by recovery — the next fold's reconciliation would delete
  * their live directories, losing the rows everywhere while the roster
  * declined every redelivery. `pending:` ids decline without ever
  * authorizing reclamation; only a completed swap flips them.
  *
  * Crash matrix: die before the pending commit → staging discarded,
  * nothing recorded. Die between pending commit and marker → staging
  * discarded, directories intact, replays decline (safe — rows are
  * durable on disk), the next fold re-targets the same directories and
  * re-commits pending idempotently. Die between marker and flip →
  * recovery completes the swap; a maintenance sweep at the next fold
  * flips any pending id whose directory is gone (its rows are in the
  * leaf); the destination id may sit in pending with a live directory
  * until a later fold names it leaf — benign, since pending both
  * declines replays and forbids reclamation.
  *
  * What this closes: any replay arriving AFTER the fold's pending
  * commit declines, forever — no duplicate, no clobbered leaf, no
  * horizon arithmetic. What it narrows but cannot close: a stager whose
  * overwrite is IN FLIGHT across the fold's swap can re-create the
  * directory between the swap's delete and rename; the stagers re-check
  * the roster after writing (deleting their directory only for
  * `folded:` ids — rows already in the leaf — and failing LOUDLY on a
  * `leaf:` collision), but the instant of overlap itself remains
  * excluded by the fold's documented maintenance-window contract (which
  * the age floor provides in practice — hot directories are simply not
  * fold targets).
  *
  * Log retention: the roster is a SET, not a history, so each commit
  * expires versions more than 64 below the new head — bounded files,
  * stager reads stay O(live ids) (see the watermark note below). The margin matters: expiring up
  * to the head would let a reader that just resolved the head race a
  * commit's expiry and read an ABSENT version (an empty roster would
  * silently wave replays through), and would let a stalled committer
  * claim a reclaimed below-head name (a lost update). Roster WRITES
  * come only from folds, which already run single-writer inside their
  * maintenance window, so for either race to bite, a read or claim
  * would have to straddle 64 roster commits ≈ 20+ complete fold runs.
  * Belt and braces, `current` retries a vanished head and then THROWS
  * — a reader can stale-read by one commit or fail loudly, but can
  * never observe an emptier roster than one it already saw.
  *
  * Roster SIZE is bounded too: folded ids are compacted to a watermark.
  * A `below:<W>` line means every id < W is non-free (folded, unless
  * the explicit pending/leaf sets say otherwise), and explicit
  * `folded:` entries under W are dropped. W only ever advances across
  * ids the roster has EXPLICITLY recorded (folded/leaf/pending), so a
  * genuinely never-seen id — a gap in the id space — blocks it forever
  * rather than being misclassified as consumed (which would silently
  * decline that id's FIRST delivery). Structured Streaming batch ids
  * are contiguous from 0, so for the intended stagers the watermark
  * tracks the fold frontier and the explicit sets stay O(live ids)
  * instead of O(all-time batch count).
  */
object BatchRoster {
  private def rosterDir(root: String) = root + "/_roster"

  private final case class State(pending: Set[Long], folded: Set[Long],
      leaf: Set[Long], below: Long) {
    /** folded-or-under-watermark, before leaf/pending precedence. */
    def foldedLike(id: Long): Boolean = id < below || folded.contains(id)
  }

  private def parse(lines: Seq[String]): State = State(
    lines.collect { case s if s.startsWith("pending:") =>
      s.stripPrefix("pending:").toLong }.toSet,
    lines.collect { case s if s.startsWith("folded:") =>
      s.stripPrefix("folded:").toLong }.toSet,
    lines.collect { case s if s.startsWith("leaf:") =>
      s.stripPrefix("leaf:").toLong }.toSet,
    lines.collectFirst { case s if s.startsWith("below:") =>
      s.stripPrefix("below:").toLong }.getOrElse(0L))

  private def render(s: State): Seq[String] =
    (if (s.below > 0L) Seq(s"below:${s.below}") else Seq.empty) ++
      s.pending.toSeq.sorted.map(i => s"pending:$i") ++
      s.folded.toSeq.sorted.map(i => s"folded:$i") ++
      s.leaf.toSeq.sorted.map(i => s"leaf:$i")

  /** Advance the watermark across the contiguous explicitly-recorded
    * prefix, then drop the folded entries it subsumes (leaf/pending
    * stay explicit — they carry precedence over the watermark). */
  private def compacted(s: State): State = {
    var w = s.below
    while (s.folded.contains(w) || s.leaf.contains(w) ||
        s.pending.contains(w)) w += 1
    s.copy(folded = s.folded.filter(_ >= w), below = w)
  }

  private val KeepVersions = 64L

  private def current(spark: SparkSession, root: String): State = {
    val dir = rosterDir(root)
    var attempt = 0
    while (attempt < 5) {
      val v = ManifestLog.currentVersion(spark, dir)
      if (v == 0L) return parse(Seq.empty)
      ManifestLog.read(spark, dir, v) match {
        case Some(lines) => return parse(lines)
        case None => attempt += 1 // expiry raced the read — re-resolve
      }
    }
    throw new IllegalStateException(
      s"roster head vanished mid-read 5x under $dir — refusing to " +
        "treat the roster as empty (that would wave folded replays through)")
  }

  private def commit(spark: SparkSession, root: String,
      update: State => State): Unit = {
    val v = ManifestLog.commit(spark, rosterDir(root),
      lines => render(compacted(update(parse(lines)))))
    // bounded retention, NOT keep-only-head: see the class doc for why
    // the margin is load-bearing
    if (v > KeepVersions)
      ManifestLog.expire(spark, rosterDir(root), keepFrom = v - KeepVersions)
  }

  /** Must a stager decline this id? True for ids consumed by a
    * committed-or-in-flight fold (`pending`/folded-or-under-watermark)
    * or the live consolidated leaf. */
  def isConsumed(spark: SparkSession, root: String, id: Long): Boolean = {
    val s = current(spark, root)
    s.pending.contains(id) || s.leaf.contains(id) || s.foldedLike(id)
  }

  /** One-read predicate over ids whose re-landed directories are
    * reconciliation garbage — folded (rows live in the leaf) and not
    * the leaf itself. A `pending` id's directory is NEVER reclaimable:
    * until its swap commits, that directory is the only copy of its
    * rows. One roster read serves every listed directory. */
  def reconcilablePred(spark: SparkSession, root: String): Long => Boolean = {
    val s = current(spark, root)
    id => !s.leaf.contains(id) && !s.pending.contains(id) && s.foldedLike(id)
  }

  /** One-read state classification for the stagers' post-write check:
    * "leaf" | "pending" | "folded" | "free" (leaf wins over stale
    * folded marks from a superseded fold generation; the watermark
    * counts as folded for ids no explicit set claims). */
  def classify(spark: SparkSession, root: String, id: Long): String = {
    val s = current(spark, root)
    if (s.leaf.contains(id)) "leaf"
    else if (s.pending.contains(id)) "pending"
    else if (s.foldedLike(id)) "folded"
    else "free"
  }

  /** Phase 1 — the fold's commit point against replays, BEFORE its swap
    * marker: record `targets` as pending. From here on a redelivery of
    * any target declines, while the directories remain authoritative
    * (and reclaim-forbidden) until the swap completes. Idempotent. */
  def commitPending(spark: SparkSession, root: String,
      targets: Seq[Long]): Unit =
    commit(spark, root, s => s.copy(
      pending = s.pending ++ (targets.toSet -- s.folded)))

  /** Phase 2 — AFTER the swap completed: targets leave pending; all but
    * the destination become folded (reclaimable if re-landed); `dest`
    * (a member of targets) becomes the consolidated leaf. */
  def finishFold(spark: SparkSession, root: String, targets: Seq[Long],
      dest: Long): Unit = {
    require(targets.contains(dest), s"fold destination $dest not in targets")
    commit(spark, root, s => s.copy(
      pending = s.pending -- targets,
      // dest also LEAVES folded: its directory is live again (can only
      // matter if an earlier generation folded the id — defensive, the
      // reconciliation sweep makes that physically unreachable)
      folded = (s.folded ++ targets.filterNot(_ == dest)) - dest,
      leaf = (s.leaf -- targets) + dest))
  }

  /** Maintenance sweep for a fold that died between its swap and its
    * phase-2 flip: a pending id whose directory is GONE was swapped
    * (its rows are in a leaf) — flip it to folded so its state stops
    * read-blocking nothing and a re-landed directory becomes
    * reconcilable. Pending ids with live directories are left alone
    * (the crashed-before-swap case, where the directory is the truth). */
  def sweepStalePending(spark: SparkSession, root: String,
      dirExists: Long => Boolean): Unit = {
    val s = current(spark, root)
    val gone = s.pending.filterNot(dirExists)
    if (gone.nonEmpty)
      commit(spark, root, cur => cur.copy(
        pending = cur.pending -- gone,
        folded = cur.folded ++ (gone -- cur.leaf)))
  }
}
