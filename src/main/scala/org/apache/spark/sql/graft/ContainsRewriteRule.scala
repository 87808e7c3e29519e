package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StringType

/** Optimizer rule: route a substring filter over the registered corpus
  * through its TRIGRAM POSTING INDEX — the optimizer-driven version of
  * the `knn_where_contains_indexed` serve, so a user writing nothing
  * but `WHERE contains(text, 'needle')` (or `.filter(col("text")
  * .contains(...))`, or a [[graft.ops.ChromaFilter]] `$contains` tree)
  * gets the index route without calling a routed API.
  *
  * Pattern:  Filter(cond, <bare scan of `source`>) where `cond` has a
  * conjunct `Contains(<the REGISTERED text column>, <literal of >= 3
  * code points>)` and the scan outputs `doc_id`. A contains over any
  * OTHER column of the source never routes — the posting index covers
  * one column, and gating a title filter on text trigrams would
  * silently drop rows.
  *
  * Rewrite:  the SAME Filter over a LeftSemi join of the scan against
  * the posting gate — documents carrying ALL of the needle's trigrams
  * (every gated conjunct intersects inside ONE aggregation, the shared
  * [[graft.ops.VectorSearch.trigramGateFrame]] the indexed serves use;
  * its distinct-then-sum formulation is planner-safe for a plan built
  * AFTER the distinct-aggregate rewrite batch has already run). The
  * gate is a SUPERSET of true matches (trigram co-occurrence admits
  * false positives; needle and index sides lower + sigma-fold
  * identically) and the original contains conjunct stays as the
  * verify, so unlike [[AnnRewriteRule]] this rewrite is EXACT —
  * semantics are preserved bit-for-bit PROVIDED the posting table
  * indexes every document in the source. That completeness is the
  * registration contract (the [[MvRewriteRule]] freshness discipline):
  * opting in declares "postingsPath is a complete trigram index of
  * source.textCol", and the index-maintenance lifecycle rows
  * (append/upsert/delete/stream) are how it stays one.
  *
  *   spark.graft.contains.rewrite      = true   (default false)
  *   spark.graft.contains.source       = <documents parquet path>
  *   spark.graft.contains.postingsPath = <(doc_id, tg) posting parquet>
  *   spark.graft.contains.textCol      = <indexed column> (default text)
  *
  * A malformed conf, a sub-trigram needle, an oversized trigram set,
  * a doc_id type mismatch, or an unreadable posting table declines the
  * rewrite rather than failing the query (the AnnRewriteRule
  * discipline). Idempotence does NOT rely on batch placement: a plan
  * already carrying a posting-gate semi-join is left alone wholesale,
  * so the fixed-point interplay with PushDownPredicates (which
  * re-creates the matched Filter-over-scan shape below the injected
  * join) cannot add a second gate per iteration. The analyzed posting
  * relation is cached on a listing signature (the MvRewriteRule cache
  * discipline) — matching queries don't pay a footer read per
  * optimization pass. */
object ContainsRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.contains.rewrite"
  val SourceKey = "spark.graft.contains.source"
  val PostingsKey = "spark.graft.contains.postingsPath"
  val TextColKey = "spark.graft.contains.textCol"

  /** Past this many distinct trigrams the injected IN-list stops paying
    * for itself (plan bloat; the posting probe reads more lists than
    * the verify would save). */
  private val MaxTrigrams = 256

  /** Analyzed posting relation cache keyed by path, invalidated on a
    * listing signature (file count, max mtime, total bytes) — the
    * MvRewriteRule.analyzedMv discipline: without it every optimization
    * pass of every matching query re-lists the directory and re-reads
    * footer schema, driver-side RPCs inside the optimizer. */
  private case class CachedRel(signature: (Int, Long, Long),
      rel: LogicalRelation)
  private val relCache =
    new java.util.concurrent.ConcurrentHashMap[String, CachedRel]()

  private def postingsFrame(session: SparkSession,
      path: String): Option[DataFrame] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(session.sessionState.newHadoopConf())
    val files =
      try fs.listStatus(hPath).filter(_.isFile)
      catch { case _: java.io.IOException => return None }
    val signature = (
      files.length,
      if (files.isEmpty) 0L else files.map(_.getModificationTime).max,
      files.map(_.getLen).sum)
    val cached = relCache.get(path)
    val rel =
      if (cached != null && cached.signature == signature) cached.rel
      else {
        val analyzed =
          try session.read.parquet(path).queryExecution.analyzed
          catch { case _: Exception => return None }
        val lr = analyzed.collectFirst { case l: LogicalRelation => l }
          .getOrElse(return None)
        relCache.put(path, CachedRel(signature, lr))
        lr
      }
    // fresh exprIds per rewrite, light plan on top re-analyzes without
    // touching the filesystem (Dataset.ofRows is private[sql] — this
    // rule lives under org.apache.spark.sql for exactly this access)
    Some(org.apache.spark.sql.classic.Dataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      rel.newInstance()))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").equalsIgnoreCase("true"))
      return plan
    val source = conf.getConfString(SourceKey, "")
    val postings = conf.getConfString(PostingsKey, "")
    val textCol = conf.getConfString(TextColKey, "text")
    if (source.isEmpty || postings.isEmpty) return plan
    // whole-plan idempotency guard: once ANY posting-gate semi-join is
    // present, leave the plan alone — under fixed-point optimization
    // PushDownPredicates pushes the kept verify back below the injected
    // join, re-creating the Filter-over-scan shape; re-matching it
    // would add one gate per iteration until maxIterations
    val alreadyGated = plan.collectFirst {
      case Join(_, right, LeftSemi, _, _)
          if right.collectLeaves().exists {
            case lr: LogicalRelation =>
              RewriteSupport.relationAtPath(lr, postings)
            case _ => false
          } => ()
    }.isDefined
    if (alreadyGated) return plan
    var done = false // at most one injection per pass (see guard above)
    plan.transformUp {
      case f @ Filter(cond, child)
          if !done && RewriteSupport.scansSource(child, source) =>
        rewrite(cond, child, postings, textCol) match {
          case Some(r) => done = true; r
          case None => f
        }
    }
  }

  private def rewrite(cond: Expression, child: LogicalPlan,
      postings: String, textCol: String): Option[LogicalPlan] = {
    val needles = splitConjunctivePredicates(cond).collect {
      case Contains(a: AttributeReference, Literal(s, StringType))
          if s != null && a.name == textCol && child.outputSet.contains(a) =>
        s.toString
    }
    // only needles long enough to have a trigram gate participate; any
    // others stay as plain verify conjuncts (the rewrite still helps)
    val gated = needles.filter(n => n.codePoints().count() >= 3)
    if (gated.isEmpty) return None
    val nTrigrams = gated
      .flatMap(graft.ops.VectorSearch.needleTrigrams).distinct.size
    if (nTrigrams > MaxTrigrams) {
      logWarning(s"graft contains rewrite declined: $nTrigrams " +
        s"trigrams exceed $MaxTrigrams")
      return None
    }
    val docId = child.output.find(_.name == "doc_id").getOrElse(return None)
    val session = RewriteSupport.resolveSession(conf).getOrElse(return None)
    val gatePlan =
      try {
        val pf = postingsFrame(session, postings).getOrElse(return None)
        graft.ops.VectorSearch.trigramGateFrame(pf, gated)
          .queryExecution.analyzed
      } catch {
        case e: Exception =>
          logWarning(s"graft contains rewrite declined: $e")
          return None
      }
    val gateDocId = gatePlan.output.find(_.name == "doc_id")
      .getOrElse(return None)
    // a postings table whose doc_id type drifted from the corpus would
    // make the join condition unresolved — decline, never fail
    if (gateDocId.dataType != docId.dataType) {
      logWarning("graft contains rewrite declined: postings doc_id is " +
        s"${gateDocId.dataType}, corpus doc_id is ${docId.dataType}")
      return None
    }
    Some(Filter(cond,
      Join(child, gatePlan, LeftSemi,
        Some(EqualTo(docId, gateDocId)), JoinHint.NONE)))
  }
}
