package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, countDistinct}
import org.apache.spark.sql.types.StringType

/** Optimizer rule: route a substring filter over the registered corpus
  * through its TRIGRAM POSTING INDEX — the optimizer-driven version of
  * the `knn_where_contains_indexed` serve, so a user writing nothing
  * but `WHERE contains(text, 'needle')` (or `.filter(col("text")
  * .contains(...))`, or a [[graft.ops.ChromaFilter]] `$contains` tree)
  * gets the index route without calling a routed API.
  *
  * Pattern:  Filter(cond, <bare scan of `source`>) where `cond` has a
  * conjunct `Contains(<string col>, <literal >= 3 code points>)` and
  * the scan outputs `doc_id`.
  *
  * Rewrite:  the SAME Filter over a LeftSemi join of the scan against
  * the posting gate — documents carrying ALL of the needle's trigrams
  * (every conjunct's gate intersects inside one aggregation). The gate
  * is a SUPERSET of true matches (trigram co-occurrence admits false
  * positives) and the original contains conjunct stays as the verify,
  * so unlike [[AnnRewriteRule]] this rewrite is EXACT — semantics are
  * preserved bit-for-bit PROVIDED the posting table indexes every
  * document in the source. That completeness is the registration
  * contract (the [[MvRewriteRule]] freshness discipline): opting in
  * declares "postingsPath is a complete trigram index of source", and
  * the index-maintenance lifecycle rows (append/upsert/delete/stream)
  * are how it stays one.
  *
  *   spark.graft.contains.rewrite      = true   (default false)
  *   spark.graft.contains.source       = <documents parquet path>
  *   spark.graft.contains.postingsPath = <(doc_id, tg) posting parquet>
  *
  * A malformed conf, a sub-trigram needle, or an oversized trigram set
  * declines the rewrite rather than failing the query (the
  * AnnRewriteRule discipline). The rewritten Filter's child is a Join,
  * which the pattern no longer matches — idempotent across optimizer
  * iterations.
  */
object ContainsRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.contains.rewrite"
  val SourceKey = "spark.graft.contains.source"
  val PostingsKey = "spark.graft.contains.postingsPath"

  /** Past this many distinct trigrams the injected IN-list stops paying
    * for itself (plan bloat; the posting probe reads more lists than
    * the verify would save). */
  private val MaxTrigrams = 256

  private def resolveSession(): Option[SparkSession] = {
    val candidates =
      SparkSession.getActiveSession.toSeq ++ SparkSession.getDefaultSession.toSeq
    candidates.find(_.sessionState.conf eq conf).orElse(candidates.headOption)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").equalsIgnoreCase("true"))
      return plan
    val source = conf.getConfString(SourceKey, "")
    val postings = conf.getConfString(PostingsKey, "")
    if (source.isEmpty || postings.isEmpty) return plan
    plan.transformUp {
      case f @ Filter(cond, child) if scansSource(child, source) =>
        rewrite(f, cond, child, postings).getOrElse(f)
    }
  }

  private def rewrite(f: Filter, cond: Expression, child: LogicalPlan,
      postings: String): Option[LogicalPlan] = {
    val needles = splitConjunctivePredicates(cond).collect {
      case Contains(a: AttributeReference, Literal(s, StringType))
          if s != null && child.outputSet.contains(a) =>
        s.toString
    }
    // only needles long enough to have a trigram gate participate; any
    // others stay as plain verify conjuncts (the rewrite still helps)
    val gated = needles.filter(n => n.codePoints().count() >= 3)
    if (gated.isEmpty) return None
    val docId = child.output.find(_.name == "doc_id").getOrElse(return None)
    val session = resolveSession().getOrElse(return None)
    val tgSets =
      try gated.map(graft.ops.VectorSearch.needleTrigrams)
      catch { case _: IllegalArgumentException => return None }
    val allTgs = tgSets.flatten.distinct
    if (allTgs.size > MaxTrigrams) {
      logWarning(s"graft contains rewrite declined: ${allTgs.size} " +
        s"trigrams exceed $MaxTrigrams")
      return None
    }
    val gateDf =
      try {
        val gates = tgSets.zipWithIndex.map { case (tgs, i) =>
          countDistinct(org.apache.spark.sql.functions
            .when(col("tg").isin(tgs: _*), col("tg"))).as(s"n_tg$i")
        }
        session.read.parquet(postings)
          .filter(col("tg").isin(allTgs: _*))
          .groupBy("doc_id").agg(gates.head, gates.tail: _*)
          .filter(tgSets.zipWithIndex.map { case (tgs, i) =>
            col(s"n_tg$i") === tgs.size }.reduce(_ && _))
          .select("doc_id")
      } catch {
        case e: Exception =>
          logWarning(s"graft contains rewrite declined: $e")
          return None
      }
    val gatePlan = gateDf.queryExecution.analyzed
    val gateDocId = gatePlan.output.find(_.name == "doc_id").getOrElse(return None)
    Some(Filter(cond,
      Join(child, gatePlan, LeftSemi,
        Some(EqualTo(docId, gateDocId)), JoinHint.NONE)))
  }

  /** Bare scan of the registered source, optionally under an
    * attribute-only Project — the MvRewriteRule matcher: exact on the
    * scheme-stripped path, so sibling tables never route to a posting
    * index that does not cover them. */
  private def scansSource(child: LogicalPlan, source: String): Boolean =
    child match {
      case Project(projectList, grandchild)
          if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        scansSource(grandchild, source)
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val want = new org.apache.hadoop.fs.Path(source).toUri.getPath
          fs.location.rootPaths.exists(_.toUri.getPath == want)
        case _ => false
      }
      case _ => false
    }
}
