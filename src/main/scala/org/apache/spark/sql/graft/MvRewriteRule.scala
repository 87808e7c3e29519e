package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: answer a grouped COUNT over a fact table from a
  * pre-aggregated materialized summary (the materialized-view routing
  * every warehouse does — at 100 TB a `GROUP BY event_type` over raw
  * events rescans the table; the MV answer is catalog-scale).
  *
  * Pattern:  Aggregate(group = [<groupCol>],
  *                     aggs  = [<groupCol>, count(<literal>) …])
  *           over a bare scan (optionally a pruning Project) of the
  *           registered SOURCE path — no filters, no other aggregates,
  *           count never DISTINCT or FILTERed. Anything stricter-than-
  *           matched stays untouched: a filtered or differently-grouped
  *           query would be WRONG from the summary.
  *
  * Rewrite:  Aggregate(group = [<groupCol>], sum(cnt) …) over the MV
  *           parquet. Counts are mergeable, so summing the stored
  *           partial counts is exact — the refresh job's guarantee
  *           (ivm_event_summary is the maintenance pattern). Output
  *           aliases keep the ORIGINAL exprIds, so parents resolve
  *           unchanged. With `spark.graft.mv.sumCol=<col>` registered,
  *           plain `sum(<col>)` (LongType integer units) routes the
  *           same way to the MV column `sum_<col>` — sums of integer
  *           partials are as mergeable as counts; float sums are never
  *           routed (shuffle-order addition isn't associative).
  *
  * Strictly OPT-IN via session conf (freshness is the user's contract —
  * enabling it declares "the MV at `path` reflects `source`"):
  *
  *   spark.graft.mv.rewrite  = true     // master switch (default false)
  *   spark.graft.mv.source   = <fact table dir or file>
  *   spark.graft.mv.path     = <summary parquet: (<groupCol>, cnt)>
  *   spark.graft.mv.groupCol = <group column> (default event_type)
  *
  * A malformed conf or unreadable MV declines the rewrite rather than
  * failing the query (the AnnRewriteRule discipline).
  */
object MvRewriteRule extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.mv.rewrite"
  val SourceKey = "spark.graft.mv.source"
  val PathKey = "spark.graft.mv.path"
  val GroupColKey = "spark.graft.mv.groupCol"

  /** Optional second routed shape: `sum(<sumCol>)` over the fact scan is
    * answered from the MV column `sum_<sumCol>` (both LongType — integer
    * units only, because float partial sums don't merge deterministically;
    * the ivm_event_summary mergeability argument). Empty = counts only.
    */
  val SumColKey = "spark.graft.mv.sumCol"

  /** Optional third routed shape: `min(<c>)` / `max(<c>)` for each column
    * in this comma-separated registration routes to the MV columns
    * `min_<c>` / `max_<c>`. Unlike sums, min/max partials are mergeable
    * for ANY ordered type — re-taking the extremum of stored extrema is
    * exact — so the only guard is that the MV column's type equals the
    * fact column's (a drifted summary schema declines, never miscasts).
    */
  val MinMaxColsKey = "spark.graft.mv.minmaxCols"

  /** Analyzed MV relation cache, keyed by path and invalidated on a
    * LISTING SIGNATURE (file count + max file mtime + total bytes):
    * without it every optimization pass of every matching query re-reads
    * the footer schema (driver-side RPCs inside the optimizer). A bare
    * directory-mtime probe is unreliable off local FS — S3A synthesizes
    * directory statuses (mtime 0, never changes) and some filesystems
    * have 1 s mtime granularity — so a refreshed MV could keep serving
    * the stale cached relation. The signature is one listStatus over the
    * MV directory (MVs are few small files by construction), and any
    * refresh that adds/removes/rewrites a data file changes it.
    */
  private case class CachedMv(signature: (Int, Long, Long), rel: LogicalRelation)
  private val mvCache = new java.util.concurrent.ConcurrentHashMap[String, CachedMv]()

  /** The session whose conf registered the MV, not whichever session
    * happens to be thread-active: prefer the one whose SQLConf is the
    * very instance this rule is reading its keys from (multi-session
    * apps can have a different `SparkSession.active`).
    */
  private def resolveSession(): Option[SparkSession] =
    RewriteSupport.resolveSession(conf)

  /** Fresh-output copy of the (cached) analyzed MV relation. A new
    * instance per rewrite keeps exprIds unique even if two aggregates in
    * one query both route to the same MV.
    */
  private def analyzedMv(mvPath: String): Option[LogicalRelation] = {
    val session = resolveSession().getOrElse(return None)
    val hPath = new org.apache.hadoop.fs.Path(mvPath)
    val fs = hPath.getFileSystem(session.sessionState.newHadoopConf())
    val files = fs.listStatus(hPath).filter(_.isFile)
    val signature = (
      files.length,
      if (files.isEmpty) 0L else files.map(_.getModificationTime).max,
      files.map(_.getLen).sum)
    val cached = mvCache.get(mvPath)
    val rel =
      if (cached != null && cached.signature == signature) cached.rel
      else {
        val analyzed = session.read.parquet(mvPath).queryExecution.analyzed
        val lr = analyzed.collectFirst { case l: LogicalRelation => l }
          .getOrElse(return None)
        mvCache.put(mvPath, CachedMv(signature, lr))
        lr
      }
    Some(rel.newInstance())
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").equalsIgnoreCase("true")) return plan
    val source = conf.getConfString(SourceKey, "")
    val mvPath = conf.getConfString(PathKey, "")
    val groupCol = conf.getConfString(GroupColKey, "event_type")
    val sumCol = conf.getConfString(SumColKey, "")
    val mmCols = conf.getConfString(MinMaxColsKey, "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    if (source.isEmpty || mvPath.isEmpty) return plan

    plan.transformUp {
      case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _)
          if g.name == groupCol && scansSource(child, source) &&
            aggExprs.forall(shapeOk(_, g, sumCol, mmCols)) &&
            aggExprs.exists(e => isCountAlias(e) || isSumAlias(e, sumCol) ||
              isMinMaxAlias(e, mmCols)) =>
        rewrite(agg, g, aggExprs, mvPath, groupCol, sumCol).getOrElse(agg)
    }
  }

  /** Bare scan of the registered source, optionally under a pruning
    * Project (attribute-only — an expression would change semantics).
    * Matching is EXACT on the scheme-stripped path: a substring match
    * would route scans of sibling tables (`…/events_archive` when
    * `…/events` is registered) to the wrong MV.
    */
  private def scansSource(child: LogicalPlan, source: String): Boolean =
    RewriteSupport.scansSource(child, source)

  private def isCountAlias(e: NamedExpression): Boolean = e match {
    case Alias(ae: AggregateExpression, _) =>
      ae.aggregateFunction.isInstanceOf[Count] && !ae.isDistinct &&
        ae.filter.isEmpty &&
        ae.aggregateFunction.children.forall(_.foldable)
    case _ => false
  }

  /** `sum(<sumCol>)`, plain (no DISTINCT/FILTER), over the LongType fact
    * column registered for sum routing — the only sum the stored integer
    * partials can answer exactly.
    */
  private def isSumAlias(e: NamedExpression, sumCol: String): Boolean =
    sumCol.nonEmpty && (e match {
      case Alias(ae: AggregateExpression, _) =>
        !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
          case s: Sum => s.child match {
            case a: AttributeReference =>
              a.name == sumCol &&
                a.dataType == org.apache.spark.sql.types.LongType
            case _ => false
          }
          case _ => false
        })
      case _ => false
    })

  /** `min(<c>)` / `max(<c>)`, plain, over a registered min/max column. */
  private def isMinMaxAlias(e: NamedExpression, mmCols: Set[String]): Boolean =
    mmCols.nonEmpty && (e match {
      case Alias(ae: AggregateExpression, _) =>
        !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
          case Min(a: AttributeReference) => mmCols.contains(a.name)
          case Max(a: AttributeReference) => mmCols.contains(a.name)
          case _ => false
        })
      case _ => false
    })

  private def shapeOk(e: NamedExpression, g: AttributeReference,
      sumCol: String, mmCols: Set[String]): Boolean =
    (e match {
      case a: AttributeReference => a.exprId == g.exprId
      case _ => false
    }) || isCountAlias(e) || isSumAlias(e, sumCol) || isMinMaxAlias(e, mmCols)

  private def rewrite(agg: Aggregate, g: AttributeReference,
      aggExprs: Seq[NamedExpression], mvPath: String,
      groupCol: String, sumCol: String): Option[LogicalPlan] = {
    try {
      val mv = analyzedMv(mvPath).getOrElse(return None)
      val longType = org.apache.spark.sql.types.LongType
      val mvG = mv.output.find(_.name == groupCol)
      val mvC = mv.output.find(_.name == "cnt")
      val mvS = mv.output.find(_.name == s"sum_$sumCol")
      if (mvG.isEmpty || mvG.get.dataType != g.dataType) return None
      // the needed MV columns must exist with LongType: the rewrite
      // reuses the original aggregates' exprIds whose parent-bound
      // references are LongType — a drifted MV schema must decline here,
      // not fail at physical planning
      if (aggExprs.exists(isCountAlias) &&
        !mvC.exists(_.dataType == longType)) return None
      if (aggExprs.exists(isSumAlias(_, sumCol)) &&
        !mvS.exists(_.dataType == longType)) return None
      // min/max route to `min_<c>` / `max_<c>` MV columns of the SAME
      // type as the fact column — re-taking the extremum of stored
      // extrema is exact for any ordered type; a missing or drifted
      // column declines before any expression is built
      def mvExtremum(prefix: String, a: AttributeReference): Option[Attribute] =
        mv.output.find(c => c.name == s"${prefix}_${a.name}" &&
          c.dataType == a.dataType)
      val newExprs: Seq[NamedExpression] = aggExprs.map {
        case a: AttributeReference => // the group column
          Alias(mvG.get, a.name)(exprId = a.exprId)
        case al @ Alias(ae: AggregateExpression, name) =>
          val merged: AggregateExpression = ae.aggregateFunction match {
            case _: Count =>
              AggregateExpression(Sum(mvC.get), Complete, isDistinct = false)
            case Min(a: AttributeReference) =>
              AggregateExpression(Min(mvExtremum("min", a).getOrElse(return None)),
                Complete, isDistinct = false)
            case Max(a: AttributeReference) =>
              AggregateExpression(Max(mvExtremum("max", a).getOrElse(return None)),
                Complete, isDistinct = false)
            case _: Sum => // isSumAlias by shapeOk: re-sum stored partials
              AggregateExpression(Sum(mvS.get), Complete, isDistinct = false)
            case _ => return None // unreachable given shapeOk
          }
          Alias(merged, name)(exprId = al.exprId)
        case other => return None // unreachable given shapeOk
      }
      logInfo(s"graft MV rewrite: answering grouped agg by $groupCol from $mvPath")
      Some(Aggregate(Seq(mvG.get), newExprs, mv, None))
    } catch {
      // unreadable/missing MV: decline, never fail the query
      case scala.util.control.NonFatal(_) => None
    }
  }
}
