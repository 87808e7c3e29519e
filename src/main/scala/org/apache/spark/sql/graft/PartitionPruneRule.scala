package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.TimestampType

/** Optimizer rule: DERIVED partition-predicate inference — the
  * generated-column pruning lakehouse engines do. A time-partitioned
  * table stores `partCol = unix_micros(tsCol) DIV 86400000000` (the
  * engine's day-layout convention, `Relational.rangeLayoutScan`), but
  * users filter on the TIMESTAMP column; without inference the scan reads
  * every partition and filters rows. This rule derives the implied
  * day-id bounds from literal `tsCol` comparisons and conjoins them, so
  * `FileSourceStrategy` classifies them as partition filters and prunes
  * directories at planning time — at 100 TB the difference between a
  * 3-day read and a full-history read.
  *
  * Soundness: the layout convention is Spark's `DIV` (IntegralDivide),
  * which TRUNCATES toward zero — so the inference must too. Truncating
  * division by a positive divisor is monotone non-decreasing, hence for
  * rows of the registered table
  * `ts ≥ X ⇒ day_id ≥ trunc(X / µs/day)` and
  * `ts ≤ Y ⇒ day_id ≤ trunc(Y / µs/day)`, and the added predicate is
  * IMPLIED by the existing one — results never change, only files read.
  * (floorDiv would be UNSOUND pre-epoch: a row with ts in (-1 day, 0)
  * stores day_id 0, but floorDiv of a negative literal yields -1 and
  * would prune the partition the row lives in.) Strict `>`/`<` use the
  * same inclusive day bound (conservative: the boundary day may still
  * hold matching rows).
  *
  * Strictly OPT-IN via session conf (the derivation is the registrant's
  * contract that `partCol` really is the epoch-day of `tsCol`):
  *
  *   spark.graft.partprune.enabled = true     // default false
  *   spark.graft.partprune.source  = <table dir>
  *   spark.graft.partprune.tsCol   = ts       // timestamp column
  *   spark.graft.partprune.partCol = day_id   // epoch-day partition col
  *
  * Idempotent: declines when the filter already references `partCol`.
  * Anything but a literal-vs-tsCol comparison contributes no bound.
  */
object PartitionPruneRule extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.partprune.enabled"
  val SourceKey = "spark.graft.partprune.source"
  val TsColKey = "spark.graft.partprune.tsCol"
  val PartColKey = "spark.graft.partprune.partCol"

  private val MicrosPerDay = 86400000000L

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").equalsIgnoreCase("true")) return plan
    val source = conf.getConfString(SourceKey, "")
    val tsCol = conf.getConfString(TsColKey, "ts")
    val partCol = conf.getConfString(PartColKey, "day_id")
    if (source.isEmpty) return plan

    plan.transformUp {
      case f @ Filter(cond, child)
          if scansSource(child, source) &&
            !cond.references.exists(_.name == partCol) =>
        val partAttr = child.output.find(_.name == partCol)
        val bounds = dayBounds(splitConjunctivePredicates(cond), tsCol)
        (partAttr, bounds) match {
          case (Some(p), (lo, hi)) if lo.isDefined || hi.isDefined =>
            // partition discovery may have typed the column int32 or int64
            // — the literal must match exactly (a mistyped Literal throws)
            def litOf(d: Long): Option[Literal] = p.dataType match {
              case org.apache.spark.sql.types.LongType =>
                Some(Literal(d, p.dataType))
              case org.apache.spark.sql.types.IntegerType
                  if d >= Int.MinValue && d <= Int.MaxValue =>
                Some(Literal(d.toInt, p.dataType))
              case _ => None // unexpected partCol type: decline the bound
            }
            val extras =
              lo.flatMap(litOf).map(GreaterThanOrEqual(p, _)).toSeq ++
                hi.flatMap(litOf).map(LessThanOrEqual(p, _))
            if (extras.isEmpty) f
            else {
              logInfo(s"graft partition-prune: inferred $partCol bounds " +
                s"[${lo.getOrElse("-inf")}, ${hi.getOrElse("+inf")}] from $tsCol")
              Filter(extras.foldLeft(cond)(And(_, _)), child)
            }
          case _ => f
        }
    }
  }

  /** (lower, upper) day-id bounds implied by literal tsCol comparisons. */
  private def dayBounds(preds: Seq[Expression], tsCol: String)
      : (Option[Long], Option[Long]) = {
    // trunc-div, NOT floorDiv: must match the layout's IntegralDivide
    // semantics or pre-epoch bounds prune partitions that hold rows
    def day(v: Any): Long = v.asInstanceOf[Long] / MicrosPerDay
    def isTs(e: Expression): Option[Unit] = e match {
      case a: AttributeReference if a.name == tsCol => Some(())
      case _ => None
    }
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    def tighterLo(d: Long): Unit = lo = Some(lo.fold(d)(math.max(_, d)))
    def tighterHi(d: Long): Unit = hi = Some(hi.fold(d)(math.min(_, d)))
    preds.foreach {
      case GreaterThanOrEqual(a, Literal(v, TimestampType)) if isTs(a).isDefined =>
        tighterLo(day(v))
      case GreaterThan(a, Literal(v, TimestampType)) if isTs(a).isDefined =>
        tighterLo(day(v))
      case LessThanOrEqual(a, Literal(v, TimestampType)) if isTs(a).isDefined =>
        tighterHi(day(v))
      case LessThan(a, Literal(v, TimestampType)) if isTs(a).isDefined =>
        tighterHi(day(v))
      // literal-on-left shapes are normalized away by the main optimizer
      // before the user-provided batch runs; anything else → no bound
      case _ => ()
    }
    (lo, hi)
  }

  /** Bare scan (or pruning Project/Filter chain) of the registered path —
    * the MvRewriteRule exact-path discipline.
    */
  private def scansSource(child: LogicalPlan, source: String): Boolean =
    RewriteSupport.scansSource(child, source)
}
