package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{DoubleType, IntegralType, LongType}

/** Optimizer rule: EAGER AGGREGATION (Yan & Larson, VLDB 1995) — push a
  * partial aggregate below a key-unique inner join, so the join consumes
  * |distinct fact keys| rows instead of |fact|:
  *
  *   Aggregate(G, aggs, Join(fact, dim, fact.k = dim.pk))
  *     ⇒ Aggregate(G, merge(aggs),
  *          Join(Aggregate((G∩fact) ∪ {fact.k}, partial(aggs), fact), dim))
  *
  * Sound ONLY when the join neither duplicates nor splits fact rows per
  * key, i.e. the dim join key is UNIQUE and non-null. The rule does not
  * guess: it consults the CATALOG STATISTICS the `CatalogStats` job
  * collects (`ANALYZE … FOR ALL COLUMNS`) and requires
  * `distinctCount(pk) == rowCount ∧ nullCount(pk) == 0` on the dim's base
  * relation — no stats (or CBO off, which hides rowCount), no rewrite.
  * A dim-side Filter is permitted: filtering can only REMOVE whole fact
  * key groups (matching the inner join's own behavior), never change a
  * surviving group's multiplicity.
  *
  * Guarded shape — anything looser declines untouched:
  *  - inner join, AND-chain of column equalities, exactly one dim key;
  *  - grouping expressions are plain attributes;
  *  - every aggregate is Sum (long/double — decimal widens its type under
  *    re-aggregation), Min, Max, Count, or Average over an INTEGRAL
  *    input, non-distinct, unfiltered, with inputs from the fact side
  *    only. A float-input Average stays declined: its decomposition
  *    re-associates the double sum, which is not bit-stable — the same
  *    reason decimal Sum declines;
  *  - the fact side is not itself an Aggregate (also the idempotence
  *    guard: the rewritten plan's fact side IS one).
  *
  * Merge algebra: sum → sum(partial), count → coalesce(sum(partial), 0)
  * (count of an empty join result), min/max → min/max(partial), and —
  * the rest of Yan & Larson's algebra — avg decomposes into the
  * (sum, count) partial PAIR, merged as sum(sums)/sum(counts) with the
  * division done once at the top (an integral sum re-aggregates
  * exactly, so the quotient is bit-identical to the undecomposed
  * Average wherever the total fits a double — and unlike it, the
  * partial layer never accumulates float error). At 100 TB
  * this is the difference between shuffling the fact table into the join
  * and shuffling one row per (group, fact-key) — the classic star-schema
  * agg goes from O(|fact|) join input to O(|keys|).
  *
  * Opt-in: spark.graft.eageragg.enabled=true (default false).
  */
object EagerAggregationRule extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.eageragg.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").equalsIgnoreCase("true"))
      return plan
    plan.transformUp {
      case agg @ Aggregate(_, _, j: Join, _) =>
        tryRewrite(agg, j).getOrElse(agg)
      // the shape column pruning leaves: an attribute-only Project narrows
      // the join output; attributes keep their exprIds through it, and the
      // rewritten final aggregate reads straight off the new join, so the
      // Project can be dropped (the per-side pruning Projects BELOW the
      // join, which bound what the scans read, are untouched)
      case agg @ Aggregate(_, _, Project(pl, j: Join), _)
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        tryRewrite(agg, j).getOrElse(agg)
    }
  }

  /** cond as an AND-chain of attribute equalities, or None. */
  private def equiPairs(cond: Expression)
      : Option[Seq[(AttributeReference, AttributeReference)]] = cond match {
    case EqualTo(a: AttributeReference, b: AttributeReference) =>
      Some(Seq((a, b)))
    case And(l, r) =>
      for { x <- equiPairs(l); y <- equiPairs(r) } yield x ++ y
    case _ => None
  }

  /** Walk attribute-preserving Project/Filter down to the base relation
    * still carrying `key`, and prove uniqueness + non-null from its
    * catalog column statistics.
    */
  private def keyUnique(plan: LogicalPlan, key: AttributeReference): Boolean =
    plan match {
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        keyUnique(child, key)
      case Filter(_, child) => keyUnique(child, key)
      case lr: LogicalRelation if lr.outputSet.contains(key) =>
        val st = lr.stats
        (st.rowCount, st.attributeStats.get(key)) match {
          case (Some(rows), Some(cs)) =>
            rows > 0 && cs.distinctCount.contains(rows) &&
              cs.nullCount.contains(BigInt(0))
          case _ => false
        }
      case _ => false
    }

  private def supported(ae: AggregateExpression): Boolean =
    ae.filter.isEmpty && !ae.isDistinct && (ae.aggregateFunction match {
      case s: Sum => s.dataType == LongType || s.dataType == DoubleType
      case _: Min | _: Max | _: Count => true
      // integral only: a float-input Average would re-associate its
      // double sum under decomposition (not bit-stable — declined)
      case a: Average => a.child.dataType.isInstanceOf[IntegralType]
      case _ => false
    })

  private def tryRewrite(agg: Aggregate, j: Join): Option[LogicalPlan] = {
    if (j.joinType != Inner) return None
    val pairs = equiPairs(j.condition.getOrElse(return None)).getOrElse(return None)
    if (!agg.groupingExpressions.forall(_.isInstanceOf[Attribute])) return None
    val aggExprs = agg.aggregateExpressions
      .flatMap(_.collect { case ae: AggregateExpression => ae })
    if (aggExprs.isEmpty || !aggExprs.forall(supported)) return None

    def attempt(fact: LogicalPlan, dim: LogicalPlan,
        oriented: Seq[(AttributeReference, AttributeReference)])
        : Option[LogicalPlan] = {
      val (factKeys, dimKeys) = (oriented.map(_._1), oriented.map(_._2))
      if (fact.isInstanceOf[Aggregate]) return None // idempotence guard
      if (!factKeys.forall(fact.outputSet.contains) ||
        !dimKeys.forall(dim.outputSet.contains)) return None
      if (dimKeys.distinct.length != 1 || !keyUnique(dim, dimKeys.head))
        return None
      if (!aggExprs.forall(_.references.subsetOf(fact.outputSet))) return None

      val factGroupAttrs = agg.groupingExpressions
        .collect { case a: Attribute if fact.outputSet.contains(a) => a }
      val partialKeys: Seq[Attribute] = (factGroupAttrs ++ factKeys).distinct

      // partial columns per distinct aggregate (avg takes TWO — its sum
      // and count halves), plus the merge form over the partial attrs
      val distinctAggs = aggExprs.groupBy(_.canonicalized).map(_._2.head).toSeq
      def complete(f: AggregateFunction): AggregateExpression =
        AggregateExpression(f, Complete, isDistinct = false)
      val partials: Seq[(Expression, Seq[Alias], Expression)] =
        distinctAggs.zipWithIndex.map { case (ae, i) =>
          ae.aggregateFunction match {
            case avg: Average =>
              val s = Alias(complete(Sum(avg.child)), s"_eager_${i}s")()
              val c = Alias(complete(Count(Seq(avg.child))), s"_eager_${i}c")()
              val merged: Expression = Divide(
                Cast(complete(Sum(s.toAttribute)), DoubleType),
                Cast(complete(Sum(c.toAttribute)), DoubleType))
              (ae.canonicalized, Seq(s, c), merged)
            case f =>
              val alias = Alias(ae, s"_eager_$i")()
              val pa = alias.toAttribute
              val merged: Expression = f match {
                case _: Sum => complete(Sum(pa))
                case _: Min => complete(Min(pa))
                case _: Max => complete(Max(pa))
                case _: Count => Coalesce(Seq(complete(Sum(pa)), Literal(0L)))
              }
              (ae.canonicalized, Seq(alias), merged)
          }
        }
      val mergeMap = partials.map(p => p._1 -> p._3).toMap
      val partialAgg = Aggregate(partialKeys,
        partialKeys ++ partials.flatMap(_._2), fact)
      val newJoin = Join(partialAgg, dim, Inner, j.condition, j.hint)
      val mergedResult = agg.aggregateExpressions.map(_.transform {
        case ae: AggregateExpression if mergeMap.contains(ae.canonicalized) =>
          mergeMap(ae.canonicalized)
      }.asInstanceOf[NamedExpression])
      logInfo(s"graft eager aggregation: pushed ${partials.length} partial " +
        s"aggregate(s) below the join on ${dimKeys.head.name}")
      Some(Aggregate(agg.groupingExpressions, mergedResult, newJoin))
    }

    // orient each pair as (left-side attr, right-side attr); decline mixed
    val leftRight = pairs.map {
      case (a, b) if j.left.outputSet.contains(a) && j.right.outputSet.contains(b) =>
        Some((a, b))
      case (a, b) if j.right.outputSet.contains(a) && j.left.outputSet.contains(b) =>
        Some((b, a))
      case _ => None
    }
    if (leftRight.exists(_.isEmpty)) return None
    val oriented = leftRight.flatten
    attempt(j.left, j.right, oriented)
      .orElse(attempt(j.right, j.left, oriented.map(_.swap)))
  }
}
