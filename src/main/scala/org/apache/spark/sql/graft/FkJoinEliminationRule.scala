package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, NamedExpression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: eliminate an inner dimension join whose columns the
  * query never reads — classic PK-FK join elimination, legal ONLY under
  * the constraint triple the DataQuality suite verifies for exactly this
  * pair (`orders_custkey_fk`, `customer_pk_unique`,
  * `orders_custkey_complete`):
  *
  *   - FK-complete: every fact fk matches a dim pk  → the join drops no
  *     fact row;
  *   - PK-unique: one dim row per pk               → the join duplicates
  *     no fact row;
  *   - FK-non-null: no null fk                     → no inner-join null
  *     elimination.
  *
  * Pattern:  Join(fact, Project([pk]) over the registered dim scan,
  *           Inner, fk = pk) — the shape column pruning leaves when the
  *           query reads no dim column beyond the key. The surviving pk
  *           output is re-bound to the fk under the pk's exprId (equal
  *           by the join predicate), so parents resolve unchanged.
  *
  * Strictly OPT-IN — registering the constraint is the user asserting
  * the DQ suite is green for this pair:
  *
  *   spark.graft.fkelim.enabled    = true      (default false)
  *   spark.graft.fkelim.factSource = <fact table path>
  *   spark.graft.fkelim.fkCol      = <fact fk column>
  *   spark.graft.fkelim.dimSource  = <dim table path>
  *   spark.graft.fkelim.pkCol      = <dim pk column>
  *
  * Anything looser than the shape above (dim columns used, outer joins,
  * compound conditions, unregistered paths) declines untouched.
  */
object FkJoinEliminationRule extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.fkelim.enabled"
  val FactSourceKey = "spark.graft.fkelim.factSource"
  val FkColKey = "spark.graft.fkelim.fkCol"
  val DimSourceKey = "spark.graft.fkelim.dimSource"
  val PkColKey = "spark.graft.fkelim.pkCol"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").equalsIgnoreCase("true")) return plan
    val factSource = conf.getConfString(FactSourceKey, "")
    val fkCol = conf.getConfString(FkColKey, "")
    val dimSource = conf.getConfString(DimSourceKey, "")
    val pkCol = conf.getConfString(PkColKey, "")
    if (factSource.isEmpty || fkCol.isEmpty || dimSource.isEmpty || pkCol.isEmpty)
      return plan

    plan.transformUp {
      case j @ Join(fact, dimSide, Inner, Some(EqualTo(a, b)), _) =>
        (factBaseFk(fact, factSource, fkCol),
          pkOnlyScan(dimSide, dimSource, pkCol), a, b) match {
          case (Some(baseFk), Some(pk), fk: AttributeReference, pkRef: AttributeReference)
              if pkRef.exprId == pk.exprId && fk.exprId == baseFk.exprId =>
            eliminate(fact, fk, pk)
          case (Some(baseFk), Some(pk), pkRef: AttributeReference, fk: AttributeReference)
              if pkRef.exprId == pk.exprId && fk.exprId == baseFk.exprId =>
            eliminate(fact, fk, pk)
          case _ => j
        }
    }
  }

  /** The join's output was fact.output :+ pk; rebind pk to the fk value
    * (equal under the dropped predicate) keeping the pk's exprId.
    */
  private def eliminate(fact: LogicalPlan, fk: AttributeReference,
      pk: AttributeReference): LogicalPlan = {
    logInfo(s"graft FK join elimination: dropped dim join on ${fk.name} = ${pk.name}")
    val projExprs: Seq[NamedExpression] =
      fact.output :+ Alias(fk, pk.name)(exprId = pk.exprId)
    Project(projExprs, fact)
  }

  /** Dim side must be a pk-only pruning Project over a bare scan of the
    * registered dim path (the post-pruning shape when no dim column is
    * read). Returns the pk attribute.
    */
  private def pkOnlyScan(plan: LogicalPlan, dimSource: String,
      pkCol: String): Option[AttributeReference] = plan match {
    // a single-column pruning Project pins the side's OUTPUT to [pk];
    // below it only the dim scan plus the optimizer's vacuous
    // join-key null filter may appear (vacuous under the registered
    // FK-non-null/PK constraints)
    case Project(Seq(pk: AttributeReference), child)
        if pk.name == pkCol && bareDimScan(child, dimSource, pkCol) &&
          child.outputSet.contains(pk) => Some(pk)
    case lr: LogicalRelation
        if isSource(lr, dimSource) && lr.output.length == 1 &&
          lr.output.head.name == pkCol =>
      Some(lr.output.head.asInstanceOf[AttributeReference])
    case _ => None
  }

  private def bareDimScan(plan: LogicalPlan, dimSource: String,
      pkCol: String): Boolean = plan match {
    case Filter(org.apache.spark.sql.catalyst.expressions.IsNotNull(
        key: AttributeReference), child) if key.name == pkCol =>
      bareDimScan(child, dimSource, pkCol)
    case lr: LogicalRelation => isSource(lr, dimSource)
    case _ => false
  }

  /** The fact side must be an attribute-preserving Project/Filter chain
    * over ONE scan of the registered fact path, and the join key must be
    * the BASE fk column's own attribute (matched by exprId, not name) —
    * the registered constraints hold for the stored column only. A
    * derived column merely NAMED like the fk (`custkey + 1 AS custkey`)
    * or an fk passing through an outer self-join (which can manufacture
    * nulls) has no FK guarantee, so anything beyond the simple chain
    * declines. Returns the base fk attribute when the shape qualifies.
    */
  private def factBaseFk(plan: LogicalPlan, source: String,
      fkCol: String): Option[AttributeReference] = plan match {
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      factBaseFk(child, source, fkCol)
    case Filter(_, child) => factBaseFk(child, source, fkCol)
    case lr: LogicalRelation if isSource(lr, source) =>
      lr.output.find(_.name == fkCol).map(_.asInstanceOf[AttributeReference])
    case _ => None
  }

  private def isSource(lr: LogicalRelation, source: String): Boolean =
    lr.relation match {
      case fs: HadoopFsRelation =>
        val want = new org.apache.hadoop.fs.Path(source).toUri.getPath
        fs.location.rootPaths.exists(_.toUri.getPath == want)
      case _ => false
    }
}
