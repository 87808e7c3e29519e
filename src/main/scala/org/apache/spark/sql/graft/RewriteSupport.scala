package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf

/** The plumbing every registered-path optimizer rewrite shares
  * (MvRewriteRule / ContainsRewriteRule / PartitionPruneRule grew
  * character-identical copies — the path-matching semantics must not
  * drift between rules). */
private[graft] object RewriteSupport {

  /** The session whose conf registered the rewrite, not whichever
    * session happens to be thread-active: prefer the one whose SQLConf
    * is the very instance the calling rule is reading its keys from
    * (multi-session apps can have a different `SparkSession.active`). */
  def resolveSession(conf: SQLConf): Option[SparkSession] = {
    val candidates =
      SparkSession.getActiveSession.toSeq ++ SparkSession.getDefaultSession.toSeq
    candidates.find(_.sessionState.conf eq conf).orElse(candidates.headOption)
  }

  /** Bare scan of the registered source path, optionally under an
    * attribute-only Project (an expression would change semantics).
    * Matching is EXACT on the scheme-stripped path: a substring match
    * would route scans of sibling tables (`…/events_archive` when
    * `…/events` is registered) to the wrong rewrite target. */
  def scansSource(child: LogicalPlan, source: String): Boolean = child match {
    case Project(projectList, grandchild)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      scansSource(grandchild, source)
    case lr: LogicalRelation => relationAtPath(lr, source)
    case _ => false
  }

  /** True iff this relation's file index roots include `path`. */
  def relationAtPath(lr: LogicalRelation, path: String): Boolean =
    lr.relation match {
      case fs: HadoopFsRelation =>
        val want = new org.apache.hadoop.fs.Path(path).toUri.getPath
        fs.location.rootPaths.exists(_.toUri.getPath == want)
      case _ => false
    }
}
