package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point: exposes the engine's native
  * Catalyst expressions as SQL functions, so the library is usable from
  * pure `spark.sql(...)` — the (c)-level extension surface
  * (SURVEY.md §2.10, §7.4).
  *
  *   spark-submit --conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions
  *   SELECT graft_dot(a.embedding, b.embedding) FROM ...
  *   SELECT chunk_split(text, 1000, 150) FROM documents
  *
  * For an already-built session (REPL, tests) use
  * `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // Opt-in ANN rewrite (spark.graft.ann.rewrite=true): ORDER BY
    // graft_dot(emb, qvec) DESC LIMIT k over an LSH-indexed table becomes
    // a multi-probe bucket-pruned scan. Off by default; see AnnRewriteRule.
    ext.injectOptimizerRule(_ => AnnRewriteRule)
    // Opt-in MV routing (spark.graft.mv.rewrite=true): grouped COUNT over
    // the registered fact table is answered from its materialized summary.
    ext.injectOptimizerRule(_ => MvRewriteRule)
    // Opt-in contains routing (spark.graft.contains.rewrite=true): a
    // substring filter over the registered corpus gains a semi-join
    // against its trigram posting gate — EXACT (the verify stays).
    ext.injectOptimizerRule(_ => ContainsRewriteRule)
    // Opt-in PK-FK join elimination (spark.graft.fkelim.enabled=true):
    // an unused dimension join is dropped under DQ-verified constraints.
    ext.injectOptimizerRule(_ => FkJoinEliminationRule)
    // Opt-in derived partition pruning (spark.graft.partprune.enabled=true):
    // literal tsCol bounds imply epoch-day partCol bounds on the registered
    // day-partitioned table.
    ext.injectOptimizerRule(_ => PartitionPruneRule)
    // Opt-in eager aggregation (spark.graft.eageragg.enabled=true): a
    // partial aggregate is pushed below a key-unique inner join, with
    // uniqueness proven from ANALYZE catalog statistics.
    ext.injectOptimizerRule(_ => EagerAggregationRule)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "usage: graft_dot(array<float|double>, array<float|double>)")
        DotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("chunk_split"),
      new ExpressionInfo(classOf[ChunkSplit].getName, "chunk_split"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "usage: chunk_split(text, chunk_size, overlap)")
        new ChunkSplit(args(0), intLit(args(1), "chunk_size"), intLit(args(2), "overlap"))
      }),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "usage: nfc_normalize(text)")
        NfcNormalize(args(0))
      }),
    // aggregate builders return the bare AggregateFunction — the analyzer
    // wraps it in an AggregateExpression (the built-in registry pattern)
    (FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[GroupTopK].getName, "graft_topk"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "usage: graft_topk(score_bigint, payload_string, k)")
        GroupTopK(args(0), args(1), intLit(args(2), "k"))
      }))

  /** Register the functions + optimizer rule into an existing session. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    val em = spark.experimental
    if (!em.extraOptimizations.contains(AnnRewriteRule))
      em.extraOptimizations = em.extraOptimizations :+ AnnRewriteRule
    if (!em.extraOptimizations.contains(MvRewriteRule))
      em.extraOptimizations = em.extraOptimizations :+ MvRewriteRule
    if (!em.extraOptimizations.contains(ContainsRewriteRule))
      em.extraOptimizations = em.extraOptimizations :+ ContainsRewriteRule
    if (!em.extraOptimizations.contains(FkJoinEliminationRule))
      em.extraOptimizations = em.extraOptimizations :+ FkJoinEliminationRule
    if (!em.extraOptimizations.contains(PartitionPruneRule))
      em.extraOptimizations = em.extraOptimizations :+ PartitionPruneRule
    if (!em.extraOptimizations.contains(EagerAggregationRule))
      em.extraOptimizations = em.extraOptimizations :+ EagerAggregationRule
  }
}
