package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from the per-module registries so
  * each operator family (relational, text, vector, dedup, …) owns its own
  * query surface. Keys must be identical between the two maps for every
  * SQL-expressible query; non-SQL-expressible ops appear in `queries` only.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full RAG lifecycle slice (SURVEY.md §7.3): chunk → embed →
    * retrieve → rerank → threshold → ranked context rows.
    */
  def entry(spark: SparkSession): DataFrame =
    // the pipeline ROWS, not the rag_pipeline_topk violation gate (the
    // driver smoke-checks rows > 0 here; the gate's green state is empty)
    ops.Rag.ragPipelineTopk(spark, "/root/testdata/sf0.001")

  private def modules: Seq[QueryModule] = Seq(
    ops.Relational,
    ops.CatalogStats,
    ops.ResultCache,
    ops.Lakehouse,
    ops.DataQuality,
    ops.Linkage,
    ops.Graph,
    ops.Temporal,
    ops.Chunking,
    ops.VectorSearch,
    ops.AnnIndex,
    ops.Dedup,
    ops.TextAnalysis,
    ops.QualityFilters,
    ops.Rag,
    ops.LateInteraction,
    ops.Forget,
    ops.Ingest,
    ops.Multimodal,
    ops.Functions,
    ops.SessionLogs,
    streaming.EventStreams)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}

/** A module contributing queries to the driver contract. */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
