package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.text.Chunker
import graft.vector.{Embedding, VectorFunctions => V}

/** The RAG query lifecycle (SURVEY.md §3.2/§3.3): candidate retrieval →
  * rerank (V6) → top-n (T2) → threshold (P6/P7) → ordered context assembly
  * (A4) with title/id fallback projections (P9/P10).
  *
  * The reference's cross-encoder scorer is a neural model
  * (`query_rag_database.py:348-356`); offline and determinism constraints
  * substitute a lexical-cosine scorer (distinct-token overlap normalized by
  * sqrt(|q|·|d|)) — same signature (query, text) → unbounded-ish score,
  * same pipeline position, expressed entirely in codegen'd array functions
  * so it is also DuckDB-oracle-checkable.
  *
  * Scale shape: candidate generation is the §3.2 top-k plan
  * (TakeOrderedAndProject — only k rows cross the exchange); rerank is a
  * narrow projection over k rows; context assembly aggregates exactly n
  * capped rows (the reference's own k/top_n caps guarantee collect_list
  * never sees an unbounded group, SURVEY.md §7.5).
  */
object Rag extends QueryModule {

  val DefaultQuery = "spark shuffle hash join window merge"

  /** Lexical rerank score: |distinct tokens ∩| / sqrt(|q distinct| · |d
    * distinct|), rounded for cross-engine agreement. Deterministic V6
    * substitute.
    */
  def lexicalScore(query: Column, text: Column): Column = {
    val qt = array_distinct(Dedup.tokensCol(query))
    val dt = array_distinct(Dedup.tokensCol(text))
    round(size(array_intersect(qt, dt)) /
      sqrt(size(qt).cast("double") * size(dt).cast("double")), 6)
  }

  /** T2: rerank documents against a constant query, keep top-20. */
  def rerankTopn(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("relevance_score", lexicalScore(lit(DefaultQuery), col("text")))
      .select(col("doc_id"), col("relevance_score"))
      .orderBy(col("relevance_score").desc, col("doc_id").asc)
      .limit(20)

  private val rerankTopnSql =
    s"""WITH scored AS (
       |  SELECT doc_id,
       |    round(
       |      len(list_intersect(
       |        list_distinct(list_filter(string_split_regex(lower('$DefaultQuery'), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0)),
       |        list_distinct(list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0))))
       |      / sqrt(
       |          len(list_distinct(list_filter(string_split_regex(lower('$DefaultQuery'), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0)))::DOUBLE
       |        * len(list_distinct(list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0)))::DOUBLE), 6)
       |      AS relevance_score
       |  FROM documents WHERE length(trim(text)) > 0)
       |SELECT doc_id, relevance_score FROM scored
       |ORDER BY relevance_score DESC, doc_id ASC LIMIT 20""".stripMargin

  /** A2 stats over rerank scores (min/max/avg display that drives the
    * interactive threshold, `Auto_query_rag_database.py:328-331`).
    */
  def rerankScoreStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("s", lexicalScore(lit(DefaultQuery), col("text")))
      .agg(round(min(col("s")), 6).as("min_score"),
        round(max(col("s")), 6).as("max_score"),
        round(avg(col("s")), 6).as("avg_score"),
        count(lit(1)).as("n_candidates"))

  private val rerankScoreStatsSql =
    s"""WITH scored AS (
       |  SELECT round(
       |      len(list_intersect(
       |        list_distinct(list_filter(string_split_regex(lower('$DefaultQuery'), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0)),
       |        list_distinct(list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0))))
       |      / sqrt(
       |          len(list_distinct(list_filter(string_split_regex(lower('$DefaultQuery'), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0)))::DOUBLE
       |        * len(list_distinct(list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0)))::DOUBLE), 6) AS s
       |  FROM documents WHERE length(trim(text)) > 0)
       |SELECT round(min(s), 6) AS min_score, round(max(s), 6) AS max_score,
       |       round(avg(s), 6) AS avg_score, count(*) AS n_candidates
       |FROM scored""".stripMargin

  /** A4 + P9/P10: ordered context assembly. Each retrieved doc gets a
    * header "Source N (doc <id|fallback>, score <milli>): <text>"; docs
    * are concatenated best-first with "\n\n" (similarity order preserved
    * through formatting, `query_rag_database.py:151-164`). Scores embed as
    * integer milli-points — float-to-string formatting differs across
    * engines, integers never do.
    */
  def ragContext(spark: SparkSession, dir: String): DataFrame = {
    val top = rerankTopn(spark, dir).limit(5)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("text"), col("source")), Seq("doc_id"))
    val ranked = top
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("relevance_score").desc, col("doc_id").asc)))
      .withColumn("source_label",
        coalesce(nullif(col("source"), lit("")), concat(lit("doc_"), col("doc_id"))))
      .withColumn("fmt", concat(
        lit("Source "), col("rank"),
        lit(" ("), col("source_label"),
        lit(", score "), round(col("relevance_score") * 1000).cast("int"),
        lit("): "), col("text")))
    ranked.agg(
      array_join(transform(array_sort(collect_list(struct(col("rank"), col("fmt")))),
        x => x.getField("fmt")), "\n\n").as("context"),
      count(lit(1)).as("n_docs"))
  }

  private val ragContextSql =
    s"""WITH scored AS (
       |  SELECT doc_id, text, source,
       |    round(
       |      len(list_intersect(
       |        list_distinct(list_filter(string_split_regex(lower('$DefaultQuery'), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0)),
       |        list_distinct(list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0))))
       |      / sqrt(
       |          len(list_distinct(list_filter(string_split_regex(lower('$DefaultQuery'), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0)))::DOUBLE
       |        * len(list_distinct(list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0)))::DOUBLE), 6)
       |      AS relevance_score
       |  FROM documents WHERE length(trim(text)) > 0),
       |top5 AS (
       |  SELECT *, row_number() OVER (ORDER BY relevance_score DESC, doc_id ASC) AS rnk
       |  FROM scored ORDER BY relevance_score DESC, doc_id ASC LIMIT 5)
       |SELECT string_agg(
       |         'Source ' || rnk || ' (' ||
       |         coalesce(nullif(source, ''), 'doc_' || doc_id) ||
       |         ', score ' || CAST(round(relevance_score * 1000) AS INTEGER) || '): ' || text,
       |         chr(10) || chr(10) ORDER BY rnk) AS context,
       |       count(*) AS n_docs
       |FROM top5""".stripMargin

  /** The full §3.3 lifecycle on driver data (SURVEY.md §7.3 minimum
    * end-to-end slice): validate → chunk (V1) → embed (V2) → cosine top-50
    * candidates (V3/T1) → lexical rerank (V6) → threshold (P6) → top-5
    * (T2) → ordered context columns (A4 inputs). Rows-only (hash embedder
    * is not SQL-expressible); this is `SparkEntry.entry`.
    */
  def ragPipelineTopk(spark: SparkSession, dir: String): DataFrame = {
    val dim = 256
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val qv = Embedding.hashingEmbed(DefaultQuery, dim)
    val chunks = Chunking.chunkDocuments(
      Tables.documents(spark, dir), chunkSize = 200, overlap = 30)
    val candidates = chunks
      .withColumn("embedding", embed(col("chunk_text")))
      .withColumn("similarity", round(V.cosineUnit(col("embedding"), typedlit(qv.toSeq)), 6))
      .orderBy(col("similarity").desc, col("chunk_id").asc)
      .limit(50)
    candidates
      .withColumn("relevance_score", lexicalScore(lit(DefaultQuery), col("chunk_text")))
      .filter(col("relevance_score") > 0.0)
      .orderBy(col("relevance_score").desc, col("chunk_id").asc)
      .limit(5)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("relevance_score").desc, col("chunk_id").asc)))
      .select("rank", "chunk_id", "doc_id", "chunk_number", "total_chunks",
        "similarity", "relevance_score", "chunk_text")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rerank_topn" -> rerankTopn,
    "rerank_score_stats" -> rerankScoreStats,
    "rag_context" -> ragContext,
    "rag_pipeline_topk" -> ragPipelineTopk)

  def oracles: Map[String, String] = Map(
    "rerank_topn" -> rerankTopnSql,
    "rerank_score_stats" -> rerankScoreStatsSql,
    "rag_context" -> ragContextSql)
}
