package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.text.Chunker

/** Chunking pipeline (SURVEY.md §2.9 V1, §2.5 A3, §2.3 P2/P3).
  *
  * documents → validate → split into chunks (recursive character splitter,
  * reference defaults at `chunk_cisa_kev.py:23-24`) → posexplode → chunk id
  * `"{doc_id}_chunk_{i+1}"` (`chunk_cisa_kev.py:152`), chunk_number,
  * total_chunks (`chunk_cisa_kev.py:148-155`).
  *
  * Scale: the splitter is a deterministic narrow map (one UDF call per doc,
  * no shuffle, no state); `total_chunks` comes from `size(chunks)` *before*
  * the explode, so per-parent numbering needs no window/shuffle. At 100 TB
  * this pipeline is scan → map → explode → write, embarrassingly parallel.
  */
object Chunking extends QueryModule {

  def splitUdf(chunkSize: Int, overlap: Int) =
    udf((text: String) =>
      if (text == null) Array.empty[String]
      else Chunker.split(text, chunkSize, overlap).toArray)

  /** Validated documents (P1/P2 analog: non-null id, non-blank text). */
  def validDocs(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id").isNotNull && length(trim(col("text"))) > 0)

  /** Full chunking pipeline over a documents frame — native Generator
    * path: one pass, no per-row chunk array materialized, total_chunks
    * emitted at split time (no window/shuffle). Row-for-row identical to
    * chunkDocumentsUdf (asserted in ChunkingSpec).
    */
  def chunkDocuments(docs: DataFrame, chunkSize: Int, overlap: Int): DataFrame =
    validDocs(docs)
      .select(col("doc_id"), col("lang"), col("source"),
        org.apache.spark.sql.graft.ChunkSplit(col("text"), chunkSize, overlap)
          .as(Seq("pos", "total_chunks", "chunk_text")))
      .filter(length(trim(col("chunk_text"))) > 0) // P3 empty-chunk filter
      .withColumn("chunk_number", (col("pos") + 1).cast("int"))
      .withColumn("chunk_id",
        concat(col("doc_id").cast("string"), lit("_chunk_"), col("chunk_number")))
      .select("chunk_id", "doc_id", "chunk_text", "chunk_number",
        "total_chunks", "lang", "source")

  /** UDF + posexplode formulation (the portable baseline the Generator
    * replaced; kept for cross-checking).
    */
  def chunkDocumentsUdf(docs: DataFrame, chunkSize: Int, overlap: Int): DataFrame = {
    val exploded = validDocs(docs)
      .withColumn("chunks", splitUdf(chunkSize, overlap)(col("text")))
      .withColumn("total_chunks", size(col("chunks")))
      .select(col("doc_id"), col("lang"), col("source"), col("total_chunks"),
        posexplode(col("chunks")).as(Seq("pos", "chunk_text")))
      .filter(length(trim(col("chunk_text"))) > 0) // P3 empty-chunk filter
    exploded
      .withColumn("chunk_number", (col("pos") + 1).cast("int"))
      .withColumn("chunk_id",
        concat(col("doc_id").cast("string"), lit("_chunk_"), col("chunk_number")))
      .select("chunk_id", "doc_id", "chunk_text", "chunk_number",
        "total_chunks", "lang", "source")
  }

  /** Multi-chunk split (size 200 / overlap 30 so sf docs actually split).
    * The splitter itself is not SQL-expressible; the DRIVER row for this
    * config is the violation gate chunkDocs200Gate below.
    */
  def chunkDocs200(spark: SparkSession, dir: String): DataFrame =
    chunkDocuments(Tables.documents(spark, dir), chunkSize = 200, overlap = 30)

  /** Driver gate for the multi-chunk 200/30 path (formerly a rows-only
    * dump): one violation row per breach, oracle = the empty set. Three
    * checks the per-row chunk_invariants gate can't see:
    *
    *  - PARITY: the native ChunkSplit Generator and the UDF+posexplode
    *    baseline must agree row-for-row on the full corpus (symmetric
    *    anti-join both ways — previously spec-only on fixtures);
    *  - CONTAINMENT: every chunk_text must appear verbatim inside its
    *    source document (chunks are segments rejoined with their original
    *    separators, so any splice corruption breaks `instr`);
    *  - ID UNIQUENESS: chunk_id is globally unique (it keys the vector
    *    store upsert — a collision silently overwrites a chunk).
    */
  def chunkDocs200Gate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val gen = chunkDocuments(docs, chunkSize = 200, overlap = 30)
    val viaUdf = chunkDocumentsUdf(docs, chunkSize = 200, overlap = 30)
    val parity = gen.exceptAll(viaUdf).select(col("chunk_id"))
      .union(viaUdf.exceptAll(gen).select(col("chunk_id")))
      .select(col("chunk_id"), lit("generator_udf_parity").as("violation"))
    val containment = gen
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .filter(instr(col("text"), col("chunk_text")) === 0)
      .select(col("chunk_id"), lit("not_substring_of_source").as("violation"))
    val idDupes = gen.groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .select(col("chunk_id"), lit("duplicate_chunk_id").as("violation"))
    parity.union(containment).union(idDupes).orderBy("chunk_id", "violation")
  }

  private val chunkDocs200GateSql =
    """SELECT NULL::VARCHAR AS chunk_id, NULL::VARCHAR AS violation WHERE false""".stripMargin

  /** Reference-default split (1000/150). Every sf document is shorter than
    * 1000 chars, so each yields exactly one chunk equal to its trimmed text —
    * which makes the default-config chunker DuckDB-checkable end to end.
    */
  def chunkDocsDefault(spark: SparkSession, dir: String): DataFrame =
    chunkDocuments(
      Tables.documents(spark, dir).filter(length(col("text")) <= 1000),
      Chunker.DefaultChunkSize, Chunker.DefaultOverlap)

  val chunkDocsDefaultSql: String =
    """SELECT doc_id || '_chunk_1' AS chunk_id, doc_id,
      | trim(text) AS chunk_text, 1 AS chunk_number, 1 AS total_chunks,
      | lang, source
      |FROM documents
      |WHERE doc_id IS NOT NULL AND length(trim(text)) > 0
      |  AND length(text) <= 1000""".stripMargin

  /** Driver-visible chunker invariants over the multi-chunk split: the
    * splitter algorithm itself is not SQL-expressible, but its CONTRACT is
    * — every chunk ≤ chunkSize chars, chunk_number within [1,
    * total_chunks] and duplicate-free, row count ≤ total_chunks. NOT
    * asserted: dense numbering and count == total — the P3 empty-chunk
    * filter legally drops a whitespace-only chunk AFTER total_chunks is
    * computed, leaving a legitimate gap. The query emits one row per
    * violation and the oracle asserts the empty set, so a chunker
    * regression at data scale (not just on spec fixtures) turns a green
    * CORRECTNESS row red.
    */
  def chunkInvariants(spark: SparkSession, dir: String): DataFrame = {
    val chunks = chunkDocs200(spark, dir)
    val rowLevel = chunks
      .filter(length(col("chunk_text")) > 200 ||
        col("chunk_number") < 1 || col("chunk_number") > col("total_chunks"))
      .select(col("doc_id"), lit("row_bounds").as("violation"))
    val docLevel = chunks
      .groupBy(col("doc_id"), col("total_chunks"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("chunk_number")).as("n_distinct"))
      .filter(col("n") > col("total_chunks") || col("n_distinct") =!= col("n"))
      .select(col("doc_id"), lit("numbering").as("violation"))
    rowLevel.union(docLevel).orderBy("doc_id", "violation")
  }

  private val chunkInvariantsSql =
    """SELECT NULL::BIGINT AS doc_id, NULL::VARCHAR AS violation WHERE false""".stripMargin

  /** The MULTI-chunk 200/30 splitting path under a real hash oracle —
    * chunk_docs_200 over the word-salad corpus is not SQL-expressible
    * (word-level overlap carry), but the splitter's semantics are fully
    * hand-traceable on uniform-character paragraphs, which DuckDB
    * enumerates with repeat():
    *
    *  - doc 930000 (a×120 ¶ b×25 ¶ c×150): the 25-char middle paragraph is
    *    under the 30-char overlap, so it carries BACK into the next chunk
    *    → chunks "a¶b" and "b¶c" (the overlap rule, observable in output).
    *  - doc 930001 (three 180-char paragraphs): each exceeds the overlap,
    *    so chunks are exactly the paragraphs — the no-carry rule.
    *  - doc 930002 (x×450, no separator at all): character-level recursion
    *    → exact 200/30 sliding windows [1,200], [171,370], [341,450].
    *
    * A regression in separator choice, greedy merge, overlap pop, or the
    * character-level fallback changes at least one chunk against the
    * enumerated oracle. Row-parity of the native Generator with
    * Chunker.split is separately asserted in ChunkingSpec.
    */
  def chunkPlantedParagraphs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Seq(
      (930000L, ("a" * 120) + "\n\n" + ("b" * 25) + "\n\n" + ("c" * 150)),
      (930001L, ("p" * 180) + "\n\n" + ("q" * 180) + "\n\n" + ("r" * 180)),
      (930002L, "x" * 450))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("planted"))
    chunkDocuments(docs, chunkSize = 200, overlap = 30).orderBy("chunk_id")
  }

  private val chunkPlantedParagraphsSql =
    """WITH expected(chunk_id, doc_id, chunk_text, chunk_number, total_chunks) AS (VALUES
      |  ('930000_chunk_1', 930000::BIGINT, repeat('a', 120) || chr(10) || chr(10) || repeat('b', 25), 1, 2),
      |  ('930000_chunk_2', 930000::BIGINT, repeat('b', 25) || chr(10) || chr(10) || repeat('c', 150), 2, 2),
      |  ('930001_chunk_1', 930001::BIGINT, repeat('p', 180), 1, 3),
      |  ('930001_chunk_2', 930001::BIGINT, repeat('q', 180), 2, 3),
      |  ('930001_chunk_3', 930001::BIGINT, repeat('r', 180), 3, 3),
      |  ('930002_chunk_1', 930002::BIGINT, repeat('x', 200), 1, 3),
      |  ('930002_chunk_2', 930002::BIGINT, repeat('x', 200), 2, 3),
      |  ('930002_chunk_3', 930002::BIGINT, repeat('x', 110), 3, 3))
      |SELECT chunk_id, doc_id, chunk_text, chunk_number, total_chunks,
      |       'en' AS lang, 'planted' AS source
      |FROM expected ORDER BY chunk_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "chunk_docs_200" -> chunkDocs200Gate,
    "chunk_docs_default" -> chunkDocsDefault,
    "chunk_planted_paragraphs" -> chunkPlantedParagraphs,
    "chunk_invariants" -> chunkInvariants)

  def oracles: Map[String, String] = Map(
    "chunk_docs_200" -> chunkDocs200GateSql,
    "chunk_docs_default" -> chunkDocsDefaultSql,
    "chunk_planted_paragraphs" -> chunkPlantedParagraphsSql,
    "chunk_invariants" -> chunkInvariantsSql)
}
