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
    // Rank comes from sorting the collected (already ≤5-row) frame, not a
    // global row_number window: an unpartitioned WindowExec moves all rows
    // to one partition and its warning noise would mask a real unbounded
    // window if one ever appeared.
    top
      .withColumn("source_label",
        coalesce(nullif(col("source"), lit("")), concat(lit("doc_"), col("doc_id"))))
      .agg(
        array_sort(collect_list(struct(
          (-col("relevance_score")).as("neg_score"), col("doc_id"),
          col("source_label"),
          round(col("relevance_score") * 1000).cast("int").as("milli"),
          col("text")))).as("docs"),
        count(lit(1)).as("n_docs"))
      .select(
        array_join(transform(col("docs"),
          (d, i) => concat(
            lit("Source "), i + 1,
            lit(" ("), d.getField("source_label"),
            lit(", score "), d.getField("milli"),
            lit("): "), d.getField("text"))), "\n\n").as("context"),
        col("n_docs"))
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
  def ragPipelineTopk(spark: SparkSession, dir: String): DataFrame =
    ragPipeline(Tables.documents(spark, dir), DefaultQuery,
      chunkSize = 200, overlap = 30)

  /** Shared lifecycle body for the flagship and its planted-oracle sibling —
    * the SAME code path, so the sibling's green oracle row certifies the
    * flagship's stage wiring, not a parallel reimplementation.
    */
  private def ragPipeline(docs: DataFrame, queryText: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    val dim = 256
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val qv = Embedding.hashingEmbed(queryText, dim)
    val chunks = Chunking.chunkDocuments(docs, chunkSize, overlap)
    val candidates = chunks
      .withColumn("embedding", embed(col("chunk_text")))
      .withColumn("similarity", round(V.cosineUnit(col("embedding"), typedlit(qv.toSeq)), 6))
      .orderBy(col("similarity").desc, col("chunk_id").asc)
      .limit(50)
    // Rank via posexplode of the sorted collected frame (≤5 rows) — no
    // unpartitioned row_number window (see ragContext).
    candidates
      .withColumn("relevance_score", lexicalScore(lit(queryText), col("chunk_text")))
      .filter(col("relevance_score") > 0.0)
      .orderBy(col("relevance_score").desc, col("chunk_id").asc)
      .limit(5)
      .agg(array_sort(collect_list(struct(
        (-col("relevance_score")).as("neg_score"), col("chunk_id").as("tie"),
        struct(col("chunk_id"), col("doc_id"), col("chunk_number"),
          col("total_chunks"), col("similarity"), col("relevance_score"),
          col("chunk_text")).as("r")))).as("rows"))
      .select(posexplode(col("rows")).as(Seq("pos", "x")))
      .select((col("pos") + 1).cast("int").as("rank"),
        col("x.r.chunk_id"), col("x.r.doc_id"), col("x.r.chunk_number"),
        col("x.r.total_chunks"), col("x.r.similarity"),
        col("x.r.relevance_score"), col("x.r.chunk_text"))
  }

  /** Driver gate for the flagship pipeline over REAL data (formerly a
    * rows-only dump; SparkEntry.entry still returns the pipeline rows for
    * the driver's rows>0 smoke check, and rag_pipeline_planted pins the
    * stage wiring under a value oracle — this gate pins the serving
    * CONTRACT on the unplanted corpus): one violation row per breach,
    * oracle = empty set.
    *
    *  - RESULT SHAPE: at most 5 rows, rank dense from 1;
    *  - ORDER: relevance_score non-increasing by rank, ties broken by
    *    chunk_id ascending;
    *  - THRESHOLD: every served score strictly positive (P6);
    *  - SCORE RANGE: similarity and relevance in [-1, 1] (cosine/overlap
    *    bounds — an unnormalized embedding shows up here);
    *  - PROVENANCE: every served chunk_id exists in the chunking of its
    *    source document with the same text (no fabricated or stale rows).
    */
  def ragPipelineTopkGate(spark: SparkSession, dir: String): DataFrame = {
    val top = ragPipelineTopk(spark, dir).cache()
    val shape = top.agg(count(lit(1)).as("n"), min(col("rank")).as("minr"),
        max(col("rank")).as("maxr"), countDistinct(col("rank")).as("nr"))
      .filter(col("n") > 5 || (col("n") > 0 &&
        (col("minr") =!= 1 || col("maxr") =!= col("n") || col("nr") =!= col("n"))))
      .select(lit("rank_shape").cast("string").as("chunk_id"),
        lit("result_shape").as("violation"))
    // rank-successor self-join, not an unpartitioned lag window (house
    // rule — see ragContext), and the frame is ≤5 rows anyway
    val order = top.as("a").join(top.as("b"), col("a.rank") === col("b.rank") + 1)
      .filter(col("a.relevance_score") > col("b.relevance_score") ||
        (col("a.relevance_score") === col("b.relevance_score") &&
         col("a.chunk_id") <= col("b.chunk_id")))
      .select(col("a.chunk_id").as("chunk_id"), lit("rerank_order").as("violation"))
    val threshold = top.filter(col("relevance_score") <= 0.0)
      .select(col("chunk_id"), lit("threshold").as("violation"))
    val range = top.filter(
        col("similarity") < -1.0 || col("similarity") > 1.0 ||
        col("relevance_score") < -1.0 || col("relevance_score") > 1.0)
      .select(col("chunk_id"), lit("score_range").as("violation"))
    val chunks = Chunking.chunkDocuments(
      Tables.documents(spark, dir), chunkSize = 200, overlap = 30)
    val provenance = top.join(chunks,
        Seq("chunk_id", "doc_id", "chunk_number", "total_chunks", "chunk_text"),
        "left_anti")
      .select(col("chunk_id"), lit("provenance").as("violation"))
    shape.union(order).union(threshold).union(range).union(provenance)
      .orderBy("chunk_id", "violation")
  }

  private val ragPipelineTopkGateSql =
    """SELECT NULL::VARCHAR AS chunk_id, NULL::VARCHAR AS violation WHERE false""".stripMargin

  /** The full lifecycle under a REAL oracle via the planted self-query
    * construction (the embed_selfknn_planted pattern, applied to the whole
    * pipeline): nine exact copies of doc 308's text are planted at ids
    * 900000..900008 and the query IS doc 308's trimmed text. Default
    * chunking (1000/150) makes every chunk its whole trimmed document, the
    * self-group embeds bit-identically (similarity rounds to exactly 1.0)
    * and reranks to exactly 1.0 (identical distinct-token sets: n/sqrt(n·n)
    * is exact in double for integer n), while every foreign document stays
    * strictly below on BOTH scores — doc 308 is the one document whose max
    * non-self distinct-token overlap is < 0.85 at sf0.001, sf0.01 AND
    * sf0.1 (the testdata plants near-duplicate twins for most other ids,
    * e.g. docs 0/82 at sf0.001 share an exact token set). The top-5 is
    * therefore provably doc 308 + planted 900000..900003 (chunk-id string
    * tiebreak: "308_…" < "900000_…" < …), every column SQL-enumerable,
    * while the real chunk → embed → cosine-top-50 → rerank → threshold →
    * top-5 machinery runs unmodified.
    */
  def ragPipelinePlanted(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") === 308L)
    // bounded driver collect: exactly one row (the query text)
    val queryText = base.select(trim(col("text"))).head().getString(0)
    val planted = spark.range(900000L, 900009L).toDF("new_id")
      .crossJoin(broadcast(base.drop("doc_id")))
      .withColumnRenamed("new_id", "doc_id")
    ragPipeline(docs.unionByName(planted.select(docs.columns.map(col): _*)),
      queryText, Chunker.DefaultChunkSize, Chunker.DefaultOverlap)
  }

  private val ragPipelinePlantedSql =
    """WITH q AS (SELECT trim(text) AS t FROM documents WHERE doc_id = 308),
      |ids(rank, chunk_id, doc_id) AS (VALUES
      |  (1, '308_chunk_1', 308::BIGINT),
      |  (2, '900000_chunk_1', 900000::BIGINT),
      |  (3, '900001_chunk_1', 900001::BIGINT),
      |  (4, '900002_chunk_1', 900002::BIGINT),
      |  (5, '900003_chunk_1', 900003::BIGINT))
      |SELECT ids.rank, ids.chunk_id, ids.doc_id, 1 AS chunk_number,
      |       1 AS total_chunks, 1.0::DOUBLE AS similarity,
      |       1.0::DOUBLE AS relevance_score, q.t AS chunk_text
      |FROM ids, q ORDER BY ids.rank""".stripMargin

  /** Ordered candidate frame for the zip-join stages: top-20 by lexical
    * similarity, the §3.3 stage-1 retrieval order.
    */
  private def zipCandidates(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("sim", lexicalScore(lit(DefaultQuery), col("text")))
      .orderBy(col("sim").desc, col("doc_id").asc)
      .limit(20)

  /** J3 positional-zip rerank (`Auto_query_rag_database.py:317-325`): the
    * candidate doc list and the rerank score list are produced by SEPARATE
    * stages that only share ordering; they are zipped by position —
    * posexplode each side, equi-join on the position index — with the
    * reference's length-mismatch guard (counts disagree → all docs fall
    * back to unscored, exactly as the reference logs-and-continues).
    */
  def rerankZip(spark: SparkSession, dir: String,
      scores: Option[DataFrame] = None): DataFrame = {
    val cand = zipCandidates(spark, dir)
    // Stage A: the ordered doc-id list.
    val docsPos = cand
      .agg(array_sort(collect_list(struct((-col("sim")).as("neg"), col("doc_id")))).as("arr"))
      .select(posexplode(transform(col("arr"), x => x.getField("doc_id"))).as(Seq("pos", "doc_id")))
    // Stage B: scores from an independent scorer (distinct-token count),
    // emitted positionally parallel to stage A — no doc ids attached.
    val scoresPos = scores.getOrElse(
      cand
        .withColumn("relevance_score",
          round(size(array_distinct(Dedup.tokensCol(col("text")))) / lit(100.0), 6))
        .agg(array_sort(collect_list(struct(
          (-col("sim")).as("neg"), col("doc_id"), col("relevance_score")))).as("arr"))
        .select(posexplode(transform(col("arr"), x => x.getField("relevance_score")))
          .as(Seq("pos", "relevance_score"))))
    // The zip: equi-join on position + the length-mismatch guard.
    val counts = docsPos.agg(count(lit(1)).as("n_docs"))
      .crossJoin(scoresPos.agg(count(lit(1)).as("n_scores")))
    docsPos.join(scoresPos, Seq("pos"), "left")
      .crossJoin(broadcast(counts))
      .select((col("pos") + 1).cast("int").as("rank"), col("doc_id"),
        when(col("n_docs") === col("n_scores"), col("relevance_score"))
          .as("relevance_score"))
      .orderBy("rank")
  }

  private def rerankZipQ(spark: SparkSession, dir: String): DataFrame =
    rerankZip(spark, dir)

  private val rerankZipSql =
    s"""WITH scored AS (
       |  SELECT doc_id, text,
       |    round(
       |      len(list_intersect(
       |        list_distinct(list_filter(string_split_regex(lower('$DefaultQuery'), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0)),
       |        list_distinct(list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0))))
       |      / sqrt(
       |          len(list_distinct(list_filter(string_split_regex(lower('$DefaultQuery'), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0)))::DOUBLE
       |        * len(list_distinct(list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0)))::DOUBLE), 6)
       |      AS sim
       |  FROM documents WHERE length(trim(text)) > 0),
       |top20 AS (
       |  SELECT doc_id, text, sim FROM scored
       |  ORDER BY sim DESC, doc_id ASC LIMIT 20)
       |SELECT CAST(row_number() OVER (ORDER BY sim DESC, doc_id ASC) AS INTEGER) AS rank,
       |       doc_id,
       |       round(len(list_distinct(list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'),
       |                                           x -> length(x) > 0))) / 100.0, 6) AS relevance_score
       |FROM top20 ORDER BY rank""".stripMargin

  /** Okapi BM25 (Robertson et al., the standard probabilistic-IR scorer;
    * k1 = 1.2, b = 0.75) as a second V6 rerank option — unlike the
    * lexical-cosine substitute, BM25 weights matches by corpus rarity
    * (idf) and saturates term frequency. Everything is relational:
    * document frequencies and lengths come from equi-join aggregations,
    * the two corpus constants (N, avgdl) broadcast as a 1-row frame, and
    * each per-(doc, term) partial is a codegen'd scalar expression — the
    * exact shape that holds at 100 TB (tokens shuffle once, text never).
    * Constants appear as identical decimal literals in engine and oracle
    * so both parse to the same doubles.
    */
  def bm25Scores(spark: SparkSession, dir: String): DataFrame = {
    val qTerms = Seq("hash", "join", "merge", "sort", "window")
    val docs = Tables.documents(spark, dir)
      .filter(col("doc_id") < 500) // candidate cap (reference reranks candidates, not the corpus)
      .select(col("doc_id"), Dedup.tokensCol(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")))
    val stats = docs.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      .withColumn("part",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1))
          * (col("tf") * lit(2.2))
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("part")), 4).as("bm25"),
        count(lit(1)).as("n_terms_matched"))
      .orderBy("doc_id")
  }

  private val bm25ScoresSql =
    """WITH d AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
      |                     x -> length(x) > 0) AS toks
      |  FROM documents WHERE doc_id < 500),
      |dd AS (SELECT doc_id, len(toks) AS dl, toks FROM d),
      |s AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dd),
      |t AS (SELECT doc_id, dl, unnest(toks) AS term FROM dd),
      |tt AS (SELECT doc_id, dl, term, count(*) AS tf FROM t
      |       WHERE term IN ('hash','join','merge','sort','window')
      |       GROUP BY doc_id, dl, term),
      |dft AS (SELECT term, count(*) AS df FROM tt GROUP BY term)
      |SELECT tt.doc_id,
      |       round(sum(ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1)
      |                 * (tt.tf * 2.2)
      |                 / (tt.tf + 1.2 * (0.25 + 0.75 * tt.dl / s.avgdl))), 4) AS bm25,
      |       count(*) AS n_terms_matched
      |FROM tt JOIN dft ON tt.term = dft.term CROSS JOIN s
      |GROUP BY tt.doc_id ORDER BY tt.doc_id""".stripMargin

  /** T2 over the BM25 scorer: top-20 candidates by (rounded score desc,
    * doc_id asc). Ordering on the ROUNDED score keeps top-k tie membership
    * identical across engines (SURVEY.md §7.5 tie-break rule).
    */
  def bm25Topn(spark: SparkSession, dir: String): DataFrame =
    bm25Scores(spark, dir)
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(20)
      .select(col("doc_id"), col("bm25"), col("n_terms_matched"))

  private val bm25TopnSql =
    s"""WITH scored AS ($bm25ScoresSql)
       |SELECT doc_id, bm25, n_terms_matched FROM scored
       |ORDER BY bm25 DESC, doc_id ASC LIMIT 20""".stripMargin

  // ---- persisted BM25 inverted index (postings as a table) ----

  /** Build the inverted index bm25Scores recomputes per query: full
    * postings (term, doc_id, tf, dl) hash-clustered and sorted by term
    * (a probe's `term IN` filter pushes to the scan and row-group stats
    * skip everything else), per-term document frequencies, and the two
    * corpus constants as a 1-row table. The full tokenize→explode pass
    * is the INDEX JOB's cost, paid once — the trigram-postings lesson
    * applied to ranked retrieval. dl rides denormalized in the posting
    * row (the standard posting payload) so scoring joins nothing
    * corpus-sized.
    */
  def buildBm25Index(docs: DataFrame, path: String): Unit = {
    val dd = docs
      .select(col("doc_id"), Dedup.tokensCol(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")))
    val postings = dd
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    postings
      .repartition(8, col("term")).sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(path + "/postings")
    postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .repartition(8, col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(path + "/dfs")
    dd.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      .write.mode("overwrite").parquet(path + "/stats")
  }

  /** BM25 served from the persisted index: the query touches k posting
    * lists and k df rows (pushed `term IN` filters) plus the 1-row stats
    * broadcast — the corpus text is never read. Same scoring expression
    * as bm25Scores; the driver row's oracle is bm25TopnSql VERBATIM, so
    * the index path must reproduce the from-scratch computation exactly.
    */
  def bm25IndexedScores(spark: SparkSession, path: String,
      qTerms: Seq[String]): DataFrame = {
    // conf-keyed forget exclusion on the pruned posting read — a
    // forgotten doc's postings never score; no-op with the conf unset
    // (corpus stats keep the forgotten doc until reclaim, the standard
    // stale-stats tolerance of every inverted index)
    val postings = Forget.defaultExclusion(
      spark.read.parquet(path + "/postings")
        .filter(col("term").isin(qTerms: _*)), // pushed: k posting lists
      "doc_id")
    val dfs = spark.read.parquet(path + "/dfs")
      .filter(col("term").isin(qTerms: _*))
    val stats = spark.read.parquet(path + "/stats")
    postings.join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .withColumn("part",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1))
          * (col("tf") * lit(2.2))
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("part")), 4).as("bm25"),
        count(lit(1)).as("n_terms_matched"))
  }

  /** Driver row: build the index over the same capped candidate set and
    * serve the standing query from it — top-20 must equal the
    * from-scratch BM25 oracle.
    */
  def bm25IndexedTopn(spark: SparkSession, dir: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25idx_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 500)
    ResultCache.buildIfAbsent(spark, docs, "bm25:lifecycle=build:v1", path) {
      buildBm25Index(docs, path)
    }
    bm25IndexedScores(spark, path, Seq("hash", "join", "merge", "sort", "window"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(20)
      .select(col("doc_id"), col("bm25"), col("n_terms_matched"))
  }

  // ---- segmented BM25 index: append without rebuild (Lucene segments) ----

  /** One Lucene-style SEGMENT of the BM25 index: postings / per-term df /
    * mergeable corpus stats for JUST these docs, written under
    * `segment=<id>` dirs with OVERWRITE — a replayed append rewrites the
    * identical directory instead of duplicating postings (the
    * stageLshBatch idempotence discipline). Stats store (n_docs, sum_dl),
    * not avgdl: sums merge exactly across segments, an average does not.
    * A doc lives in exactly one segment, so merged df = sum of per-segment
    * dfs with no overlap correction.
    */
  def writeBm25Segment(docs: DataFrame, path: String, segId: Long): Unit = {
    val dd = docs
      .select(col("doc_id"), Dedup.tokensCol(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")))
    val postings = dd
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    postings
      .repartition(8, col("term")).sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(s"$path/postings/segment=$segId")
    postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .repartition(8, col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$path/dfs/segment=$segId")
    dd.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).cast("long").as("sum_dl"))
      .write.mode("overwrite").parquet(s"$path/stats/segment=$segId")
    // per-segment (doc_id, dl) roster: postings alone cannot witness a
    // token-less doc, and targeted deletion must re-derive stats exactly
    dd.select(col("doc_id"), col("dl"))
      .write.mode("overwrite").parquet(s"$path/docs/segment=$segId")
  }

  /** Base build = clean slate + segment 0. Appends add segments; nothing
    * ever rewrites an existing segment's files.
    */
  def buildBm25SegmentedIndex(spark: SparkSession, docs: DataFrame,
      path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    writeBm25Segment(docs, path, 0L)
  }

  /** Serve BM25 across ALL segments: per-term df re-merges with one sum,
    * corpus stats re-merge with two sums (exact — integer units), and the
    * scoring expression is bm25IndexedScores' verbatim, so appending must
    * be indistinguishable from a full rebuild. Query cost is still k
    * pushed posting lists per segment + a segments-row stats broadcast;
    * segment-count growth is the compaction job's concern, not the
    * query's correctness.
    */
  def bm25SegmentedScores(spark: SparkSession, path: String,
      qTerms: Seq[String]): DataFrame = {
    val postings = spark.read.parquet(path + "/postings")
      .filter(col("term").isin(qTerms: _*))
    val dfs = spark.read.parquet(path + "/dfs")
      .filter(col("term").isin(qTerms: _*))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    val stats = spark.read.parquet(path + "/stats")
      .agg(sum(col("n_docs")).as("n_docs"),
        (sum(col("sum_dl")).cast("double") /
          sum(col("n_docs"))).as("avgdl"))
    postings.join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .withColumn("part",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1))
          * (col("tf") * lit(2.2))
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("part")), 4).as("bm25"),
        count(lit(1)).as("n_terms_matched"))
  }

  /** Driver row: base segment over the first 300 candidate docs, the rest
    * APPENDED as segment 1 (no rebuild — segment 0's files are never
    * touched), served across segments. The oracle is bm25TopnSql
    * VERBATIM: df/idf and avgdl are corpus-global, so a merge bug that
    * under-counts df or mis-merges avgdl shifts every score and the
    * compare goes red — append must equal rebuild exactly.
    */
  def bm25AppendedTopn(spark: SparkSession, dir: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25seg_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 500)
    ResultCache.buildIfAbsent(spark, docs, "bm25:lifecycle=append:v1", path) {
      buildBm25SegmentedIndex(spark, docs.filter(col("doc_id") < 300), path)
      writeBm25Segment(docs.filter(col("doc_id") >= 300), path, 1L)
    }
    bm25SegmentedScores(spark, path, Seq("hash", "join", "merge", "sort", "window"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(20)
      .select(col("doc_id"), col("bm25"), col("n_terms_matched"))
  }

  /** Fold all segments into one (the Lucene merge): segment dirs are
    * disjoint doc sets, so compaction is a pure re-layout — union the
    * postings into a fresh `segment=0`, re-derive dfs/stats from the
    * merged postings, and swap via a staged directory rename (readers of
    * the old layout are never half-updated). Scores cannot change: the
    * driver row reuses the SAME verbatim oracle after compaction.
    */
  def compactBm25Segments(spark: SparkSession, path: String): Unit = {
    val staged = path + ".compacting"
    val merged = spark.read.parquet(path + "/postings")
      .select("term", "doc_id", "dl", "tf") // drop the segment partition col
    merged
      .repartition(8, col("term")).sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(s"$staged/postings/segment=0")
    merged.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .repartition(8, col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$staged/dfs/segment=0")
    // stats fold from the per-segment sums, NOT from postings — a
    // token-less doc has no posting rows but still counts in n_docs
    spark.read.parquet(path + "/stats")
      .agg(sum(col("n_docs")).cast("long").as("n_docs"),
        sum(col("sum_dl")).cast("long").as("sum_dl"))
      .write.mode("overwrite").parquet(s"$staged/stats/segment=0")
    spark.read.parquet(path + "/docs").select("doc_id", "dl")
      .write.mode("overwrite").parquet(s"$staged/docs/segment=0")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(staged),
      new org.apache.hadoop.fs.Path(path))
  }

  /** Targeted document deletion from the segmented index — the
    * right-to-be-forgotten job a governed corpus needs. Only segments
    * whose roster actually CONTAINS a target doc are rewritten (filtered
    * postings + re-derived dfs/stats, staged then swapped per segment);
    * every other segment's files stay byte-identical (spec-pinned).
    * df and (n_docs, sum_dl) re-derive inside the rewritten segment, so
    * the corpus-GLOBAL idf and avgdl shift exactly as a full rebuild
    * without the docs would — which is precisely what the driver oracle
    * recomputes. Replay-safe: a second identical delete finds no
    * affected segment and is a no-op.
    */
  def deleteFromBm25Segments(spark: SparkSession, path: String,
      docIds: Seq[Long]): Unit = {
    val affected = spark.read.parquet(path + "/docs")
      .filter(col("doc_id").isin(docIds: _*))
      .select(col("segment")).distinct()
      .collect().map(_.getAs[Number]("segment").longValue()) // ≤ segment count
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    affected.foreach { seg =>
      val keepDocs = spark.read.parquet(s"$path/docs/segment=$seg")
        .filter(!col("doc_id").isin(docIds: _*))
      val keepPostings = spark.read.parquet(s"$path/postings/segment=$seg")
        .filter(!col("doc_id").isin(docIds: _*))
      val staged = Map(
        "docs" -> keepDocs,
        "postings" -> keepPostings
          .repartition(8, col("term")).sortWithinPartitions("term", "doc_id"),
        "dfs" -> keepPostings.groupBy(col("term"))
          .agg(count(lit(1)).as("df"))
          .repartition(8, col("term")).sortWithinPartitions("term"),
        "stats" -> keepDocs.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("dl")), lit(0L)).cast("long").as("sum_dl")))
      staged.foreach { case (sub, df) =>
        df.write.mode("overwrite")
          .parquet(s"$path/$sub/.seg$seg.staged") // materialize BEFORE swap
      }
      staged.keys.foreach { sub =>
        val live = new org.apache.hadoop.fs.Path(s"$path/$sub/segment=$seg")
        fs.delete(live, true)
        fs.rename(new org.apache.hadoop.fs.Path(s"$path/$sub/.seg$seg.staged"),
          live)
      }
    }
  }

  /** Driver row: build + append, then DELETE every 50th candidate doc;
    * the oracle recomputes BM25 from scratch over the corpus WITHOUT the
    * deleted docs — df/idf/avgdl are corpus-global, so a deletion that
    * only hid postings (without re-deriving the per-segment stats) would
    * shift every score and fail the compare.
    */
  def bm25DeletedTopn(spark: SparkSession, dir: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25del_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 500)
    ResultCache.buildIfAbsent(spark, docs, "bm25:lifecycle=delete:v1", path) {
      buildBm25SegmentedIndex(spark, docs.filter(col("doc_id") < 300), path)
      writeBm25Segment(docs.filter(col("doc_id") >= 300), path, 1L)
      deleteFromBm25Segments(spark, path, (0L until 500L by 50L).toSeq)
    }
    bm25SegmentedScores(spark, path, Seq("hash", "join", "merge", "sort", "window"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(20)
      .select(col("doc_id"), col("bm25"), col("n_terms_matched"))
  }

  /** The from-scratch oracle minus the deleted docs — textual surgery on
    * the shared candidate filter keeps the two queries provably aligned.
    */
  private val bm25DeletedTopnSql =
    bm25TopnSql.replace("WHERE doc_id < 500",
      "WHERE doc_id < 500 AND doc_id % 50 <> 0")

  /** UPSERT = targeted delete + append of the new versions as their own
    * segment — the same two primitives, composed; no rebuild, no touch of
    * unaffected segments. The driver row re-texts every 50th candidate
    * doc (appending a literal query term, so the edit provably changes
    * retrieval) and the oracle recomputes from scratch over the EDITED
    * corpus: serving the old version, double-counting old+new, or missing
    * the stats shift each fails the compare.
    */
  def bm25UpsertedTopn(spark: SparkSession, dir: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25ups_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 500)
    // the lifecycle (build + append + delete + upsert) is a deterministic
    // function of the doc slice, so the WHOLE sequence is the cached unit
    // (never a prefix — later steps rewrite segments in place) and bench
    // re-runs serve the standing index instead of rebuilding the fixture
    ResultCache.buildIfAbsent(spark, docs, "bm25:lifecycle=upsert:v1", path) {
      buildBm25SegmentedIndex(spark, docs.filter(col("doc_id") < 300), path)
      writeBm25Segment(docs.filter(col("doc_id") >= 300), path, 1L)
      val targets = (0L until 500L by 50L).toSeq
      deleteFromBm25Segments(spark, path, targets)
      writeBm25Segment(
        docs.filter(col("doc_id").isin(targets: _*))
          .withColumn("text", concat(col("text"), lit(" hash"))),
        path, 2L)
    }
    bm25SegmentedScores(spark, path, Seq("hash", "join", "merge", "sort", "window"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(20)
      .select(col("doc_id"), col("bm25"), col("n_terms_matched"))
  }

  /** From-scratch oracle over the UPSERTED corpus — the same textual
    * surgery discipline as the delete oracle, applied to the doc source.
    */
  private val bm25UpsertedTopnSql =
    bm25TopnSql.replace("FROM documents WHERE doc_id < 500",
      """FROM (SELECT doc_id,
        |        CASE WHEN doc_id % 50 = 0 THEN text || ' hash' ELSE text END
        |          AS text
        |      FROM documents WHERE doc_id < 500)""".stripMargin)

  /** Driver row: build + append (two segments), COMPACT to one, serve.
    * Same verbatim from-scratch oracle as the appended row — compaction
    * may change layout, never content (the mor_compact pinning trick).
    */
  def bm25CompactedTopn(spark: SparkSession, dir: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25cpt_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 500)
    ResultCache.buildIfAbsent(spark, docs, "bm25:lifecycle=compact:v1", path) {
      buildBm25SegmentedIndex(spark, docs.filter(col("doc_id") < 300), path)
      writeBm25Segment(docs.filter(col("doc_id") >= 300), path, 1L)
      compactBm25Segments(spark, path)
    }
    bm25SegmentedScores(spark, path, Seq("hash", "join", "merge", "sort", "window"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(20)
      .select(col("doc_id"), col("bm25"), col("n_terms_matched"))
  }

  /** Hybrid retrieval via reciprocal-rank fusion (Cormack et al. 2009,
    * k = 60): the modern two-tower serving shape — a lexical ranking
    * (BM25 over the standing query terms) and a semantic ranking (exact
    * cosine against stored vector 0) fused by summing 1/(k + rank), here
    * in exact 1e-6 integer units so the oracle compare is bit-exact. A
    * doc absent from one retriever's list simply contributes nothing from
    * that side (standard RRF).
    *
    * Scale shape: RRF only ever sees each retriever's top-k — both sides
    * truncate to their top-100 BEFORE ranks are assigned, so the fusion
    * join is k-sized regardless of corpus size. Both cuts and both rank
    * orders are (rounded score desc, doc_id asc) — cross-engine
    * deterministic.
    */
  def hybridRrfFusion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // both unpartitioned rank windows below run over LIMIT-100 frames —
    // bounded, never corpus-scale (the round-22 window audit)
    val lex = bm25Scores(spark, dir)
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(100)
      .withColumn("r_lex", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("r_lex"))
    val sem = VectorSearch.scoredAgainst(spark, dir, 0L)
      .select(col("vec_id").as("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(100)
      .withColumn("r_sem", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("r_sem"))
    lex.join(sem, Seq("doc_id"), "full")
      .withColumn("rrf_e6",
        coalesce(expr("1000000 DIV (60 + r_lex)"), lit(0L)) +
          coalesce(expr("1000000 DIV (60 + r_sem)"), lit(0L)))
      .orderBy(col("rrf_e6").desc, col("doc_id").asc)
      .limit(20)
      .select("doc_id", "rrf_e6")
  }

  private val hybridRrfFusionSql =
    s"""WITH bm AS ($bm25ScoresSql),
       |lex_top AS (SELECT doc_id, bm25 FROM bm
       |            ORDER BY bm25 DESC, doc_id ASC LIMIT 100),
       |lex AS (SELECT doc_id, row_number() OVER (
       |          ORDER BY bm25 DESC, doc_id ASC) AS r_lex FROM lex_top),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |sc AS (SELECT e.vec_id AS doc_id,
       |              round(list_dot_product(e.embedding::DOUBLE[],
       |                                     q.qe::DOUBLE[]), 6) AS score
       |       FROM embeddings e, q),
       |sem_top AS (SELECT doc_id, score FROM sc
       |            ORDER BY score DESC, doc_id ASC LIMIT 100),
       |sem AS (SELECT doc_id, row_number() OVER (
       |          ORDER BY score DESC, doc_id ASC) AS r_sem FROM sem_top),
       |f AS (SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
       |             coalesce(1000000 // (60 + r_lex), 0)
       |               + coalesce(1000000 // (60 + r_sem), 0) AS rrf_e6
       |      FROM lex FULL JOIN sem ON lex.doc_id = sem.doc_id)
       |SELECT doc_id, rrf_e6 FROM f
       |ORDER BY rrf_e6 DESC, doc_id ASC LIMIT 20""".stripMargin

  /** Hybrid retrieval via WEIGHTED SCORE fusion — the other standard
    * fusion mode next to RRF (the `alpha` blend production hybrid APIs
    * expose): each retriever's top-100 scores are min-max normalized
    * WITHIN the retrieved set, then blended 0.7·lex + 0.3·sem. Everything
    * is exact integer arithmetic — scores enter as rounded integer units
    * (bm25 ×1e4, cosine ×1e6), normalization is `(x−min)·1e6 DIV
    * (max−min)` on non-negatives (floor division agrees across engines
    * there), and the weights are ×10 integers — so the oracle compare is
    * bit-exact. A doc absent from one list contributes 0 from that side,
    * same contract as RRF.
    *
    * Scale shape: identical to RRF — only the two top-k lists are ever
    * normalized or joined, so fusion cost is k-bounded regardless of
    * corpus size; the min/max are 1-row broadcast aggregates of a k-row
    * frame.
    */
  def hybridWeightedTopk(spark: SparkSession, dir: String): DataFrame = {
    val semTop = VectorSearch.scoredAgainst(spark, dir, 0L)
      .select(col("vec_id").as("doc_id"),
        expr("CAST(round(score * 1000000, 0) AS BIGINT)").as("sem_i"))
      .orderBy(col("sem_i").desc, col("doc_id").asc).limit(100)
    weightedFuse(lexTop100(spark, dir), semTop)
  }

  private def lexTop100(spark: SparkSession, dir: String): DataFrame =
    bm25Scores(spark, dir)
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(100)
      .withColumn("lex_i", expr("CAST(round(bm25 * 10000, 0) AS BIGINT)"))

  /** The normalize-and-blend stage over two k-bounded retriever lists —
    * shared by the exact and index-pruned semantic candidate generators so
    * both driver rows pin ONE fusion implementation.
    */
  private def weightedFuse(lexTop: DataFrame, semTop: DataFrame): DataFrame = {
    val lex = lexTop.crossJoin(broadcast(
        lexTop.agg(min("lex_i").as("lmin"), max("lex_i").as("lmax"))))
      .withColumn("lex_norm_e6",
        when(col("lmax") === col("lmin"), lit(1000000L))
          .otherwise(expr("(lex_i - lmin) * 1000000 DIV (lmax - lmin)")))
      .select("doc_id", "lex_norm_e6")
    val sem = semTop.crossJoin(broadcast(
        semTop.agg(min("sem_i").as("smin"), max("sem_i").as("smax"))))
      .withColumn("sem_norm_e6",
        when(col("smax") === col("smin"), lit(1000000L))
          .otherwise(expr("(sem_i - smin) * 1000000 DIV (smax - smin)")))
      .select("doc_id", "sem_norm_e6")
    lex.join(sem, Seq("doc_id"), "full")
      .withColumn("hybrid_e7",
        coalesce(col("lex_norm_e6"), lit(0L)) * 7 +
          coalesce(col("sem_norm_e6"), lit(0L)) * 3)
      .orderBy(col("hybrid_e7").desc, col("doc_id").asc)
      .limit(20)
      .select("doc_id", "hybrid_e7")
  }

  /** Weighted hybrid fusion with the SEMANTIC side routed through the
    * pruned persisted LSH index — the 100 TB serving shape
    * (hybridWeightedTopk's exact scan is O(corpus) per query; this scan
    * reads only the radius-2 probe partitions, plan-audited). Same lex
    * side, same weightedFuse.
    *
    * Oracle by construction (the mmr_rerank_indexed discipline): 99 exact
    * copies of stored vector 0 are planted and the query IS vector 0, so
    * the 100 perfect-scoring rows {0, 100000..100098} share vector 0's
    * bucket, exactly fill the sem top-100, and provably survive the
    * pruned scan — DuckDB replays the whole fusion over the SQL-augmented
    * corpus. The all-equal sem list exercises the min-max degenerate
    * branch (everything normalizes to 1e6) while the real spread stays
    * pinned by hybrid_weighted_topk; THIS row pins the index routing.
    */
  def hybridWeightedIndexed(spark: SparkSession, dir: String): DataFrame =
    weightedFuse(lexTop100(spark, dir), semIndexedTop(spark, dir))

  /** The pruned-scan semantic stage of hybridWeightedIndexed, exposed so
    * PlanAuditSpec can pin partition pruning on the very frame the
    * driver row consumes.
    */
  private[graft] def semIndexedTop(spark: SparkSession, dir: String): DataFrame = {
    import graft.vector.IndexBuilder
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_lshhyb_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
    val e = graft.Tables.embeddings(spark, dir)
    val copies = spark.range(100000L, 100099L).toDF("vec_id")
      .crossJoin(broadcast(e.filter(col("vec_id") === 0L).select(col("embedding"))))
      .select(col("vec_id"), col("embedding"))
    val lsh = AnnIndex.defaultLsh
    val corpus = e.select("vec_id", "embedding").union(copies)
    // standing fixture: the build is a pure function of the corpus — a
    // serving-path call must read the persisted index, not rebuild it
    graft.ops.ResultCache.buildIfAbsent(spark, corpus,
      s"lsh:bits=${lsh.nBits}:seed=42:hybrid99:v1", path) {
      IndexBuilder.buildLshIndex(corpus, "embedding", lsh, path)
    }
    val qv = e.filter(col("vec_id") === 0L).select("embedding")
      .head().getSeq[Float](0)
    val probes = lsh.probes(lsh.signature(qv),
      radius = AnnIndex.tunedRadius(spark, dir))
    spark.read.parquet(path)
      .filter(col("bucket").isin(probes: _*))
      .withColumn("score", round(
        graft.vector.VectorFunctions.cosineUnit(
          col("embedding"), typedlit(qv)), 6))
      .select(col("vec_id").as("doc_id"),
        expr("CAST(round(score * 1000000, 0) AS BIGINT)").as("sem_i"))
      .orderBy(col("sem_i").desc, col("doc_id").asc).limit(100)
  }

  private val hybridWeightedIndexedSql =
    s"""WITH bm AS ($bm25ScoresSql),
       |lex_top AS (SELECT doc_id, CAST(round(bm25 * 10000, 0) AS BIGINT) AS lex_i
       |            FROM bm ORDER BY bm25 DESC, doc_id ASC LIMIT 100),
       |lex_mm AS (SELECT min(lex_i) AS lmin, max(lex_i) AS lmax FROM lex_top),
       |lex AS (SELECT doc_id,
       |               CASE WHEN lmax = lmin THEN 1000000
       |                    ELSE (lex_i - lmin) * 1000000 // (lmax - lmin) END
       |                 AS lex_norm_e6
       |        FROM lex_top CROSS JOIN lex_mm),
       |aug AS (SELECT vec_id, embedding FROM embeddings
       |        UNION ALL
       |        SELECT e2.vec_id + 100000 AS vec_id, e.embedding
       |        FROM embeddings e2,
       |             (SELECT embedding FROM embeddings WHERE vec_id = 0) e
       |        WHERE e2.vec_id < 99),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |sem_top AS (SELECT a.vec_id AS doc_id,
       |                   CAST(round(round(list_dot_product(a.embedding::DOUBLE[],
       |                                                     q.qe::DOUBLE[]), 6)
       |                              * 1000000, 0) AS BIGINT) AS sem_i
       |            FROM aug a, q
       |            ORDER BY sem_i DESC, doc_id ASC LIMIT 100),
       |sem_mm AS (SELECT min(sem_i) AS smin, max(sem_i) AS smax FROM sem_top),
       |sem AS (SELECT doc_id,
       |               CASE WHEN smax = smin THEN 1000000
       |                    ELSE (sem_i - smin) * 1000000 // (smax - smin) END
       |                 AS sem_norm_e6
       |        FROM sem_top CROSS JOIN sem_mm),
       |f AS (SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
       |             coalesce(lex_norm_e6, 0) * 7 + coalesce(sem_norm_e6, 0) * 3
       |               AS hybrid_e7
       |      FROM lex FULL JOIN sem ON lex.doc_id = sem.doc_id)
       |SELECT doc_id, CAST(hybrid_e7 AS BIGINT) AS hybrid_e7 FROM f
       |ORDER BY hybrid_e7 DESC, doc_id ASC LIMIT 20""".stripMargin

  private val hybridWeightedTopkSql =
    s"""WITH bm AS ($bm25ScoresSql),
       |lex_top AS (SELECT doc_id, CAST(round(bm25 * 10000, 0) AS BIGINT) AS lex_i
       |            FROM bm ORDER BY bm25 DESC, doc_id ASC LIMIT 100),
       |lex_mm AS (SELECT min(lex_i) AS lmin, max(lex_i) AS lmax FROM lex_top),
       |lex AS (SELECT doc_id,
       |               CASE WHEN lmax = lmin THEN 1000000
       |                    ELSE (lex_i - lmin) * 1000000 // (lmax - lmin) END
       |                 AS lex_norm_e6
       |        FROM lex_top CROSS JOIN lex_mm),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |sem_top AS (SELECT e.vec_id AS doc_id,
       |                   CAST(round(round(list_dot_product(e.embedding::DOUBLE[],
       |                                                     q.qe::DOUBLE[]), 6)
       |                              * 1000000, 0) AS BIGINT) AS sem_i
       |            FROM embeddings e, q
       |            ORDER BY sem_i DESC, doc_id ASC LIMIT 100),
       |sem_mm AS (SELECT min(sem_i) AS smin, max(sem_i) AS smax FROM sem_top),
       |sem AS (SELECT doc_id,
       |               CASE WHEN smax = smin THEN 1000000
       |                    ELSE (sem_i - smin) * 1000000 // (smax - smin) END
       |                 AS sem_norm_e6
       |        FROM sem_top CROSS JOIN sem_mm),
       |f AS (SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
       |             coalesce(lex_norm_e6, 0) * 7 + coalesce(sem_norm_e6, 0) * 3
       |               AS hybrid_e7
       |      FROM lex FULL JOIN sem ON lex.doc_id = sem.doc_id)
       |SELECT doc_id, CAST(hybrid_e7 AS BIGINT) AS hybrid_e7 FROM f
       |ORDER BY hybrid_e7 DESC, doc_id ASC LIMIT 20""".stripMargin

  /** Retrieval-quality evaluation: self-rank MRR over a BM25 query batch —
    * the offline eval every retrieval system ships with (the reference
    * exposes scores but no quality metric; this closes that gap). Every
    * 50th document becomes a query (its own distinct tokens as terms) and
    * its known-relevant answer is itself; the output is each query's rank
    * of its source doc, reciprocal rank in exact 1e-6 units, and a
    * hit@10 flag — MRR/recall@10 are their plain averages.
    *
    * Scale shape: the inverted index (term → doc postings with tf) is the
    * big side and shuffles once on the term key; the query-term set and
    * per-term df are broadcast. Scoring every query against the full
    * posting lists of its terms — never against the whole corpus — is the
    * standard impact-ordered evaluation shape. Ranking sorts the ROUNDED
    * score (ties broken by doc_id) so rank membership is cross-engine
    * deterministic.
    */
  def bm25SelfRankMrr(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .filter(col("doc_id") < 500)
      .select(col("doc_id"), Dedup.tokensCol(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")))
    val stats = docs.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val qt = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_doc"),
        explode(array_distinct(col("toks"))).as("term"))
    // Prune the inverted index to the query vocabulary BEFORE computing df:
    // at corpus scale dft over all terms is vocabulary-sized for no reason.
    val tfq = tf.join(broadcast(qt.select("term").distinct()), "term")
    val dfT = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tfq
      .join(broadcast(qt), "term")
      .join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      .withColumn("part",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1))
          * (col("tf") * lit(2.2))
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy(col("query_doc"), col("doc_id"))
      .agg(round(sum(col("part")), 4).as("bm25"))
    scored
      .withColumn("self_rank", row_number().over(
        Window.partitionBy(col("query_doc"))
          .orderBy(col("bm25").desc, col("doc_id").asc)).cast("long"))
      .filter(col("doc_id") === col("query_doc"))
      .select(col("query_doc"), col("self_rank"),
        expr("1000000 DIV self_rank").as("rr_e6"),
        (col("self_rank") <= 10).as("hit_at_10"))
      .orderBy("query_doc")
  }

  private val bm25SelfRankMrrSql =
    """WITH d AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
      |                     x -> length(x) > 0) AS toks
      |  FROM documents WHERE doc_id < 500),
      |dd AS (SELECT doc_id, len(toks) AS dl, toks FROM d),
      |s AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dd),
      |t AS (SELECT doc_id, dl, unnest(toks) AS term FROM dd),
      |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM t GROUP BY 1, 2, 3),
      |qt AS (SELECT DISTINCT query_doc, term FROM (
      |         SELECT doc_id AS query_doc, unnest(toks) AS term
      |         FROM dd WHERE doc_id % 50 = 0) u),
      |tfq AS (SELECT tf.* FROM tf JOIN (SELECT DISTINCT term FROM qt) v
      |        USING (term)),
      |dft AS (SELECT term, count(*) AS df FROM tfq GROUP BY term),
      |scored AS (
      |  SELECT qt.query_doc, tfq.doc_id,
      |         round(sum(ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1)
      |                   * (tfq.tf * 2.2)
      |                   / (tfq.tf + 1.2 * (0.25 + 0.75 * tfq.dl / s.avgdl))),
      |               4) AS bm25
      |  FROM tfq JOIN qt USING (term) JOIN dft USING (term) CROSS JOIN s
      |  GROUP BY qt.query_doc, tfq.doc_id),
      |ranked AS (
      |  SELECT query_doc, doc_id,
      |         row_number() OVER (PARTITION BY query_doc
      |                            ORDER BY bm25 DESC, doc_id ASC) AS rnk
      |  FROM scored)
      |SELECT query_doc, rnk AS self_rank, 1000000 // rnk AS rr_e6,
      |       rnk <= 10 AS hit_at_10
      |FROM ranked WHERE doc_id = query_doc ORDER BY query_doc""".stripMargin

  /** The reference's interactive loop made driver-visible end to end
    * (`Auto_query_rag_database.py:541-563`: conversation follow-ups reuse
    * prior context; mode toggles change k / threshold / reranker between
    * turns). A scripted three-turn session, entirely on the
    * SQL-expressible retrieval paths so the WHOLE session hash-compares:
    *
    *  - turn 1 (defaults): lexical top-3 for the base query, threshold 0;
    *  - turn 2 (follow-up + threshold toggle): the query is the follow-up
    *    text CONCATENATED with turn 1's top-1 document — context reuse as
    *    a declarative broadcast, no driver round-trip — threshold 0.15;
    *  - turn 3 (reranker toggle): BM25 ordering instead of lexical
    *    cosine, top-3.
    *
    * Output is (turn, rank, doc_id, score); per-turn rank windows run over
    * limit-3 frames (bounded partitions at any scale).
    */
  def interactiveReplay(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val followUp = "shuffle partition skew"
    val docs = Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("text"))
    val lex1 = docs.withColumn("score", lexicalScore(lit(DefaultQuery), col("text")))
    val t1 = lex1.orderBy(col("score").desc, col("doc_id").asc).limit(3)
      .select(lit(1).as("turn"), col("doc_id"), col("score"))
    val ctx = lex1.orderBy(col("score").desc, col("doc_id").asc).limit(1)
      .select(col("text").as("ctx"))
    val t2 = docs.crossJoin(broadcast(ctx))
      .withColumn("score",
        lexicalScore(concat(lit(followUp + " "), col("ctx")), col("text")))
      .filter(col("score") > 0.15)
      .orderBy(col("score").desc, col("doc_id").asc).limit(3)
      .select(lit(2).as("turn"), col("doc_id"), col("score"))
    val t3 = bm25Scores(spark, dir)
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(3)
      .select(lit(3).as("turn"), col("doc_id"), col("bm25").as("score"))
    val w = Window.partitionBy(col("turn"))
      .orderBy(col("score").desc, col("doc_id").asc)
    t1.union(t2).union(t3)
      .withColumn("rank", row_number().over(w).cast("int"))
      .select("turn", "rank", "doc_id", "score")
      .orderBy("turn", "rank")
  }

  private def lexListSql(queryExpr: String): String =
    s"""round(
       |      len(list_intersect(
       |        list_distinct(list_filter(string_split_regex(lower($queryExpr), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0)),
       |        list_distinct(list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0))))
       |      / sqrt(
       |          len(list_distinct(list_filter(string_split_regex(lower($queryExpr), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0)))::DOUBLE
       |        * len(list_distinct(list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'), x -> length(x) > 0)))::DOUBLE), 6)""".stripMargin

  private val interactiveReplaySql =
    s"""WITH lex1 AS (
       |  SELECT doc_id, text, ${lexListSql(s"'$DefaultQuery'")} AS score
       |  FROM documents WHERE length(trim(text)) > 0),
       |t1 AS (SELECT 1 AS turn, doc_id, score FROM lex1
       |       ORDER BY score DESC, doc_id ASC LIMIT 3),
       |ctx AS (SELECT text AS ctxt FROM lex1 ORDER BY score DESC, doc_id ASC LIMIT 1),
       |lex2 AS (
       |  SELECT d.doc_id,
       |         ${lexListSql("'shuffle partition skew ' || ctx.ctxt")} AS score
       |  FROM (SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0) d
       |       CROSS JOIN ctx),
       |t2 AS (SELECT 2 AS turn, doc_id, score FROM lex2 WHERE score > 0.15
       |       ORDER BY score DESC, doc_id ASC LIMIT 3),
       |bm AS ($bm25ScoresSql),
       |t3 AS (SELECT 3 AS turn, doc_id, bm25 AS score FROM bm
       |       ORDER BY bm25 DESC, doc_id ASC LIMIT 3),
       |u AS (SELECT * FROM t1 UNION ALL SELECT * FROM t2 UNION ALL SELECT * FROM t3)
       |SELECT turn,
       |       CAST(row_number() OVER (PARTITION BY turn ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank,
       |       doc_id, score
       |FROM u ORDER BY turn, rank""".stripMargin

  // ---- trigram inverted index (substring search) ----

  private val TrigramNeedle = "customer stream"

  /** Substring search served from a trigram inverted index — how engines
    * answer `LIKE '%needle%'` without scanning every text (pg_trgm /
    * hybrid-search shape). Index = distinct character trigrams per doc;
    * a query intersects the needle's trigram posting lists (candidates
    * must contain ALL of them — a count aggregation on the doc key, no
    * set intersection materialized), then verifies the actual substring
    * only on the candidates. The oracle is the plain LIKE scan, so a
    * posting/intersection bug that drops a true match breaks the compare.
    *
    * Scale: the postings build is one explode + distinct (the index job;
    * production persists it partitioned by trigram prefix); the query
    * touches ONLY the needle's ~|needle| posting lists via an
    * equi-filter, and full text is read for candidate rows alone.
    */
  def trigramSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), lower(col("text")).as("norm"))
    val needleTgs = TrigramNeedle.sliding(3).toSeq.distinct
    // Only the NEEDLE's posting lists are computed — a (doc_id, tg) row
    // exists iff the doc contains trigram tg, which is exactly the
    // posting-list relation restricted to the query's trigrams (what a
    // persisted index's trigram equi-filter would return), produced by
    // |needle| substring probes per doc instead of enumerating and
    // hashing ~|text| trigrams per doc and exploding them (the previous
    // shape — measured ~4× slower at sf0.1; the full enumeration is the
    // INDEX JOB's cost, not the query's)
    val postings = docs.select(col("doc_id"),
      explode(filter(array(needleTgs.map(lit): _*),
        t => col("norm").contains(t))).as("tg"))
    val candidates = postings
      .groupBy("doc_id").agg(countDistinct(col("tg")).as("n_tg"))
      .filter(col("n_tg") === needleTgs.size)
    candidates.join(docs, "doc_id")
      .filter(col("norm").contains(TrigramNeedle))
      .select(col("doc_id"))
      .orderBy("doc_id")
  }

  private val trigramSearchSql =
    s"""SELECT doc_id FROM documents
       |WHERE contains(lower(text), '$TrigramNeedle')
       |ORDER BY doc_id""".stripMargin

  /** The reference's §3.2 retrieve-and-assemble slice expressed PURELY as
    * `spark.sql` TEXT through the registered extension functions
    * (`GraftExtensions` — `graft_dot` for the vector stage, `chunk_split`
    * for the chunking stage): proof that a SQL-only user of the library
    * runs the reference's query shape (`query_rag_database.py` retrieve →
    * snippet assembly) with no Scala API at all. Scala prepares only the
    * TABLES (temp views: embeddings + nine planted self-copies of vec 0 —
    * the annLshTopk fixture — and the documents table) and the query
    * vector literal; every stage of the query itself is SQL text.
    *
    * Enumerable oracle (the planted self-query construction): the top-10
    * is exactly {0, 100000..100008} at rounded score 1.0, each joined to
    * its source document's chunk 1 — which at default (1000/150) chunking
    * is the whole trimmed document (the rag_pipeline_planted contract).
    */
  def ragSqlTopk(spark: SparkSession, dir: String): DataFrame = {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    import spark.implicits._
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    // bounded collect: the 1-row query vector, reused as planted copies
    val q = e.filter(col("vec_id") === 0L).head().getSeq[Float](1)
    val copies = (100000L until 100009L).map(id => (id, q))
      .toDF("vec_id", "embedding")
    e.unionByName(copies).createOrReplaceTempView("g_rag_sql_embeddings")
    Tables.documents(spark, dir)
      .createOrReplaceTempView("g_rag_sql_documents")
    // Float.toString is shortest-round-trip, so the literal re-parses to
    // the identical float and graft_dot scores bit-equal to the Scala path
    val qvLit = q.map(f => s"CAST($f AS FLOAT)")
      .mkString("array(", ", ", ")")
    spark.sql(s"""
      WITH scored AS (
        SELECT vec_id, round(graft_dot(embedding, $qvLit), 6) AS score
        FROM g_rag_sql_embeddings
      ),
      hits AS (
        SELECT vec_id, score FROM scored
        ORDER BY score DESC, vec_id ASC LIMIT 10
      ),
      chunks AS (
        -- semi-join BEFORE the LATERAL VIEW: the chunk generator runs on
        -- the ≤10 hit documents only, not the corpus — at 100 TB the
        -- chunking of unrequested documents would dominate this query
        SELECT doc_id, CAST(c.pos + 1 AS INT) AS chunk_number,
               c.total AS total_chunks, c.chunk AS chunk_text
        FROM (SELECT * FROM g_rag_sql_documents
              WHERE doc_id IN (SELECT vec_id % 100000 FROM hits))
        LATERAL VIEW chunk_split(text, 1000, 150) c AS pos, total, chunk
      )
      SELECT h.vec_id, h.score, ck.chunk_number, ck.total_chunks, ck.chunk_text
      FROM hits h
      JOIN chunks ck
        ON ck.doc_id = h.vec_id % 100000 AND ck.chunk_number = 1
      ORDER BY h.vec_id
    """)
  }

  private val ragSqlTopkSql =
    """WITH hits AS (
      |  SELECT CAST(0 AS BIGINT) AS vec_id
      |  UNION ALL
      |  SELECT doc_id + 100000 FROM documents WHERE doc_id < 9
      |)
      |SELECT h.vec_id, 1.0::DOUBLE AS score, 1 AS chunk_number,
      |       1 AS total_chunks, trim(d.text) AS chunk_text
      |FROM hits h JOIN documents d ON d.doc_id = h.vec_id % 100000
      |ORDER BY h.vec_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rag_sql_topk" -> ragSqlTopk,
    "trigram_search" -> trigramSearch,
    "interactive_replay" -> interactiveReplay,
    "rerank_topn" -> rerankTopn,
    "rerank_score_stats" -> rerankScoreStats,
    "rerank_zip" -> rerankZipQ,
    "rag_context" -> ragContext,
    "rag_pipeline_topk" -> ragPipelineTopkGate,
    "rag_pipeline_planted" -> ragPipelinePlanted,
    "bm25_scores" -> bm25Scores,
    "bm25_topn" -> bm25Topn,
    "bm25_indexed_topn" -> bm25IndexedTopn,
    "bm25_appended_topn" -> bm25AppendedTopn,
    "bm25_compacted_topn" -> bm25CompactedTopn,
    "bm25_deleted_topn" -> bm25DeletedTopn,
    "bm25_upserted_topn" -> bm25UpsertedTopn,
    "bm25_selfrank_mrr" -> bm25SelfRankMrr,
    "hybrid_rrf_fusion" -> hybridRrfFusion,
    "hybrid_weighted_topk" -> hybridWeightedTopk,
    "hybrid_weighted_indexed" -> hybridWeightedIndexed)

  def oracles: Map[String, String] = Map(
    "rag_sql_topk" -> ragSqlTopkSql,
    "trigram_search" -> trigramSearchSql,
    "interactive_replay" -> interactiveReplaySql,
    "rerank_topn" -> rerankTopnSql,
    "rerank_score_stats" -> rerankScoreStatsSql,
    "rerank_zip" -> rerankZipSql,
    "rag_context" -> ragContextSql,
    "rag_pipeline_topk" -> ragPipelineTopkGateSql,
    "rag_pipeline_planted" -> ragPipelinePlantedSql,
    "bm25_scores" -> bm25ScoresSql,
    "bm25_topn" -> bm25TopnSql,
    "bm25_indexed_topn" -> bm25TopnSql,
    "bm25_appended_topn" -> bm25TopnSql,
    "bm25_compacted_topn" -> bm25TopnSql,
    "bm25_deleted_topn" -> bm25DeletedTopnSql,
    "bm25_upserted_topn" -> bm25UpsertedTopnSql,
    "bm25_selfrank_mrr" -> bm25SelfRankMrrSql,
    "hybrid_rrf_fusion" -> hybridRrfFusionSql,
    "hybrid_weighted_topk" -> hybridWeightedTopkSql,
    "hybrid_weighted_indexed" -> hybridWeightedIndexedSql)
}
