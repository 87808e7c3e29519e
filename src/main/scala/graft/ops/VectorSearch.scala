package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.vector.{Embedding, VectorFunctions => V}

/** Exact k-NN similarity search surface (SURVEY.md §2.9 V3/V4, §2.6 T1,
  * §2.5 A2, §2.4 J4).
  *
  * Pattern: the query vector(s) are a tiny frame broadcast against the
  * corpus (J4 — "broadcast join of query vector vs corpus"); scoring is a
  * codegen'd higher-order-function expression (no UDF); global top-k plans
  * as TakeOrderedAndProject (per-partition partial top-k, merged on the
  * driver — only k rows ever cross an exchange); per-query-group top-k uses
  * a window over a shuffle keyed by query id. This is the shape that holds
  * at 100 TB: corpus never moves, queries broadcast, k rows come back.
  *
  * Scores are rounded to 6 dp in BOTH engine and oracle before ordering /
  * filtering so float summation-order ulps and top-k tie membership agree
  * (SURVEY.md §7.5). Self-matches are kept where the reference keeps them
  * (Chroma returns the query doc itself when it is in the corpus).
  */
object VectorSearch extends QueryModule {

  /** Corpus scored against one stored query vector (vec_id = `queryId`).
    * The conf-keyed forget exclusion rides the corpus side (the brute
    * exact-knn serve tail; no-op with `spark.graft.forget.root` unset);
    * the query probe itself is the caller's and stays unfiltered. */
  private[ops] def scoredAgainst(spark: SparkSession, dir: String, queryId: Long): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("query_embedding"))
    Forget.defaultExclusion(e, "vec_id").crossJoin(broadcast(q))
      .withColumn("score", round(V.cosineUnit(col("embedding"), col("query_embedding")), 6))
  }

  /** T1: exact top-10 neighbors of vec_id 0 (score desc, id tiebreak). */
  def knnExactTopk(spark: SparkSession, dir: String): DataFrame =
    scoredAgainst(spark, dir, 0L)
      .select(col("vec_id"), col("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)

  private val knnExactTopkSql =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
      |SELECT e.vec_id,
      |       round(list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) AS score
      |FROM embeddings e, q
      |ORDER BY score DESC, e.vec_id ASC
      |LIMIT 10""".stripMargin

  /** T1 in the reference's OWN metric space: Chroma collections default
    * to `hnsw:space = l2` (the store `ingest_chunks_to_chromadb.py`
    * builds never overrides it), so the raw serve the reference's
    * `similarity_search_with_relevance_scores` converts FROM is squared
    * euclidean. Computed as |a|² + |b|² − 2a·b — three codegen dot
    * products, the SAME left-to-right double accumulation the oracle's
    * `list_dot_product` performs, so the values are bit-identical
    * cross-engine with no elementwise-difference summation-order hazard.
    * On unit vectors the ordering inverts cosine exactly; the row still
    * computes the real quantity so non-normalized stores serve
    * correctly. */
  def knnL2Topk(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") === 0L)
      .select(col("embedding").as("qe"))
    Forget.defaultExclusion(e, "vec_id").crossJoin(broadcast(q))
      .withColumn("l2_sq", round(
        V.normSq(col("embedding")) + V.normSq(col("qe"))
          - lit(2.0) * V.cosineUnit(col("embedding"), col("qe")), 6))
      .select(col("vec_id"), col("l2_sq"))
      .orderBy(col("l2_sq").asc, col("vec_id").asc)
      .limit(10)
  }

  private val knnL2TopkSql =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
      |SELECT e.vec_id,
      |       round(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
      |             + list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[])
      |             - 2 * list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) AS l2_sq
      |FROM embeddings e, q
      |ORDER BY l2_sq ASC, e.vec_id ASC
      |LIMIT 10""".stripMargin

  /** V4/P7: threshold on raw cosine (calibrated to the synthetic data). */
  def knnThreshold(spark: SparkSession, dir: String): DataFrame =
    scoredAgainst(spark, dir, 0L)
      .filter(col("score") >= 0.2)
      .select(col("vec_id"), col("score"))

  private val knnThresholdSql =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
      |SELECT e.vec_id,
      |       round(list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) AS score
      |FROM embeddings e, q
      |WHERE round(list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) >= 0.2""".stripMargin

  /** P7 faithful: relevance = (1+cos)/2 in [0,1], default threshold 0.75
    * (`Auto_query_rag_database.py:67`).
    */
  def knnRelevanceThreshold(spark: SparkSession, dir: String): DataFrame =
    scoredAgainst(spark, dir, 0L)
      .withColumn("relevance", round((lit(1.0) + col("score")) / 2.0, 6))
      .filter(col("relevance") >= 0.75)
      .select(col("vec_id"), col("relevance"))

  private val knnRelevanceThresholdSql =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |s AS (SELECT e.vec_id,
      |        round(list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) AS score
      |      FROM embeddings e, q)
      |SELECT vec_id, round((1.0 + score) / 2.0, 6) AS relevance
      |FROM s WHERE round((1.0 + score) / 2.0, 6) >= 0.75""".stripMargin

  /** Batch k-NN: top-5 neighbors (self excluded) for each of the first 10
    * vectors — the approxSimilarityJoin-shaped workload, exact path.
    */
  def knnBatchTopk(spark: SparkSession, dir: String): DataFrame =
    batchSelfExcludedScores(
        Tables.embeddings(spark, dir).select("vec_id", "embedding"),
        col("vec_id") < 10)
      .withColumn("rank", row_number().over(batchRankWindow))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id"), col("score"), col("rank"))

  private val knnBatchTopkSql =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.query_id, e.vec_id,
      |         round(list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) AS score
      |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, vec_id, score,
      |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rnk
      |  FROM scored)
      |SELECT query_id, vec_id, score, rnk::INTEGER AS rank
      |FROM ranked WHERE rnk <= 5""".stripMargin

  /** HARD-NEGATIVE MINING for contrastive embedding training — the
    * batch serve that builds (anchor, hard-negative) pairs: per query,
    * the highest-scoring corpus vectors that are NOT the anchor itself
    * and NOT inside the positive/near-dup band (score ≥ 0.98 — a
    * near-duplicate mined as a negative poisons the loss; the planted
    * copies of vec 0 make that band provably load-bearing: without it
    * they would top query 0's list). Same scale shape as batch k-NN:
    * corpus never moves, the query batch broadcasts, the per-query
    * top-k crosses the one query-id exchange. */
  def hardNegativesBatch(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val copies = AnnIndex.plantedLocalRows(spark, e,
      (0 until 3).map(i => (200000L + i) -> 0L))
    batchSelfExcludedScores(e.unionByName(copies), col("vec_id") < 5)
      .filter(col("score") < 0.98)
      .withColumn("rank", row_number().over(batchRankWindow))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id"), col("score"))
      .orderBy("query_id", "rank")
  }

  /** The ONE batch-scoring core both batch rows serve from: the query
    * batch broadcasts against the corpus, anchors never score
    * themselves, scores round to the module's 6-dp discipline. */
  private def batchSelfExcludedScores(corpus: DataFrame,
      queryPred: Column): DataFrame = {
    val q = corpus.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score",
        round(V.cosineUnit(col("embedding"), col("qe")), 6))
  }

  private def batchRankWindow =
    Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)

  private val hardNegativesBatchSql =
    """WITH copies AS (
      |  SELECT CAST(200000 + r.range AS BIGINT) AS vec_id, e.embedding
      |  FROM range(3) r, embeddings e WHERE e.vec_id = 0),
      |corpus AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL SELECT vec_id, embedding FROM copies),
      |q AS (SELECT vec_id AS query_id, embedding AS qe
      |      FROM corpus WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.query_id, c.vec_id,
      |         round(list_dot_product(c.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) AS score
      |  FROM corpus c, q WHERE c.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, vec_id, score,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY score DESC, vec_id ASC) AS rnk
      |  FROM scored WHERE score < 0.98)
      |SELECT query_id, rnk::INTEGER AS rank, vec_id, score
      |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin

  /** A2: score stats over the candidate set (min/max/avg display that
    * drives interactive thresholding, `Auto_query_rag_database.py:328-331`).
    */
  def cosineScoreStats(spark: SparkSession, dir: String): DataFrame =
    scoredAgainst(spark, dir, 0L)
      .agg(
        round(min(col("score")), 6).as("min_score"),
        round(max(col("score")), 6).as("max_score"),
        round(avg(col("score")), 6).as("avg_score"),
        count(lit(1)).as("n_candidates"))

  private val cosineScoreStatsSql =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |s AS (SELECT round(list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) AS score
      |      FROM embeddings e, q)
      |SELECT round(min(score), 6) AS min_score, round(max(score), 6) AS max_score,
      |       round(avg(score), 6) AS avg_score, count(*) AS n_candidates
      |FROM s""".stripMargin

  /** V2+V3 end to end under a real oracle: hash-embed document text and
    * retrieve the top-10 for an embedded query string — same embed function
    * both sides, as the reference does (`query_rag_database.py:125-133`).
    * The hashing embedder is not SQL-expressible, so the query is made
    * oracle-checkable by the self-query construction: the query string IS
    * doc 0's text and nine exact copies of it are planted at ids
    * 100000..100008. Identical text ⇒ identical embedding ⇒ the ten copies
    * tie at the exact (bit-identical) self-score, above every distinct
    * document (doc 0's text is md5-unique in the testdata; id tiebreak
    * orders the group) — so DuckDB enumerates the answer: rank 1 → doc 0,
    * ranks 2..10 → the planted ids. The full embed → broadcast-score →
    * top-k machinery must reproduce exactly that or the hash compare fails.
    * Scores are intentionally NOT emitted (engine-specific floats); raw
    * unrounded scores order the rows, so no rounding-tie risk exists.
    */
  def embedDocumentsKnn(spark: SparkSession, dir: String): DataFrame = {
    val dim = 256
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val planted = spark.range(100000L, 100009L).toDF("doc_id")
      .crossJoin(broadcast(docs.filter(col("doc_id") === 0L).select(col("text"))))
      .select(col("doc_id"), col("text"))
    val corpus = docs.union(planted).withColumn("embedding", embed(col("text")))
    val q = corpus.filter(col("doc_id") === 0L).select(col("embedding").as("qvec"))
    val top = corpus.crossJoin(broadcast(q)) // 1-row query side; corpus never moves
      .withColumn("score", V.cosineUnit(col("embedding"), col("qvec")))
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(10)
    // rank the 10 surviving rows (window over k rows, not the corpus)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
      .select(col("rank"), col("doc_id").as("top_doc_id"))
  }

  /** Chroma's `where_document={"$contains": term}` composed with k-NN —
    * the filtered-retrieval mode the reference's store exposes next to
    * metadata filters: candidates are restricted to documents whose
    * TEXT contains the term BEFORE the top-k, so a match outside the
    * filter can never serve. Planted construction makes it enumerable
    * AND load-bearing: group A (doc-0 text + " zzaa", ids 300000+) ties
    * the query at self-score 1.0 and would top an unfiltered serve;
    * group B (same + " zzbb", ids 320000+) is the ONLY text containing
    * the filter term — the answer flips entirely to B's five copies,
    * which tie among themselves (identical text ⇒ identical embedding)
    * and rank by id. The contains predicate is a pushed scan filter
    * here; [[knnWhereContainsIndexed]] is the SAME serve routed through
    * the trigram substring index — the 100 TB shape — and both rows
    * share one replayed oracle (the router discipline). */
  def knnWhereContains(spark: SparkSession, dir: String): DataFrame = {
    val dim = 256
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val (docs, plantedAll) = whereContainsCorpus(spark, dir)
    val corpus = docs.unionByName(plantedAll)
      .withColumn("embedding", embed(col("text")))
    val qv = corpus.filter(col("doc_id") === 300000L)
      .select(col("embedding").as("qvec"))
    rankedTop5(corpus.filter(ChromaFilter.whereDocument(
      Map("$contains" -> "zzbb"), col("text"))), qv)
  }

  /** Chroma's `where_document={"$and": [{"$contains": a}, {"$contains":
    * b}]}` composed with k-NN — the conjunctive document filter next to
    * the single-clause row. The planted construction makes BOTH clauses
    * load-bearing: group B (' zzaa zzbb') carries both terms; group D
    * (' zzbb zzcc', ids 340000+) carries ONLY `zzbb`, so it would
    * survive a single-clause `zzbb` filter and is excluded exactly by
    * the `zzaa` clause — the answer is B's five copies alone (tied
    * identical embeddings, ranked by id), enumerable because no natural
    * doc carries either sentinel. Both predicates are pushed scan
    * filters here; [[knnWhereContainsAndIndexed]] IS the at-scale
    * route — each clause's trigram gate intersects inside one
    * aggregation over the shared posting probe, same answer, same
    * oracle. */
  def knnWhereContainsAnd(spark: SparkSession, dir: String): DataFrame = {
    val dim = 256
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val (docs, plantedABD) = whereContainsAndCorpus(spark, dir)
    val corpus = docs.unionByName(plantedABD)
      .withColumn("embedding", embed(col("text")))
    val qv = corpus.filter(col("doc_id") === 300000L)
      .select(col("embedding").as("qvec"))
    rankedTop5(corpus.filter(ChromaFilter.whereDocument(
      Map("$and" -> Seq(Map("$contains" -> "zzaa"),
        Map("$contains" -> "zzbb"))), col("text"))), qv)
  }

  /** Replayed conjunctive oracle: rebuild A∪B∪D, apply BOTH contains
    * clauses, rank survivors by id (the B-tie construction). */
  private val knnWhereContainsAndSql =
    """WITH base AS (SELECT text FROM documents WHERE doc_id = 0),
      |a AS (SELECT CAST(300000 + r.range AS BIGINT) AS doc_id,
      |             b.text || ' zzaa' AS text
      |      FROM range(5) r, base b),
      |bb AS (SELECT CAST(320000 + r.range AS BIGINT) AS doc_id,
      |              b.text || ' zzaa zzbb' AS text
      |       FROM range(5) r, base b),
      |d AS (SELECT CAST(340000 + r.range AS BIGINT) AS doc_id,
      |             b.text || ' zzbb zzcc' AS text
      |      FROM range(5) r, base b),
      |corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id, text FROM a
      |  UNION ALL SELECT doc_id, text FROM bb
      |  UNION ALL SELECT doc_id, text FROM d),
      |cand AS (SELECT doc_id FROM corpus
      |         WHERE contains(text, 'zzaa') AND contains(text, 'zzbb'))
      |SELECT CAST(row_number() OVER (ORDER BY doc_id) AS INTEGER) AS rank,
      |       doc_id AS top_doc_id
      |FROM (SELECT doc_id FROM cand ORDER BY doc_id LIMIT 5)
      |ORDER BY rank""".stripMargin

  /** Chroma's `where` (metadata) AND `where_document` ($contains) in
    * ONE query — the fully-composed filtered retrieval the store
    * exposes (`collection.query(..., where={...},
    * where_document={...})`). Planted groups E (source='eval_a') and F
    * (source='eval_b') carry IDENTICAL text (⇒ identical embeddings ⇒
    * an exact tie) and both contain the document sentinel — so the
    * `$contains` clause alone cannot separate them and the metadata
    * clause alone cannot exclude the naturals: only the CONJUNCTION
    * yields F's five copies, ranked by id. Metadata is a pushed scan
    * predicate (at scale: a partition/zone-map prune on the metadata
    * column); the document clause routes per the contains rows. */
  def knnWhereMetadataAndDocument(spark: SparkSession,
      dir: String): DataFrame = {
    val dim = 256
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
    val base0 = docs.filter(col("doc_id") === 0L).select(col("text").as("base"))
    def planted(from: Long, source: String): DataFrame =
      spark.range(from, from + 5).toDF("doc_id")
        .crossJoin(broadcast(base0))
        .select(col("doc_id"), concat(col("base"), lit(" zzmm")).as("text"),
          lit(source).as("source"))
    val corpus = docs
      .unionByName(planted(360000L, "eval_a"))
      .unionByName(planted(380000L, "eval_b"))
      .withColumn("embedding", embed(col("text")))
    val qv = corpus.filter(col("doc_id") === 360000L)
      .select(col("embedding").as("qvec"))
    rankedTop5(corpus.filter(
      ChromaFilter.where(Map("source" -> "eval_b")) &&
        ChromaFilter.whereDocument(Map("$contains" -> "zzmm"),
          col("text"))), qv)
  }

  /** Replayed composed oracle: rebuild E∪F, apply BOTH the metadata and
    * document clauses, rank the surviving tie by id. */
  private val knnWhereMetadataAndDocumentSql =
    """WITH base AS (SELECT text FROM documents WHERE doc_id = 0),
      |e AS (SELECT CAST(360000 + r.range AS BIGINT) AS doc_id,
      |             b.text || ' zzmm' AS text, 'eval_a' AS source
      |      FROM range(5) r, base b),
      |f AS (SELECT CAST(380000 + r.range AS BIGINT) AS doc_id,
      |             b.text || ' zzmm' AS text, 'eval_b' AS source
      |      FROM range(5) r, base b),
      |corpus AS (
      |  SELECT doc_id, text, source FROM documents
      |  UNION ALL SELECT * FROM e
      |  UNION ALL SELECT * FROM f),
      |cand AS (SELECT doc_id FROM corpus
      |         WHERE source = 'eval_b' AND contains(text, 'zzmm'))
      |SELECT CAST(row_number() OVER (ORDER BY doc_id) AS INTEGER) AS rank,
      |       doc_id AS top_doc_id
      |FROM (SELECT doc_id FROM cand ORDER BY doc_id LIMIT 5)
      |ORDER BY rank""".stripMargin

  /** Chroma's NON-EQUALITY metadata `where` operators composed with
    * k-NN — the retriever filter surface `Auto_query_rag_database.py`
    * accepts beyond bare equality: `{"$and": [{"n_chars":
    * {"$gte": 300}}, {"n_chars": {"$lt": 10000}}]}` AND a `$contains`
    * document clause in one query.
    * Three planted groups carry IDENTICAL text (⇒ identical embeddings
    * ⇒ an exact tie the text clauses cannot separate) and differ ONLY
    * in the numeric metadata, making each bound load-bearing on its
    * own: G (n_chars=120, ids 400000+) is the QUERY's group — a
    * dropped `$gte` serves its 1.0 self-tie; I (n_chars=50000, ids
    * 410000+) sits BELOW H in id order — a dropped `$lt` serves I's
    * tie first; only H (n_chars=5000, ids 420000+) passes both. The
    * range predicate is a pushed scan filter (plan-audited:
    * `GreaterThanOrEqual(n_chars,300)` reaches the documents parquet);
    * [[knnWhereMetadataRangePruned]] is the SAME query with the
    * natural scan wired through the zone-map file prune — the 100 TB
    * shape, where the range skips whole files off footer stats. */
  def knnWhereMetadataRange(spark: SparkSession, dir: String): DataFrame = {
    val (naturals, planted, qv) = whereMetadataRangeCorpus(spark, dir)
    rankedTop5(naturals.unionByName(planted)
      .filter(whereMetadataRangeFilter), qv)
  }

  /** [[knnWhereMetadataRange]] with the NATURAL side served from a
    * zone-map-pruned file set (the `zonemap_pruned_scan` discipline,
    * `ops/Lakehouse.scala`): the documents lay out range-partitioned by
    * `n_chars`, a per-file (min,max) stats sidecar is the catalog, and
    * the range clause prunes every file whose stats window misses
    * [300, 10000) BEFORE any row is read — at 100 TB the predicate
    * skips whole files off footer stats instead of filtering rows.
    * Same answer, same oracle as the pushed-filter sibling (the
    * route-independence discipline); the spec pins that files are
    * actually skipped AND none that matter were. */
  def knnWhereMetadataRangePruned(spark: SparkSession,
      dir: String): DataFrame = {
    val (_, planted, qv) = whereMetadataRangeCorpus(spark, dir)
    val tmp = Tables.scratchPath("docs_zm_nchars", dir)
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text", "n_chars")
    ResultCache.buildIfAbsent(spark, docs, "zonemap:n_chars:v1", tmp) {
      docs.repartitionByRange(6, col("n_chars"))
        .write.mode("overwrite").parquet(tmp + "/data")
      spark.read.parquet(tmp + "/data")
        .groupBy(col("_metadata.file_path").as("file"))
        .agg(min("n_chars").as("min_n"), max("n_chars").as("max_n"))
        .write.mode("overwrite").parquet(tmp + "/stats")
    }
    val (pruned, _, _) = zonemapPrunedDocs(spark, tmp, 300L, 10000L)
    val embed = udf((t: String) =>
      Embedding.hashingEmbed(t, 256))
    rankedTop5(pruned.withColumn("embedding", embed(col("text")))
      .unionByName(planted)
      .filter(whereMetadataRangeFilter), qv)
  }

  /** The range rows' shared predicate, built from the EXACT filter
    * dicts a Chroma client would send (`where={"$and": [{"n_chars":
    * {"$gte": 300}}, {"n_chars": {"$lt": 10000}}]},
    * where_document={"$contains": "zzrr"}`) through [[ChromaFilter]] —
    * the translator is thereby oracle-exercised, and the compiled tree
    * is ordinary Catalyst, so both bounds still push into the parquet
    * scan (the row's plan audit). */
  private def whereMetadataRangeFilter: Column =
    ChromaFilter.where(Map("$and" -> Seq(
      Map("n_chars" -> Map("$gte" -> 300L)),
      Map("n_chars" -> Map("$lt" -> 10000L))))) &&
      ChromaFilter.whereDocument(Map("$contains" -> "zzrr"), col("text"))

  /** The stats-sidecar file prune for the n_chars zone map: keep files
    * whose [min,max] window intersects [lo, hi). Returns (frame, kept,
    * total) so the spec can assert real skipping. The collect is over
    * the SIDECAR — file-count-bounded, a catalog-lookup cardinality,
    * never data rows. */
  private[graft] def zonemapPrunedDocs(spark: SparkSession, tmp: String,
      lo: Long, hi: Long): (DataFrame, Int, Int) = {
    val stats = spark.read.parquet(tmp + "/stats")
    val total = stats.count().toInt
    val files = stats.filter(col("max_n") >= lo && col("min_n") < hi)
      .select("file").collect().map(_.getString(0))
    val frame =
      if (files.isEmpty) spark.read.parquet(tmp + "/data").limit(0)
      else spark.read.parquet(files.toIndexedSeq: _*)
    (frame, files.length, total)
  }

  /** The shared range-row construction: (naturals, planted G∪I∪H with
    * their metadata, the query vector = G's embedding). */
  private def whereMetadataRangeCorpus(spark: SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame) = {
    val dim = 256
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val naturals = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .withColumn("embedding", embed(col("text")))
    val base0 = Tables.documents(spark, dir)
      .filter(col("doc_id") === 0L).select(col("text").as("base"))
    def grp(from: Long, nChars: Long): DataFrame =
      spark.range(from, from + 5).toDF("doc_id")
        .crossJoin(broadcast(base0))
        .select(col("doc_id"), concat(col("base"), lit(" zzrr")).as("text"),
          lit(nChars).as("n_chars"))
        .withColumn("embedding", embed(col("text")))
    val planted = grp(400000L, 120L)
      .unionByName(grp(410000L, 50000L))
      .unionByName(grp(420000L, 5000L))
    val qv = planted.filter(col("doc_id") === 400000L)
      .select(col("embedding").as("qvec"))
    (naturals, planted, qv)
  }

  /** Replayed range oracle shared by the pushed-filter and zone-map
    * routes: rebuild G∪I∪H with their metadata literals, apply both
    * bounds and the contains clause, rank the surviving tie by id. */
  private val knnWhereMetadataRangeSql =
    """WITH base AS (SELECT text FROM documents WHERE doc_id = 0),
      |g AS (SELECT CAST(400000 + r.range AS BIGINT) AS doc_id,
      |             b.text || ' zzrr' AS text, CAST(120 AS BIGINT) AS n_chars
      |      FROM range(5) r, base b),
      |i AS (SELECT CAST(410000 + r.range AS BIGINT) AS doc_id,
      |             b.text || ' zzrr' AS text, CAST(50000 AS BIGINT) AS n_chars
      |      FROM range(5) r, base b),
      |h AS (SELECT CAST(420000 + r.range AS BIGINT) AS doc_id,
      |             b.text || ' zzrr' AS text, CAST(5000 AS BIGINT) AS n_chars
      |      FROM range(5) r, base b),
      |corpus AS (
      |  SELECT doc_id, text, n_chars FROM documents
      |  UNION ALL SELECT * FROM g
      |  UNION ALL SELECT * FROM i
      |  UNION ALL SELECT * FROM h),
      |cand AS (SELECT doc_id FROM corpus
      |         WHERE n_chars >= 300 AND n_chars < 10000
      |           AND contains(text, 'zzrr'))
      |SELECT CAST(row_number() OVER (ORDER BY doc_id) AS INTEGER) AS rank,
      |       doc_id AS top_doc_id
      |FROM (SELECT doc_id FROM cand ORDER BY doc_id LIMIT 5)
      |ORDER BY rank""".stripMargin

  /** Chroma's `{"source": {"$in": [...]}}` metadata operator composed
    * with a document clause and k-NN: three identical-text groups
    * differ only in `source` — E2 ('eval_a', ids 440000+, the QUERY's
    * group: a dropped `$in` serves its self-tie), F2 ('eval_b',
    * 460000+) and G2 ('eval_c', 480000+) both pass. Top-5 is F2 by id;
    * the spec pins the full F2∪G2 candidate set, since the top-5 alone
    * cannot see a silently dropped second list element (the `$or`
    * lesson). The In predicate is a pushed scan filter (at scale: a
    * dictionary/partition prune on the metadata column). */
  def knnWhereMetadataIn(spark: SparkSession, dir: String): DataFrame = {
    val (corpus, qv) = whereMetadataSourceCorpus(spark, dir)
    // built from the LITERAL JSON a Chroma client sends — the whole
    // translator chain (Jackson parse -> tree walk -> Column) is
    // thereby oracle-exercised, including java.lang Integer/List
    // value shapes the map-typed entry never sees
    rankedTop5(corpus.filter(
      ChromaFilter.whereJson(
        """{"source": {"$in": ["eval_b", "eval_c"]}}""") &&
        ChromaFilter.whereDocumentJson("""{"$contains": "zznn"}""",
          col("text"))), qv)
  }

  /** Chroma's `{"source": {"$nin": [...]}}` — the complement list
    * operator, over the SAME corpus: excluding 'eval_a' (the query's
    * own group, so the exclusion is load-bearing: a no-op filter
    * serves E2's 1.0 self-tie) and a NATURAL source value ('src0', so
    * the list walks both planted and natural metadata). */
  def knnWhereMetadataNin(spark: SparkSession, dir: String): DataFrame = {
    val (corpus, qv) = whereMetadataSourceCorpus(spark, dir)
    rankedTop5(corpus.filter(
      ChromaFilter.where(Map("source" ->
        Map("$nin" -> Seq("eval_a", "src0")))) &&
        ChromaFilter.whereDocument(Map("$contains" -> "zznn"),
          col("text"))), qv)
  }

  private def whereMetadataSourceCorpus(spark: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val dim = 256
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
    val base0 = docs.filter(col("doc_id") === 0L)
      .select(col("text").as("base"))
    def grp(from: Long, source: String): DataFrame =
      spark.range(from, from + 5).toDF("doc_id")
        .crossJoin(broadcast(base0))
        .select(col("doc_id"), concat(col("base"), lit(" zznn")).as("text"),
          lit(source).as("source"))
    val corpus = docs
      .unionByName(grp(440000L, "eval_a"))
      .unionByName(grp(460000L, "eval_b"))
      .unionByName(grp(480000L, "eval_c"))
      .withColumn("embedding", embed(col("text")))
    val qv = corpus.filter(col("doc_id") === 440000L)
      .select(col("embedding").as("qvec"))
    (corpus, qv)
  }

  private val whereMetadataSourceCorpusSqlPrefix =
    """WITH base AS (SELECT text FROM documents WHERE doc_id = 0),
      |e2 AS (SELECT CAST(440000 + r.range AS BIGINT) AS doc_id,
      |              b.text || ' zznn' AS text, 'eval_a' AS source
      |       FROM range(5) r, base b),
      |f2 AS (SELECT CAST(460000 + r.range AS BIGINT) AS doc_id,
      |              b.text || ' zznn' AS text, 'eval_b' AS source
      |       FROM range(5) r, base b),
      |g2 AS (SELECT CAST(480000 + r.range AS BIGINT) AS doc_id,
      |              b.text || ' zznn' AS text, 'eval_c' AS source
      |       FROM range(5) r, base b),
      |corpus AS (
      |  SELECT doc_id, text, source FROM documents
      |  UNION ALL SELECT * FROM e2
      |  UNION ALL SELECT * FROM f2
      |  UNION ALL SELECT * FROM g2),
      |""".stripMargin

  private val knnWhereMetadataInSql = whereMetadataSourceCorpusSqlPrefix +
    """cand AS (SELECT doc_id FROM corpus
      |         WHERE source IN ('eval_b', 'eval_c')
      |           AND contains(text, 'zznn'))
      |SELECT CAST(row_number() OVER (ORDER BY doc_id) AS INTEGER) AS rank,
      |       doc_id AS top_doc_id
      |FROM (SELECT doc_id FROM cand ORDER BY doc_id LIMIT 5)
      |ORDER BY rank""".stripMargin

  private val knnWhereMetadataNinSql = whereMetadataSourceCorpusSqlPrefix +
    """cand AS (SELECT doc_id FROM corpus
      |         WHERE source NOT IN ('eval_a', 'src0')
      |           AND contains(text, 'zznn'))
      |SELECT CAST(row_number() OVER (ORDER BY doc_id) AS INTEGER) AS rank,
      |       doc_id AS top_doc_id
      |FROM (SELECT doc_id FROM cand ORDER BY doc_id LIMIT 5)
      |ORDER BY rank""".stripMargin

  /** The shared `$contains` planted corpus: (base docs, planted A∪B).
    * Lazy planted construction (the embedDocumentsKnn discipline): the
    * doc-0 text rides a 1-row broadcast — no driver action at plan
    * construction time. */
  private def whereContainsCorpus(spark: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    (docs, whereContainsPlanted(spark, docs, 300000L, " zzaa")
      .unionByName(whereContainsPlanted(spark, docs, 320000L, " zzaa zzbb")))
  }

  /** The conjunction rows' corpus: A∪B plus group D (' zzbb zzcc',
    * ids 340000+) which carries ONLY the second term — the group the
    * `zzaa` clause must exclude. */
  private def whereContainsAndCorpus(spark: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val (docs, ab) = whereContainsCorpus(spark, dir)
    (docs, ab.unionByName(
      whereContainsPlanted(spark, docs, 340000L, " zzbb zzcc")))
  }

  private def whereContainsPlanted(spark: SparkSession, docs: DataFrame,
      from: Long, suffix: String): DataFrame = {
    val base0 = docs.filter(col("doc_id") === 0L).select(col("text").as("base"))
    spark.range(from, from + 5).toDF("doc_id")
      .crossJoin(broadcast(base0))
      .select(col("doc_id"), concat(col("base"), lit(suffix)).as("text"))
  }

  /** Above this many trigram-index candidates the serve stops collecting
    * ids for a pushed scan filter and falls back to a distributed
    * semi-join — the driver must never hold an unbounded id list. */
  private[graft] val WhereContainsPushdownCap = 8192

  /** [[knnWhereContains]] routed through the TRIGRAM SUBSTRING INDEX —
    * the at-scale serve for Chroma's `where_document={"$contains": t}`
    * (`query_rag_database.py`'s store capability): instead of scanning
    * every document's text for the term, probe the persisted trigram
    * posting table with the needle's trigrams (a pushed `tg IN (…)`
    * equi-filter touching ~|needle| posting lists), keep doc ids that
    * carry ALL of them, VERIFY the actual substring on those candidates
    * only, then k-NN the survivors. The posting build is the INDEX JOB
    * (paid once, cached); the query reads corpus text only for the
    * candidate row set — a bounded id list pushed into the documents
    * scan (`PushedFilters: In(doc_id, …)` prunes row groups), falling
    * back to a distributed semi-join above [[WhereContainsPushdownCap]]
    * candidates so the driver never holds an unbounded list.
    *
    * Answer contract: IDENTICAL rows to [[knnWhereContains]] — the two
    * routes share one replayed oracle, so a posting bug that drops a
    * true candidate (or a verify bypass that admits a false one) breaks
    * the compare. */
  def knnWhereContainsIndexed(spark: SparkSession, dir: String): DataFrame =
    knnWhereContainsIndexedCapped(spark, dir, WhereContainsPushdownCap)

  /** The cap-parameterized body — the spec drives `cap = 0` to force
    * the distributed semi-join arm and pin route equality on it too. */
  private[graft] def knnWhereContainsIndexedCapped(spark: SparkSession,
      dir: String, cap: Int): DataFrame = {
    val (_, plantedAll) = whereContainsCorpus(spark, dir)
    whereContainsIndexedCore(spark, dir, cap, Seq("zzbb"), plantedAll,
      "trigram_postings_wc", WhereContainsPostingsTag)
  }

  /** The OPTIMIZER-driven trigram route — the third way to reach the
    * posting index, after the explicit indexed serve and the measured
    * router: user code is the NAÏVE scan query (`spark.read.parquet(
    * corpus).filter(col("text").contains("zzbb"))` — no index API
    * anywhere), and the opt-in [[org.apache.spark.sql.graft.
    * ContainsRewriteRule]] injects the posting-gate semi-join during
    * optimization, with the contains conjunct kept as the verify (an
    * EXACT rewrite, unlike the ANN one — the gate is a superset of
    * matches). Same answer, same replayed oracle as the scan route;
    * the spec audits that the armed plan REALLY carries the semi-join
    * (a silently non-firing rule would still pass the oracle via the
    * scan). Conf is localized around a collect (the
    * annRewriteFilteredTopk discipline — a lazily-served frame would
    * otherwise optimize after the conf window closed). */
  def knnWhereContainsRewritten(spark: SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.graft.{ContainsRewriteRule => R, GraftExtensions}
    GraftExtensions.register(spark)
    val dim = 256
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val (docs, plantedAll) = whereContainsCorpus(spark, dir)
    val corpusPath = whereContainsRuleCorpus(spark, dir)
    val postingsPath = lifecycleTrigramTable(spark, docs, plantedAll, dir,
      "trigram_postings_wc", WhereContainsPostingsTag)()
    val qv = plantedAll.filter(col("doc_id") === 300000L)
      .withColumn("embedding", embed(col("text")))
      .select(col("embedding").as("qvec"))
    Relational.withConfsLocalized(spark, Seq(
      R.EnabledKey -> "true",
      R.SourceKey -> corpusPath,
      R.PostingsKey -> postingsPath)) {
      rankedTop5(whereContainsRuleUserQuery(spark, corpusPath)
        .withColumn("embedding", embed(col("text"))), qv)
    }
  }

  /** The materialized store the rule row registers as its source —
    * docs ∪ planted as ONE parquet table (the rule matches bare scans
    * of a registered path, the MvRewrite source discipline). */
  private[graft] def whereContainsRuleCorpus(spark: SparkSession,
      dir: String): String = {
    val (docs, plantedAll) = whereContainsCorpus(spark, dir)
    materializedRuleCorpus(spark, dir, "wc_rule_corpus",
      "wcrule:corpus:v1", docs, plantedAll)
  }

  /** The OR row's registered store: the A∪B∪D conjunction corpus as one
    * parquet table (same discipline as [[whereContainsRuleCorpus]]). */
  private[graft] def whereContainsAndRuleCorpus(spark: SparkSession,
      dir: String): String = {
    val (docs, plantedAll) = whereContainsAndCorpus(spark, dir)
    materializedRuleCorpus(spark, dir, "wca_rule_corpus",
      "wcarule:corpus:v1", docs, plantedAll)
  }

  /** One builder for every rule-registered corpus table (name + tag +
    * planted set are the only degrees of freedom). */
  private def materializedRuleCorpus(spark: SparkSession, dir: String,
      name: String, tag: String, docs: DataFrame,
      plantedAll: DataFrame): String = {
    val corpusPath = Tables.scratchPath(name, dir)
    ResultCache.buildIfAbsent(spark, docs, tag, corpusPath) {
      docs.unionByName(plantedAll)
        .write.mode("overwrite").parquet(corpusPath)
    }
    corpusPath
  }

  /** The naïve DISJUNCTIVE user query the OR-rewrite row runs — exposed
    * so the spec can audit the very plan the driver row serves. */
  private[graft] def whereContainsOrRuleUserQuery(spark: SparkSession,
      corpusPath: String): DataFrame =
    spark.read.parquet(corpusPath)
      .filter(col("text").contains("zzbb") || col("text").contains("zzcc"))

  /** The OPTIMIZER route for a DISJUNCTION of substring clauses — the
    * r19 gap: ChromaFilter's `$or`-of-`$contains` compiles to
    * `Or(Contains, Contains)`, which `splitConjunctivePredicates`
    * never splits, so the r19 rule left disjunctions entirely on the
    * scan route even though the explicit `_or_indexed` serve computed
    * the ANY-gate. The rule now matches an OR-of-contains conjunct
    * (every branch over the registered column and gateable, else
    * decline) and injects the disjunctive gate — the same
    * `trigramGateFrame(conjunctive = false)` the explicit serve uses,
    * original Or kept as the verify (EXACT rewrite). This row also
    * registers through the REGISTRY conf (a JSON map of many corpora —
    * the multi-index surface), not the legacy single pair, so the
    * registry path is oracle-exercised too. Same answer and replayed
    * oracle as [[knnWhereContainsOr]]; the spec audits the armed plan
    * really carries the posting-gate semi-join. */
  def knnWhereContainsOrRewritten(spark: SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.graft.{ContainsRewriteRule => R, GraftExtensions}
    GraftExtensions.register(spark)
    val dim = 256
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val (docs, plantedAll) = whereContainsAndCorpus(spark, dir)
    val corpusPath = whereContainsAndRuleCorpus(spark, dir)
    val postingsPath = lifecycleTrigramTable(spark, docs, plantedAll, dir,
      "trigram_postings_wca", WhereContainsAndPostingsTag)()
    val qv = plantedAll.filter(col("doc_id") === 320000L)
      .withColumn("embedding", embed(col("text")))
      .select(col("embedding").as("qvec"))
    Relational.withConfsLocalized(spark, Seq(
      R.EnabledKey -> "true",
      R.RegistryKey ->
        s"""{"$corpusPath": {"postings": "$postingsPath"}}""")) {
      rankedTop5(whereContainsOrRuleUserQuery(spark, corpusPath)
        .withColumn("embedding", embed(col("text"))), qv)
    }
  }

  /** The exact naïve frame the user writes — exposed so the spec can
    * audit the very plan the driver row runs. */
  private[graft] def whereContainsRuleUserQuery(spark: SparkSession,
      corpusPath: String): DataFrame =
    spark.read.parquet(corpusPath)
      .filter(col("text").contains("zzbb"))

  /** MEASURED auto-routing between the `$contains` SCAN and TRIGRAM
    * routes — the `ann_auto_route`/`maxsim_auto_route` discipline on
    * the substring index: both routes' dominant cost is the documents
    * whose text must be decoded and verified, so the router compares
    * the MEASURED candidate count from the (cheap, pushed-In) posting
    * probe against the corpus count, with an `overhead` factor for the
    * probe + candidate fetch the indexed route adds. A rare needle
    * routes trigram (verify a handful of docs); a needle so common its
    * candidates approach the corpus routes scan — the same inversion
    * the `$not_contains` cap encodes, here chosen by measurement. Both
    * arms provably serve the identical answer (the route-independent
    * oracle), and the choice lands in [[RouteLog]] so bench boards
    * record it. */
  def knnWhereContainsAutoRoute(spark: SparkSession,
      dir: String): DataFrame =
    knnWhereContainsAutoRouteWith(spark, dir, overhead = 2L)

  /** Per-dir documents cardinality — the value a production deployment
    * reads from catalog statistics; re-counting the corpus on every
    * routed serve would make the ROUTER cost what it exists to avoid.
    * A Long memo, never a cached frame (a plan-keyed DataFrame cache
    * pins its first caller's session — the r18 ivf-memo lesson), keyed
    * on the corpus directory's LISTING SIGNATURE, not the dir string
    * (the ContainsRewriteRule.relCache discipline): a memo keyed on the
    * path alone would mis-price routes for the JVM's life after any
    * corpus churn. One `listStatus` per serve buys the invalidation —
    * namenode RPC, not a Spark job. */
  private val corpusCountMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Long)]() // dir -> (leaf signature, count): one
                              // REPLACED entry per dir, bounded memory
  private def corpusDocsOf(spark: SparkSession, dir: String): Long = {
    // leaf-level signature (name, length, mtime of every data file,
    // flat or one col= level deep — the shapes a documents table
    // takes): an in-place overwrite or partition-dir churn invalidates
    // (the ContainsRewriteRule.relCache discipline; a top-level-only
    // triple goes blind under partition dirs). Unlistable → count
    // without memoizing, never poison a shared key.
    val docsDir = new org.apache.hadoop.fs.Path(dir, "documents.parquet")
    val sig: String =
      try {
        val fs = docsDir.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val (dirs, files) = fs.listStatus(docsDir).partition(_.isDirectory)
        def hidden(n: String) = n.startsWith("_") || n.startsWith(".")
        // skip hidden DIRS too (an in-flight writer's _temporary tree
        // would churn the signature on every serve during the write)
        (files.toSeq ++ dirs.toSeq
            .filterNot(d => hidden(d.getPath.getName))
            .flatMap(d => fs.listStatus(d.getPath).filter(_.isFile).toSeq))
          .filterNot(st => hidden(st.getPath.getName))
          .map(st => s"${st.getPath.getName} ${st.getLen} " +
            s"${st.getModificationTime}")
          .sorted.mkString("\n")
      } catch { case _: java.io.IOException => null }
    if (sig == null) return Tables.documents(spark, dir).count()
    val cached = corpusCountMemo.get(dir)
    if (cached != null && cached._1 == sig) cached._2
    else {
      val n = Tables.documents(spark, dir).count()
      corpusCountMemo.put(dir, (sig, n))
      n
    }
  }

  /** Overhead-parameterized body — the spec drives a huge factor to
    * force the scan arm and pin route equality on it. The bounded
    * cap+1 probe serves BOTH purposes in one job: its length is the
    * candidate-count price, and below the cap its ids ARE the pushed
    * fetch list — the routed serve never re-runs the posting probe. */
  private[graft] def knnWhereContainsAutoRouteWith(spark: SparkSession,
      dir: String, overhead: Long): DataFrame = {
    val needle = "zzbb"
    val dim = 256
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val (docs, plantedAll) = whereContainsCorpus(spark, dir)
    val path = lifecycleTrigramTable(spark, docs, plantedAll, dir,
      "trigram_postings_wc", WhereContainsPostingsTag)()
    val candidates = lifecycleTrigramCandidates(spark, path, Seq(needle))
    val probe = candidates.limit(WhereContainsPushdownCap + 1)
      .collect().map(_.getLong(0))
    // above the cap the exact count is unknown — price with cap+1, a
    // LOWER bound, which can only bias toward the (semi-join) indexed
    // route when candidates are genuinely plentiful
    val corpusDocs = corpusDocsOf(spark, dir)
    // BigInt: a large overhead factor must price AGAINST the index,
    // never overflow Long into routing FOR it
    val indexed =
      BigInt(probe.length) * BigInt(overhead) < BigInt(corpusDocs)
    RouteLog.record("where_contains", if (indexed) "trigram" else "scan")
    System.err.println(s"[route] where_contains corpus=$corpusDocs " +
      s"candidates>=${probe.length} -> ${if (indexed) "trigram" else "scan"}")
    if (!indexed) knnWhereContains(spark, dir)
    else {
      val qv = plantedAll.filter(col("doc_id") === 300000L)
        .withColumn("embedding", embed(col("text")))
        .select(col("embedding").as("qvec"))
      verifiedTop5(cappedCandidateFetch(docs.unionByName(plantedAll),
        candidates, probe, WhereContainsPushdownCap),
        Seq(needle), conjunctive = true, qv, dim = dim)
    }
  }

  /** The AND row through the index — the composition its scan sibling's
    * doc promises: each clause's trigrams probe the SAME posting table
    * and the per-needle all-trigrams gates INTERSECT inside one
    * aggregation (a conditional countDistinct per needle — no
    * join-per-clause), then both substrings verify on the surviving
    * candidates only. Same answer as [[knnWhereContainsAnd]]; same
    * replayed oracle (the router discipline). */
  def knnWhereContainsAndIndexed(spark: SparkSession,
      dir: String): DataFrame = {
    val (_, plantedAll) = whereContainsAndCorpus(spark, dir)
    whereContainsIndexedCore(spark, dir, WhereContainsPushdownCap,
      Seq("zzaa", "zzbb"), plantedAll,
      "trigram_postings_wca", WhereContainsAndPostingsTag)
  }

  /** Chroma's `where_document={"$or": [{"$contains": a}, {"$contains":
    * b}]}` — the disjunctive document filter completing the composed
    * surface next to [[knnWhereContainsAnd]]. Candidates are the UNION
    * of the clauses' matches over the A∪B∪D corpus: `zzbb` admits B,
    * `zzcc` admits D, `zzaa`-only A is excluded. The query is B's OWN
    * embedding, so B's five identical copies tie at self-score 1.0 and
    * serve (ranked by id) — a union that silently dropped the FIRST
    * clause would flip the answer to D wholesale; the spec pins the
    * full candidate set B∪D so a dropped SECOND clause (which this
    * row's top-5 alone cannot see) fails there. */
  def knnWhereContainsOr(spark: SparkSession, dir: String): DataFrame = {
    val dim = 256
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val (docs, plantedABD) = whereContainsAndCorpus(spark, dir)
    val corpus = docs.unionByName(plantedABD)
      .withColumn("embedding", embed(col("text")))
    val qv = corpus.filter(col("doc_id") === 320000L)
      .select(col("embedding").as("qvec"))
    rankedTop5(corpus.filter(ChromaFilter.whereDocument(
      Map("$or" -> Seq(Map("$contains" -> "zzbb"),
        Map("$contains" -> "zzcc"))), col("text"))), qv)
  }

  /** Replayed disjunctive oracle: rebuild A∪B∪D, take the OR of the
    * clauses, rank by id — valid because B's self-tie owns the top-5
    * AND B's ids sort below D's, so score order and id order agree on
    * the emitted rows. */
  private val knnWhereContainsOrSql =
    """WITH base AS (SELECT text FROM documents WHERE doc_id = 0),
      |a AS (SELECT CAST(300000 + r.range AS BIGINT) AS doc_id,
      |             b.text || ' zzaa' AS text
      |      FROM range(5) r, base b),
      |bb AS (SELECT CAST(320000 + r.range AS BIGINT) AS doc_id,
      |              b.text || ' zzaa zzbb' AS text
      |       FROM range(5) r, base b),
      |d AS (SELECT CAST(340000 + r.range AS BIGINT) AS doc_id,
      |             b.text || ' zzbb zzcc' AS text
      |      FROM range(5) r, base b),
      |corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id, text FROM a
      |  UNION ALL SELECT doc_id, text FROM bb
      |  UNION ALL SELECT doc_id, text FROM d),
      |cand AS (SELECT doc_id FROM corpus
      |         WHERE contains(text, 'zzbb') OR contains(text, 'zzcc'))
      |SELECT CAST(row_number() OVER (ORDER BY doc_id) AS INTEGER) AS rank,
      |       doc_id AS top_doc_id
      |FROM (SELECT doc_id FROM cand ORDER BY doc_id LIMIT 5)
      |ORDER BY rank""".stripMargin

  /** The `$or` through the index: candidates are docs carrying ANY
    * clause's full trigram set (the same single-aggregation gate with a
    * disjunctive reduce), verified against the OR of the substrings —
    * the union the scan sibling's spec pins, served from the SAME
    * posting fixture as the conjunction. */
  def knnWhereContainsOrIndexed(spark: SparkSession,
      dir: String): DataFrame = {
    val (_, plantedAll) = whereContainsAndCorpus(spark, dir)
    whereContainsIndexedCore(spark, dir, WhereContainsPushdownCap,
      Seq("zzbb", "zzcc"), plantedAll,
      "trigram_postings_wca", WhereContainsAndPostingsTag,
      conjunctive = false, queryId = 320000L)
  }

  /** The shared trigram-routed `$contains` serve over any conjunction
    * OR disjunction of needles: posting probe restricted to the union
    * of the needles' trigrams (pushed IN), one aggregation gating each
    * needle's full trigram set per doc (ALL gates for $and, ANY for
    * $or), bounded-probe candidate fetch (pushed ids or distributed
    * semi-join above `cap`), the composed substring verify on
    * candidates only, then k-NN against `queryId`'s planted group. */
  private def whereContainsIndexedCore(spark: SparkSession, dir: String,
      cap: Int, needles: Seq[String], plantedAll: DataFrame,
      fixtureName: String, fixtureTag: String,
      conjunctive: Boolean = true, queryId: Long = 300000L): DataFrame = {
    val dim = 256
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val path = lifecycleTrigramTable(spark, docs, plantedAll, dir,
      fixtureName, fixtureTag)()
    val candidates = lifecycleTrigramCandidates(spark, path,
      needles, conjunctive)
    // bounded probe: take cap+1 — the driver sees at most cap+1 ids,
    // never the full candidate set, whatever the needles' selectivity
    val probe = candidates.limit(cap + 1)
      .collect().map(_.getLong(0))
    val qv = plantedAll.filter(col("doc_id") === queryId)
      .withColumn("embedding", embed(col("text")))
      .select(col("embedding").as("qvec"))
    verifiedTop5(cappedCandidateFetch(docs.unionByName(plantedAll),
      candidates, probe, cap), needles, conjunctive, qv, dim = dim)
  }

  /** One ResultCache tag per lifecycle posting table — bumping a tag
    * rebuilds the table in place (the same-path-new-layout migration
    * the static fixture's retirement rode). */
  private val WhereContainsPostingsTag =
    "trigram:n=3:planted=wherecontains:lc:v1"
  private val WhereContainsAndPostingsTag =
    "trigram:n=3:planted=wherecontains_and:lc:v1"

  /** The all-trigrams candidate gate over a posting frame, shared by
    * the indexed serves AND [[org.apache.spark.sql.graft.
    * ContainsRewriteRule]] (one definition, so index-side and
    * rule-side gating cannot drift): docs carrying EVERY trigram of
    * each needle (ALL gates for a conjunction, ANY for a disjunction).
    * PLANNER-SAFE formulation — an explicit (doc_id, tg) AGGREGATE to
    * dedup, then plain conditional sums: an optimizer-injected plan is
    * built AFTER the batches that rewrite distinct aggregates and
    * replace Deduplicate with Aggregate have already run, so either a
    * multi-countDistinct or a .distinct() here would reach physical
    * planning unrewritten and fail with an internal error
    * (spec-pinned: the rule's multi-needle conjunct must execute). */
  def trigramGateFrame(postings: DataFrame, needles: Seq[String],
      conjunctive: Boolean = true,
      assumeDistinct: Boolean = false): DataFrame = {
    // per-needle VARIANT sets (see needleTrigramVariants): a needle is
    // "maybe present" when the doc carries EVERY trigram of at least ONE
    // lowering variant — gating on a single lowering would lose the
    // superset property on any JVM whose default locale diverges from
    // the ASCII fast path (tr/az/lt: the scan route matches a doc the
    // index route silently drops)
    val variantSets = needles.map(needleTrigramVariants)
    val allTgs = variantSets.flatten.flatten.distinct
    val gates = variantSets.zipWithIndex.flatMap { case (vs, i) =>
      vs.zipWithIndex.map { case (tgs, j) =>
        sum(when(col("tg").isin(tgs: _*), 1).otherwise(0)).as(s"n_tg${i}_$j")
      }
    }
    val probed = postings.filter(col("tg").isin(allTgs: _*))
    // `assumeDistinct = true` skips the dedup aggregate (one exchange,
    // measured ~0.4 s/serve at sf0.1) — valid for every ENGINE-built
    // posting table: trigramPostingsFrame array_distincts per doc, each
    // doc lands in exactly one write (the upsert's stale generation is
    // excluded before gating), and overwrite/rewrite paths rebuild
    // whole. The optimizer rule keeps the dedup: an arbitrary
    // REGISTERED table carries no such guarantee, and duplicate
    // postings would overshoot the all-trigrams gate and silently drop
    // true matches.
    val base =
      if (assumeDistinct) probed.select("doc_id", "tg")
      else probed
        .groupBy(col("doc_id"), col("tg")).agg(count(lit(1)).as("dup_n"))
    base.groupBy("doc_id").agg(gates.head, gates.tail: _*)
      .filter(variantSets.zipWithIndex.map { case (vs, i) =>
        vs.zipWithIndex.map { case (tgs, j) =>
          col(s"n_tg${i}_$j") === tgs.size }.reduce(_ || _) }
        .reduce((a, b) => if (conjunctive) a && b else a || b))
      .select("doc_id")
  }

  /** The needle's trigrams under EVERY lowering the probe must cover —
    * the union of [[needleTrigramVariants]]. This is the PROBE set (the
    * pushed `In(tg, …)` and the bucket prune); the gate itself counts
    * per VARIANT (see [[trigramGateFrame]]). */
  def needleTrigrams(needle: String): Seq[String] =
    needleTrigramVariants(needle).flatten.distinct

  /** Spark's OWN lowering of a driver-side string — the exact value
    * `lower(lit(s))` produces, by evaluating the same UTF8String code
    * the index writer codegens (the [[trigramBucketsOf]] zero-drift
    * technique applied to lowering). */
  private[graft] def sparkLower(s: String): String =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)
      .toLowerCase.toString

  /** One trigram set per LOWERING PATH a containing document can take:
    * Spark's `lower()` (UTF8String.toLowerCase, 4.1.2) lowers an
    * ALL-ASCII string through a locale-free fast path but any string
    * containing a non-ASCII byte through `String.toLowerCase()` with
    * the DEFAULT locale of WHICHEVER JVM runs the task — so the SAME
    * needle occurrence lowers differently depending on the rest of the
    * doc's text ('I' → 'i' inside an ASCII doc, 'I' → '\u0131' inside
    * a non-ASCII doc on a tr-default executor), and the index side's
    * locale is the EXECUTOR's, never reliably the driver's. No single
    * needle lowering matches every path, so the needle enumerates the
    * CLOSED set of lowerings a doc can take (see the body: ASCII fast
    * path + the ROOT/tr/lt slow-path family — Java lowercase
    * special-cases exactly those locales). [[trigramGateFrame]] passes
    * a needle when ANY variant fully matches, so the gate's SUPERSET
    * property holds whatever locale any executor (or the driver) runs
    * under — deriving one variant from Locale.ROOT (the r19
    * formulation) silently dropped docs the scan route matches on a
    * tr-default JVM. A needle any of whose lowered variants is shorter
    * than one trigram refuses loudly (an empty variant would
    * gate-match EVERY doc; short needles belong on the scan route). */
  private[graft] def needleTrigramVariants(
      needle: String): Seq[Seq[String]] = {
    // The CLOSED variant set: a document lowers on whichever EXECUTOR
    // writes its postings, so the needle cannot assume any particular
    // default locale — not even the driver's (a cluster does not
    // propagate it). But `String.toLowerCase(locale)` special-cases
    // exactly the tr/az pair (dotted/dotless I) and lt (combining dots
    // over accented I/J); every other locale lowers identically to
    // Locale.ROOT. Enumerating those three therefore covers the slow
    // path under EVERY possible executor default locale, and
    // sparkLower covers the ASCII fast path (for ASCII needles it
    // equals the ROOT lowering, so the set stays minimal). Extra
    // variants only widen the gate's OR — superset-safe; a MISSING
    // variant is the silent-drop hazard.
    val lowered = (sparkLower(needle) +: Seq(java.util.Locale.ROOT,
        java.util.Locale.forLanguageTag("tr"),
        java.util.Locale.forLanguageTag("lt"))
      .map(needle.toLowerCase)).distinct
    lowered.foreach { l =>
      require(l.codePoints().count() >= 3,
        "trigram route needs needles of >= 3 lowered code points, got " +
          s"'$needle' — serve short needles through the contains scan " +
          "instead")
      // BOUNDARY GUARD: Java's tr/az After_I context rule DELETES a
      // combining dot above (U+0307) that follows 'I' — context the
      // needle cannot see across its own left boundary. A needle whose
      // lowered form LEADS with U+0307 would enumerate trigrams a
      // tr-executor doc (where a preceding 'I' consumed the dot) never
      // wrote, silently breaking the superset property — the one
      // cross-boundary case the closed variant set cannot cover (the
      // other context rules either fold here — Final_Sigma — or are
      // covered by the ROOT variant). Refuse loudly; the scan route
      // serves such needles exactly.
      require(l.codePoints().findFirst().getAsInt != 0x307,
        "trigram route cannot gate a needle whose lowered form leads " +
          s"with combining dot above (U+0307), got '$needle' — the " +
          "tr/az After_I rule makes its postings context-dependent " +
          "across the match boundary; serve it through the contains " +
          "scan instead")
    }
    lowered.map(trigramsOfLowered).distinct
  }

  /** Trigram enumeration of an already-lowered string, over CODE POINTS
    * (Spark's substr/length count code points, not UTF-16 units — a
    * supplementary-plane char must be ONE symbol on both sides or the
    * probe's trigrams misalign with the posting lists). SIGMA FOLD
    * first, on BOTH sides (see [[trigramPostingsFrame]]): Java/Spark
    * lowercase applies Unicode Final_Sigma context-sensitively —
    * "ΡΟΣ" lowers to final ς as a needle but to medial σ inside a
    * longer doc — so unfolded trigrams would break the gate's SUPERSET
    * property and silently drop true matches. */
  private def trigramsOfLowered(lowered: String): Seq[String] = {
    val cps = lowered.replace('\u03c2', '\u03c3').codePoints().toArray
    (0 to cps.length - 3).map(i => new String(cps, i, 3)).distinct
  }

  /** The trigram index job: full lowercased trigram enumeration per
    * (doc_id, text), deduped. Enumerate over the LOWERED string's OWN
    * length: lowercasing can CHANGE length (İ → i + combining dot), and
    * sequencing over the original text's length would drop the lowered
    * text's trailing trigrams — a doc the scan route matches would then
    * fail the all-trigrams gate and silently vanish from the indexed
    * route (regression spec feeds a length-changing doc). */
  private[graft] def trigramPostingsFrame(docs: DataFrame): DataFrame =
    docs
      // sigma fold after lowering — the needle side folds identically
      // (see needleTrigrams); without it a Greek needle's final-ς
      // trigram misses the doc's medial-σ posting and the gate loses
      // its superset property
      .select(col("doc_id"),
        translate(lower(col("text")), "\u03c2", "\u03c3").as("lt"))
      .filter(length(col("lt")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, length(lt) - 2), " +
          "i -> substr(lt, i, 3))"))).as("tg"))

  // ---- trigram posting index LIFECYCLE ----
  //
  // The static fixture above serves an immutable corpus; a 100 TB
  // substring index must ride the same append/delete/forget discipline
  // the vector indexes do — a deleted or forgotten doc must STOP
  // serving from the posting index the moment its delete commits, and
  // its posting bytes must be physically reclaimable. The lifecycle
  // table below shares ALL of the MaxSim posting machinery (one
  // resolution dispatch, one tombstone semantics, one reclaim core):
  // `_table_manifest` CAS-published appends, `_tombstones_log` composed
  // deletes, `Forget.reclaimTable` physical reclamation.

  /** Hash-bucket count for the lifecycle posting layout: `tb =
    * xxhash64(tg) mod 16` partitions, so an APPEND's postings land in
    * exactly the partitions a probe for those trigrams will look in
    * (the LSH append discipline), and a probe prunes to |needle|
    * buckets without any global re-sort. The static fixture's
    * range-by-tg layout cannot absorb appends — new trigrams would
    * straddle its sorted file boundaries. */
  private[graft] val TrigramBuckets = 16

  /** The lifecycle posting writer: trigram postings bucketed by tb.
    * `append` on a manifest-versioned table publishes exactly the
    * files this write added through a bounded CAS commit — manifest
    * readers flip atomically, and a crashed append's orphan files stay
    * invisible until vacuumed ([[graft.ops.LateInteraction.writePostings]]
    * is the same shape for the window-hash index). */
  private[graft] def writeTrigramPostings(docs: DataFrame, path: String,
      mode: String, seq: Long = -1L): Unit = {
    val spark = docs.sparkSession
    val base = trigramPostingsFrame(docs)
      .withColumn("tb",
        pmod(xxhash64(col("tg")), lit(TrigramBuckets.toLong)).cast("int"))
    // seq >= 0 stamps the commit generation — the upsert watermark's
    // target column, exactly as the MaxSim posting writer stamps it
    val frame = if (seq >= 0L) base.withColumn("seq", lit(seq)) else base
    val md = LateInteraction.tableManifestDir(path)
    val manifested = mode == "append" &&
      LateInteraction.probeTableDir(spark, path).hasManifest &&
      graft.ingest.ManifestLog.currentVersion(spark, md) > 0L
    val before = if (manifested)
      LateInteraction.leafFilesAny(spark, path).toSet else Set.empty[String]
    // sort by tg INSIDE each bucket: the probe's pushed In(tg, …) then
    // prunes whole row groups off footer stats instead of decoding the
    // bucket's full posting list (measured 2.4–3.2 s → ~1 s warm at
    // sf0.1 on the deleted-lifecycle serve)
    frame.repartition(col("tb")).sortWithinPartitions("tg")
      .write.mode(mode).partitionBy("tb").parquet(path)
    if (manifested) {
      val added =
        (LateInteraction.leafFilesAny(spark, path).toSet -- before)
          .toSeq.sorted
      if (added.nonEmpty)
        LateInteraction.tableManifestCommitBounded(spark, path,
          head => (head ++ added).distinct)
    }
  }

  /** The needle's posting buckets, computed by evaluating SPARK'S OWN
    * `XxHash64` Catalyst expression on the driver (interpreted eval of
    * the exact expression the index writer codegens — zero drift by
    * construction, including the seed-42 default the `xxhash64`
    * function uses) so the probe can never disagree with the writer's
    * bucketing, WITHOUT paying a Spark job per serve: a per-query
    * local-relation job is scheduler overhead the fleet-QPS serve path
    * should not carry, and a hand-rolled reimplementation of the hash
    * would silently probe empty partitions on any algorithm drift. */
  private[graft] def trigramBucketsOf(tgs: Seq[String]): Seq[Int] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    tgs.map { t =>
      val h = new XxHash64(
        Seq(Literal.create(org.apache.spark.unsafe.types.UTF8String
          .fromString(t), org.apache.spark.sql.types.StringType)), 42L)
        .eval(null).asInstanceOf[Long]
      (((h % TrigramBuckets) + TrigramBuckets) % TrigramBuckets).toInt
    }.distinct
  }

  /** Build-once LIFECYCLE posting table over a planted corpus — the ONE
    * builder every trigram route resolves through (r19 served the
    * explicit/auto/rewritten routes from an immutable range-by-tg
    * fixture while the manifest-versioned table sat beside it; at
    * 100 TB there is ONE posting table and it mutates, so a route that
    * read a frozen layout would serve deleted docs the moment the
    * corpus churned). The build IS the lifecycle: the naturals'
    * postings land as the base table, the manifest ADOPTS the current
    * leaves (v1 — the reclaimTable step-1 shape), the planted groups
    * arrive through the APPEND path (CAS-published: a reader mid-append
    * sees the old head, never half a write), then any composed deletes
    * commit to the `_tombstones_log`. Each driver row's corpus STATE
    * (pre-delete, post-delete, post-reclaim) is one such table — in
    * production they are the same table at successive manifest
    * versions; ResultCache snapshots are immutable, so each state
    * builds once under its own tag. */
  private def lifecycleTrigramTable(spark: SparkSession, docs: DataFrame,
      plantedAll: DataFrame, dir: String, name: String, tag: String,
      deletes: Seq[Long] = Nil)(afterBuild: String => Unit = _ => ())
      : String = {
    val path = Tables.scratchPath(name, dir)
    ResultCache.buildIfAbsent(spark, docs, tag, path) {
      writeTrigramPostings(docs, path, "overwrite")
      graft.ingest.ManifestLog.commit(spark,
        LateInteraction.tableManifestDir(path),
        _ => LateInteraction.leafFilesAny(spark, path))
      writeTrigramPostings(plantedAll, path, "append")
      if (deletes.nonEmpty)
        LateInteraction.composeDelete(spark, path, deletes)
      afterBuild(path)
    }
    path
  }

  /** The tombstone-and-forget-RESOLVED candidate gate over a lifecycle
    * posting table — the ONE read path every indexed `$contains` route
    * goes through, so the resolution discipline (manifest head pins the
    * live file set, composed deletes and upsert watermarks exclude at
    * read, the forget conf arms by default) cannot drift between the
    * explicit serve, the measured router, and the `$not_contains`
    * inversion. ONE directory listing resolves all sidecar/log/manifest
    * state ([[LateInteraction.probeTableDir]]); the probe prunes to the
    * needles' hash buckets via driver-side Catalyst `XxHash64` eval
    * (zero drift from the writer, no per-serve job) and pushes
    * `In(tg, …)` into the pruned partitions, where postings are sorted
    * by `tg` so row groups prune off footer stats. */
  private[graft] def lifecycleTrigramCandidates(spark: SparkSession,
      path: String, needles: Seq[String],
      conjunctive: Boolean = true): DataFrame = {
    val st = LateInteraction.probeTableDir(spark, path)
    val (sidecar, _) = LateInteraction.tombstoneStateWith(spark, path, st)
    lifecycleTrigramCandidatesWith(spark, path, st, sidecar,
      needles, conjunctive)
  }

  /** [[lifecycleTrigramCandidates]] over a PRE-PAID directory probe —
    * the hoisted form the delete-lifecycle routes use, so ONE listing
    * serves both the posting resolution and the corpus-side tombstone
    * exclusion (FsProbes-spec-pinned). */
  private[graft] def lifecycleTrigramCandidatesWith(spark: SparkSession,
      path: String, st: LateInteraction.TableDirState,
      sidecar: Option[(DataFrame, Boolean)], needles: Seq[String],
      conjunctive: Boolean = true): DataFrame = {
    val buckets = trigramBucketsOf(needles.flatMap(needleTrigrams).distinct)
    trigramGateFrame(
      Forget.defaultExclusion(
        LateInteraction.minusTombstonedWith(
          LateInteraction.tableDataWith(spark, path, st), sidecar),
        "doc_id")
        .filter(col("tb").isin(buckets: _*)),   // partition-pruned
      needles, conjunctive, assumeDistinct = true) // pushed In(tg, …) gate
  }

  private val WhereContainsDeletedId = 320002L

  /** The delete-lifecycle serve, SCAN route: the composed delete is
    * already committed in the store's `_tombstones_log`; the corpus
    * excludes the tombstoned doc (one CAS-log read) and the conf-keyed
    * forget exclusion, then the `$contains` filter and k-NN run as in
    * [[knnWhereContains]]. Query = B's surviving copy 320000; answer =
    * B minus the deleted 320002 — FOUR rows, so a tombstone leak on
    * either route surfaces as a fifth row (or the wrong fourth). */
  def knnWhereContainsDeleted(spark: SparkSession, dir: String): DataFrame =
    whereContainsDeletedRoute(spark, dir, indexed = false)

  /** The delete-lifecycle serve, TRIGRAM route — the row VERDICT r18
    * queued: the posting table resolves through its `_table_manifest`
    * head (appends were CAS-published), the tombstone state excludes
    * the deleted doc's postings AT READ (posting files are immutable;
    * [[graft.ops.Forget.reclaimPostings]]-style reclamation folds them
    * physically later), and the forget conf arms on the posting side —
    * so a deleted OR forgotten doc stops serving from the substring
    * index exactly as it does from every ANN family. Answer contract:
    * IDENTICAL to [[knnWhereContainsDeleted]]; both routes share one
    * replayed oracle (the router discipline). */
  def knnWhereContainsDeletedIndexed(spark: SparkSession,
      dir: String): DataFrame =
    whereContainsDeletedRoute(spark, dir, indexed = true)

  /** Both delete-lifecycle routes over the shared manifest-versioned
    * fixture. The fixture build IS the lifecycle: naturals' postings
    * as the base table, manifest ADOPTED (v1 = current leaves, the
    * reclaimTable step-1 shape), the planted groups' postings arriving
    * through the APPEND path (CAS-published — a reader mid-append sees
    * the old head, never half a write), then ONE composed delete. ONE
    * `listStatus` resolves sidecar/log/manifest state for BOTH the
    * posting table and the corpus exclusion (FsProbes-spec-pinned). */
  private[graft] def whereContainsDeletedRoute(spark: SparkSession,
      dir: String, indexed: Boolean,
      cap: Int = WhereContainsPushdownCap): DataFrame = {
    val dim = 256
    val needle = "zzbb"
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val (docs, plantedAll) = whereContainsCorpus(spark, dir)
    val path = lifecycleTrigramTable(spark, docs, plantedAll, dir,
      "trigram_postings_lc", "trigram:n=3:lifecycle=delete:v3",
      deletes = Seq(WhereContainsDeletedId))()
    val st = LateInteraction.probeTableDir(spark, path)
    val (sidecar, _) = LateInteraction.tombstoneStateWith(spark, path, st)
    // route symmetry: the SAME exclusion (tombstones + forget conf)
    // rides the corpus on both routes and the postings on the indexed
    // one — a route-dependent exclusion would answer differently per
    // plan, exactly what the shared oracle exists to catch. The CORPUS
    // side goes through the corpus-shaped dispatch (minusIdTombstoned):
    // the posting-shaped anti-join references a `seq` column a corpus
    // does not carry, so it would throw the moment this table's
    // sidecar turned watermark-shaped (delete composed onto an
    // upserted store) — id-level deletes and full composed deletes
    // drop, finite upsert watermarks keep the doc (whose replacement
    // text the corpus carries), exactly the brute-arm contract the
    // MaxSim router pins.
    val corpus = Forget.defaultExclusion(
      LateInteraction.minusIdTombstoned(docs.unionByName(plantedAll),
        sidecar), "doc_id")
    val survivors =
      if (!indexed) corpus.filter(col("text").contains(needle))
      else {
        val candidates = lifecycleTrigramCandidatesWith(spark, path, st,
          sidecar, Seq(needle))
        val probe = candidates.limit(cap + 1).collect().map(_.getLong(0))
        cappedCandidateFetch(corpus, candidates, probe, cap)
          .filter(col("text").contains(needle))
      }
    val qv = plantedAll.filter(col("doc_id") === 320000L)
      .withColumn("embedding", embed(col("text")))
      .select(col("embedding").as("qvec"))
    rankedTop5(survivors.withColumn("embedding", embed(col("text"))), qv)
  }

  /** The MEASURED ROUTER fronting the post-delete LIFECYCLE table — the
    * row r19's verdict queued: r19's router priced and served the
    * immutable fixture, so the moment the corpus churned it would have
    * kept serving deleted docs. Here the probe, the price, and the
    * serve all resolve through the SAME tombstone-aware read path
    * ([[lifecycleTrigramCandidatesWith]]): the composed delete excludes
    * the doc from the candidate probe AND from both serve arms' corpus,
    * so whichever arm the measurement picks, the deleted doc cannot
    * serve. Answer contract: IDENTICAL to [[knnWhereContainsDeleted]] —
    * all three delete-lifecycle routes (scan, explicit index, measured)
    * share one replayed oracle. */
  def knnWhereContainsDeletedAutoRoute(spark: SparkSession,
      dir: String): DataFrame = {
    val needle = "zzbb"
    val dim = 256
    val cap = WhereContainsPushdownCap
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val (docs, plantedAll) = whereContainsCorpus(spark, dir)
    val path = lifecycleTrigramTable(spark, docs, plantedAll, dir,
      "trigram_postings_lc", "trigram:n=3:lifecycle=delete:v3",
      deletes = Seq(WhereContainsDeletedId))()
    val st = LateInteraction.probeTableDir(spark, path)
    val (sidecar, _) = LateInteraction.tombstoneStateWith(spark, path, st)
    val candidates = lifecycleTrigramCandidatesWith(spark, path, st,
      sidecar, Seq(needle))
    // bounded cap+1 probe = the price AND (below cap) the fetch list
    val probe = candidates.limit(cap + 1).collect().map(_.getLong(0))
    val corpusDocs = corpusDocsOf(spark, dir)
    val indexed = BigInt(probe.length) * BigInt(2) < BigInt(corpusDocs)
    RouteLog.record("where_contains_deleted",
      if (indexed) "trigram" else "scan")
    // BOTH arms serve the post-delete store: the corpus-side exclusion
    // (id tombstones + forget conf) is route-independent, so the
    // measured choice can never change the answer
    val corpus = Forget.defaultExclusion(
      LateInteraction.minusIdTombstoned(docs.unionByName(plantedAll),
        sidecar), "doc_id")
    val survivors =
      if (!indexed) corpus.filter(col("text").contains(needle))
      else cappedCandidateFetch(corpus, candidates, probe, cap)
        .filter(col("text").contains(needle))
    val qv = plantedAll.filter(col("doc_id") === 320000L)
      .withColumn("embedding", embed(col("text")))
      .select(col("embedding").as("qvec"))
    rankedTop5(survivors.withColumn("embedding", embed(col("text"))), qv)
  }

  /** PHYSICAL reclamation of the trigram substring index — the
    * compliance half the delete lifecycle's read-time exclusion
    * defers: [[graft.ops.Forget.reclaimTable]] folds the composed
    * delete INTO the posting files (rewrite minus the tombstoned doc,
    * published as ONE `_table_manifest` CAS commit, folded log lines
    * consumed, unreferenced files vacuumed) — after it, the deleted
    * doc's posting BYTES are gone from every live file, not merely
    * unread (spec-pinned by scanning the raw live files). The serve is
    * the plain indexed route over the reclaimed table; the answer must
    * be UNCHANGED by reclamation, so this row shares the delete
    * lifecycle's replayed oracle. Same reclaim core as the MaxSim
    * posting index and the export table (`partitionCols = tb` here) —
    * one crash-recovery matrix for every reclaimed shape. */
  def knnWhereContainsReclaimed(spark: SparkSession,
      dir: String): DataFrame = {
    val needle = "zzbb"
    val dim = 256
    val cap = WhereContainsPushdownCap
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val (docs, plantedAll) = whereContainsCorpus(spark, dir)
    val path = lifecycleTrigramTable(spark, docs, plantedAll, dir,
      "trigram_postings_rc", "trigram:n=3:lifecycle=reclaim:v1",
      deletes = Seq(WhereContainsDeletedId)) { p =>
      // the physical fold: an empty forget ledger — the composed
      // delete alone drives the rewrite, exactly the GDPR-erasure
      // flow after a store-side delete
      Forget.reclaimTable(spark,
        Tables.scratchPath("trigram_rc_ledger", dir), p,
        partitionCols = Seq("tb"))
    }
    val candidates = lifecycleTrigramCandidates(spark, path, Seq(needle))
    val probe = candidates.limit(cap + 1).collect().map(_.getLong(0))
    // the store text (reclaim rewrote the INDEX; candidate fetch is by
    // id, and the reclaimed doc can never be a candidate — its postings
    // are physically absent, not excluded at read)
    val qv = plantedAll.filter(col("doc_id") === 320000L)
      .withColumn("embedding", embed(col("text")))
      .select(col("embedding").as("qvec"))
    verifiedTop5(cappedCandidateFetch(docs.unionByName(plantedAll),
      candidates, probe, cap), Seq(needle), conjunctive = true, qv, dim = dim)
  }

  /** EXACTLY-ONCE streaming maintenance for the trigram substring index
    * — the last lifecycle surface the ANN families have that the text
    * index lacked: micro-batches of arriving documents stage their
    * postings into DETERMINISTIC per-batch directories
    * (`batch=<id>/tb=<bucket>`, overwrite — the
    * `IndexBuilder.stageLshBatch` discipline), and the batch that
    * delivered the planted groups is REPLAYED, the at-least-once
    * delivery every foreachBatch sink sees after a crash. Because the
    * replay rewrites `batch=1` instead of appending, each posting
    * exists exactly once — and this serve's gate counts RAW posting
    * rows (not distinct trigrams: per-doc postings are distinct by
    * construction, so the counts agree on a correct store), which
    * makes it the duplicate WITNESS: an append-mode regression doubles
    * the count past the all-trigrams gate, the candidate set empties,
    * and the row loses B wholesale against the shared replayed oracle.
    * Same answer, same oracle as [[knnWhereContains]]. */
  def knnWhereContainsStreamed(spark: SparkSession,
      dir: String): DataFrame = {
    val dim = 256
    val needle = "zzbb"
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val (docs, plantedAll) = whereContainsCorpus(spark, dir)
    val root = Tables.scratchPath("trigram_postings_stream", dir)
    ResultCache.buildIfAbsent(spark, docs,
      "trigram:n=3:lifecycle=stream:v2", root) {
      stageTrigramBatch(docs, root, 0L)
      stageTrigramBatch(plantedAll, root, 1L)
      // crash replay: same rows, same batch id, second delivery
      stageTrigramBatch(plantedAll, root, 1L)
    }
    // RAW-count witness PER VARIANT (needleTrigrams is the UNION of
    // lowering variants — demanding the union's size at once would
    // re-introduce exactly the locale drift the variant gate fixes):
    // per-doc postings are distinct by construction, so a correct
    // store matches exactly one variant's full size, while an
    // append-mode replay DOUBLES every count past every variant gate
    val variants = needleTrigramVariants(needle)
    val allTgs = variants.flatten.distinct
    val buckets = trigramBucketsOf(allTgs)
    val gates = variants.zipWithIndex.map { case (v, i) =>
      sum(when(col("tg").isin(v: _*), 1).otherwise(0)).as(s"n_tg$i") }
    val candidates = spark.read.parquet(root)
      .filter(col("tb").isin(buckets: _*))   // pruned across batch dirs
      .filter(col("tg").isin(allTgs: _*))
      .groupBy("doc_id").agg(gates.head, gates.tail: _*) // raw rows
      .filter(variants.zipWithIndex.map { case (v, i) =>
        col(s"n_tg$i") === v.size }.reduce(_ || _))
      .select("doc_id")
    val probe = candidates.limit(WhereContainsPushdownCap + 1)
      .collect().map(_.getLong(0))
    val qv = plantedAll.filter(col("doc_id") === 300000L)
      .withColumn("embedding", embed(col("text")))
      .select(col("embedding").as("qvec"))
    verifiedTop5(cappedCandidateFetch(docs.unionByName(plantedAll),
      candidates, probe, WhereContainsPushdownCap),
      Seq(needle), conjunctive = true, qv, dim = dim)
  }

  /** UPSERT lifecycle for the trigram substring index — the
    * re-ingest-a-changed-document flow, under the same WATERMARK
    * discipline the MaxSim posting index uses: posting files are
    * immutable, so the replacement's postings APPEND at a higher
    * commit generation (`seq = 1`) and a `(t_doc_id, upto_seq)`
    * watermark sidecar kills exactly the STALE generation (`seq <= 0`)
    * at read — an id-level tombstone would kill the replacement too,
    * which the spec pins by probing the NEW content's needle. Doc
    * 320002's text is re-ingested with `zzbb` replaced by `zzdd`: the
    * `zzbb` serve loses it (four rows), while its new postings serve
    * `zzdd` — both facts only hold if the watermark semantics are
    * exact on BOTH the posting and the corpus side. Oracle replays the
    * replacement route-independently. */
  def knnWhereContainsUpserted(spark: SparkSession,
      dir: String): DataFrame = {
    val dim = 256
    val needle = "zzbb"
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val (docs, plantedAll) = whereContainsCorpus(spark, dir)
    val replaced = plantedAll.filter(col("doc_id") === 320002L)
      .select(col("doc_id"),
        regexp_replace(col("text"), "zzbb", "zzdd").as("text"))
    val path = Tables.scratchPath("trigram_postings_up", dir)
    import spark.implicits._
    ResultCache.buildIfAbsent(spark, docs,
      "trigram:n=3:lifecycle=upsert:v2", path) {
      writeTrigramPostings(docs.unionByName(plantedAll), path,
        "overwrite", seq = 0L)
      // the upsert: new generation appends, watermark kills the old
      writeTrigramPostings(replaced, path, "append", seq = 1L)
      Seq((320002L, 0L)).toDF("t_doc_id", "upto_seq")
        .write.mode("overwrite").parquet(path + "/_tombstones")
    }
    val buckets = trigramBucketsOf(needleTrigrams(needle))
    val candidates = trigramGateFrame(
      LateInteraction.resolvedPostings(spark, path)
        .filter(col("tb").isin(buckets: _*)),
      Seq(needle), assumeDistinct = true)
    val probe = candidates.limit(WhereContainsPushdownCap + 1)
      .collect().map(_.getLong(0))
    // the corpus carries the REPLACEMENT text (the store after upsert)
    val corpus = docs
      .unionByName(plantedAll.filter(col("doc_id") =!= 320002L))
      .unionByName(replaced)
    val qv = plantedAll.filter(col("doc_id") === 300000L)
      .withColumn("embedding", embed(col("text")))
      .select(col("embedding").as("qvec"))
    verifiedTop5(cappedCandidateFetch(corpus, candidates, probe,
      WhereContainsPushdownCap), Seq(needle), conjunctive = true, qv, dim = dim)
  }

  /** Replayed upsert oracle: apply the replacement to the rebuilt
    * corpus, then the contains clause — route-independent, so a stale
    * generation leaking through the watermark (or the replacement
    * dying to an id-level mistake) breaks the compare. */
  private val knnWhereContainsUpsertedSql =
    """WITH base AS (SELECT text FROM documents WHERE doc_id = 0),
      |a AS (SELECT CAST(300000 + r.range AS BIGINT) AS doc_id,
      |             b.text || ' zzaa' AS text
      |      FROM range(5) r, base b),
      |bb AS (SELECT CAST(320000 + r.range AS BIGINT) AS doc_id,
      |              b.text || ' zzaa zzbb' AS text
      |       FROM range(5) r, base b),
      |corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id, text FROM a
      |  UNION ALL SELECT doc_id, text FROM bb),
      |corpus2 AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id = 320002
      |              THEN replace(text, 'zzbb', 'zzdd') ELSE text END AS text
      |  FROM corpus),
      |cand AS (SELECT doc_id FROM corpus2 WHERE contains(text, 'zzbb'))
      |SELECT CAST(row_number() OVER (ORDER BY doc_id) AS INTEGER) AS rank,
      |       doc_id AS top_doc_id
      |FROM (SELECT doc_id FROM cand ORDER BY doc_id LIMIT 5)
      |ORDER BY rank""".stripMargin

  /** TIME TRAVEL on the trigram substring index — the manifest-pinned
    * version read the MaxSim index has (`maxsim_time_travel_topk`):
    * appended postings share the v1 files' `tb=` directories, so ONLY
    * the manifest separates versions; serving version v reads exactly
    * v's file list (basePath-resolved, so `tb` partition pruning
    * survives the explicit file list). Both versions probe the SAME
    * query (group B's embedding): at v1 group B is not in the index —
    * the `zzaa` candidates are group A alone and the serve ranks A's
    * ids — while at v2 B's appended postings admit its 1.0 self-tie.
    * The answers are DISJOINT id ranges, so a torn read in either
    * direction (v2 files leaking into v1, or v2 missing the append)
    * flips whole groups against the enumerable oracle. */
  def knnWhereContainsTimeTravel(spark: SparkSession,
      dir: String): DataFrame = {
    import graft.ingest.ManifestLog
    val dim = 256
    val needle = "zzaa"
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val (docs, plantedAll) = whereContainsCorpus(spark, dir)
    val a = plantedAll.filter(col("doc_id") < 320000L)
    val b = plantedAll.filter(col("doc_id") >= 320000L)
    val path = Tables.scratchPath("trigram_postings_tt", dir)
    val log = LateInteraction.tableManifestDir(path)
    ResultCache.buildIfAbsent(spark, docs,
      "trigram:n=3:lifecycle=tt:v1", path) {
      writeTrigramPostings(docs.unionByName(a), path, "overwrite")
      ManifestLog.commit(spark, log,
        _ => LateInteraction.leafFilesAny(spark, path))
      // the append CAS-publishes v2 itself (writeTrigramPostings'
      // manifested-append arm) — new files, same tb= dirs
      writeTrigramPostings(b, path, "append")
    }
    val buckets = trigramBucketsOf(needleTrigrams(needle))
    val qv = b.filter(col("doc_id") === 320000L)
      .withColumn("embedding", embed(col("text")))
      .select(col("embedding").as("qvec"))
    def serveVersion(v: Long, corpusV: DataFrame): DataFrame = {
      val files = ManifestLog.read(spark, log, v).getOrElse(
        throw new java.io.IOException(s"missing posting manifest v$v"))
      val candidates = trigramGateFrame(
        spark.read.option("basePath", path).parquet(files: _*)
          .filter(col("tb").isin(buckets: _*)),
        Seq(needle), assumeDistinct = true)
      val probe = candidates.limit(WhereContainsPushdownCap + 1)
        .collect().map(_.getLong(0))
      verifiedTop5(cappedCandidateFetch(corpusV, candidates, probe,
        WhereContainsPushdownCap), Seq(needle), conjunctive = true, qv, dim = dim)
        .withColumn("version", lit(v))
    }
    serveVersion(1L, docs.unionByName(a))
      .unionByName(serveVersion(2L, docs.unionByName(plantedAll)))
      .select("version", "rank", "top_doc_id")
      .orderBy("version", "rank")
  }

  /** v1 (B unindexed) serves A's ids against B's own query; v2's
    * appended postings flip the whole answer to B's self-tie. */
  private val knnWhereContainsTimeTravelSql =
    """WITH rows AS (
      |  SELECT CAST(1 AS BIGINT) AS version,
      |         CAST(r.range + 1 AS INTEGER) AS rank,
      |         CAST(300000 + r.range AS BIGINT) AS top_doc_id
      |  FROM range(5) r
      |  UNION ALL
      |  SELECT CAST(2 AS BIGINT), CAST(r.range + 1 AS INTEGER),
      |         CAST(320000 + r.range AS BIGINT)
      |  FROM range(5) r)
      |SELECT version, rank, top_doc_id FROM rows
      |ORDER BY version, rank""".stripMargin

  /** COMPACTION — the small-files half of the trigram lifecycle
    * (`maxsim_compacted_topk`'s discipline): each append accretes a
    * file set inside every `tb=` bucket it touches, so a long-lived
    * substring index degrades to many tiny posting files per bucket
    * and the probe's footer-stat pruning loses its leverage. The
    * compactor rewrites the table as ONE distinct-deduped, tg-sorted
    * file per bucket; the serve is answer-identical because the gate
    * reads (doc_id, tg) CONTENT, not file layout — the same replayed
    * oracle as the build-at-once row proves it, and the spec pins the
    * one-file-per-bucket layout. */
  def knnWhereContainsCompacted(spark: SparkSession,
      dir: String): DataFrame = {
    val dim = 256
    val needle = "zzbb"
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val (docs, plantedAll) = whereContainsCorpus(spark, dir)
    val path = Tables.scratchPath("trigram_postings_cmp", dir)
    ResultCache.buildIfAbsent(spark, docs,
      "trigram:n=3:lifecycle=compact:v1", path) {
      val staged = path + ".staged"
      writeTrigramPostings(docs, staged, "overwrite")   // base build
      writeTrigramPostings(plantedAll, staged, "append") // arrivals
      // compact: repartition on tb co-locates each bucket in one task
      // (one file per leaf), tg-sort restores row-group pruning
      spark.read.parquet(staged)
        .distinct()
        .repartition(col("tb")).sortWithinPartitions("tg")
        .write.mode("overwrite").partitionBy("tb").parquet(path)
      val sp = new org.apache.hadoop.fs.Path(staged)
      sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(sp, true)
    }
    val candidates = lifecycleTrigramCandidates(spark, path, Seq(needle))
    val probe = candidates.limit(WhereContainsPushdownCap + 1)
      .collect().map(_.getLong(0))
    val qv = plantedAll.filter(col("doc_id") === 300000L)
      .withColumn("embedding", embed(col("text")))
      .select(col("embedding").as("qvec"))
    verifiedTop5(cappedCandidateFetch(docs.unionByName(plantedAll),
      candidates, probe, WhereContainsPushdownCap),
      Seq(needle), conjunctive = true, qv, dim = dim)
  }

  /** SHARDED scatter-gather on the substring index — the fleet shape
    * every other index family ends its matrix with
    * (`maxsim_sharded_topk`): each shard owns an id-hash slice of the
    * corpus with its OWN independently-built posting table; a query
    * fans out to every shard (gate + capped fetch + substring verify +
    * local scored top-5 against the shard's slice alone) and the
    * coordinator re-tops the union of per-shard top-5s. A doc's
    * postings live only in its own shard, so the union of shard
    * survivors equals the unsharded survivors, and the global re-top
    * is exact for any k ≤ per-shard k — the single-table row's
    * replayed oracle proves route equality. */
  def knnWhereContainsSharded(spark: SparkSession,
      dir: String): DataFrame = {
    val dim = 256
    val needle = "zzbb"
    val n = 2
    val cap = WhereContainsPushdownCap
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val (docs, plantedAll) = whereContainsCorpus(spark, dir)
    val corpus = docs.unionByName(plantedAll)
    val qv = plantedAll.filter(col("doc_id") === 300000L)
      .withColumn("embedding", embed(col("text")))
      .select(col("embedding").as("qvec"))
    val shardTops = (0 until n).map { shard =>
      val slice = corpus.filter(
        pmod(xxhash64(col("doc_id")), lit(n.toLong)) === shard.toLong)
      val path = Tables.scratchPath(s"trigram_postings_sh${shard}of$n", dir)
      ResultCache.buildIfAbsent(spark, docs,
        s"trigram:n=3:shard=$shard/$n:v1", path) {
        writeTrigramPostings(slice, path, "overwrite")
      }
      val candidates = lifecycleTrigramCandidates(spark, path, Seq(needle))
      val probe = candidates.limit(cap + 1).collect().map(_.getLong(0))
      scoredTop5(cappedCandidateFetch(slice, candidates, probe, cap)
        .filter(col("text").contains(needle))
        .withColumn("embedding", embed(col("text"))), qv)
    }
    // the gather: re-top the union of per-shard top-5s (k rows per
    // shard cross the coordinator, never a shard's candidate set) —
    // the same (score desc, id asc) ordering as every stage above
    rankTop5(shardTops.reduce(_ unionByName _)
      .orderBy(col("score").desc, col("doc_id").asc).limit(5))
  }

  /** One micro-batch of the streaming trigram index: deterministic
    * `batch=<id>` directory, overwrite — a replayed delivery rewrites
    * its own directory instead of duplicating postings. */
  private[graft] def stageTrigramBatch(docs: DataFrame, root: String,
      batchId: Long): Unit =
    trigramPostingsFrame(docs)
      .withColumn("tb",
        pmod(xxhash64(col("tg")), lit(TrigramBuckets.toLong)).cast("int"))
      .repartition(col("tb")).sortWithinPartitions("tg")
      .write.mode("overwrite").partitionBy("tb")
      .parquet(root + s"/batch=$batchId")

  /** Replayed delete-lifecycle oracle shared by both routes: rebuild
    * A∪B, apply the contains clause AND the committed delete, rank the
    * four survivors by id. */
  private val knnWhereContainsDeletedSql =
    """WITH base AS (SELECT text FROM documents WHERE doc_id = 0),
      |a AS (SELECT CAST(300000 + r.range AS BIGINT) AS doc_id,
      |             b.text || ' zzaa' AS text
      |      FROM range(5) r, base b),
      |bb AS (SELECT CAST(320000 + r.range AS BIGINT) AS doc_id,
      |              b.text || ' zzaa zzbb' AS text
      |       FROM range(5) r, base b),
      |corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id, text FROM a
      |  UNION ALL SELECT doc_id, text FROM bb),
      |cand AS (SELECT doc_id FROM corpus
      |         WHERE contains(text, 'zzbb') AND doc_id <> 320002)
      |SELECT CAST(row_number() OVER (ORDER BY doc_id) AS INTEGER) AS rank,
      |       doc_id AS top_doc_id
      |FROM (SELECT doc_id FROM cand ORDER BY doc_id LIMIT 5)
      |ORDER BY rank""".stripMargin

  /** The shared tail of every filtered-retrieval row: score survivors
    * against the broadcast query vector, keep the global top-5
    * (TakeOrderedAndProject — only k rows cross to the driver), rank
    * the 5 survivors (window over k rows, never the corpus). */
  private def rankedTop5(cand: DataFrame, qv: DataFrame): DataFrame =
    rankTop5(scoredTop5(cand, qv))

  /** The scoring half: global top-5 by (score desc, id asc) — ONE
    * definition of the ordering, shared by the single-table rows and
    * the sharded row's per-shard AND gather stages (three hand-rolled
    * copies of the tie-break would drift). */
  private def scoredTop5(cand: DataFrame, qv: DataFrame): DataFrame =
    cand.crossJoin(broadcast(qv))
      .withColumn("score", V.cosineUnit(col("embedding"), col("qvec")))
      .orderBy(col("score").desc, col("doc_id").asc).limit(5)
      .select(col("doc_id"), col("score"))

  /** The ranking half: window over the <= 5 survivors only. */
  private def rankTop5(top: DataFrame): DataFrame =
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
      .select(col("rank"), col("doc_id").as("top_doc_id"))

  /** The capped candidate fetch every trigram-gated serve shares: a
    * pushed `In(doc_id, …)` into the corpus scan below the cap (text
    * decodes from candidate row groups only), a distributed
    * shuffle_hash semi-join above it — NO broadcast: above the cap the
    * candidate set is by definition large, and broadcasting it would
    * materialize on the driver the exact unbounded list the cap
    * exists to prevent. ONE definition (the lifecycleTrigramTable
    * discipline): the cap arm and the fallback hint changed together
    * in r19/r20 and had grown eight hand-written copies. */
  private def cappedCandidateFetch(corpus: DataFrame,
      candidates: DataFrame, probe: Array[Long], cap: Int): DataFrame =
    if (probe.length <= cap)
      corpus.filter(col("doc_id").isin(probe.toSeq: _*))
    else corpus.join(candidates.hint("shuffle_hash"),
      Seq("doc_id"), "left_semi")

  /** The shared verify-and-rank tail: the original substring
    * conjunct(s) verify on the fetched candidates (the gate is a
    * superset — trigram co-occurrence admits false positives), then
    * embed + global top-5 against the broadcast query vector. */
  private def verifiedTop5(fetched: DataFrame, needles: Seq[String],
      conjunctive: Boolean, qv: DataFrame, dim: Int = 256): DataFrame = {
    // `dim` must match the dimension the caller embedded `qv` with —
    // callers pass their own local dim so the coupling is explicit
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    rankedTop5(fetched
      .filter(needles.map(n => col("text").contains(n))
        .reduce((a, b) => if (conjunctive) a && b else a || b))
      .withColumn("embedding", embed(col("text"))), qv)
  }

  /** Chroma's `where_document={"$not_contains": t}` — the complement
    * operator the store accepts next to `$contains`
    * (`query_rag_database.py`'s filter surface): candidates are the
    * documents whose text does NOT contain the term. The planted
    * construction makes the EXCLUSION load-bearing: the query is group
    * B's OWN embedding, and B (' zzaa zzbb') is exactly the set the
    * `zzbb` clause must exclude — a filter that silently no-ops (or
    * degenerates to `$contains`) serves B's 1.0 self-tie and flips the
    * whole answer. The survivors' top-5 is group A (' zzaa'): A shares
    * strictly more text with B than any natural doc (base + the zzaa
    * token), so its five identical copies outscore the naturals and
    * rank by id — spec-pinned in absolute terms at both SFs, since the
    * SQL oracle replays the FILTER, not the embedding-space ordering. */
  def knnWhereNotContains(spark: SparkSession, dir: String): DataFrame = {
    val dim = 256
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val (docs, plantedAll) = whereContainsCorpus(spark, dir)
    val corpus = docs.unionByName(plantedAll)
      .withColumn("embedding", embed(col("text")))
    val qv = corpus.filter(col("doc_id") === 320000L)
      .select(col("embedding").as("qvec"))
    rankedTop5(corpus.filter(ChromaFilter.whereDocument(
      Map("$not_contains" -> "zzbb"), col("text"))), qv)
  }

  /** [[knnWhereNotContains]] through the trigram index — with the
    * SELECTIVITY INVERSION the complement operator forces on the
    * router: the posting probe yields candidates C ⊇ true matches (the
    * trigram gate admits false positives), so the indexed plan is
    * "verify `contains` on C only, then ANTI-join the corpus against
    * the verified matches" — the index bounds the VERIFY work, and the
    * anti side is bounded by the probe cap, so its broadcast is safe
    * (unlike the contains row's above-cap arm, where broadcast would
    * materialize an unbounded set). Above the cap the inversion bites:
    * a common needle's C approaches the corpus, verifying it costs a
    * full scan anyway, and the SCAN route is the right plan — the
    * [[WhereContainsPushdownCap]] discipline inverted: the contains
    * row falls back to a distributed semi-join; this row falls back to
    * the plain `NOT contains` scan. Same answer either arm; same
    * replayed oracle as the scan sibling (the router discipline). */
  def knnWhereNotContainsIndexed(spark: SparkSession,
      dir: String): DataFrame =
    knnWhereNotContainsIndexedCapped(spark, dir, WhereContainsPushdownCap)

  /** Cap-parameterized body — the spec drives `cap = 0` to force the
    * inversion arm and pin route equality on it too. */
  private[graft] def knnWhereNotContainsIndexedCapped(spark: SparkSession,
      dir: String, cap: Int): DataFrame = {
    val dim = 256
    val needle = "zzbb"
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val (docs, plantedAll) = whereContainsCorpus(spark, dir)
    val path = lifecycleTrigramTable(spark, docs, plantedAll, dir,
      "trigram_postings_wc", WhereContainsPostingsTag)()
    val candidates = lifecycleTrigramCandidates(spark, path, Seq(needle))
    val probe = candidates.limit(cap + 1).collect().map(_.getLong(0))
    val corpus = docs.unionByName(plantedAll)
    // the inversion is a ROUTE choice — record it like every router
    // (boards carry a `routes` entry, so a silent arm flip is visible)
    RouteLog.record("where_not_contains",
      if (probe.length <= cap) "trigram_invert" else "scan")
    val survivors =
      if (probe.length <= cap) {
        // verify the substring on the ≤cap candidates only (pushed
        // In(doc_id, …) — text decodes from candidate row groups), then
        // anti-join the verified matches off the corpus; the anti side
        // is ≤ cap rows by construction, so broadcast is bounded
        val ids = probe.toSeq
        val matched = corpus.filter(col("doc_id").isin(ids: _*))
          .filter(col("text").contains(needle))
          .select("doc_id")
        // null-safe route equality: the scan arm's NOT contains drops
        // null-text rows (three-valued logic), and a null-text doc has
        // no postings so the anti-join alone would RETAIN it here —
        // filter it out to keep both arms (and the oracle) agreeing
        corpus.filter(col("text").isNotNull)
          .join(broadcast(matched), Seq("doc_id"), "left_anti")
      } else
        // the inversion: a common needle's candidate set approaches the
        // corpus — verifying it IS a scan, so run the scan route's plan
        corpus.filter(!col("text").contains(needle))
    val withEmb = survivors.withColumn("embedding", embed(col("text")))
    val qv = plantedAll.filter(col("doc_id") === 320000L)
      .withColumn("embedding", embed(col("text")))
      .select(col("embedding").as("qvec"))
    rankedTop5(withEmb, qv)
  }

  /** Replayed complement oracle shared by both `$not_contains` routes:
    * rebuild A∪B, apply `NOT contains`, emit the surviving PLANTED
    * group by id. The `doc_id >= 300000` restriction encodes the one
    * fact SQL cannot replay — A's copies outscore every natural under
    * the hash embedder (strictly more shared text with the query) — and
    * it is load-bearing both ways: an engine filter that no-ops serves
    * B (320000s ≠ 300000s, hash-red), one that over-excludes serves
    * naturals (ids < 300000, hash-red). The embedding-space claim
    * itself is spec-pinned in absolute terms. */
  private val knnWhereNotContainsSql =
    """WITH base AS (SELECT text FROM documents WHERE doc_id = 0),
      |a AS (SELECT CAST(300000 + r.range AS BIGINT) AS doc_id,
      |             b.text || ' zzaa' AS text
      |      FROM range(5) r, base b),
      |bb AS (SELECT CAST(320000 + r.range AS BIGINT) AS doc_id,
      |              b.text || ' zzaa zzbb' AS text
      |       FROM range(5) r, base b),
      |corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id, text FROM a
      |  UNION ALL SELECT doc_id, text FROM bb),
      |cand AS (SELECT doc_id FROM corpus
      |         WHERE NOT contains(text, 'zzbb'))
      |SELECT CAST(row_number() OVER (ORDER BY doc_id) AS INTEGER) AS rank,
      |       doc_id AS top_doc_id
      |FROM (SELECT doc_id FROM cand WHERE doc_id >= 300000
      |      ORDER BY doc_id LIMIT 5)
      |ORDER BY rank""".stripMargin

  /** Route-independent REPLAYED oracle shared by the scan and trigram
    * routes: DuckDB rebuilds the planted corpus from doc 0's text,
    * applies the contains filter, and ranks the survivors by id (valid
    * because B's copies tie at the identical self-group score and no
    * real document carries the sentinel — if the testdata ever grew a
    * natural 'zzbb' match, its id-ordered rank here would diverge from
    * the engine's score-ordered serve and the row would fail LOUDLY
    * instead of the old constant oracle's silent vacuous pass). */
  private val knnWhereContainsSql =
    """WITH base AS (SELECT text FROM documents WHERE doc_id = 0),
      |a AS (SELECT CAST(300000 + r.range AS BIGINT) AS doc_id,
      |             b.text || ' zzaa' AS text
      |      FROM range(5) r, base b),
      |bb AS (SELECT CAST(320000 + r.range AS BIGINT) AS doc_id,
      |              b.text || ' zzaa zzbb' AS text
      |       FROM range(5) r, base b),
      |corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id, text FROM a
      |  UNION ALL SELECT doc_id, text FROM bb),
      |cand AS (SELECT doc_id FROM corpus WHERE contains(text, 'zzbb'))
      |SELECT CAST(row_number() OVER (ORDER BY doc_id) AS INTEGER) AS rank,
      |       doc_id AS top_doc_id
      |FROM (SELECT doc_id FROM cand ORDER BY doc_id LIMIT 5)
      |ORDER BY rank""".stripMargin

  private val embedDocumentsKnnSql =
    """WITH ids AS (
      |  SELECT doc_id FROM documents WHERE doc_id = 0
      |  UNION ALL
      |  SELECT doc_id + 100000 FROM documents WHERE doc_id < 9)
      |SELECT CAST(row_number() OVER (ORDER BY doc_id) AS INTEGER) AS rank,
      |       doc_id AS top_doc_id
      |FROM ids ORDER BY rank""".stripMargin

  /** Embedding determinism + batch k-NN + tie-break under a real oracle:
    * plant an exact copy (doc_id + 100000) of every md5-unique document
    * with doc_id < 20, hash-embed base ∪ planted, and return each planted
    * query's exact top-1 by (cosine desc, doc_id asc). Identical text ⇒
    * identical embedding ⇒ the original ties the query's self-score
    * exactly, and the id tie-break picks the ORIGINAL — so DuckDB can
    * enumerate the answers without replicating the embedder. A
    * non-deterministic embedder, a broken tie-break, or a knn regression
    * each produce a different top-1 and fail the hash compare. (Distinct
    * texts with proportional token multisets would also embed identically;
    * verified absent in the testdata, and the md5-uniqueness filter keeps
    * the construction honest for the md5-expressible oracle.)
    */
  def embedSelfKnnPlanted(spark: SparkSession, dir: String): DataFrame = {
    val dim = 256
    val embed = udf((t: String) => Embedding.hashingEmbed(t, dim))
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val uniqueIds = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("doc_id"))
      .filter(col("n") === 1)
      .select("doc_id")
    val queryDocs = docs.join(uniqueIds, "doc_id").filter(col("doc_id") < 20)
    val planted = queryDocs.select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val corpus = docs.union(planted).withColumn("embedding", embed(col("text")))
    val qEmb = corpus.filter(col("doc_id") >= 100000)
      .select(col("doc_id").as("query_id"), col("embedding").as("qvec"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    corpus.crossJoin(broadcast(qEmb)) // ≤20 queries broadcast; corpus never moves
      .withColumn("score", V.cosineUnit(col("embedding"), col("qvec")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("query_id"), col("doc_id").as("top1_doc_id"))
      .orderBy("query_id")
  }

  private val embedSelfKnnPlantedSql =
    """WITH uniq AS (
      |  SELECT md5(text) AS h FROM documents GROUP BY md5(text) HAVING count(*) = 1)
      |SELECT d.doc_id + 100000 AS query_id, d.doc_id AS top1_doc_id
      |FROM documents d JOIN uniq u ON md5(d.text) = u.h
      |WHERE d.doc_id < 20 ORDER BY query_id""".stripMargin

  /** Int8-quantized coarse scan + exact rescore (graft.vector.Quantization)
    * for stored query vec 0. The oracle is the EXACT top-10 SQL: with the
    * 4× overscan margin the coarse pass must not lose a true neighbor, so
    * any quantization bug that perturbs the candidate set breaks the
    * compare against an engine that never quantizes at all.
    */
  def quantizedKnnTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val qv = e.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    graft.vector.Quantization.quantizedKnn(e, "embedding", "vec_id", qv, k = 10)
  }

  /** The PRE-quantized index path end-to-end, under the same exact oracle:
    * persist the corpus with its q_scale/q_codes projection (the at-scale
    * index layout), read it back from parquet, and run the coarse/exact
    * k-NN against the stored codes. quantizedKnn honors pre-quantized
    * columns, so the coarse pass scans the 4×-smaller codes only (the plan
    * audit asserts the coarse scan's ReadSchema has no float column) and
    * the parquet round-trip of scale/codes must be lossless — a storage or
    * codec regression perturbs the candidate set and breaks the compare
    * against an engine that never quantizes at all.
    */
  def quantizedIndexKnn(spark: SparkSession, dir: String): DataFrame = {
    val path = Tables.scratchPath("graft_qindex", dir)
    val e = Tables.embeddings(spark, dir)
    graft.vector.Quantization.buildQuantizedIndex(e, "embedding", path)
    val index = spark.read.parquet(path)
    val qv = e.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    graft.vector.Quantization.quantizedKnn(index, "embedding", "vec_id", qv, k = 10)
  }

  /** Matryoshka (MRL) two-stage ANN — the prefix-dimension counterpart
    * of the SQ8/PQ quantized coarse passes (Kusupati et al. 2022:
    * matryoshka-trained embeddings concentrate signal in the leading
    * dims, so a 16-of-64-dim prefix scan prices candidates at 1/4 the
    * flops and bandwidth): stage 1 scores `prefix16` from a MATERIALIZED
    * prefix sidecar table — the scan reads (vec_id, prefix16) ONLY, the
    * storage point of MRL, plan-audited — and keeps a 5× tie-broken
    * overscan of candidates via TakeOrdered; stage 2 broadcast-joins the
    * candidate ids back to the full-dim table for the exact rescore.
    * The conf-keyed forget exclusion rides the coarse scan like the
    * other quantized serve tails. The oracle replays BOTH stages, so a
    * prefix/slice/rescore bug breaks the compare even where the
    * two-stage answer happens to equal exact. */
  def matryoshkaKnnTopk(spark: SparkSession, dir: String): DataFrame = {
    val path = Tables.scratchPath("graft_mrl_prefix", dir)
    val e = Tables.embeddings(spark, dir)
    ResultCache.buildIfAbsent(spark, e, "matryoshka:prefix=16:v1", path) {
      e.select(col("vec_id"), slice(col("embedding"), 1, 16).as("prefix16"))
        .write.mode("overwrite").parquet(path)
    }
    val q = e.filter(col("vec_id") === 0L)
    val qp = q.select(slice(col("embedding"), 1, 16).as("qp"))
    val cand = Forget.defaultExclusion(spark.read.parquet(path), "vec_id")
      .crossJoin(broadcast(qp))
      .withColumn("coarse", round(V.cosineUnit(col("prefix16"), col("qp")), 6))
      .orderBy(col("coarse").desc, col("vec_id").asc).limit(50)
      .select("vec_id")
    val qe = q.select(col("embedding").as("qe"))
    e.join(broadcast(cand), Seq("vec_id"))
      .crossJoin(broadcast(qe))
      .withColumn("score", round(V.cosineUnit(col("embedding"), col("qe")), 6))
      .select(col("vec_id"), col("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
  }

  private val matryoshkaKnnTopkSql =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |c AS (
      |  SELECT e.vec_id,
      |         round(list_dot_product((e.embedding[1:16])::DOUBLE[],
      |                                (q.qe[1:16])::DOUBLE[]), 6) AS coarse
      |  FROM embeddings e, q
      |  ORDER BY coarse DESC, e.vec_id ASC LIMIT 50)
      |SELECT e.vec_id,
      |       round(list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) AS score
      |FROM embeddings e JOIN c USING (vec_id), q
      |ORDER BY score DESC, e.vec_id ASC
      |LIMIT 10""".stripMargin

  /** Product-quantized ADC coarse scan + exact rescore
    * (graft.vector.ProductQuantization — the FAISS PQ8 shape: 64-dim
    * float32 → 8 code bytes, 32× smaller) for stored query vec 0, under
    * the same EXACT top-10 oracle as the SQ8 paths: with the tie-
    * inclusive 16× overscan margin the ADC pass must not lose a true
    * neighbor, so a codebook/encode/LUT bug that perturbs the candidate
    * set breaks the compare against an engine that never quantizes.
    */
  def pqKnnTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val qv = e.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    graft.vector.ProductQuantization.pqKnn(e, "embedding", "vec_id", qv, k = 10)
  }

  /** Johnson–Lindenstrauss random projection 64 → 16 dims: a ±1 sign
    * matrix (Achlioptas 2003 — database-friendly random projections)
    * applied as a pure narrow map, the standard trick to cut ANN memory
    * and bandwidth 4× before bucketing. The matrix is derived from md5
    * parity so BOTH engines construct bit-identical signs, and the dot
    * product folds strictly left-to-right in both (Spark `aggregate`,
    * DuckDB `list_reduce`) — float addition isn't associative, so agreeing
    * on the fold order is what makes the oracle compare exact.
    *
    * Scale: zero shuffle — the sign matrix is a plan literal (~1 KB) and
    * each row projects independently; at 100 TB this is a map-only stage
    * fused into whatever scan precedes it.
    */
  def embeddingProjection(spark: SparkSession, dir: String): DataFrame = {
    val signs: Seq[Seq[Double]] = (0 until 16).map { j =>
      (0 until 64).map { i =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${i}_${j}".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if ("02468ace".contains(hex.charAt(0))) 1.0 else -1.0
      }
    }
    val m = typedlit(signs)
    // Long form (vec_id, j, proj_e6), one row per output dimension: the
    // driver's checker sorts rows in pandas and an array<double> column
    // is unsortable there (unhashable ndarray — the one r4 checker
    // crash). Integer micro-units also remove the float column entirely;
    // floor(d * 1e6) of the bit-identical fold is exact on both engines.
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 200)
      .select(col("vec_id"),
        posexplode(transform(sequence(lit(0), lit(15)), j =>
          aggregate(
            zip_with(col("embedding"), element_at(m, j + 1),
              (x, s) => x.cast("double") * s),
            lit(0.0), (acc, x) => acc + x) / 4.0)))
      .select(col("vec_id"), col("pos").cast("long").as("j"),
        expr("CAST(floor(col * 1000000) AS BIGINT)").as("proj_e6"))
      .orderBy("vec_id", "j")
  }

  /** Maximal Marginal Relevance diversity rerank (Carbonell & Goldstein
    * 1998 — the `search_type="mmr"` retriever mode in LangChain/Chroma
    * deployments like the reference): greedy selection of k=5 from the
    * exact top-20 candidates, each step maximizing
    * `λ·rel − (1−λ)·max_sim_to_selected` (λ=½; scores kept ×2 in integer
    * micro-units so no division — `mmr_e6 = rel_e6 − max_sim_e6` orders
    * identically and avoids engine-dependent negative-division semantics).
    *
    * The query is the NORMALIZED MIDPOINT of stored vectors 0 and 1 (a
    * non-corpus point, derived with the same elementwise IEEE ops in both
    * engines): querying WITH a stored vector degenerates MMR — once the
    * query's twin is selected, every candidate's penalty equals its
    * relevance and all scores collapse to 0.
    *
    * Scale shape: candidate generation is the distributed exact (or ANN)
    * top-k; the 20×20 pairwise-sim join is broadcast-bounded; the greedy
    * loop runs driver-side over k·n bounded state — the serving-path
    * step, same contract as the pagination cursor. The oracle replays the
    * identical greedy in a DuckDB recursive CTE, so a wrong penalty
    * (e.g. sim-to-last instead of max-over-selected) changes the picks.
    */
  def mmrRerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val Seq(v0, v1) = Seq(0L, 1L).map(id =>
      e.filter(col("vec_id") === id).select("embedding").head().getSeq[Float](0))
    val s = v0.zip(v1).map { case (a, b) => a.toDouble + b.toDouble }
    val norm = math.sqrt(s.map(x => x * x).sum) // left fold = list_dot_product(s,s)
    val qvec = s.map(_ / norm)
    val cand = e
      .withColumn("rel_e6",
        floor(V.cosineUnit(col("embedding"), typedlit(qvec)) * 1000000).cast("long"))
      .orderBy(col("rel_e6").desc, col("vec_id").asc)
      .limit(20)
      .select("vec_id", "rel_e6", "embedding")
    mmrGreedySelect(spark, cand, k = 5)
  }

  /** The MMR selection stage over a bounded candidate frame of
    * (vec_id, rel_e6, embedding): pairwise sims via a candidate-bounded
    * broadcast crossJoin (20×20), then the k-step greedy over collected
    * state (20 rels + 380 sims — the bounded serving-path step, same
    * contract as the pagination cursor). Shared by the exact and the
    * index-pruned candidate generators, so the driver rows pin ONE greedy.
    */
  private def mmrGreedySelect(spark: SparkSession, cand: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val c2 = cand.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    val sims = cand.select(col("vec_id").as("va"), col("embedding").as("ea"))
      .crossJoin(broadcast(c2)) // 20×20, candidate-bounded by construction
      .filter(col("va") =!= col("vb"))
      .select(col("va"), col("vb"),
        floor(V.cosineUnit(col("ea"), col("eb")) * 1000000).cast("long").as("sim_e6"))
    val relsArr = cand.select("vec_id", "rel_e6").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val relMap = relsArr.toMap
    val simMap = sims.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val bySeed = relsArr.sortBy { case (id, rel) => (-rel, id) }
    val chosen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val remaining = scala.collection.mutable.SortedSet(bySeed.map(_._1): _*)
    for (rank <- 1 to k) {
      val (id, mmr) =
        if (rank == 1) bySeed.head
        else remaining.toSeq
          .map(id => id -> (relMap(id) - chosen.map(c => simMap((id, c._2))).max))
          .minBy { case (i, m) => (-m, i) }
      chosen += ((rank.toLong, id, mmr))
      remaining -= id
    }
    chosen.toSeq.toDF("rank", "vec_id", "mmr_e6").orderBy("rank")
  }

  /** MMR with candidate generation routed through the PRUNED persisted
    * LSH index — the 100 TB serving shape (mmrRerank's exact top-k is
    * O(corpus) per query; here the scan reads only the radius-2 probe
    * partitions, plan-audited in PlanAuditSpec). Same greedy, same
    * recursive-CTE replay oracle.
    *
    * Oracle by construction: 20 exact copies of stored vector 0 are
    * planted and the query IS vector 0, so all 21 perfect-scoring rows
    * share vector 0's bucket (the signature is a pure function of the
    * vector) and the pruned top-20 provably equals the exact top-20 of
    * the augmented corpus — {0, 100000..100018} by the id tie-break —
    * which DuckDB enumerates by augmenting `embeddings` in SQL. The
    * degenerate sims (all candidates identical ⇒ every post-seed pick
    * scores rel−sim = 0, ordered by id) are themselves replayed by the
    * same CTE, and the non-degenerate greedy stays pinned by mmr_rerank;
    * THIS row pins the routing: a probe-set, bucket-layout, or
    * candidate-cutoff regression perturbs the candidate set and the picks.
    */
  def mmrRerankIndexed(spark: SparkSession, dir: String): DataFrame =
    mmrGreedySelect(spark, mmrIndexedCandidates(spark, dir), k = 5)

  /** The pruned-scan candidate stage of mmrRerankIndexed, exposed so
    * PlanAuditSpec can pin partition pruning on the very frame the
    * driver row consumes.
    */
  private[graft] def mmrIndexedCandidates(spark: SparkSession, dir: String): DataFrame = {
    import graft.vector.IndexBuilder
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_lshmmr_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
    val e = Tables.embeddings(spark, dir)
    val copies = spark.range(100000L, 100020L).toDF("vec_id")
      .crossJoin(broadcast(e.filter(col("vec_id") === 0L).select(col("embedding"))))
      .select(col("vec_id"), col("embedding"))
    val lsh = AnnIndex.defaultLsh
    val corpus = e.select("vec_id", "embedding").union(copies)
    // standing fixture: the build is a pure function of the corpus — a
    // serving-path call must read the persisted index, not rebuild it
    graft.ops.ResultCache.buildIfAbsent(spark, corpus,
      s"lsh:bits=${lsh.nBits}:seed=42:mmr20:v1", path) {
      IndexBuilder.buildLshIndex(corpus, "embedding", lsh, path)
    }
    val qv = e.filter(col("vec_id") === 0L).select("embedding")
      .head().getSeq[Float](0)
    val probes = lsh.probes(lsh.signature(qv),
      radius = AnnIndex.tunedRadius(spark, dir))
    spark.read.parquet(path)
      .filter(col("bucket").isin(probes: _*))
      .withColumn("rel_e6",
        floor(V.cosineUnit(col("embedding"), typedlit(qv)) * 1000000).cast("long"))
      .orderBy(col("rel_e6").desc, col("vec_id").asc)
      .limit(20)
      .select("vec_id", "rel_e6", "embedding")
  }

  private val mmrRerankIndexedSql =
    """WITH RECURSIVE
      |aug AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT e2.vec_id + 100000 AS vec_id, e.embedding
      |  FROM embeddings e2, (SELECT embedding FROM embeddings WHERE vec_id = 0) e
      |  WHERE e2.vec_id < 20),
      |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |cand AS (
      |  SELECT a.vec_id,
      |         CAST(floor(list_dot_product(a.embedding::DOUBLE[], q.qe::DOUBLE[])
      |                    * 1000000) AS BIGINT) AS rel_e6,
      |         a.embedding
      |  FROM aug a, q
      |  ORDER BY rel_e6 DESC, a.vec_id ASC LIMIT 20),
      |sims AS (
      |  SELECT a.vec_id AS va, b.vec_id AS vb,
      |         CAST(floor(list_dot_product(a.embedding::DOUBLE[],
      |                                     b.embedding::DOUBLE[]) * 1000000)
      |              AS BIGINT) AS sim_e6
      |  FROM cand a, cand b WHERE a.vec_id <> b.vec_id),
      |sel AS (
      |  (SELECT 1 AS rank, vec_id, rel_e6 AS mmr_e6, [vec_id] AS chosen FROM cand
      |   ORDER BY rel_e6 DESC, vec_id ASC LIMIT 1)
      |  UNION ALL
      |  (SELECT s.rank + 1, c.vec_id, c.rel_e6 - ms.m, list_append(s.chosen, c.vec_id)
      |   FROM sel s, cand c,
      |        LATERAL (SELECT max(sim_e6) AS m FROM sims
      |                 WHERE va = c.vec_id AND list_contains(s.chosen, vb)) ms
      |   WHERE s.rank < 5 AND NOT list_contains(s.chosen, c.vec_id)
      |   ORDER BY c.rel_e6 - ms.m DESC, c.vec_id ASC LIMIT 1)
      |)
      |SELECT CAST(rank AS BIGINT) AS rank, vec_id, mmr_e6 FROM sel
      |ORDER BY rank""".stripMargin

  private val mmrRerankSql =
    """WITH RECURSIVE
      |qraw AS (
      |  SELECT list_transform(generate_series(1, 64),
      |           i -> a.embedding[i]::DOUBLE + b.embedding[i]::DOUBLE) AS s
      |  FROM (SELECT embedding FROM embeddings WHERE vec_id = 0) a,
      |       (SELECT embedding FROM embeddings WHERE vec_id = 1) b),
      |q AS (SELECT list_transform(s, x -> x / sqrt(list_dot_product(s, s))) AS qe
      |      FROM qraw),
      |cand AS (
      |  SELECT e.vec_id,
      |         CAST(floor(list_dot_product(e.embedding::DOUBLE[], q.qe) * 1000000)
      |              AS BIGINT) AS rel_e6,
      |         e.embedding
      |  FROM embeddings e, q
      |  ORDER BY rel_e6 DESC, e.vec_id ASC LIMIT 20),
      |sims AS (
      |  SELECT a.vec_id AS va, b.vec_id AS vb,
      |         CAST(floor(list_dot_product(a.embedding::DOUBLE[],
      |                                     b.embedding::DOUBLE[]) * 1000000)
      |              AS BIGINT) AS sim_e6
      |  FROM cand a, cand b WHERE a.vec_id <> b.vec_id),
      |sel AS (
      |  (SELECT 1 AS rank, vec_id, rel_e6 AS mmr_e6, [vec_id] AS chosen FROM cand
      |   ORDER BY rel_e6 DESC, vec_id ASC LIMIT 1)
      |  UNION ALL
      |  (SELECT s.rank + 1, c.vec_id, c.rel_e6 - ms.m, list_append(s.chosen, c.vec_id)
      |   FROM sel s, cand c,
      |        LATERAL (SELECT max(sim_e6) AS m FROM sims
      |                 WHERE va = c.vec_id AND list_contains(s.chosen, vb)) ms
      |   WHERE s.rank < 5 AND NOT list_contains(s.chosen, c.vec_id)
      |   ORDER BY c.rel_e6 - ms.m DESC, c.vec_id ASC LIMIT 1)
      |)
      |SELECT CAST(rank AS BIGINT) AS rank, vec_id, mmr_e6 FROM sel
      |ORDER BY rank""".stripMargin

  /** Embedding-space hygiene report: the L2-norm histogram per label — the
    * first thing to look at before cosine search or quantization (norm
    * collapse, un-normalized batches and dead vectors all show up here).
    * The norm is a strict left fold over the vector (same construction
    * that makes `embedding_projection` bit-exact cross-engine: per-row,
    * order-fixed, no shuffle-order float sums), sqrt is IEEE
    * correctly-rounded in both engines, and the bucket floor is exact
    * integer. Pure narrow projection + one small-key aggregation.
    */
  def embeddingNormHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"),
        expr("CAST(floor(sqrt(aggregate(embedding, CAST(0.0 AS DOUBLE), " +
          "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * 10) AS BIGINT)")
          .as("norm_bucket"))
      .groupBy(col("label"), col("norm_bucket"))
      .agg(count(lit(1)).as("n_vectors"))
      .orderBy("label", "norm_bucket")

  /** Embedding DRIFT between two corpus snapshots — the observability
    * check every embedding pipeline needs before serving a re-embedded
    * corpus (a model/preprocessing change shifts centroids; cosine
    * thresholds silently rot). Per (label, dimension): integer-unit
    * coordinate sums over snapshot A (vec_id < 250) and snapshot B (the
    * full corpus); the centroid shift |sA/nA − sB/nB| is compared WITHOUT
    * division via cross-multiplication |sA·nB − sB·nA| — pure BIGINT, so
    * the oracle is exact. Output: each label's worst dimension and its
    * drift numerator (denominator nA·nB is constant per label).
    *
    * Scale shape: one posexplode + one (label, dim)-keyed partial-agg
    * sum per snapshot — integer sums are order-insensitive (the reason
    * the metric is built on floor(x·1e6), not float addition) — then a
    * labels×64 join and a rank window over labels×64 rows.
    */
  def embeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, dir)
    def sums(df: DataFrame, sName: String, nName: String): DataFrame = df
      .select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos").cast("long").as("j"),
        expr("CAST(floor(CAST(col AS DOUBLE) * 1000000) AS BIGINT)").as("x_e6"))
      .groupBy("label", "j")
      .agg(sum("x_e6").as(sName), count(lit(1)).as(nName))
    val a = sums(e.filter(col("vec_id") < 250), "s_a", "n_a")
    val b = sums(e, "s_b", "n_b")
    val w = Window.partitionBy(col("label"))
      .orderBy(col("drift_x").desc, col("j").asc)
    a.join(b, Seq("label", "j"))
      .withColumn("drift_x", abs(col("s_a") * col("n_b") - col("s_b") * col("n_a")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("label"), col("j"), col("drift_x"))
      .orderBy("label")
  }

  private val embeddingDriftSql =
    """WITH x AS (
      |  SELECT label, vec_id, g.j,
      |         CAST(floor(embedding[g.j]::DOUBLE * 1000000) AS BIGINT) AS x_e6
      |  FROM embeddings, generate_series(1, 64) AS g(j)),
      |a AS (SELECT label, j, CAST(sum(x_e6) AS BIGINT) AS s_a,
      |             count(*) AS n_a
      |      FROM x WHERE vec_id < 250 GROUP BY label, j),
      |b AS (SELECT label, j, CAST(sum(x_e6) AS BIGINT) AS s_b,
      |             count(*) AS n_b
      |      FROM x GROUP BY label, j),
      |m AS (SELECT a.label, a.j,
      |             CAST(abs(a.s_a * b.n_b - b.s_b * a.n_a) AS BIGINT) AS drift_x
      |      FROM a JOIN b ON a.label = b.label AND a.j = b.j),
      |r AS (SELECT label, j, drift_x,
      |             row_number() OVER (PARTITION BY label
      |                                ORDER BY drift_x DESC, j ASC) AS rn
      |      FROM m)
      |SELECT label, CAST(j - 1 AS BIGINT) AS j, drift_x FROM r WHERE rn = 1
      |ORDER BY label""".stripMargin

  private val embeddingNormHistogramSql =
    """SELECT label,
      |       CAST(floor(sqrt(list_reduce(list_transform(embedding,
      |              x -> x::DOUBLE * x::DOUBLE), (a, b) -> a + b)) * 10)
      |            AS BIGINT) AS norm_bucket,
      |       count(*) AS n_vectors
      |FROM embeddings GROUP BY 1, 2 ORDER BY label, norm_bucket""".stripMargin

  private val embeddingProjectionSql =
    """WITH m AS (
      |  SELECT i.i, j.j,
      |         CASE WHEN strpos('02468ace', substr(md5(i.i || '_' || j.j), 1, 1)) > 0
      |              THEN 1.0 ELSE -1.0 END AS s
      |  FROM generate_series(0, 63) i(i), generate_series(0, 15) j(j)),
      |mm AS (SELECT j, list(s ORDER BY i) AS signs FROM m GROUP BY j)
      |SELECT e.vec_id, CAST(mm.j AS BIGINT) AS j,
      |       CAST(floor(list_reduce(list_transform(generate_series(1, 64),
      |              k -> e.embedding[k]::DOUBLE * mm.signs[k]),
      |            (a, b) -> a + b) / 4.0 * 1000000) AS BIGINT) AS proj_e6
      |FROM embeddings e, mm
      |WHERE e.vec_id < 200
      |ORDER BY vec_id, j""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embedding_projection" -> embeddingProjection,
    "embedding_norm_histogram" -> embeddingNormHistogram,
    "embedding_drift" -> embeddingDrift,
    "quantized_knn_topk" -> quantizedKnnTopk,
    "quantized_index_knn" -> quantizedIndexKnn,
    "pq_knn_topk" -> pqKnnTopk,
    "ann_matryoshka_topk" -> matryoshkaKnnTopk,
    "knn_exact_topk" -> knnExactTopk,
    "knn_l2_topk" -> knnL2Topk,
    "mmr_rerank" -> mmrRerank,
    "mmr_rerank_indexed" -> mmrRerankIndexed,
    "knn_threshold" -> knnThreshold,
    "knn_relevance_threshold" -> knnRelevanceThreshold,
    "knn_batch_topk" -> knnBatchTopk,
    "hard_negatives_batch" -> hardNegativesBatch,
    "cosine_score_stats" -> cosineScoreStats,
    "embed_documents_knn" -> embedDocumentsKnn,
    "knn_where_contains" -> knnWhereContains,
    "knn_where_contains_indexed" -> knnWhereContainsIndexed,
    "knn_where_contains_auto_route" -> knnWhereContainsAutoRoute,
    "knn_where_contains_rewritten" -> knnWhereContainsRewritten,
    "knn_where_contains_and" -> knnWhereContainsAnd,
    "knn_where_contains_and_indexed" -> knnWhereContainsAndIndexed,
    "knn_where_contains_or" -> knnWhereContainsOr,
    "knn_where_contains_or_indexed" -> knnWhereContainsOrIndexed,
    "knn_where_contains_or_rewritten" -> knnWhereContainsOrRewritten,
    "knn_where_not_contains" -> knnWhereNotContains,
    "knn_where_not_contains_indexed" -> knnWhereNotContainsIndexed,
    "knn_where_contains_deleted" -> knnWhereContainsDeleted,
    "knn_where_contains_deleted_indexed" -> knnWhereContainsDeletedIndexed,
    "knn_where_contains_deleted_auto_route" -> knnWhereContainsDeletedAutoRoute,
    "knn_where_contains_reclaimed" -> knnWhereContainsReclaimed,
    "knn_where_contains_streamed" -> knnWhereContainsStreamed,
    "knn_where_contains_upserted" -> knnWhereContainsUpserted,
    "knn_where_contains_time_travel" -> knnWhereContainsTimeTravel,
    "knn_where_contains_compacted" -> knnWhereContainsCompacted,
    "knn_where_contains_sharded" -> knnWhereContainsSharded,
    "knn_where_metadata_document" -> knnWhereMetadataAndDocument,
    "knn_where_metadata_range" -> knnWhereMetadataRange,
    "knn_where_metadata_range_pruned" -> knnWhereMetadataRangePruned,
    "knn_where_metadata_in" -> knnWhereMetadataIn,
    "knn_where_metadata_nin" -> knnWhereMetadataNin,
    "embed_selfknn_planted" -> embedSelfKnnPlanted)

  def oracles: Map[String, String] = Map(
    "embedding_projection" -> embeddingProjectionSql,
    "embedding_norm_histogram" -> embeddingNormHistogramSql,
    "embedding_drift" -> embeddingDriftSql,
    "quantized_knn_topk" -> knnExactTopkSql, // quantized path must equal exact
    "quantized_index_knn" -> knnExactTopkSql, // stored-codes path must equal exact too
    "pq_knn_topk" -> knnExactTopkSql, // PQ-ADC path must equal exact too
    "ann_matryoshka_topk" -> matryoshkaKnnTopkSql,
    "knn_exact_topk" -> knnExactTopkSql,
    "knn_l2_topk" -> knnL2TopkSql,
    "mmr_rerank" -> mmrRerankSql,
    "mmr_rerank_indexed" -> mmrRerankIndexedSql,
    "knn_threshold" -> knnThresholdSql,
    "knn_relevance_threshold" -> knnRelevanceThresholdSql,
    "knn_batch_topk" -> knnBatchTopkSql,
    "hard_negatives_batch" -> hardNegativesBatchSql,
    "cosine_score_stats" -> cosineScoreStatsSql,
    "embed_documents_knn" -> embedDocumentsKnnSql,
    "knn_where_contains" -> knnWhereContainsSql,
    "knn_where_contains_indexed" -> knnWhereContainsSql,
    "knn_where_contains_auto_route" -> knnWhereContainsSql,
    "knn_where_contains_rewritten" -> knnWhereContainsSql,
    "knn_where_contains_and" -> knnWhereContainsAndSql,
    "knn_where_contains_and_indexed" -> knnWhereContainsAndSql,
    "knn_where_contains_or" -> knnWhereContainsOrSql,
    "knn_where_contains_or_indexed" -> knnWhereContainsOrSql,
    "knn_where_contains_or_rewritten" -> knnWhereContainsOrSql,
    "knn_where_not_contains" -> knnWhereNotContainsSql,
    "knn_where_not_contains_indexed" -> knnWhereNotContainsSql,
    "knn_where_contains_deleted" -> knnWhereContainsDeletedSql,
    "knn_where_contains_deleted_indexed" -> knnWhereContainsDeletedSql,
    "knn_where_contains_deleted_auto_route" -> knnWhereContainsDeletedSql,
    "knn_where_contains_reclaimed" -> knnWhereContainsDeletedSql,
    "knn_where_contains_streamed" -> knnWhereContainsSql,
    "knn_where_contains_upserted" -> knnWhereContainsUpsertedSql,
    "knn_where_contains_time_travel" -> knnWhereContainsTimeTravelSql,
    "knn_where_contains_compacted" -> knnWhereContainsSql,
    "knn_where_contains_sharded" -> knnWhereContainsSql,
    "knn_where_metadata_document" -> knnWhereMetadataAndDocumentSql,
    "knn_where_metadata_range" -> knnWhereMetadataRangeSql,
    "knn_where_metadata_range_pruned" -> knnWhereMetadataRangeSql,
    "knn_where_metadata_in" -> knnWhereMetadataInSql,
    "knn_where_metadata_nin" -> knnWhereMetadataNinSql,
    "embed_selfknn_planted" -> embedSelfKnnPlantedSql)
}
