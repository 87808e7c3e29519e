package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Text-analysis operators for corpus curation (training-data-pipeline
  * requirement; generalizes the reference's per-chunk text handling,
  * SURVEY.md §2.8): quality scoring, token counting, language
  * identification, and document fingerprinting.
  *
  * All metrics are pure column expressions (regex + higher-order functions)
  * — whole-stage codegen, no UDFs, embarrassingly parallel at any scale.
  * Regex patterns are restricted to syntax with identical semantics in Java
  * (Spark) and RE2 (DuckDB) so the quality/token queries stay
  * oracle-checkable.
  */
object TextAnalysis extends QueryModule {

  /** Word tokens: split on non-letter/digit, drop empties (same tokenizer
    * as Dedup/Embedding so cross-operator results compose).
    */
  def tokensCol(c: Column): Column = Dedup.tokensCol(c)

  private val EnglishStopwords = Seq(
    "the", "a", "an", "and", "of", "to", "in", "is", "that", "it",
    "was", "for", "on", "with", "as", "at", "by", "from", "this")

  // ---- quality scoring ----

  /** Per-document quality metrics: length, word count, mean word length,
    * stopword ratio, punctuation/digit/whitespace ratios, and a composite
    * [0,1] quality score (long-enough, readable word lengths, has function
    * words — the heuristics corpus filters like C4/Gopher use).
    */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokensCol(col("text"))
    val nChars = length(col("text"))
    val nWords = size(toks)
    val wordChars = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val stopHits = size(filter(toks, t => array_contains(typedlit(EnglishStopwords), t)))
    val nPunct = size(regexp_extract_all(col("text"), lit("""[.,;:!?'"()\[\]{}-]"""), lit(0)))
    val nDigits = size(regexp_extract_all(col("text"), lit("[0-9]"), lit(0)))
    val nSpaces = size(regexp_extract_all(col("text"), lit("[ \\t\\n]"), lit(0)))
    // sort-early/project-late (see QualityFilters.lineFilterC4): the tail
    // orderBy over this projection would evaluate the tokenizer/regex
    // battery twice (range sampling + shuffle) on near-single-task
    // partitions; range-sorting the narrow rows first runs it once,
    // parallel, in the same total doc_id order
    Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("text"))
      .repartitionByRange(spark.sparkContext.defaultParallelism, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .select(
        col("doc_id"),
        // long counts: length()/size() are int32 in Spark, int64 in DuckDB
        nChars.cast("long").as("n_chars_measured"),
        nWords.cast("long").as("n_words"),
        stopHits.cast("long").as("stop_hits"),
        round(wordChars / nWords.cast("double"), 6).as("avg_word_len"),
        round(stopHits / nWords.cast("double"), 6).as("stopword_ratio"),
        round(nPunct / nChars.cast("double"), 6).as("punct_ratio"),
        round(nDigits / nChars.cast("double"), 6).as("digit_ratio"),
        round(nSpaces / nChars.cast("double"), 6).as("space_ratio"))
      .withColumn("quality_score", qualityScoreCol)
  }

  /** Composite score over materialized `n_words`/`avg_word_len`/`stop_hits`
    * columns, in exact integer milli-units: products of rounded ratios land
    * on decimal half-way points where Spark and DuckDB round differently —
    * integer arithmetic sidesteps the tie entirely. Shared by textQuality
    * and corpusCuration so the two can never drift.
    */
  private def qualityScoreCol: Column = {
    val qualityMilli =
      least(lit(400), col("n_words") * 8) +
        when(col("avg_word_len").between(3.0, 10.0), 300).otherwise(0) +
        least(lit(300), expr("(1500 * stop_hits) DIV n_words"))
    (qualityMilli / lit(1000.0)).cast("double")
  }

  private val stopListSql = EnglishStopwords.map(s => s"'$s'").mkString("[", ", ", "]")

  private val textQualitySql =
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |         list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'),
       |                     x -> length(x) > 0) AS tok
       |  FROM documents WHERE length(trim(text)) > 0),
       |m AS (
       |  SELECT doc_id,
       |         length(text) AS n_chars_measured,
       |         len(tok) AS n_words,
       |         len(list_filter(tok, x -> list_contains($stopListSql, x))) AS stop_hits,
       |         round(list_sum(list_transform(tok, x -> length(x))) / len(tok)::DOUBLE, 6) AS avg_word_len,
       |         round(len(list_filter(tok, x -> list_contains($stopListSql, x))) / len(tok)::DOUBLE, 6) AS stopword_ratio,
       |         round(len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]{}-]')) / length(text)::DOUBLE, 6) AS punct_ratio,
       |         round(len(regexp_extract_all(text, '[0-9]')) / length(text)::DOUBLE, 6) AS digit_ratio,
       |         round(len(regexp_extract_all(text, '[ \\t\\n]')) / length(text)::DOUBLE, 6) AS space_ratio
       |  FROM t)
       |SELECT *,
       |       ((least(400, n_words * 8)
       |         + CASE WHEN avg_word_len BETWEEN 3.0 AND 10.0 THEN 300 ELSE 0 END
       |         + least(300, (1500 * stop_hits) // n_words)) / 1000.0)::DOUBLE AS quality_score
       |FROM m ORDER BY doc_id""".stripMargin

  /** Corpus-level quality distribution (the filter-threshold picker). */
  def qualityHistogram(spark: SparkSession, dir: String): DataFrame =
    textQuality(spark, dir)
      .groupBy(floor(col("quality_score") * 10).cast("int").as("quality_decile"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_words")), 4).as("avg_words"))
      .orderBy("quality_decile")

  private val qualityHistogramSql =
    s"""WITH q AS ($textQualitySql)
       |SELECT CAST(floor(quality_score * 10) AS INTEGER) AS quality_decile,
       |       count(*) AS n_docs, round(avg(n_words), 4) AS avg_words
       |FROM q GROUP BY 1 ORDER BY quality_decile""".stripMargin

  /** Per-language quality-threshold calibration: discrete percentiles of
    * the quality score (p10/p25/p50/p90) plus the adaptive-keep count at
    * the per-language p25 — the "keep the best 75% of EACH language"
    * curation policy, which a single global threshold can't express
    * (languages with shorter average documents would be wiped out).
    *
    * Quantiles are DISCRETE (value at rank ⌈q·n⌉) computed in pure integer
    * arithmetic — `(n*p + 99) DIV 100` — because interpolated percentiles
    * and float rank positions (`0.1 * n`) both produce engine-dependent
    * last-ulp/decimal-vs-binary disagreements. All outputs are BIGINT.
    *
    * Scale: one sort per language partition (the rank window), one 5-row
    * broadcast back for the keep count. At 100 TB the window key stays
    * `lang` (bounded cardinality ⇒ potential skew — production would
    * compute ranks via a two-pass histogram instead; same contract).
    */
  def qualityCalibration(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokensCol(col("text"))
    val nWords = size(toks)
    val wordChars = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val stopHits = size(filter(toks, t => array_contains(typedlit(EnglishStopwords), t)))
    // spreadCpuBound: the token/stopword HOF battery otherwise runs on
    // the corpus's single scan split — and `scored` is consumed twice
    // (rank window + keep count), so the single-task stage paid twice
    val scored = Tables.spreadCpuBound(
      Tables.documents(spark, dir)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), col("lang"), col("text")))
      .select(col("doc_id"), col("lang"),
        nWords.as("n_words"),
        round(wordChars / nWords.cast("double"), 6).as("avg_word_len"),
        stopHits.as("stop_hits"))
      .withColumn("quality_score", qualityScoreCol)
      .select(col("lang"),
        round(col("quality_score") * 1000).cast("long").as("score_milli"))
    val ranked = scored.select(col("lang"), col("score_milli"),
      row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("score_milli"))).as("rn"),
      count(lit(1)).over(Window.partitionBy(col("lang"))).as("n"))
    def pAt(p: Int): Column =
      min(when(col("rn") === expr(s"(n * $p + 99) DIV 100"), col("score_milli")))
        .as(s"p${p}_milli")
    val thresholds = ranked.groupBy(col("lang"))
      .agg(max(col("n")).as("n_docs"), pAt(10), pAt(25), pAt(50), pAt(90))
    val kept = scored
      .join(broadcast(thresholds.select(col("lang"), col("p25_milli"))), Seq("lang"))
      .filter(col("score_milli") >= col("p25_milli"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_keep"))
    thresholds.join(kept, Seq("lang"))
      .select(col("lang"), col("n_docs"), col("p10_milli"), col("p25_milli"),
        col("p50_milli"), col("p90_milli"), col("n_keep"))
      .orderBy("lang")
  }

  private val qualityCalibrationSql =
    s"""WITH base AS ($textQualitySql),
       |q AS (SELECT d.lang, CAST(round(b.quality_score * 1000) AS BIGINT) AS score_milli
       |      FROM base b JOIN documents d USING (doc_id)),
       |r AS (SELECT lang, score_milli,
       |             row_number() OVER (PARTITION BY lang ORDER BY score_milli) AS rn,
       |             count(*) OVER (PARTITION BY lang) AS n
       |      FROM q),
       |t AS (SELECT lang, max(n) AS n_docs,
       |             min(CASE WHEN rn = (n * 10 + 99) // 100 THEN score_milli END) AS p10_milli,
       |             min(CASE WHEN rn = (n * 25 + 99) // 100 THEN score_milli END) AS p25_milli,
       |             min(CASE WHEN rn = (n * 50 + 99) // 100 THEN score_milli END) AS p50_milli,
       |             min(CASE WHEN rn = (n * 90 + 99) // 100 THEN score_milli END) AS p90_milli
       |      FROM r GROUP BY lang)
       |SELECT lang, n_docs, p10_milli, p25_milli, p50_milli, p90_milli,
       |       (SELECT count(*) FROM q
       |        WHERE q.lang = t.lang AND q.score_milli >= t.p25_milli) AS n_keep
       |FROM t ORDER BY lang""".stripMargin

  // ---- token counting ----

  /** Token counts under three tokenizers: whitespace, word-regex, and a
    * BPE-ish pre-tokenizer (letter runs / digit runs / punctuation runs —
    * the GPT-2 pre-split shape) plus the chars/4 subword estimate.
    */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(
        col("doc_id"),
        size(split(trim(col("text")), "[ \\t\\n]+")).cast("long").as("n_ws_tokens"),
        size(tokensCol(col("text"))).cast("long").as("n_word_tokens"),
        size(regexp_extract_all(col("text"),
          lit("""\p{L}+|\p{N}+|[^\p{L}\p{N} \t\n]+"""), lit(0))).cast("long").as("n_bpe_pieces"),
        ceil(length(col("text")) / lit(4.0)).cast("long").as("est_subword_tokens"))
      .orderBy("doc_id")

  private val tokenCountsSql =
    """SELECT doc_id,
      |       len(string_split_regex(trim(text), '[ \t\n]+')) AS n_ws_tokens,
      |       len(list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
      |                       x -> length(x) > 0)) AS n_word_tokens,
      |       len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\p{L}\p{N} \t\n]+')) AS n_bpe_pieces,
      |       CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_subword_tokens
      |FROM documents WHERE length(trim(text)) > 0 ORDER BY doc_id""".stripMargin

  // ---- language identification ----

  /** Stopword profiles for the Latin-script languages + Han-script detection
    * for Chinese. Profile hit-rate argmax; deterministic tie-break by
    * profile order (en first). Spec validates accuracy on real-language
    * sentences (the driver `documents.lang` labels are synthetic noise —
    * the text vocabulary does not vary by label).
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ich", "sie", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "je", "ne", "pas", "vous", "une", "dans", "que"),
    "es" -> Seq("el", "los", "las", "y", "es", "no", "que", "en", "un", "una", "por", "con"))

  private val profileSets: Seq[(String, Set[String])] =
    LangProfiles.map { case (l, ws) => (l, ws.toSet) }

  /** Argmax over stopword hit-rates; non-Latin scripts via char-script
    * ratios (ja/zh/ru/ar/ko — see scriptCheck). One narrow-map
    * pass: tokenize once, score every profile against a hash set. (The
    * pure-Column formulation — `filter(toks, array_contains(...))` per
    * profile — evaluates its lambdas interpreted and re-materializes the
    * token array per profile: measured ~5 ms/doc vs ~10 µs/doc here.)
    *
    * Scores are exact integer micro-units ((1e6·hits) div denom): pure
    * integer arithmetic is bit-identical in any engine, which makes the
    * whole classifier DuckDB-expressible (see langIdSql) — a float ratio
    * would round differently at the last ulp. Argmax over the floored
    * micro score equals argmax over raw hits because every profile shares
    * the doc's denominator.
    */
  /** Shared tokenizer (bit-identical to tokensCol — see Dedup.tokensCol). */
  private def tokenize(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT).split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)

  /** Script-detection branch for non-Latin scripts, checked in a FIXED
    * priority order (deterministic cross-engine): kana first at a LOWER
    * 0.2 threshold — Japanese text is kanji-heavy, so a Han-first check
    * would claim it for zh while kana occurs only in Japanese — then
    * Han/Cyrillic/Arabic/Hangul at 0.3. Ratios are exact integer
    * comparisons (`10·count >= k·nonspace`); the stopword argmax handles
    * Latin-script languages below.
    */
  private def scriptCheck(text: String): Option[(Long, String)] = {
    import Character.UnicodeScript._
    var kana = 0; var han = 0; var cyr = 0; var arab = 0; var hang = 0
    var nonSpace = 0; var i = 0
    // iterate CODEPOINTS, not UTF-16 units: a supplementary-plane char
    // (e.g. CJK Extension B, classified Han) must count once with its
    // real script — per-unit iteration would count it as two UNKNOWNs,
    // diverging from any codepoint-based regex oracle
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (cp != ' ' && cp != '\t' && cp != '\n') {
        nonSpace += 1
        Character.UnicodeScript.of(cp) match {
          case HIRAGANA | KATAKANA => kana += 1
          case HAN => han += 1
          case CYRILLIC => cyr += 1
          case ARABIC => arab += 1
          case HANGUL => hang += 1
          case _ =>
        }
      }
      i += Character.charCount(cp)
    }
    val ns = math.max(nonSpace, 1)
    def score(c: Int): Long = 1000000L * c / ns
    if (10L * kana >= 2L * ns) Some((score(kana), "ja"))
    else if (10L * han >= 3L * ns) Some((score(han), "zh"))
    else if (10L * cyr >= 3L * ns) Some((score(cyr), "ru"))
    else if (10L * arab >= 3L * ns) Some((score(arab), "ar"))
    else if (10L * hang >= 3L * ns) Some((score(hang), "ko"))
    else None
  }

  /** Stopword-profile argmax over pre-tokenized text. */
  private def profileArgmax(toks: Array[String]): (Long, String) = {
    val denom = math.max(toks.length, 1)
    var bestHits = -1; var bestLang = LangProfiles.head._1
    profileSets.foreach { case (lang, words) =>
      val hits = toks.count(words.contains)
      // ties break by lang string desc, matching max on (hits, lang) structs
      if (hits > bestHits || (hits == bestHits && lang > bestLang)) {
        bestHits = hits; bestLang = lang
      }
    }
    (1000000L * bestHits / denom, bestLang)
  }

  def langIdScala(text: String): (Long, String) = {
    if (text == null || text.isEmpty) return (0L, LangProfiles.head._1)
    scriptCheck(text).getOrElse(profileArgmax(tokenize(text)))
  }

  private val langIdUdf = udf(langIdScala _)

  def langIdCol(textCol: Column): Column = {
    val p = langIdUdf(textCol)
    struct(p.getField("_1").as("score"), p.getField("_2").as("lang"))
  }

  /** Language-ID over documents. Oracle-checked: the stopword-profile
    * argmax and Han-ratio branch are replicated in DuckDB SQL (integer
    * micro-unit scores keep the compare exact).
    */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("pred", langIdCol(col("text")))
      .select(col("doc_id"), col("pred.lang").as("pred_lang"),
        col("pred.score").as("lang_score_micro"))
      .orderBy("doc_id")

  private def profileStructSql(lang: String, words: Seq[String]): String = {
    val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"{'hits': len(list_filter(tok, x -> list_contains($lst, x))), 'lang': '$lang'}"
  }

  /** DuckDB replica of langIdScala. Struct max compares (hits, lang)
    * lexicographically — the same tie-break as the Scala loop.
    */
  private val langIdSql = {
    val cands = LangProfiles.map { case (l, ws) => profileStructSql(l, ws) }
      .mkString("[", ",\n           ", "]")
    s"""WITH t AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'),
       |                     x -> length(x) > 0) AS tok,
       |         len(regexp_extract_all(text, '[\\p{Hiragana}\\p{Katakana}]')) AS kana,
       |         len(regexp_extract_all(text, '\\p{Han}')) AS han,
       |         len(regexp_extract_all(text, '\\p{Cyrillic}')) AS cyr,
       |         len(regexp_extract_all(text, '\\p{Arabic}')) AS arab,
       |         len(regexp_extract_all(text, '\\p{Hangul}')) AS hang,
       |         greatest(len(regexp_extract_all(text, '[^ \\t\\n]')), 1) AS nonspace
       |  FROM documents WHERE length(trim(text)) > 0),
       |s AS (
       |  SELECT doc_id, kana, han, cyr, arab, hang, nonspace,
       |         greatest(len(tok), 1) AS denom,
       |         list_max($cands) AS best
       |  FROM t)
       |SELECT doc_id,
       |       CASE WHEN 10*kana >= 2*nonspace THEN 'ja'
       |            WHEN 10*han  >= 3*nonspace THEN 'zh'
       |            WHEN 10*cyr  >= 3*nonspace THEN 'ru'
       |            WHEN 10*arab >= 3*nonspace THEN 'ar'
       |            WHEN 10*hang >= 3*nonspace THEN 'ko'
       |            ELSE best.lang END AS pred_lang,
       |       CASE WHEN 10*kana >= 2*nonspace THEN (1000000*kana) // nonspace
       |            WHEN 10*han  >= 3*nonspace THEN (1000000*han)  // nonspace
       |            WHEN 10*cyr  >= 3*nonspace THEN (1000000*cyr)  // nonspace
       |            WHEN 10*arab >= 3*nonspace THEN (1000000*arab) // nonspace
       |            WHEN 10*hang >= 3*nonspace THEN (1000000*hang) // nonspace
       |            ELSE (1000000*best.hits) // denom END AS lang_score_micro
       |FROM s ORDER BY doc_id""".stripMargin
  }

  // ---- document fingerprinting (winnowing) ----

  /** Winnowing fingerprint (Schleimer et al. 2003, "Winnowing: Local
    * Algorithms for Document Fingerprinting"): hash every character k-gram
    * of the normalized text, keep the minimum in each sliding window of w
    * hashes, distinct. Shared fingerprints ⇒ shared substrings — the
    * candidate generator for plagiarism/containment detection.
    *
    * Implemented as an O(n) monotonic-deque rolling loop in a narrow-map
    * UDF. A pure-HOF formulation exists but is O(n²): Spark evaluates
    * lambda bodies interpreted, re-computing the inner k-gram hash array
    * once per window — measured minutes vs milliseconds on 500-char docs.
    */
  def winnowFingerprint(text: String, k: Int = 8, w: Int = 4): Array[Long] = {
    if (text == null) return Array.empty
    val norm = text.toLowerCase(java.util.Locale.ROOT).replaceAll("[^\\p{L}\\p{N}]+", " ")
    if (norm.length < k) {
      return if (norm.isEmpty) Array.empty
      else Array(scala.util.hashing.MurmurHash3.stringHash(norm, 0x1b873593).toLong)
    }
    val n = norm.length - k + 1
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      hashes(i) = (scala.util.hashing.MurmurHash3.stringHash(
        norm.substring(i, i + k), 0x1b873593).toLong << 32) |
        (scala.util.hashing.MurmurHash3.stringHash(
          norm.substring(i, i + k), 0x61c88647).toLong & 0xffffffffL)
      i += 1
    }
    // monotonic deque of indices: head = index of window minimum
    val out = scala.collection.mutable.LinkedHashSet[Long]()
    val deque = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < n) {
      while (!deque.isEmpty && hashes(deque.peekLast()) >= hashes(i)) deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst() <= i - w) deque.pollFirst()
      if (i >= w - 1 || n < w) out += hashes(deque.peekFirst())
      i += 1
    }
    out.toArray
  }

  private val fingerprintUdf = udf((t: String) => winnowFingerprint(t))

  def fingerprintCol(textCol: Column): Column = fingerprintUdf(textCol)

  /** Per-doc fingerprint set + size (rows-only; engine-specific hash).
    * The fingerprint set is emitted as a scalar digest + joined string, not
    * a raw array column — scalar columns keep the result sortable/hashable
    * by any downstream comparator.
    */
  def docFingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), fingerprintCol(col("text")).as("fingerprints"))
      .select(col("doc_id"),
        size(col("fingerprints")).as("n_fingerprints"),
        xxhash64(array_join(transform(col("fingerprints"),
          f => f.cast("string")), ",")).as("fp_digest"))
      .orderBy("doc_id")

  /** Driver gate for the winnowing projection (formerly a rows-only dump;
    * the seeded rolling hash is not SQL-expressible, its CONTRACT is): one
    * violation row per breach, oracle = empty set.
    *
    *  - DETERMINISM: two independent evaluations of the fingerprint UDF
    *    over the corpus must produce identical (doc_id, digest) rows —
    *    winnowing with a fixed seed is a pure function of the text, and a
    *    nondeterministic fingerprint silently breaks every downstream
    *    overlap join;
    *  - NON-EMPTY: any document long enough to window (≥ 200 chars — the
    *    sf corpus minimum is far above the winnow window) must yield at
    *    least one fingerprint;
    *  - SET DISCIPLINE: the fingerprint array is duplicate-free (winnow
    *    emits a SET; duplicates would double-count containment).
    */
  def docFingerprintsGate(spark: SparkSession, dir: String): DataFrame = {
    // cache + spread: the gate's three base-side branches (digest,
    // empties, dupes) otherwise EACH re-run the winnow UDF over the whole
    // corpus on the single scan split — 4 full winnow passes per serve
    // (incl. the fresh `b` evaluation below, which stays uncached BY
    // DESIGN: it is the independent recomputation the determinism check
    // compares against)
    val base = Tables.spreadCpuBound(
      Tables.documents(spark, dir)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("text"),
        fingerprintCol(col("text")).as("fingerprints"))
      .cache()
    def digest(c: Column): Column =
      xxhash64(array_join(transform(c, f => f.cast("string")), ","))
    val a = base.select(col("doc_id"), digest(col("fingerprints")).as("d1"))
    // a SECOND evaluation from the raw text (fresh UDF application, not a
    // reused plan subtree — the reselect forces recomputation)
    val b = Tables.spreadCpuBound(
      Tables.documents(spark, dir)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        digest(fingerprintCol(reverse(reverse(col("text"))))).as("d2"))
    val nondeterm = a.join(b, Seq("doc_id"))
      .filter(col("d1") =!= col("d2"))
      .select(col("doc_id"), lit("nondeterministic").as("violation"))
    val empties = base
      .filter(length(col("text")) >= 200 && size(col("fingerprints")) === 0)
      .select(col("doc_id"), lit("no_fingerprints").as("violation"))
    val dupes = base
      .filter(size(col("fingerprints")) =!= size(array_distinct(col("fingerprints"))))
      .select(col("doc_id"), lit("duplicate_fingerprints").as("violation"))
    nondeterm.union(empties).union(dupes).orderBy("doc_id", "violation")
  }

  private val docFingerprintsGateSql =
    """SELECT NULL::BIGINT AS doc_id, NULL::VARCHAR AS violation WHERE false""".stripMargin

  /** Shared (id, fp) projection: validate non-blank text, winnow, explode.
    * The one place the empty-text rule and fingerprint column live for
    * every fingerprint-join operator below.
    */
  private def explodeFingerprints(docs: DataFrame, idAs: String): DataFrame =
    docs
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id").as(idAs), explode(fingerprintCol(col("text"))).as("fp"))

  /** Fingerprint-overlap containment pairs: docs sharing >= threshold of
    * the smaller doc's fingerprints (explode → equi-join on hash → count —
    * the same never-all-pairs shape as Dedup). Operates on any
    * (doc_id, text) frame.
    */
  def fingerprintContainment(docs: DataFrame, threshold: Double): DataFrame = {
    val fp = explodeFingerprints(docs, "doc_id").cache()
    val sizes = fp.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    val shared = fp.as("x").join(fp.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_fp").as("fp_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_fp").as("fp_b")), Seq("doc_b"))
      .withColumn("containment",
        round(col("n_shared") / least(col("fp_a"), col("fp_b")).cast("double"), 6))
      .filter(col("containment") >= threshold)
      .select("doc_a", "doc_b", "containment")
      .orderBy("doc_a", "doc_b")
  }

  def fingerprintOverlaps(spark: SparkSession, dir: String): DataFrame =
    fingerprintContainment(
      Tables.documents(spark, dir).filter(col("doc_id") < 500), 0.3)

  /** Driver gate for the containment-pair join (formerly a rows-only
    * dump): one violation row per breach, oracle = empty set.
    *
    *  - PAIR DISCIPLINE: doc_a < doc_b and no duplicate pairs (the
    *    grouped join must not double-emit);
    *  - RANGE: containment in (0.3 .. 1.0] — a value above 1 means the
    *    shared count exceeded the smaller set (a join fanout bug);
    *  - EXACT-DUP RECALL against REAL data: any two in-scope documents
    *    with byte-identical text (md5 equi-group — the dedup_exact
    *    discipline) share their whole fingerprint set, so the pair MUST
    *    surface with containment exactly 1.0; a miss is a candidate-join
    *    or winnow regression at data scale.
    */
  def fingerprintOverlapsGate(spark: SparkSession, dir: String): DataFrame = {
    val overlaps = fingerprintOverlaps(spark, dir).cache()
    val badPair = overlaps.filter(col("doc_a") >= col("doc_b"))
      .select(col("doc_a"), col("doc_b"), lit("pair_order").as("violation"))
    val dupPair = overlaps.groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .select(col("doc_a"), col("doc_b"), lit("duplicate_pair").as("violation"))
    val range = overlaps
      .filter(col("containment") < 0.3 || col("containment") > 1.0)
      .select(col("doc_a"), col("doc_b"), lit("containment_range").as("violation"))
    val docs = Tables.documents(spark, dir)
      .filter(col("doc_id") < 500 && length(trim(col("text"))) > 0)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val exactPairs = docs.as("x").join(docs.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val missed = exactPairs.join(
        overlaps.filter(col("containment") === 1.0), Seq("doc_a", "doc_b"), "left_anti")
      .select(col("doc_a"), col("doc_b"), lit("exact_dup_missed").as("violation"))
    badPair.union(dupPair).union(range).union(missed)
      .orderBy("doc_a", "doc_b", "violation")
  }

  private val fingerprintOverlapsGateSql =
    """SELECT NULL::BIGINT AS doc_a, NULL::BIGINT AS doc_b,
      |       NULL::VARCHAR AS violation WHERE false""".stripMargin

  /** Structural oracle for winnowing fingerprints: plant an exact copy of
    * every doc with doc_id < 100 (salted id +100000); identical text must
    * yield identical fingerprint sets, so each planted pair must surface
    * with containment exactly 1.0. The DuckDB oracle enumerates the
    * planted pairs — a missed or inexact pair fails the driver compare.
    */
  def fingerprintPlantedContainment(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .filter(col("doc_id") < 200 && length(trim(col("text"))) > 0)
      .select("doc_id", "text")
    val planted = docs.filter(col("doc_id") < 100)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    fingerprintContainment(docs.union(planted), threshold = 0.3)
      .filter(col("doc_b") === col("doc_a") + 100000 && col("containment") === 1.0)
      .select("doc_a", "doc_b", "containment")
      .orderBy("doc_a")
  }

  private val fingerprintPlantedContainmentSql =
    """SELECT doc_id AS doc_a, doc_id + 100000 AS doc_b, 1.0::DOUBLE AS containment
      |FROM documents WHERE doc_id < 100 AND length(trim(text)) > 0
      |ORDER BY doc_a""".stripMargin

  /** Benchmark decontamination — the train/test-overlap removal every
    * training pipeline needs: flag corpus documents that CONTAIN a
    * benchmark document's fingerprints (≥ threshold of the BENCHMARK's
    * set — leakage means eval content present in a training doc; scoring
    * against the smaller of the two sets instead would flag any short doc
    * whose few fingerprints coincidentally all occur in some benchmark).
    * Same never-all-pairs shape as the near-dup family: explode both
    * sides to (id, fp), equi-join on the fingerprint hash, count,
    * threshold — at 100 TB only fingerprint hashes shuffle and the
    * benchmark side (thousands of eval docs, not billions) broadcasts.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      threshold: Double): DataFrame = {
    val corpusFp = explodeFingerprints(corpus, "doc_id")
    // cached: used twice (join side + sizes); without it the benchmark
    // scan and winnowing UDF execute twice
    val benchFp = explodeFingerprints(benchmark, "bench_id").cache()
    val benchSizes = benchFp.groupBy("bench_id").agg(count(lit(1)).as("bench_n_fp"))
    corpusFp.join(broadcast(benchFp), Seq("fp"))
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("n_shared"))
      .join(broadcast(benchSizes), Seq("bench_id"))
      .withColumn("containment",
        round(col("n_shared") / col("bench_n_fp").cast("double"), 6))
      .filter(col("containment") >= threshold)
      .groupBy(col("doc_id"))
      .agg(max(col("containment")).as("max_containment"),
        count(lit(1)).as("n_benchmarks_hit"))
      .orderBy("doc_id")
  }

  /** Planted decontamination oracle, enumerable at ANY scale factor: the
    * "benchmark" is 40 synthetic docs over a vocabulary disjoint from the
    * corpus ("zqNNNNN" tokens never occur in the testdata), and an exact
    * copy of each is planted INTO the corpus (doc_id 700000+i). The
    * flagged set must be exactly those planted copies — the real corpus
    * cannot share a single fingerprint with the benchmark, so any extra
    * row is a false-positive bug and any missing row a detection bug.
    * (The natural direction — benchmark = copies of real corpus docs —
    * is NOT enumerable: this corpus contains genuine near-dup/superset
    * pairs that a correct decontaminator also flags.)
    */
  /** SEMANTIC decontamination — the embedding-space complement of the
    * winnowing (exact n-gram) pass: a train doc is removed when its
    * embedding sits above a similarity threshold against ANY benchmark
    * item, catching near-verbatim leakage (reformatted, re-chunked, or
    * lightly edited copies) that exact n-gram fingerprints can miss —
    * standard post-hoc eval hygiene in pretraining reports; the
    * threshold dials how loose a match counts (this row's 0.999 is the
    * near-verbatim end; a production embedder catches paraphrase at
    * lower thresholds through the same plan). The
    * benchmark here is three items whose text IS the first three
    * md5-UNIQUE corpus docs (unique ⇒ no other doc shares their text ⇒
    * the contaminated set is enumerable: exactly those three sources)
    * plus one NOVEL item that must match nothing — a false positive
    * emits a (doc, 4) pair and fails the compare. Identical text ⇒
    * identical hash embedding ⇒ rounded cosine 1.0; distinct corpus
    * texts scoring ≥ 0.999 would break the construction and fail
    * LOUDLY (verified absent in the testdata — the embed_selfknn
    * discipline).
    *
    * Scale shape: the benchmark side is SMALL by nature (an eval suite)
    * and broadcasts; the corpus never moves and each doc scores |bench|
    * dot products in one codegen projection. A benchmark too large to
    * broadcast routes through the ANN families instead (each bench item
    * is a query; the contaminated set is the union of its
    * above-threshold neighbors). */
  def decontaminateSemantic(spark: SparkSession, dir: String): DataFrame = {
    val dim = 256
    val embed = udf((t: String) =>
      graft.vector.Embedding.hashingEmbed(t, dim))
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val bench = semanticBenchItems(spark, dir)
      .withColumn("bvec", embed(col("text"))).select("bench_id", "bvec")
    docs.withColumn("dvec", embed(col("text")))
      .crossJoin(broadcast(bench))
      .withColumn("score", round(
        graft.vector.VectorFunctions.cosineUnit(col("dvec"), col("bvec")), 6))
      .filter(col("score") >= 0.999)
      .select(col("doc_id"), col("bench_id"))
      .orderBy("doc_id", "bench_id")
  }

  /** The semantic-decontamination BENCHMARK, built once for both
    * routes: items 1..3 are the first three md5-unique corpus docs
    * (unique => the contaminated set is enumerable), item 4 is the
    * novel text that must match nothing. The broadcast and ANN routes
    * share one oracle and a route-equality spec — both rest on this
    * construction being a single definition that CANNOT drift. */
  private def semanticBenchItems(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val sources = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("doc_id"),
        min(col("text")).as("text"))
      .filter(col("n") === 1)
      .orderBy("doc_id").limit(3)
      .withColumn("bench_id", row_number().over(
        Window.orderBy(col("doc_id"))).cast("long"))
      .select(col("bench_id"), col("text"))
    sources.unionByName(
      Seq((4L, "zzqx novel benchmark item zzqy never in corpus"))
        .toDF("bench_id", "text"))
  }

  /** [[decontaminateSemantic]] through the ANN route — the
    * benchmark-too-large-to-broadcast shape the broadcast row's own doc
    * declares: each bench item becomes a BATCH QUERY against a persisted
    * LSH index over the corpus embeddings (`IndexBuilder.lshBatchTopK` —
    * probe-explode + bucket equi-join + bounded GroupTopK, the
    * offline-RAG batch shape), and the contaminated set is the union of
    * each item's above-threshold neighbors. At 100 TB neither side
    * broadcasts: the index is the standing corpus artifact, the bench
    * side is a probe-exploded join input, and per-query work is bucket-
    * pruned instead of a full corpus sweep. Route-equality is
    * STRUCTURAL at this threshold: 0.999 admits only identical-text
    * pairs (rounded cosine 1.0), and identical vectors share every LSH
    * bucket by construction, so radius-0 recall of true matches is
    * guaranteed — the same answer as the broadcast route, under the
    * same oracle (the router discipline the ANN families follow). */
  def decontaminateSemanticAnn(spark: SparkSession, dir: String): DataFrame = {
    val dim = 256
    val k = 10
    val embed = udf((t: String) =>
      graft.vector.Embedding.hashingEmbed(t, dim))
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val bench = semanticBenchItems(spark, dir)
      .withColumn("qvec", embed(col("text")))
      .select(col("bench_id").as("qid"), col("qvec"))
    val lsh = new graft.vector.IndexBuilder.RandomHyperplaneLsh(dim, nBits = 6, seed = 42L)
    val path = Tables.scratchPath("decon_lsh_idx", dir)
    ResultCache.buildIfAbsent(spark, docs, "deconlsh:bits=6:seed=42:v1",
      path) {
      graft.vector.IndexBuilder.buildLshIndex(
        docs.select(col("doc_id").as("vec_id"),
          embed(col("text")).as("embedding")),
        "embedding", lsh, path)
    }
    val hits = graft.vector.IndexBuilder
      .lshBatchTopK(spark.read.parquet(path),
        bench, "qid", "qvec", lsh, k = k, radius = 0)
      .filter(col("score") >= 0.999)
      .select(col("vec_id").as("doc_id"), col("qid").as("bench_id"),
        col("score"))
      .collect() // bounded by |bench| × k (GroupTopK), tiny by nature
    // The route-equality argument is STRUCTURAL (0.999 admits only
    // identical-text pairs; identical vectors share every radius-0
    // bucket) — these guards ASSERT its two empirical premises at serve
    // time instead of trusting them (r19 ADVICE): a per-item hit count
    // reaching k means the top-k cap may have truncated the
    // above-threshold set, and a passing score below exact 1.0 means
    // the threshold admitted a non-identical pair whose bucket recall
    // radius 0 does NOT guarantee. Either failure is a silent
    // contaminated-pair drop — refuse loudly; the paraphrase regime
    // with multiprobe recall is [[decontaminateParaphraseAnn]].
    hits.groupBy(_.getLong(1)).foreach { case (qid, rows) =>
      require(rows.length < k,
        s"decontaminate_semantic_ann: bench item $qid has >= $k " +
          "above-threshold neighbors — the top-k cap is binding and " +
          "may have dropped contaminated pairs; raise k")
    }
    hits.foreach { r =>
      require(r.getDouble(2) >= 1.0 - 1e-9,
        s"decontaminate_semantic_ann: pair (${r.getLong(0)}, " +
          s"${r.getLong(1)}) passed 0.999 with score ${r.getDouble(2)} " +
          "< 1.0 — a non-identical pair, whose recall radius 0 does " +
          "not guarantee; serve the paraphrase regime via " +
          "decontaminateParaphraseAnn instead")
    }
    import spark.implicits._
    hits.map(r => (r.getLong(0), r.getLong(1))).toSeq
      .sortBy(identity).toDF("doc_id", "bench_id")
  }

  // ---- semantic decontamination, PARAPHRASE regime ----
  //
  // The 0.999 rows pin only the identical-text regime; production
  // decontamination runs LOWER thresholds where lightly-edited copies
  // must still match — there LSH recall < 1 and the multiprobe radius
  // does real work. The construction is fully seeded (bit-stable at
  // every SF, the decontaminatePlanted discipline): 20 planted corpus
  // docs over a vocabulary disjoint from the testdata ("zpNNNNN"
  // tokens), each bench item a TRUNCATED copy (the re-chunked-leakage
  // shape) of one planted doc. Margins measured and spec-pinned:
  // pair cosines 0.934–0.961 under the hash embedder (threshold 0.9
  // clears by ≥ 0.03), cross-pair max 0.213, natural-corpus max 0.289
  // across sf0.001/0.01/0.1 (no false positive can reach 0.9), and the
  // pairs' LSH signatures differ by up to 3 bits at nBits = 6 — so
  // radius 3 is the measured full-recall probe set, and the spec pins
  // BOTH that recall and the radius-0 MISS that makes multiprobe
  // load-bearing.

  private[graft] val ParaphraseThreshold = 0.9

  /** Measured over the seeded construction: max pair Hamming distance
    * at nBits = 6 is 3 (distribution 0→11, 1→7, 2→1, 3→1 pairs). At
    * production bit-widths the same recall target prices a far smaller
    * bucket fraction; 6 toy bits make multiprobe coarse (42 of 64
    * buckets) but keep the spec's exhaustive check cheap. */
  private[graft] val ParaphraseRadius = 3

  private[graft] def paraphraseTokens(i: Int): Seq[String] = {
    val r = new scala.util.Random(8000 + i) // seeded: bit-stable everywhere
    (0 until 60).map(_ => "zp" + r.nextInt(100000))
  }

  /** The 20 planted corpus docs (ids 750000+i) and their truncated
    * bench copies (bench_id i+1, first 54 of 60 tokens). */
  private[graft] def paraphrasePlanted(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 20).map(i => (750000L + i, paraphraseTokens(i).mkString(" ")))
      .toDF("doc_id", "text")
  }
  private[graft] def paraphraseBench(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 20).map(i =>
        (i + 1L, paraphraseTokens(i).take(54).mkString(" ")))
      .toDF("bench_id", "text")
  }

  /** Paraphrase-threshold decontamination, BROADCAST route: the small
    * eval suite broadcasts, every corpus doc scores |bench| dot
    * products in one codegen projection, pairs ≥ 0.9 flag. The flagged
    * set is exactly the 20 planted (truncated-copy) pairs — enumerable
    * at any SF because the margins are construction constants, not
    * data facts (spec-pinned in absolute terms). */
  def decontaminateParaphrase(spark: SparkSession, dir: String): DataFrame = {
    val dim = 256
    val embed = udf((t: String) =>
      graft.vector.Embedding.hashingEmbed(t, dim))
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .unionByName(paraphrasePlanted(spark))
    val bench = paraphraseBench(spark)
      .withColumn("bvec", embed(col("text"))).select("bench_id", "bvec")
    docs.withColumn("dvec", embed(col("text")))
      .crossJoin(broadcast(bench))
      .withColumn("score", round(
        graft.vector.VectorFunctions.cosineUnit(col("dvec"), col("bvec")), 6))
      .filter(col("score") >= ParaphraseThreshold)
      .select(col("doc_id"), col("bench_id"))
      .orderBy("doc_id", "bench_id")
  }

  /** Paraphrase-threshold decontamination through the ANN route — the
    * regime the 0.999 row's structural argument does NOT cover: edited
    * copies' vectors are near-but-not-identical, so bucket recall is
    * probabilistic and the MULTIPROBE radius buys it back
    * ([[ParaphraseRadius]] = the measured full-recall radius for this
    * construction; the spec pins that radius 0 genuinely misses pairs).
    * Neither side broadcasts at scale: the index is the standing
    * corpus artifact, bench items probe-explode into a bucket
    * equi-join, per-query work is bucket-pruned. Same answer and
    * oracle as the broadcast row (the router discipline). */
  def decontaminateParaphraseAnn(spark: SparkSession,
      dir: String): DataFrame =
    decontaminateParaphraseAnnWith(spark, dir, k = 10,
      radius = ParaphraseRadius)

  /** (k, radius)-parameterized body — the spec drives k = 1 to prove
    * the cap guard refuses loudly, and radius = 0 to pin the recall
    * loss that makes multiprobe load-bearing. */
  private[graft] def decontaminateParaphraseAnnWith(spark: SparkSession,
      dir: String, k: Int, radius: Int): DataFrame = {
    val dim = 256
    val embed = udf((t: String) =>
      graft.vector.Embedding.hashingEmbed(t, dim))
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val lsh = new graft.vector.IndexBuilder.RandomHyperplaneLsh(dim,
      nBits = 6, seed = 42L)
    val path = Tables.scratchPath("decon_para_lsh_idx", dir)
    ResultCache.buildIfAbsent(spark, docs, "deconparalsh:bits=6:seed=42:v1",
      path) {
      graft.vector.IndexBuilder.buildLshIndex(
        docs.unionByName(paraphrasePlanted(spark))
          .select(col("doc_id").as("vec_id"),
            embed(col("text")).as("embedding")),
        "embedding", lsh, path)
    }
    val bench = paraphraseBench(spark)
      .withColumn("qvec", embed(col("text")))
      .select(col("bench_id").as("qid"), col("qvec"))
    val hits = graft.vector.IndexBuilder
      .lshBatchTopK(spark.read.parquet(path),
        bench, "qid", "qvec", lsh, k = k, radius = radius)
      .filter(col("score") >= ParaphraseThreshold)
      .select(col("vec_id").as("doc_id"), col("qid").as("bench_id"),
        col("score"))
      .collect() // bounded by |bench| × k (GroupTopK)
    // same serve-time cap guard as the 0.999 route: a per-item hit
    // count reaching k means the top-k cap may have truncated the
    // above-threshold set — a silent contaminated-pair drop
    hits.groupBy(_.getLong(1)).foreach { case (qid, rows) =>
      require(rows.length < k,
        s"decontaminate_paraphrase_ann: bench item $qid has >= $k " +
          "above-threshold neighbors — raise k")
    }
    import spark.implicits._
    hits.map(r => (r.getLong(0), r.getLong(1))).toSeq
      .sortBy(identity).toDF("doc_id", "bench_id")
  }

  /** Each planted doc pairs with its own truncated bench item. */
  private val decontaminateParaphraseSql =
    """SELECT CAST(750000 + range AS BIGINT) AS doc_id,
      |       CAST(range + 1 AS BIGINT) AS bench_id
      |FROM range(20) ORDER BY doc_id, bench_id""".stripMargin

  /** The three unique sources pair with their own bench items; the
    * novel item pairs with nothing. */
  private val decontaminateSemanticSql =
    """WITH h AS (
      |  SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS doc_id
      |  FROM documents GROUP BY 1),
      |uniq AS (SELECT doc_id FROM h WHERE n = 1 ORDER BY doc_id LIMIT 3)
      |SELECT doc_id,
      |       CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS bench_id
      |FROM uniq ORDER BY doc_id, bench_id""".stripMargin

  def decontaminatePlanted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val benchTexts = (0 until 40).map { i =>
      val r = new scala.util.Random(7000 + i) // seeded: bit-stable everywhere
      (i, (0 until 80).map(_ => "zq" + r.nextInt(100000)).mkString(" "))
    }
    val benchmark = benchTexts
      .map { case (i, t) => (500000L + i, t) }.toDF("doc_id", "text")
    val planted = benchTexts
      .map { case (i, t) => (700000L + i, t) }.toDF("doc_id", "text")
    val corpus = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .union(planted)
    decontaminate(corpus, benchmark, threshold = 0.8)
  }

  private val decontaminatePlantedSql =
    """SELECT 700000 + range AS doc_id, 1.0::DOUBLE AS max_containment,
      |       1::BIGINT AS n_benchmarks_hit
      |FROM range(40) ORDER BY doc_id""".stripMargin

  /** End-to-end corpus curation (the C4/Gopher-style pipeline): language-ID
    * filter → quality-score floor → exact dedup (min doc_id survives per
    * distinct text) → per-doc curation record. Quality metrics and the
    * language classifier evaluate in ONE narrow projection over the scan
    * (no self-joins — the first formulation joined textQuality⋈langId and
    * re-joined the survivors, evaluating the classifier twice and adding
    * three shuffles; measured 7.2 s → this shape at sf0.1), and `min_by`
    * picks the survivor's attributes inside the single content-hash
    * shuffle. Two stages at any scale. The oracle replays every stage in
    * DuckDB, so a regression anywhere in the chain (classifier, scorer,
    * survivor rule) fails one compare.
    */
  /** Fused per-doc curation metrics: ONE tokenize pass feeding word count,
    * stopword hits, word-char sum, and the language classifier. The
    * unfused formulation (HOF metrics + separate langId UDF) tokenized
    * every document twice — once in interpreted lambda HOFs, once in the
    * UDF — and spent iteration-1 codegen on the HOF trees; measured 3.9 s
    * → ~2 s at sf0.1 from this fusion. Values are bit-identical to the
    * HOF path (same tokenizer, same integer arithmetic), which the
    * corpus_curation oracle re-checks end-to-end every round.
    */
  private val stopSet: Set[String] = EnglishStopwords.toSet

  def docMetricsScala(text: String): (Int, Int, Long, Long, String) = {
    val toks = if (text == null) Array.empty[String] else tokenize(text)
    var wordChars = 0L; var stopHits = 0; var i = 0
    while (i < toks.length) {
      wordChars += toks(i).length
      if (stopSet.contains(toks(i))) stopHits += 1
      i += 1
    }
    val (score, lang) =
      if (text == null || text.isEmpty) (0L, LangProfiles.head._1)
      else scriptCheck(text).getOrElse(profileArgmax(toks))
    (toks.length, stopHits, wordChars, score, lang)
  }

  // asNondeterministic: the function IS deterministic — the flag only stops
  // Catalyst from pushing the downstream lang/quality Filter below this
  // projection, which substitutes the struct fields and evaluates the UDF
  // (and its tokenize) SEVEN times per row (observed in the physical plan).
  private val docMetricsUdf = udf(docMetricsScala _).asNondeterministic()

  def corpusCuration(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("text"), docMetricsUdf(col("text")).as("m"))
      .select(
        col("doc_id"), col("text"),
        col("m._1").cast("long").as("n_words"),
        col("m._2").cast("long").as("stop_hits"),
        round(col("m._3") / col("m._1").cast("double"), 6).as("avg_word_len"),
        struct(col("m._4").as("score"), col("m._5").as("lang")).as("pred"))
      .withColumn("quality_score", qualityScoreCol)
      .filter(col("pred.lang") === "en" && col("quality_score") >= 0.5)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(
        min_by(
          struct(col("doc_id"), col("n_words"), col("quality_score"),
            col("pred.score").as("lang_score_micro")),
          col("doc_id")).as("surv"),
        count(lit(1)).as("n_copies"))
      .select(col("surv.doc_id").as("doc_id"), col("surv.n_words").as("n_words"),
        col("surv.quality_score").as("quality_score"),
        col("surv.lang_score_micro").as("lang_score_micro"), col("n_copies"))
      .orderBy("doc_id")
  }

  private val corpusCurationSql =
    s"""WITH q AS ($textQualitySql),
       |l AS ($langIdSql),
       |scored AS (
       |  SELECT q.doc_id, q.n_words, q.quality_score, l.lang_score_micro
       |  FROM q JOIN l ON q.doc_id = l.doc_id
       |  WHERE l.pred_lang = 'en' AND q.quality_score >= 0.5),
       |surv AS (
       |  SELECT min(s.doc_id) AS doc_id, count(*) AS n_copies
       |  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
       |  GROUP BY md5(d.text))
       |SELECT s.doc_id, n_words, quality_score, lang_score_micro, n_copies
       |FROM surv JOIN scored s ON surv.doc_id = s.doc_id
       |ORDER BY s.doc_id""".stripMargin

  /** Deterministic stratified sampling for training-data mixing: keep a
    * document iff the first hex digit of md5(text) falls under its
    * language's quota (en keeps 8/16 ≈ 50%, everything else 4/16 = 25%).
    * Content-hash gating — not rand() — so the sample is reproducible
    * across runs, partitionings, and engines (SURVEY §7.5 determinism
    * rule), dedup-stable (identical texts sample identically), and
    * embarrassingly parallel: a pure filter, no shuffle at any scale.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket16",
        expr("locate(substring(md5(text), 1, 1), '0123456789abcdef') - 1"))
      .filter((col("lang") === "en" && col("bucket16") < 8) ||
        (col("lang") =!= "en" && col("bucket16") < 4))
      .select(col("doc_id"), col("lang"), col("bucket16").cast("int").as("bucket16"))
      .orderBy("doc_id")

  private val stratifiedSampleSql =
    """SELECT doc_id, lang,
      |       CAST(strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS INTEGER) AS bucket16
      |FROM documents
      |WHERE (lang = 'en' AND strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 < 8)
      |   OR (lang <> 'en' AND strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 < 4)
      |ORDER BY doc_id""".stripMargin

  /** Epoch-weighted mixture materialization — the training-mix step that
    * up/down-samples sources by repetition weight (en ×2.0, de ×1.0,
    * fr ×0.5, others ×0.25 here). Weights are sixteenths: every doc gets
    * `w div 16` full copies plus one more iff its md5 hex digit falls
    * under `w mod 16` — the same content-hash gate as stratifiedSample,
    * so the materialized mix is reproducible and engine-checkable, and
    * the fractional part is exact in expectation per hash bucket rather
    * than approximate per rand() draw.
    */
  def mixtureWeights(spark: SparkSession, dir: String): DataFrame = {
    val w16 = when(col("lang") === "en", 32)
      .when(col("lang") === "de", 16)
      .when(col("lang") === "fr", 8)
      .otherwise(4)
    val bucket16 =
      expr("locate(substring(md5(text), 1, 1), '0123456789abcdef') - 1")
    Tables.documents(spark, dir)
      .select(col("lang"),
        (w16.divide(16).cast("long") +
          when(bucket16 < w16 % 16, 1L).otherwise(0L)).as("n_copies"))
      .groupBy(col("lang"))
      .agg(sum(col("n_copies")).as("weighted_docs"),
        count(when(col("n_copies") > 0, 1)).as("docs_contributing"),
        count(lit(1)).as("docs_total"))
      .orderBy("lang")
  }

  private val mixtureWeightsSql =
    """WITH w AS (
      |  SELECT lang,
      |         CASE lang WHEN 'en' THEN 32 WHEN 'de' THEN 16 WHEN 'fr' THEN 8 ELSE 4 END AS w16,
      |         strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS bucket16
      |  FROM documents)
      |SELECT lang,
      |       sum(w16 // 16 + CASE WHEN bucket16 < w16 % 16 THEN 1 ELSE 0 END)::BIGINT AS weighted_docs,
      |       count(CASE WHEN w16 // 16 + CASE WHEN bucket16 < w16 % 16 THEN 1 ELSE 0 END > 0 THEN 1 END) AS docs_contributing,
      |       count(*) AS docs_total
      |FROM w GROUP BY lang ORDER BY lang""".stripMargin

  /** Sequence packing / shard assignment by cumulative token budget — the
    * step that turns a curated corpus into fixed-size pretraining shards
    * (each shard holds ~seqLen tokens of consecutive documents). Documents
    * are laid out deterministically (per-lang, doc_id order), a running
    * token sum places each doc, and its shard is the bin its START offset
    * falls in: `shard = (cum - n_tokens) DIV seqLen`. Pure window
    * arithmetic — identical in DuckDB, so the whole layout hash-compares.
    *
    * Scale note: the running sum partitions by lang, which is unbounded at
    * 100 TB; production runs the same expression partitioned by
    * (lang, content-hash prefix) so every window partition is bounded —
    * the layout stays deterministic, only the partition key widens.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seqLen = 4096
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("lang"),
        size(tokensCol(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("shard",
        expr(s"(cum_tokens - n_tokens) DIV $seqLen"))
      .withColumn("offset_in_shard",
        expr(s"(cum_tokens - n_tokens) % $seqLen"))
      .orderBy("lang", "doc_id")
  }

  private val packSequencesSql =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |         len(list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
      |                         x -> length(x) > 0)) AS n_tokens
      |  FROM documents WHERE length(trim(text)) > 0),
      |c AS (
      |  SELECT doc_id, lang, n_tokens,
      |         CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT)
      |           AS cum_tokens
      |  FROM t)
      |SELECT doc_id, lang, n_tokens, cum_tokens,
      |       (cum_tokens - n_tokens) // 4096 AS shard,
      |       (cum_tokens - n_tokens) % 4096 AS offset_in_shard
      |FROM c ORDER BY lang, doc_id""".stripMargin

  /** Heavy-hitter n-grams per language: the top-5 token bigrams by corpus
    * frequency — the boilerplate/template detector every corpus report
    * leads with (a bigram that dominates a language is a scraper artifact
    * or licence header, not language). Rank is (count desc, bigram asc) so
    * tie membership is deterministic cross-engine. Shape: doc-local
    * bigrams explode to (lang, bigram) counts — map-side partial — then
    * one rank window over the distinct-bigram aggregate, never the corpus.
    */
  def topNgramsPerLang(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("lang"), Dedup.tokensCol(col("text")).as("tok"))
      .filter(size(col("tok")) >= 2)
    val bigrams = toks.select(col("lang"),
      explode(zip_with(
        slice(col("tok"), lit(1), greatest(size(col("tok")) - 1, lit(0))),
        slice(col("tok"), lit(2), greatest(size(col("tok")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("bigram"))
    bigrams.groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(col("n").desc, col("bigram").asc)).cast("long"))
      .filter(col("rank") <= 5)
      .select("lang", "rank", "bigram", "n")
      .orderBy("lang", "rank")
  }

  private val topNgramsPerLangSql =
    """WITH toks AS (
      |  SELECT lang,
      |         list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
      |                     t -> length(t) > 0) AS tok
      |  FROM documents WHERE length(trim(text)) > 0),
      |b AS (
      |  SELECT lang, bigram
      |  FROM toks, UNNEST(list_transform(generate_series(1, len(tok) - 1),
      |         i -> tok[i] || ' ' || tok[i+1])) AS u(bigram)
      |  WHERE len(tok) >= 2),
      |c AS (SELECT lang, bigram, count(*) AS n FROM b GROUP BY 1, 2),
      |r AS (SELECT lang, bigram, n,
      |             row_number() OVER (PARTITION BY lang
      |                                ORDER BY n DESC, bigram ASC) AS rank
      |      FROM c)
      |SELECT lang, rank, bigram, n FROM r WHERE rank <= 5
      |ORDER BY lang, rank""".stripMargin

  // ---- integer surprisal scoring (unigram-LM cross-entropy, in bits) ----

  /** Per-document surprisal against the corpus's own unigram LM — the
    * CCNet/Gopher "perplexity bucket" quality signal, made cross-engine
    * exact by computing floor(log2) in PURE INTEGER arithmetic:
    * `s(tok) = len(bin(N DIV cnt)) - 1` bits (N = corpus token count,
    * cnt = token frequency), doc surprisal = Σ occurrences · s(tok).
    * No float log ever runs, so the DuckDB oracle reproduces every score
    * bit-for-bit. Boilerplate-heavy docs (common tokens) score low;
    * rare-vocabulary docs score high — the mixture/filtering axis.
    *
    * Scale: tokens shuffle as (doc_id, tok) then tok — text never
    * crosses an exchange (the bm25 discipline); the LM "training" is one
    * token-key aggregation; the scoring join is a token equi-join; the
    * corpus total is a 1-row broadcast.
    */
  def surprisalScores(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), explode(filter(
        split(lower(col("text")), "[^\\p{L}\\p{N}]+"),
        t => length(t) > 0)).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val vocab = perDoc.groupBy("tok").agg(sum(col("c")).as("cnt"))
    val totalN = vocab.agg(sum(col("cnt")).as("n_total"))
    perDoc.join(vocab, "tok")
      .crossJoin(broadcast(totalN))
      .withColumn("s_tok",
        (length(bin(expr("n_total DIV cnt"))) - 1).cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * col("s_tok")).as("surprisal_bits"))
      .withColumn("mean_mbits", expr("1000000 * surprisal_bits DIV n_tokens"))
      .orderBy("doc_id")
  }

  private val surprisalScoresSql =
    """WITH toks AS (
      |  SELECT doc_id,
      |         unnest(list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
      |                x -> length(x) > 0)) AS tok
      |  FROM documents WHERE length(trim(text)) > 0),
      |dt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
      |vocab AS (SELECT tok, sum(c) AS cnt FROM dt GROUP BY tok),
      |tot AS (SELECT sum(cnt) AS n_total FROM vocab),
      |s AS (SELECT d.doc_id, d.c, length(bin(t.n_total // v.cnt)) - 1 AS s_tok
      |      FROM dt d JOIN vocab v USING (tok) CROSS JOIN tot t)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |       CAST(sum(c * s_tok) AS BIGINT) AS surprisal_bits,
      |       CAST((1000000 * sum(c * s_tok)) // sum(c) AS BIGINT) AS mean_mbits
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DSIR-style importance weighting for data selection (Xie et al.
    * 2023, "Data Selection for Language Models via Importance
    * Resampling", arXiv:2302.03169), integerized with the surprisal
    * row's floor(log2) trick so every weight is bit-exact cross-engine:
    * the per-token log importance log2(p_target/p_raw) becomes
    * `s_raw(tok) - s_tgt(tok)` with `s(tok) = len(bin(N DIV cnt)) - 1`
    * — no float log ever runs. The TARGET is a PLANTED sample LM (a
    * literal token histogram boosting vector/window/merge/hash 12x over
    * the baseline): this corpus's lang and source slices were MEASURED
    * to share one 31-token vocabulary with near-identical frequencies,
    * so no corpus slice can discriminate — and the planted sample is
    * the real deployment shape anyway, where the target corpus (the
    * Wikipedia/books sample in the paper) arrives from OUTSIDE the raw
    * corpus and only its broadcast-scale unigram stats ship to
    * executors. Tokens absent from the target take a count floor of 1.
    *
    * Selection is by RANK, as in the paper's resampling step (an
    * absolute zero threshold is meaningless after floor-log2
    * quantization): the top fifth by (logw_bits DESC, doc_id ASC) is
    * selected — a content-deterministic total order, so the cut is
    * reproducible across runs, partitionings, and engines. Measured at
    * sf0.001/0.01/0.1: the selected fifth carries a consistently higher
    * boosted-token fraction (~0.15 vs ~0.13 — the iid synthetic corpus
    * bounds how sharp any selector can be; direction is spec-pinned).
    *
    * Scale: the bm25/surprisal discipline — text never crosses an
    * exchange; the raw LM is one token-key aggregation; the target LM
    * and corpus total are broadcast-scale; scoring is a token
    * equi-join. The global rank window is the resampling step — at
    * 100 TB the cut becomes a threshold on logw_bits and selection a
    * pure filter: [[dsirThresholdSelection]] below, the built analog of
    * `datasetSplitHashed`'s mega-strata fallback.
    */
  def dsirImportanceWeights(spark: SparkSession, dir: String): DataFrame = {
    // Two-phase DISTRIBUTED global rank (the resampling cut) — replaces
    // the former `Window.orderBy(logw_bits desc, doc_id asc)` with no
    // partitionBy, which funneled the whole corpus through ONE task
    // (WindowExec "No Partition Defined"). Phase 1: range-partition +
    // sort within partitions on the rank key — ordered partitions, rows
    // ordered within each, i.e. exactly the orderBy execution shape, in
    // parallel. Phase 2: per-partition row counts (one bounded collect —
    // #partitions rows) become broadcast offsets, and each row's global
    // row_number is offset(pid) + its within-partition ordinal. The rank
    // is INVARIANT to where the sampled range boundaries land (the key
    // has no ties: doc_id is unique), so the result is deterministic
    // regardless of partitioning; both localCheckpoints make the counts
    // probe and the rank projection read the SAME materialized
    // partitioning (and run the weight pipeline once, not once per
    // range-sampling pass).
    val lw = dsirLogWeights(spark, dir).localCheckpoint(true)
    val sorted = lw
      .repartitionByRange(col("logw_bits").desc, col("doc_id").asc)
      .sortWithinPartitions(col("logw_bits").desc, col("doc_id").asc)
      .localCheckpoint(true)
    val counts = sorted.groupBy(spark_partition_id().as("pid"))
      .count().collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum
    if (counts.isEmpty)
      // empty corpus: no rows to rank (the map literal below would not
      // even analyze with zero entries)
      lw.withColumn("selected", lit(false))
        .select("doc_id", "n_tokens", "logw_bits", "selected")
    else {
      val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (p, c)) =>
        (p, acc + c) }.init.zip(counts).map { case ((_, off), (p, _)) => (p, off) }
      val offMap = map(offsets.flatMap { case (p, o) =>
        Seq(lit(p), lit(o)) }: _*)
      // monotonically_increasing_id: partition id in the upper bits,
      // within-partition record number in the LOW 33 bits (documented
      // layout) — the ordinal over the checkpointed, sorted blocks
      val ord = monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1))
      sorted
        .withColumn("rk",
          element_at(offMap, spark_partition_id()) + ord + lit(1L))
        // rk is built in LongType: the ×5 must not wrap past ~429M docs
        // (non-ANSI), or deep-tail docs would silently flag selected
        // while the BIGINT oracle doesn't
        .withColumn("selected", col("rk") * 5 <= lit(total))
        .select("doc_id", "n_tokens", "logw_bits", "selected")
        .orderBy("doc_id")
    }
  }

  /** The per-doc DSIR log-weight frame (doc_id, n_tokens, logw_bits) —
    * the shared core of the exact-rank row above and the threshold rows
    * below. */
  private[graft] def dsirLogWeights(spark: SparkSession, dir: String): DataFrame = {
    val nTgt = DsirTargetSample.map(_._2).sum
    val perDoc = Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        explode(filter(
          split(lower(col("text")), "[^\\p{L}\\p{N}]+"),
          t => length(t) > 0)).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val vocab = perDoc.groupBy("tok").agg(sum(col("c")).as("cnt_raw"))
    val totals = vocab.agg(sum(col("cnt_raw")).as("n_raw"))
    import spark.implicits._
    val tgt = DsirTargetSample.toDF("tok", "cnt_tgt")
    perDoc.join(vocab, "tok")
      .join(broadcast(tgt), Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("s_raw",
        (length(bin(expr("n_raw DIV cnt_raw"))) - 1).cast("long"))
      .withColumn("s_tgt",
        (length(bin(expr(s"${nTgt}L DIV coalesce(cnt_tgt, 1L)"))) - 1)
          .cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * (col("s_raw") - col("s_tgt"))).as("logw_bits"))
  }

  /** The THRESHOLD form of DSIR selection — the documented fallback of
    * the exact-rank cut above: SELECTION is a pure FILTER
    * (`logw_bits >= T`), map-only over the weight frame, with no global
    * rank window (spec-pinned plan). Ties AT the boundary are all
    * included, so the selected set is a superset of the exact fifth
    * (spec-pinned); both engines compute the identical integer
    * threshold, so the row is exactly oracle-checkable. The threshold
    * HERE is the exact boundary via TakeOrdered(⌊n/5⌋) + min — the
    * quantizedKnn cutoff shape, fine while ⌊n/5⌋-row heaps fit an
    * executor (~10^8 docs); at extreme scale T comes from a sampled
    * quantile instead ([[dsirThresholdSampled]], built and gated), and
    * the selection stage — the point of the fallback — is unchanged. A
    * corpus too small for a fifth selects nothing, matching the
    * oracle's empty set. */
  def dsirThresholdSelection(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint: the weight frame is consumed THREE times (count,
    // threshold, selection filter) and its lineage is the corpus-heavy
    // tokenize/join pipeline — materialize the tiny (doc_id, 2 longs)
    // frame once instead of recomputing it per pass (2.2→1.5 s at sf0.1)
    val lw = dsirLogWeights(spark, dir).localCheckpoint()
    val n = lw.count()
    val k = n / 5
    require(k <= Int.MaxValue,
      s"exact-boundary threshold needs k=$k <= Int.MaxValue rows — use " +
        "the sampled-quantile threshold at this scale " +
        "([[dsirThresholdSampled]], the built approx_percentile path)")
    if (k == 0L)
      return lw.filter(lit(false))
        .select("doc_id", "n_tokens", "logw_bits")
    val thr = lw.select("logw_bits")
      .orderBy(col("logw_bits").desc).limit(k.toInt)
      .agg(min(col("logw_bits"))).head().getLong(0)
    dsirSelectAtThreshold(lw, thr).orderBy("doc_id")
  }

  /** THE selection stage both threshold rows share — the point of the
    * fallback: a pure map-only filter over the weight frame, no global
    * rank window (the no-WindowExec plan property is spec-pinned on this
    * frame; a refactor reintroducing a rank here must fail there). */
  private[graft] def dsirSelectAtThreshold(lw: DataFrame,
      t: Long): DataFrame =
    lw.filter(col("logw_bits") >= t)
      .select("doc_id", "n_tokens", "logw_bits")

  /** The SAMPLED-QUANTILE form of the DSIR threshold — the >1e8-doc
    * regime [[dsirThresholdSelection]]'s guard names, built: the exact
    * TakeOrdered boundary stops fitting one executor's heap there, so T
    * comes from `approx_percentile` (Greenwald–Khanna at accuracy 10⁴ —
    * one mergeable-sketch aggregation, no rank sort, no k-row heap) and
    * SELECTION stays exactly what the fallback exists for: a pure
    * map-only filter `logw_bits >= T` with no global rank window
    * (spec-pinned plan property shared with the exact row).
    *
    * The row is a GATE (the approx_quantile_gate discipline): an
    * approximate T has no cross-engine oracle, so the row verifies the
    * estimate lands INSIDE the exact discrete rank band around the
    * target — T must select between 15% and 25% of docs (the exact
    * boundary values at those ranks, computed here via the same bounded
    * TakeOrdered + min the exact row uses — test scaffolding, not the
    * selection path). Violations (must be none) also audit selection
    * monotonicity: the selected count must sit between the band edges'
    * own counts. */
  def dsirThresholdSampled(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    def noViolations =
      Seq.empty[(String, Long)].toDF("violation", "detail")
        .select(col("violation"), col("detail").cast("long"))
    val lw = dsirLogWeights(spark, dir).localCheckpoint()
    val n = lw.count()
    // too small for the band to be meaningful — nothing to gate
    if (n < 20L) return noViolations
    // the sampled threshold: the 80th percentile of logw_bits ⇒ the top
    // ~fifth selects — ONE sketch aggregation, the 100 TB path
    val t = lw.agg(percentile_approx(col("logw_bits"), lit(0.8), lit(10000)))
      .head().getLong(0)
    // exact discrete band edges (rank 15% and 25% from the top): GK at
    // accuracy 10⁴ must land the estimate inside it. Bounded TakeOrdered
    // per edge — GATE scaffolding with the exact row's own k bound (the
    // SELECTION path above has no such bound; past it, gate against a
    // sampled reference or a subsampled band instead)
    def valueAtTopRank(k: Long): Long = {
      require(k <= Int.MaxValue,
        s"exact band edge needs k=$k <= Int.MaxValue rows — the gate's " +
          "exact-rank scaffolding stops here, not the sampled selection " +
          "it audits; gate against a subsampled band at this scale")
      lw.select("logw_bits")
        .orderBy(col("logw_bits").desc).limit(k.toInt)
        .agg(min(col("logw_bits"))).head().getLong(0)
    }
    val hi = valueAtTopRank(math.max(1L, n * 15 / 100)) // 85th pct value
    val lo = valueAtTopRank(n * 25 / 100)               // 75th pct value
    // THE selection — the shared pure-filter stage (no rank window,
    // spec-pinned on dsirSelectAtThreshold's frame)
    val selected = dsirSelectAtThreshold(lw, t)
    val selCount = selected.count()
    val inBandCounts =
      selCount >= lw.filter(col("logw_bits") >= hi).count() &&
        selCount <= lw.filter(col("logw_bits") >= lo).count()
    val violations =
      (if (t < lo || t > hi)
        Seq(("dsir_sampled_thr_out_of_band", t)) else Nil) ++
      (if (!inBandCounts)
        Seq(("dsir_sampled_selection_count", selCount)) else Nil)
    if (violations.isEmpty) noViolations
    else violations.toDF("violation", "detail")
      .select(col("violation"), col("detail").cast("long"))
  }

  private val dsirThresholdSampledSql =
    """SELECT NULL::VARCHAR AS violation, NULL::BIGINT AS detail WHERE false""".stripMargin

  /** The planted DSIR target sample: the raw corpus's 31-token
    * vocabulary at baseline 250 with four tokens boosted 12x. Literal
    * so the DuckDB oracle receives the identical histogram. */
  private val DsirTargetSample: Seq[(String, Long)] = {
    val boosted = Set("vector", "window", "merge", "hash")
    ("join hash row batch scan customer column filter small slow merge " +
      "order vector line data table agg value key stream window spark a " +
      "group part big sort query fast the dup").split(" ").toSeq
      .map(t => (t, if (boosted(t)) 3000L else 250L))
  }

  /** The CTE chain reconstructing the per-doc log-weight frame in DuckDB
    * (tokenizer parity + integer bit quantization) — shared by both DSIR
    * oracles. */
  private val dsirSqlCtes = {
    val vals = DsirTargetSample
      .map { case (t, c) => s"('$t', $c)" }.mkString(", ")
    s"""WITH tgt(tok, cnt_tgt) AS (VALUES $vals),
      |tot_tgt AS (SELECT sum(cnt_tgt) AS n_tgt FROM tgt),
      |toks AS (
      |  SELECT doc_id,
      |         unnest(list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'),
      |                x -> length(x) > 0)) AS tok
      |  FROM documents WHERE length(trim(text)) > 0),
      |dt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
      |vocab AS (SELECT tok, sum(c) AS cnt_raw FROM dt GROUP BY tok),
      |tot AS (SELECT sum(cnt_raw) AS n_raw FROM vocab),
      |s AS (SELECT d.doc_id, d.c,
      |             length(bin(t.n_raw // v.cnt_raw)) - 1 AS s_raw,
      |             length(bin(tt.n_tgt // coalesce(g.cnt_tgt, 1))) - 1 AS s_tgt
      |      FROM dt d JOIN vocab v USING (tok) CROSS JOIN tot t
      |      CROSS JOIN tot_tgt tt LEFT JOIN tgt g USING (tok)),
      |lw AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |              CAST(sum(c * (s_raw - s_tgt)) AS BIGINT) AS logw_bits
      |       FROM s GROUP BY doc_id)""".stripMargin
  }

  // CONCATENATED, not interpolated into an outer stripMargin: a future
  // '|' inside the shared CTE block (a regex alternation, say) would be
  // mangled by the outer strip and corrupt both oracles silently
  private val dsirImportanceWeightsSql =
    dsirSqlCtes + ",\n" +
      """r AS (SELECT *, row_number() OVER (ORDER BY logw_bits DESC, doc_id ASC) AS rk,
      |             count(*) OVER () AS total FROM lw)
      |SELECT doc_id, n_tokens, logw_bits,
      |       CAST(rk * 5 <= total AS BOOLEAN) AS selected
      |FROM r ORDER BY doc_id""".stripMargin

  /** The threshold is the smallest log-weight among the exact top fifth
    * (an integer, so both engines agree bit-for-bit); the selection is
    * every doc at or above it — the exact fifth plus its boundary ties. */
  private val dsirThresholdSelectionSql =
    dsirSqlCtes + ",\n" +
      """t AS (SELECT min(logw_bits) AS thr FROM (
      |  SELECT logw_bits,
      |         row_number() OVER (ORDER BY logw_bits DESC, doc_id) AS rk,
      |         count(*) OVER () AS n
      |  FROM lw) WHERE rk * 5 <= n)
      |SELECT l.doc_id, l.n_tokens, l.logw_bits
      |FROM lw l, t WHERE l.logw_bits >= t.thr
      |ORDER BY doc_id""".stripMargin

  /** Weighted deterministic sampling WITHOUT randomness: keep a doc iff
    * its md5 prefix, read as a 60-bit hex number, falls below a
    * per-doc threshold proportional to its weight (here n_chars) — so
    * inclusion probability ∝ weight, yet membership is a pure function
    * of content (reproducible across runs, dedup-stable, engine-
    * checkable — the stratifiedSample contract extended to weights).
    * The numeric compare happens in HEX-STRING space on both sides
    * (fixed-width lowercase hex orders identically to its value;
    * `format_string`/`printf` '%015x' emit identical text), so neither
    * engine ever parses a 60-bit hex literal.
    * Threshold arithmetic `(2^58 DIV max_w) * w` is ordered to stay in
    * Long range; both engines truncate identically. Zero shuffle — a
    * pure filter against a 1-row broadcast maximum.
    */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val maxW = docs.agg(max(col("n_chars")).as("max_w"))
    docs.crossJoin(broadcast(maxW))
      // 2^58 = 16^15 / 4: average keep rate ≈ avg_w / (4·max_w)
      .withColumn("thr_hex", format_string("%015x",
        expr("(288230376151711744L DIV max_w) * n_chars")))
      .filter(substring(md5(col("text")), 1, 15) < col("thr_hex"))
      .select(col("doc_id"), col("n_chars"))
      .orderBy("doc_id")
  }

  private val weightedSampleSql =
    """SELECT doc_id, n_chars
      |FROM documents CROSS JOIN (SELECT max(n_chars) AS max_w FROM documents)
      |WHERE substr(md5(text), 1, 15) <
      |      printf('%015x', (288230376151711744 // max_w) * n_chars)
      |ORDER BY doc_id""".stripMargin

  /** Deterministic per-group sample via the native bounded top-k
    * aggregate: the 5 docs with the SMALLEST md5 prefix per language — a
    * reproducible, dedup-stable uniform draw (the stratifiedSample
    * contract) that ships k rows per (group, partition) through a
    * partial aggregate instead of window-sorting every row per group.
    * Score = negated hex-prefix value (GroupTopK keeps maxima); a fixed-
    * width lowercase hex string orders identically to its numeric value,
    * which is what lets the oracle sort by the string.
    */
  def groupedSampleNative(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.GroupTopK
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(GroupTopK.topK(
        expr("-CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT)"),
        col("doc_id").cast("string"), 5).as("top"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
        col("col.payload").as("doc_id_str"))
      .orderBy("lang", "rank")
  }

  private val groupedSampleNativeSql =
    """SELECT lang, rank, doc_id_str FROM (
      |  SELECT lang, CAST(doc_id AS VARCHAR) AS doc_id_str,
      |         row_number() OVER (
      |           PARTITION BY lang
      |           ORDER BY substr(md5(text), 1, 15) ASC,
      |                    CAST(doc_id AS VARCHAR) ASC) AS rank
      |  FROM documents) WHERE rank <= 5
      |ORDER BY lang, rank""".stripMargin

  /** Exact, deterministic train/val/test partitioning per stratum — the
    * split every training pipeline freezes before a run. Within each
    * source, rows rank by (md5(text), doc_id) — a content-derived total
    * order, so the split is reproducible across re-runs, re-partitionings
    * and engines, and adding a document moves only ranks after its hash —
    * and integer threshold arithmetic (rank·10 vs n·8 / n·9) carves exact
    * 80/10/10 proportions with no float boundary ambiguity. Disjoint and
    * exhaustive by construction (every row gets exactly one split).
    *
    * Scale: one shuffle on the stratum key; the rank window sorts within
    * each stratum, so a mega-stratum is the straggler bound — at 100 TB
    * strata of that size should use [[datasetSplitHashed]], the map-only
    * hash-split below, where exact proportions aren't required.
    */
  def datasetSplit(spark: SparkSession, dir: String): DataFrame = {
    val bySource = Window.partitionBy(col("source"))
    Tables.documents(spark, dir)
      .withColumn("rk", row_number().over(
        bySource.orderBy(md5(col("text")), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(bySource))
      .withColumn("split",
        // cast before the multiply: an IntegerType row_number * 10 wraps
        // past ~214M rows per stratum (see dsirImportanceWeights)
        when(col("rk").cast("long") * 10 <= col("n") * 8, "train")
          .when(col("rk").cast("long") * 10 <= col("n") * 9, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("source"), col("split"))
      .orderBy("doc_id")
  }

  private val datasetSplitSql =
    """SELECT doc_id, source,
      |       CASE WHEN rk * 10 <= n * 8 THEN 'train'
      |            WHEN rk * 10 <= n * 9 THEN 'val'
      |            ELSE 'test' END AS split
      |FROM (
      |  SELECT doc_id, source,
      |         row_number() OVER (PARTITION BY source
      |           ORDER BY md5(text), doc_id) AS rk,
      |         count(*) OVER (PARTITION BY source) AS n
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  // thresholds at (2^60/10)·8 and (2^60/10)·9, emitted as fixed-width
  // hex LITERALS: the compare runs in hex-string space on both engines
  // (the weightedSample discipline — 15 lowercase hex chars order
  // identically to their value, and neither engine parses a 60-bit hex
  // number). (2^60/10)·8 — not 2^60·8/10, which overflows Long.
  private val HashSplitTrainHex = f"${(1152921504606846976L / 10) * 8}%015x"
  private val HashSplitValHex = f"${(1152921504606846976L / 10) * 9}%015x"

  /** The MEGA-STRATA fallback of [[datasetSplit]] — the documented
    * map-only hash split, now real: split membership is a pure function
    * of content (md5 15-hex prefix vs fixed thresholds), so there is NO
    * window, NO shuffle, and no straggler bound — a 100 TB stratum
    * splits in one map pass. The trade: proportions are binomial around
    * 80/10/10 instead of exact (the spec gates the tolerance), while
    * keeping every property that matters — deterministic, reproducible
    * across runs/partitionings/engines, dedup-stable, disjoint and
    * exhaustive by construction.
    */
  def hashSplit(text: Column): Column = {
    val prefix = substring(md5(text), 1, 15)
    when(prefix < lit(HashSplitTrainHex), "train")
      .when(prefix < lit(HashSplitValHex), "val")
      .otherwise("test")
  }

  /** Driver row: per-(source, split) counts of the hash split — exact on
    * both engines because membership is content-deterministic. */
  def datasetSplitHashed(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("split", hashSplit(col("text")))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "split")

  private val datasetSplitHashedSql =
    s"""SELECT source,
      |       CASE WHEN substr(md5(text), 1, 15) < '$HashSplitTrainHex'
      |              THEN 'train'
      |            WHEN substr(md5(text), 1, 15) < '$HashSplitValHex'
      |              THEN 'val'
      |            ELSE 'test' END AS split,
      |       count(*) AS n_docs
      |FROM documents GROUP BY 1, 2
      |ORDER BY source, split""".stripMargin

  // ---- tokenizer-training support: BPE merge-candidate statistics ----

  /** Corpus-global adjacent-symbol pair counts — the statistic one BPE
    * training iteration computes to pick its next merge (Sennrich et al.
    * 2016, the `get_stats` step of the reference algorithm; the engine
    * ships the candidate TABLE, not the merge loop — each iteration is
    * one such aggregation over the re-segmented corpus, driven from a
    * bounded driver loop over the vocab). Words through the engine's one
    * tokenizer split, then every adjacent character pair inside a word.
    *
    * Scale shape: the pair explode multiplies rows by word length, but
    * the aggregation key space is bounded by |alphabet|² — partial
    * (map-side) aggregation collapses each task's pairs to at most that
    * many rows BEFORE the exchange, so the shuffle carries KB per task
    * regardless of corpus size, and the final top-k is a TakeOrdered,
    * never a global sort. */
  def bpePairCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), "[^\\p{L}\\p{N}]+")).as("w"))
      .filter(length(col("w")) > 1)
      .select(explode(
        expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(20)

  private val bpePairCountsSql =
    """WITH words AS (
      |  SELECT unnest(list_filter(
      |           string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
      |           x -> length(x) > 1)) AS w
      |  FROM documents),
      |pairs AS (
      |  SELECT unnest(list_transform(range(1, length(w)),
      |                i -> substr(w, i, 2))) AS pair
      |  FROM words)
      |SELECT pair, count(*) AS cnt FROM pairs
      |GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 20""".stripMargin

  /** BPE merge TRAINING, distributed — [[bpePairCounts]] is one
    * iteration's statistic; this runs the actual learn loop (Sennrich et
    * al. 2016): segment the deduped vocabulary into symbols, count
    * adjacent pairs weighted by word frequency, merge the argmax pair,
    * re-segment, repeat. Segmentations are `<sym><sym>…` marker strings,
    * so applying a merge is ONE left-to-right `replace` — marker
    * consumption gives exactly BPE's non-overlapping greedy semantics
    * (`a a a a` merges to `aa aa`, never `aa a a`), with no lookbehind
    * regex (which the oracle engine's RE2 lacks). Ties break on the pair
    * string, so the learned table is deterministic cross-engine; the
    * oracle replays all five iterations in chained CTEs.
    *
    * Scale shape: the corpus is touched ONCE (the word-frequency
    * aggregation, partial-agg'd map-side); every iteration then runs on
    * the DISTINCT-WORD table — vocabulary-sized, corpus-size-independent
    * — with one bounded single-row collect (the argmax) per step, and a
    * localCheckpoint per step so the re-segmentation lineage never
    * deepens. A 100 TB corpus trains at the same per-iteration cost as
    * a 100 GB one once the vocab table exists. */
  def bpeLearnMerges(spark: SparkSession, dir: String,
      steps: Int = 5): DataFrame = {
    import spark.implicits._
    bpeTrain(spark, dir, steps)._1
      .toDF("step", "left_sym", "right_sym", "cnt")
      .orderBy("step")
  }

  /** The shared train loop: returns (merges, final segmentation frame)
    * so the encode row reuses the seg frame the loop just checkpointed
    * instead of re-scanning the corpus and re-applying every merge.
    * PERSISTED as a standing artifact ([[bpeArtifact]]): a tokenizer is
    * trained once and shipped — every serve after the first reads the
    * merge table + final segmentation from parquet instead of re-running
    * the loop. */
  private def bpeTrain(spark: SparkSession, dir: String,
      steps: Int): (Seq[(Long, String, String, Long)], DataFrame) =
    bpeArtifact(spark, dir, steps, "char",
      bpeTrainWords(Tables.documents(spark, dir)
        .select(explode(split(lower(col("text")), "[^\\p{L}\\p{N}]+")).as("w"))
        .filter(length(col("w")) > 1)
        .groupBy("w").agg(count(lit(1)).as("freq")), steps))

  /** The persisted-tokenizer fixture: `<scratch>/merges` (step, left_sym,
    * right_sym, cnt) + `<scratch>/seg` (seg, freq) under one build
    * marker keyed on the corpus + variant + depth. The artifact IS what
    * a production trainer ships (the merge table is the model); rows
    * serve from it, and a corpus change rebuilds through the standard
    * fixture discipline. `train` is by-name — a cache hit never runs
    * the loop. */
  private def bpeArtifact(spark: SparkSession, dir: String, steps: Int,
      variant: String,
      train: => (Seq[(Long, String, String, Long)], DataFrame)):
      (Seq[(Long, String, String, Long)], DataFrame) = {
    import spark.implicits._
    val path = Tables.scratchPath(s"bpe_art_$variant", dir)
    val docs = Tables.documents(spark, dir)
    ResultCache.buildIfAbsent(spark, docs,
      s"bpe:variant=$variant:steps=$steps:v1", path) {
      val (merges, seg) = train
      merges.toDF("step", "left_sym", "right_sym", "cnt")
        .repartition(1)
        .write.mode("overwrite").parquet(path + "/merges")
      seg.write.mode("overwrite").parquet(path + "/seg")
    }
    val merges = spark.read.parquet(path + "/merges")
      .orderBy("step").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[Long]("cnt"))).toSeq
    (merges, spark.read.parquet(path + "/seg"))
  }

  /** The char-level front-end over an explicit (w, freq) frame — the
    * property spec runs it against an in-memory reference BPE on random
    * vocabularies. */
  private[graft] def bpeTrainWords(words: DataFrame,
      steps: Int): (Seq[(Long, String, String, Long)], DataFrame) =
    bpeTrainSeg(words.select(
      expr("concat_ws('', transform(sequence(1, length(w)), " +
        "i -> concat('<', substr(w, i, 1), '>')))").as("seg"),
      col("freq")), steps)

  /** The train loop over an explicit (seg, freq) MARKER frame — shared
    * by the char-level and byte-level front-ends (their only difference
    * is what a base symbol is). Stops EARLY like reference BPE when no
    * adjacent pairs remain (a fully-merged vocabulary); the oracles'
    * fixed-depth CTE chains tolerate the exhausted tail — COALESCE
    * keeps each exhausted step's segmentation stable and the null
    * argmax rows are filtered — so both engines agree on the stop. */
  private[graft] def bpeTrainSeg(seg0: DataFrame,
      steps: Int): (Seq[(Long, String, String, Long)], DataFrame) = {
    var seg = seg0.localCheckpoint()
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      // guard size > 1 BEFORE sequence(1, size-1): Spark's sequence runs
      // DESCENDING when stop < start, and element_at(syms, 0) throws
      val top = seg
        .withColumn("syms",
          expr("split(substr(seg, 2, length(seg) - 2), '><')"))
        .filter(size(col("syms")) > 1)
        .select(explode(expr("transform(sequence(1, size(syms) - 1), " +
          "i -> concat(element_at(syms, i), '|', element_at(syms, i + 1)))"))
          .as("pair"), col("freq"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect() // bounded: ONE row per iteration to the driver
        .headOption
      top match {
        case None => exhausted = true // reference BPE stops training here
        case Some(t) =>
          val pair = t.getString(0)
          val cnt = t.getLong(1)
          val Array(l, r) = pair.split("\\|", 2)
          merges += ((step.toLong, l, r, cnt))
          // symbols are word chars or hex digits only — never
          // quotes/markers — so the literal interpolation below cannot
          // escape the SQL string
          seg = seg.withColumn("seg",
            expr(s"replace(seg, '<$l><$r>', '<$l$r>')")).localCheckpoint()
          step += 1
      }
    }
    (merges.result(), seg)
  }

  /** BPE ENCODING under the learned merges — the tokenizer's other half:
    * the shared [[bpeTrain]] loop already ends at the fully-merged
    * segmentation (checkpointed, vocabulary-sized), so encoding is ONE
    * aggregation over that frame — the corpus-frequency table of the
    * encoded symbols. The merged symbols surface with exactly the
    * counts their selection step saw minus later-merge consumption —
    * the oracle replays the whole train+encode chain. Corpus touched
    * once (the train loop's word aggregation); everything else
    * vocabulary-sized. */
  def bpeEncodeTokens(spark: SparkSession, dir: String,
      steps: Int = 5): DataFrame =
    bpeTrain(spark, dir, steps)._2
      .select(explode(
        expr("split(substr(seg, 2, length(seg) - 2), '><')")).as("sym"),
        col("freq"))
      .groupBy("sym").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("sym").asc)
      .limit(20)

  private def bpeEncodeTokensSql(steps: Int): String =
    bpeCteChain(steps, bpeCharHead) + s"""
      |SELECT sym, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
      |  SELECT unnest(string_split(substr(seg, 2, length(seg) - 2),
      |           '><')) AS sym, freq
      |  FROM seg$steps)
      |GROUP BY sym ORDER BY cnt DESC, sym ASC LIMIT 20""".stripMargin

  /** The oracle replays the identical loop as chained CTEs — one
    * (pairs → argmax → re-segment) block per step; exhausted steps
    * surface as null argmax rows and are filtered, matching the
    * engine's reference-BPE early stop. */
  private def bpeLearnMergesSql(steps: Int,
      head: String = bpeCharHead): String = {
    val rows = (1 to steps).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS step,
         |       split_part((SELECT pair FROM m$k), '|', 1) AS left_sym,
         |       split_part((SELECT pair FROM m$k), '|', 2) AS right_sym,
         |       (SELECT cnt FROM m$k) AS cnt""".stripMargin
    }
    bpeCteChain(steps, head) +
      "\nSELECT * FROM (\n" + rows.mkString("\nUNION ALL\n") +
      "\n) WHERE cnt IS NOT NULL ORDER BY step"
  }

  /** Char-level words → seg0 head: lowercased word splits, one symbol
    * per character. */
  private val bpeCharHead =
    """WITH words AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
      |    SELECT unnest(list_filter(
      |             string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
      |             x -> length(x) > 1)) AS w
      |    FROM documents)
      |  GROUP BY w),
      |seg0 AS MATERIALIZED (
      |  SELECT array_to_string(list_transform(range(1, length(w) + 1),
      |           i -> '<' || substr(w, i, 1) || '>'), '') AS seg, freq
      |  FROM words)""".stripMargin

  /** The shared train-loop CTE chain: <head's> seg0 → (pairs, argmax,
    * re-segment) per step — every BPE oracle replays through it. An
    * EXHAUSTED step (empty argmax) leaves its segmentation unchanged
    * (COALESCE over the null-pair replace), exactly the engine's early
    * stop. */
  private def bpeCteChain(steps: Int, head: String): String = {
    val blocks = (1 to steps).map { k =>
      s"""p$k AS (
         |  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(range(1, len(syms)),
         |             i -> syms[i] || '|' || syms[i + 1])) AS pair, freq
         |    FROM (SELECT string_split(substr(seg, 2, length(seg) - 2),
         |                   '><') AS syms, freq
         |          FROM seg${k - 1}))
         |  GROUP BY pair),
         |m$k AS MATERIALIZED (SELECT pair, cnt FROM p$k
         |        ORDER BY cnt DESC, pair ASC LIMIT 1),
         |seg$k AS MATERIALIZED (
         |  SELECT COALESCE(replace(seg,
         |           '<' || split_part((SELECT pair FROM m$k), '|', 1) ||
         |           '><' || split_part((SELECT pair FROM m$k), '|', 2) ||
         |           '>',
         |           '<' || replace((SELECT pair FROM m$k), '|', '') ||
         |           '>'), seg) AS seg, freq
         |  FROM seg${k - 1})""".stripMargin
    }
    (head +: blocks).mkString(",\n")
  }

  // ---- byte-level BPE with GPT-2-style pretokenization ----

  /** GPT-2-style pretokenizer (Radford et al. 2019, the `gpt2` regex):
    * contraction suffixes, space-prefixed letter runs, space-prefixed
    * digit runs, space-prefixed punctuation runs, whitespace runs —
    * case- and punctuation-PRESERVING, unlike the lowercased word
    * splits of the char-level rows. Two deliberate deviations, both for
    * cross-engine exactness: GPT-2's `\s+(?!\S)` branch needs negative
    * lookahead (the oracle engine's RE2 has none), so a pre-token
    * whitespace run keeps its last space instead of donating it to the
    * next token; and `\s` is spelled as an explicit class because Java
    * and RE2 disagree on `\s` membership (vertical tab). */
  private[graft] val BytePretokenPattern =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+" +
      "| ?[^ \\t\\n\\r\\f\\p{L}\\p{N}]+|[ \\t\\n\\r\\f]+"

  /** Byte-alphabet seg0: each pre-token becomes its UTF-8 byte sequence,
    * one marker symbol per byte, spelled as two uppercase hex digits —
    * the byte FALLBACK that makes every string tokenizable with a
    * 256-symbol base alphabet (multi-byte UTF-8 chars simply contribute
    * several base symbols, merged back together if frequent). Hex keeps
    * symbols inside the marker/SQL-literal safe set; merged symbols are
    * hex-pair concatenations, the direct analogue of GPT-2's
    * byte-to-unicode display alphabet. */
  /** The ONE hex-pair marker-segmentation expression (over a column
    * named `h` holding `hex(encode(w, 'UTF-8'))`) — training seg0 and
    * the unseen-encode path must stay byte-identical, so both read it
    * from here. */
  private val byteSeg0Expr =
    "concat_ws('', transform(sequence(1, length(h) div 2), " +
      "i -> concat('<', substr(h, 2*i - 1, 2), '>')))"

  private def bpeByteSeg0(words: DataFrame): DataFrame =
    words.select(hex(encode(col("w"), "UTF-8")).as("h"), col("freq"))
      .select(expr(byteSeg0Expr).as("seg"), col("freq"))

  /** The byte-level front-end over an explicit (w, freq) frame — the
    * property spec runs it against the in-memory reference BPE over
    * mixed-case/punctuated/multi-byte vocabularies. */
  private[graft] def bpeTrainByteWords(words: DataFrame,
      steps: Int): (Seq[(Long, String, String, Long)], DataFrame) =
    bpeTrainSeg(bpeByteSeg0(words), steps)

  /** The corpus-scale stage both byte trainers share: ONE pre-token
    * frequency aggregation (map-side partial; output vocabulary-sized). */
  private def bpeByteWords(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(regexp_extract_all(col("text"),
        lit(BytePretokenPattern), lit(0))).as("w"))
      .filter(octet_length(col("w")) > 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  private def bpeByteTrain(spark: SparkSession, dir: String,
      steps: Int): (Seq[(Long, String, String, Long)], DataFrame) =
    bpeArtifact(spark, dir, steps, "byte",
      bpeTrainByteWords(bpeByteWords(spark, dir), steps))

  /** Vocabulary-collect bound for the in-process merge loop — distinct
    * pre-tokens beyond this refuse loudly (the distributed loop is the
    * unbounded fallback). Web-scale corpora land in the 10⁶–10⁸ range;
    * the loop state is O(vocab), never O(corpus). */
  private[graft] val MaxVocabCollect = 2000000

  /** PRODUCTION-shape BPE training — the split every shipped tokenizer
    * trainer uses (HF tokenizers, SentencePiece): the corpus is touched
    * by ONE distributed word-frequency aggregation, and the merge loop
    * runs IN-PROCESS over the collected vocabulary (bounded, loud) —
    * per-merge cost has no scheduler round-trip, so a 50k-merge vocab
    * needs 50k map-scans of an in-memory table, not 50k cluster jobs.
    * Deeper than the distributed rows (8 steps) to exercise the loop
    * past their depth; [[graft.text.LocalBpe]]'s semantics are pinned
    * IDENTICAL to the distributed loop by spec, and the oracle replays
    * all 8 steps in chained CTEs. */
  def bpeByteVocabTrain(spark: SparkSession, dir: String,
      steps: Int = 8): DataFrame = {
    import spark.implicits._
    val rows = bpeByteWords(spark, dir)
      .limit(MaxVocabCollect + 1).collect() // bounded: vocab, not corpus
    require(rows.length <= MaxVocabCollect,
      s"distinct pre-token vocabulary exceeds $MaxVocabCollect — use the " +
        "distributed loop (bpe_byte_learn_merges path) instead")
    graft.text.LocalBpe.trainByteWords(
        rows.map(r => r.getString(0) -> r.getLong(1)).toSeq, steps)
      .toDF("step", "left_sym", "right_sym", "cnt")
      .orderBy("step")
  }

  /** BYTE-level BPE merge training — [[bpeLearnMerges]] with what a
    * production pretraining tokenizer actually eats: GPT-2
    * pretokenization (case/punctuation preserved, leading space
    * attached) over a byte alphabet with hex-pair symbols. Same shared
    * loop, same scale shape: corpus touched once into the pre-token
    * frequency frame, then vocabulary-sized iterations with one 1-row
    * argmax collect per step. The oracle replays pretokenization, the
    * UTF-8 hex explosion, and all five merge steps in chained CTEs. */
  def bpeByteLearnMerges(spark: SparkSession, dir: String,
      steps: Int = 5): DataFrame = {
    import spark.implicits._
    bpeByteTrain(spark, dir, steps)._1
      .toDF("step", "left_sym", "right_sym", "cnt")
      .orderBy("step")
  }

  /** Byte-level encoding off the shared train loop's final checkpoint —
    * the corpus-frequency table of the encoded hex symbols ([[
    * bpeEncodeTokens]]'s byte analogue). */
  def bpeByteEncodeTokens(spark: SparkSession, dir: String,
      steps: Int = 5): DataFrame =
    bpeByteTrain(spark, dir, steps)._2
      .select(explode(
        expr("split(substr(seg, 2, length(seg) - 2), '><')")).as("sym"),
        col("freq"))
      .groupBy("sym").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("sym").asc)
      .limit(20)

  /** The pretokenizer regex as a DuckDB single-quoted literal body
    * (apostrophes doubled) — the byte head and the unseen-encode oracle
    * must use the IDENTICAL pattern. */
  private val bpeByteOraclePattern =
    """''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^ \t\n\r\f\p{L}\p{N}]+|[ \t\n\r\f]+"""

  /** DuckDB head replaying the GPT-2 pretokenizer + UTF-8 hex seg0. */
  private val bpeByteHead =
    s"""WITH words AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
      |    SELECT unnest(regexp_extract_all(text,
      |      '$bpeByteOraclePattern'
      |      )) AS w
      |    FROM documents)
      |  WHERE octet_length(encode(w)) > 1
      |  GROUP BY w),
      |seg0 AS MATERIALIZED (
      |  SELECT array_to_string(list_transform(
      |           range(1, octet_length(encode(w)) + 1),
      |           i -> '<' || substr(hex(encode(w)), 2*i - 1, 2) || '>'),
      |           '') AS seg, freq
      |  FROM words)""".stripMargin

  private def bpeByteEncodeTokensSql(steps: Int): String =
    bpeCteChain(steps, bpeByteHead) + s"""
      |SELECT sym, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
      |  SELECT unnest(string_split(substr(seg, 2, length(seg) - 2),
      |           '><')) AS sym, freq
      |  FROM seg$steps)
      |GROUP BY sym ORDER BY cnt DESC, sym ASC LIMIT 20""".stripMargin

  /** The tokenizer INFERENCE path — encode text the training never saw
    * by applying the learned merge list in priority order (exactly how
    * a shipped tokenizer runs: the merge table is the model; training's
    * final segmentation is irrelevant at serve time). Each learned
    * merge becomes ONE marker-string `replace` folded into the plan in
    * learned order — the merges are a driver-side constant (5 rows,
    * vocabulary-sized in general) BROADCAST into a pure map over the
    * unseen corpus: at 100 TB of fresh text this is a scan with k
    * chained replaces and no exchange (a production vocab's 50k merges
    * would compile to a trie UDF, same dataflow). The planted text
    * exercises case preservation, a contraction, digits, punctuation,
    * AND a multi-byte char (é → two byte symbols — the byte fallback on
    * unseen input). The oracle replays training AND the ordered merge
    * application on the same text. */
  def bpeByteEncodeUnseen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val merges = bpeByteTrain(spark, dir, 5)._1 // bounded: 5 learned rows
    val text = "Cafés don't RE-train byte-pairs, 42 times!"
    val toks = Seq(text).toDF("text")
      .select(posexplode(regexp_extract_all(col("text"),
        lit(BytePretokenPattern), lit(0))).as(Seq("tok_pos", "w")))
    val seg0 = toks
      .select(col("tok_pos"), hex(encode(col("w"), "UTF-8")).as("h"))
      .select(col("tok_pos"), expr(byteSeg0Expr).as("seg"))
    val encoded = merges.foldLeft(seg0) { case (df, (_, l, r, _)) =>
      df.withColumn("seg", expr(s"replace(seg, '<$l><$r>', '<$l$r>')"))
    }
    encoded.select(col("tok_pos"),
        posexplode(expr("split(substr(seg, 2, length(seg) - 2), '><')"))
          .as(Seq("sym_pos", "sym")))
      .select(col("tok_pos").cast("int").as("tok_pos"),
        col("sym_pos").cast("int").as("sym_pos"), col("sym"))
      .orderBy("tok_pos", "sym_pos")
  }

  private val bpeByteEncodeUnseenSql: String =
    bpeCteChain(5, bpeByteHead) + s""",
      |toksu AS (
      |  SELECT generate_subscripts(regexp_extract_all(t,
      |           '$bpeByteOraclePattern'), 1) AS tok_pos,
      |         unnest(regexp_extract_all(t, '$bpeByteOraclePattern')) AS w
      |  FROM (SELECT 'Caf' || chr(233) ||
      |               's don''t RE-train byte-pairs, 42 times!' AS t)),
      |e0 AS (
      |  SELECT tok_pos, array_to_string(list_transform(
      |           range(1, octet_length(encode(w)) + 1),
      |           i -> '<' || substr(hex(encode(w)), 2*i - 1, 2) || '>'),
      |           '') AS seg
      |  FROM toksu),
      |""".stripMargin +
      (1 to 5).map { k =>
        s"""e$k AS (
           |  SELECT tok_pos, COALESCE(replace(seg,
           |           '<' || split_part((SELECT pair FROM m$k), '|', 1) ||
           |           '><' || split_part((SELECT pair FROM m$k), '|', 2) ||
           |           '>',
           |           '<' || replace((SELECT pair FROM m$k), '|', '') ||
           |           '>'), seg) AS seg
           |  FROM e${k - 1})""".stripMargin
      }.mkString(",\n") + """
      |SELECT CAST(tok_pos - 1 AS INTEGER) AS tok_pos,
      |       CAST(generate_subscripts(syms, 1) - 1 AS INTEGER) AS sym_pos,
      |       unnest(syms) AS sym
      |FROM (SELECT tok_pos,
      |        string_split(substr(seg, 2, length(seg) - 2), '><') AS syms
      |      FROM e5)
      |ORDER BY tok_pos, sym_pos""".stripMargin

  /** Variable-depth training witness: a PLANTED vocabulary ({ab×2, abc,
    * abcd}) that fully merges after three steps of a five-step request —
    * the engine stops like reference BPE (three merges emitted), and the
    * oracle's fixed five-step chain agrees because its exhausted steps
    * produce null argmax rows that the final filter drops. Before this
    * row the loop REFUSED on exhaustion; a real small-alphabet corpus
    * (or an aggressive vocab size) hits this constantly. */
  def bpeExhaustedMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = Seq(("ab", 2L), ("abc", 1L), ("abcd", 1L)).toDF("w", "freq")
    bpeTrainWords(words, steps = 5)._1
      .toDF("step", "left_sym", "right_sym", "cnt")
      .orderBy("step")
  }

  private val bpeExhaustedHead =
    """WITH words AS (
      |  SELECT * FROM (VALUES ('ab', CAST(2 AS BIGINT)),
      |                        ('abc', CAST(1 AS BIGINT)),
      |                        ('abcd', CAST(1 AS BIGINT))) AS t(w, freq)),
      |seg0 AS MATERIALIZED (
      |  SELECT array_to_string(list_transform(range(1, length(w) + 1),
      |           i -> '<' || substr(w, i, 1) || '>'), '') AS seg, freq
      |  FROM words)""".stripMargin

  // ---- Unicode normalization + control hygiene ----

  /** Text normalization — the cleaning pass upstream of every
    * fingerprint/dedup/tokenize stage: Unicode NFC (canonical
    * composition, via the native codegen expression
    * [[org.apache.spark.sql.graft.NfcNormalize]] — a decomposed
    * `e`+COMBINING ACUTE and precomposed `é` must hash identically),
    * then control-character stripping (C0 minus `\t\n\r`, plus DEL) and
    * space/tab run collapsing. Three dirty docs are PLANTED so the row
    * is enumerable at any scale factor: a decomposed accent, an
    * ANGSTROM SIGN (NFC folds it to Å), and a control-ridden doc — the
    * synthetic corpus is ASCII, so it must normalize as a no-op.
    *
    * Scale shape: a pure map over the scan — no exchange at any corpus
    * size; the NFC probe (`isNormalized`) allocates nothing on the
    * already-normalized fast path, which at web scale is nearly every
    * row. */
  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val planted = Seq(
      (9000001L, "Cafe\u0301  menu"),
      (9000002L, "unit \u212B angstrom"),
      (9000003L, "bad\u0007text\u001F  here")).toDF("doc_id", "text")
    val base = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .unionByName(planted)
    base
      .withColumn("nfc", org.apache.spark.sql.graft.NfcNormalize(col("text")))
      .withColumn("clean", trim(regexp_replace(regexp_replace(col("nfc"),
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""), "[ \\t]+", " ")))
      .select(col("doc_id"),
        (col("nfc") =!= col("text")).as("nfc_changed"),
        length(col("text")).cast("long").as("n_chars_raw"),
        length(col("clean")).cast("long").as("n_chars_clean"),
        substring(col("clean"), 1, 40).as("clean_prefix"))
      .orderBy("doc_id")
  }

  private val textNormalizeSql =
    """WITH planted AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM (VALUES
      |    (9000001, 'Cafe' || chr(769) || '  menu'),
      |    (9000002, 'unit ' || chr(8491) || ' angstrom'),
      |    (9000003, 'bad' || chr(7) || 'text' || chr(31) || '  here'))
      |    AS t(doc_id, text)),
      |base AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id, text FROM planted),
      |n AS (SELECT doc_id, text, nfc_normalize(text) AS nfc FROM base),
      |c AS (SELECT doc_id, text, nfc,
      |        trim(regexp_replace(regexp_replace(nfc,
      |          '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
      |          '[ \t]+', ' ', 'g')) AS clean
      |      FROM n)
      |SELECT doc_id, nfc <> text AS nfc_changed,
      |       length(text) AS n_chars_raw,
      |       length(clean) AS n_chars_clean,
      |       substr(clean, 1, 40) AS clean_prefix
      |FROM c ORDER BY doc_id""".stripMargin

  // ---- deterministic epoch shuffle + sharding ----

  /** Training-order materialization: a deterministic pseudo-random
    * permutation of the corpus, sharded for parallel loaders — the
    * shuffle every epoch of LLM training consumes. The permutation key
    * is a seeded md5 over the doc id (content-independent: a re-chunked
    * or re-scored doc keeps its slot), the shard is the key's first hex
    * char (16 shards here; production widens to `substr(h, 1, k)` for
    * 16^k shards), and `pos` is the within-shard rank. A new seed is a
    * new epoch's order; the same seed replays byte-identically on any
    * engine, partitioning, or cluster size — the reproducibility that
    * `ORDER BY rand()` can never give.
    *
    * Scale shape: ONE exchange (hash by shard), uniform by md5 so no
    * skew; the within-shard rank window sorts each shard independently.
    * At 100 TB the physical export widens the shard prefix until a
    * shard fits a task, then `repartitionByRange(shard, h)` +
    * `sortWithinPartitions` writes the order WITHOUT materializing
    * ranks — `pos` here is the oracle-checkable witness of that order,
    * not the production representation. */
  def datasetShuffleShards(spark: SparkSession, dir: String,
      seed: String = "epoch:1"): DataFrame = {
    val h = substring(
      md5(concat(lit(seed + ":"), col("doc_id").cast("string"))), 1, 15)
    Tables.documents(spark, dir)
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", substring(col("h"), 1, 1))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("h", "doc_id")).cast("long"))
      .select("shard", "pos", "doc_id")
      .orderBy("shard", "pos")
  }

  private val datasetShuffleShardsSql =
    """WITH h AS (
      |  SELECT doc_id,
      |         substr(md5('epoch:1:' || CAST(doc_id AS VARCHAR)), 1, 15) AS h
      |  FROM documents)
      |SELECT substr(h, 1, 1) AS shard,
      |       CAST(row_number() OVER (PARTITION BY substr(h, 1, 1)
      |              ORDER BY h, doc_id) AS BIGINT) AS pos,
      |       doc_id
      |FROM h ORDER BY shard, pos""".stripMargin

  /** The PRODUCTION write of [[datasetShuffleShards]]'s training order —
    * the path its doc-comment promised: `repartitionByRange` on the
    * shard key (ONE range exchange; equal shard values land in one
    * task) + `sortWithinPartitions(shard, h, doc_id)` + a plain parquet
    * export, so the epoch order is materialized as PHYSICAL ROW ORDER
    * with no global sort and no rank window anywhere in the write. The
    * row then proves the bytes landed in order: read the export back
    * and derive each row's position purely from `_metadata.row_index`
    * (the file-physical row number — never from `h`), and hand that to
    * the SAME oracle as the rank witness. A write that dropped the
    * within-partition sort, or a range partitioner that split one
    * shard's rows across tasks, puts some doc at the wrong physical
    * position and fails the hash compare.
    *
    * Scale shape: at 100 TB the shard prefix widens (`substr(h, 1, k)`,
    * 16^k shards) until one shard fits a task; the write stays one
    * range exchange + local sorts, and a training loader streams each
    * shard's files in order with zero further shuffling. */
  def datasetShuffleExport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val path = Tables.scratchPath("shuffle_export", dir)
    ResultCache.buildIfAbsent(spark, docs,
      "shuffle_export:seed=epoch1:shards=16:v1", path) {
      shuffleExportFrame(spark, dir)
        .write.mode("overwrite").parquet(path)
    }
    // physical position = (file, row-in-file): row_index is per-FILE, so
    // a shard that spans several files (maxRecordsPerFile, a committer
    // change) would alias row indexes across them — ordering by file
    // path first keeps the witness faithful (one task writes a shard,
    // and its files' c000/c001… suffixes sort in write order)
    spark.read.parquet(path)
      .select(col("shard"), col("doc_id"),
        col("_metadata.file_path").as("fp"),
        col("_metadata.row_index").as("ri"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("fp", "ri")).cast("long"))
      .select("shard", "pos", "doc_id")
      .orderBy("shard", "pos")
  }

  /** The export plan itself, exposed so the plan-audit spec can pin
    * "one range exchange, local sort only, no rank window". */
  private[graft] def shuffleExportFrame(spark: SparkSession,
      dir: String): DataFrame = {
    val h = substring(
      md5(concat(lit("epoch:1:"), col("doc_id").cast("string"))), 1, 15)
    Tables.documents(spark, dir)
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", substring(col("h"), 1, 1))
      .repartitionByRange(16, col("shard"))
      .sortWithinPartitions("shard", "h", "doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bpe_pair_counts" -> bpePairCounts,
    "dataset_shuffle_shards" -> (datasetShuffleShards(_, _)),
    "dataset_shuffle_export" -> datasetShuffleExport,
    "bpe_learn_merges" -> (bpeLearnMerges(_, _)),
    "bpe_encode_tokens" -> (bpeEncodeTokens(_, _)),
    "bpe_byte_learn_merges" -> (bpeByteLearnMerges(_, _)),
    "bpe_byte_encode_tokens" -> (bpeByteEncodeTokens(_, _)),
    "bpe_byte_encode_unseen" -> bpeByteEncodeUnseen,
    "bpe_byte_vocab_train" -> (bpeByteVocabTrain(_, _)),
    "bpe_exhausted_merges" -> bpeExhaustedMerges,
    "text_normalize" -> textNormalize,
    "weighted_sample" -> weightedSample,
    "dataset_split" -> datasetSplit,
    "dataset_split_hashed" -> datasetSplitHashed,
    "grouped_sample_native" -> groupedSampleNative,
    "surprisal_scores" -> surprisalScores,
    "dsir_importance_weights" -> dsirImportanceWeights,
    "dsir_threshold_selection" -> dsirThresholdSelection,
    "dsir_threshold_sampled" -> dsirThresholdSampled,
    "top_ngrams_per_lang" -> topNgramsPerLang,
    "pack_sequences" -> packSequences,
    "stratified_sample" -> stratifiedSample,
    "mixture_weights" -> mixtureWeights,
    "decontaminate_planted" -> decontaminatePlanted,
    "decontaminate_semantic" -> decontaminateSemantic,
    "decontaminate_semantic_ann" -> decontaminateSemanticAnn,
    "decontaminate_paraphrase" -> decontaminateParaphrase,
    "decontaminate_paraphrase_ann" -> decontaminateParaphraseAnn,
    "corpus_curation" -> corpusCuration,
    "text_quality" -> textQuality,
    "quality_histogram" -> qualityHistogram,
    "quality_calibration" -> qualityCalibration,
    "token_counts" -> tokenCounts,
    "lang_id" -> langId,
    "doc_fingerprints" -> docFingerprintsGate,
    "fingerprint_overlaps" -> fingerprintOverlapsGate,
    "fingerprint_planted_containment" -> fingerprintPlantedContainment)

  def oracles: Map[String, String] = Map(
    "bpe_pair_counts" -> bpePairCountsSql,
    "dataset_shuffle_shards" -> datasetShuffleShardsSql,
    // the export's read-back order must equal the rank witness exactly
    "dataset_shuffle_export" -> datasetShuffleShardsSql,
    "bpe_learn_merges" -> bpeLearnMergesSql(5),
    "bpe_encode_tokens" -> bpeEncodeTokensSql(5),
    "bpe_byte_learn_merges" -> bpeLearnMergesSql(5, bpeByteHead),
    "bpe_byte_encode_tokens" -> bpeByteEncodeTokensSql(5),
    "bpe_byte_encode_unseen" -> bpeByteEncodeUnseenSql,
    "bpe_byte_vocab_train" -> bpeLearnMergesSql(8, bpeByteHead),
    "bpe_exhausted_merges" -> bpeLearnMergesSql(5, bpeExhaustedHead),
    "text_normalize" -> textNormalizeSql,
    "weighted_sample" -> weightedSampleSql,
    "dataset_split" -> datasetSplitSql,
    "dataset_split_hashed" -> datasetSplitHashedSql,
    "grouped_sample_native" -> groupedSampleNativeSql,
    "surprisal_scores" -> surprisalScoresSql,
    "dsir_importance_weights" -> dsirImportanceWeightsSql,
    "dsir_threshold_selection" -> dsirThresholdSelectionSql,
    "dsir_threshold_sampled" -> dsirThresholdSampledSql,
    "top_ngrams_per_lang" -> topNgramsPerLangSql,
    "pack_sequences" -> packSequencesSql,
    "stratified_sample" -> stratifiedSampleSql,
    "mixture_weights" -> mixtureWeightsSql,
    "decontaminate_planted" -> decontaminatePlantedSql,
    "decontaminate_semantic" -> decontaminateSemanticSql,
    "decontaminate_semantic_ann" -> decontaminateSemanticSql,
    "decontaminate_paraphrase" -> decontaminateParaphraseSql,
    "decontaminate_paraphrase_ann" -> decontaminateParaphraseSql,
    "corpus_curation" -> corpusCurationSql,
    "text_quality" -> textQualitySql,
    "quality_histogram" -> qualityHistogramSql,
    "quality_calibration" -> qualityCalibrationSql,
    "token_counts" -> tokenCountsSql,
    "lang_id" -> langIdSql,
    "doc_fingerprints" -> docFingerprintsGateSql,
    "fingerprint_overlaps" -> fingerprintOverlapsGateSql,
    "fingerprint_planted_containment" -> fingerprintPlantedContainmentSql)
}
