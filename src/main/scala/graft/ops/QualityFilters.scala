package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Corpus quality FILTERS for training-data pipelines — the pruning stage
  * that runs before dedup/mixing (SURVEY.md §2.8 extension family):
  *
  *  - Gopher-style repetition metrics (Rae et al. 2021, §A1.2): top
  *    adjacent-bigram fraction and distinct-word fraction, the signals that
  *    catch boilerplate/spam whose character n-grams repeat pathologically.
  *  - C4-style line filtering (Raffel et al. 2020, §2.2): per-line keep/drop
  *    with the classic rules (minimum words, terminal punctuation, brace and
  *    "lorem ipsum" blocklists) and the cleaned text reassembled.
  *  - PII redaction: email/IPv4/phone detection counts + placeholder
  *    substitution, the scrub every public corpus release runs.
  *
  * Scale shape: line filtering and redaction are pure narrow projections
  * (regex + higher-order functions inside whole-stage codegen — zero
  * shuffle at any corpus size). Repetition metrics explode adjacent bigrams
  * and aggregate on (doc_id, bigram) then (doc_id) — equi-key shuffles that
  * partition cleanly at 100 TB; nothing is ever all-pairs and the raw text
  * never moves (only doc-local token pairs).
  *
  * Regexes are restricted to syntax with identical Java/RE2 semantics, and
  * fractions are emitted in exact integer 1e-6 units (integer DIV — float
  * division lands on cross-engine rounding ties), so every query here is
  * DuckDB-oracle-checkable. Line-filter and PII rows that need structure the
  * synthetic word-salad corpus lacks (multi-line docs, addresses) come from
  * planted literals constructed identically in the engine and the oracle;
  * the 500 real docs double as the no-false-positives case.
  */
object QualityFilters extends QueryModule {

  private def toksOf(c: Column): Column = Dedup.tokensCol(c)

  // ---- Gopher repetition metrics ----

  /** Per-document repetition metrics over adjacent token bigrams.
    *
    * The top-bigram count is DOC-LOCAL, so it never needs to leave the
    * row: the max multiplicity of any bigram equals the longest run in
    * the SORTED bigram array, computed by one O(n log n) `aggregate` HOF
    * per document. The previous relational shape (explode every bigram →
    * count per (doc, bigram) → max per doc → join back to the stats
    * frame) shuffled one row PER BIGRAM — at 100 TB that is a
    * corpus-token-scale exchange for a quantity each document can
    * compute about itself (guide §2.3 "aggregate before you shuffle" /
    * §2.4 "remove shuffles outright"); measured at sf0.1 it was 3 extra
    * exchanges and a 0.6 s single-task explode stage. (The once-feared
    * per-row QUADRATIC HOF — filter+count per distinct bigram — remains
    * avoided: sort + run-length is linearithmic in doc length.)
    */
  def repetitionMetrics(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), toksOf(col("text")).as("tok"))
      .filter(size(col("tok")) > 0) // punctuation-only docs have no words
    val bigrams = zip_with(
      slice(col("tok"), lit(1), greatest(size(col("tok")) - 1, lit(0))),
      slice(col("tok"), lit(2), greatest(size(col("tok")) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    // longest run in the sorted array == max multiplicity; empty bigram
    // arrays (single-token docs) fold to 0, matching the old left-join's
    // coalesce(0). Bigrams are built from nonempty tokens, so the ""
    // initial `prev` can never match a real first element.
    val topRun = aggregate(
      array_sort(bigrams),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (s, x) => {
        val run = when(x === s.getField("prev"), s.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(s.getField("best"), run).as("best"))
      },
      s => s.getField("best"))
    // sort-early/project-late (see lineFilterC4): the narrow (doc_id, tok)
    // rows range-sort once; the per-row metrics project after, in parallel
    t.repartitionByRange(spark.sparkContext.defaultParallelism, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .select(
        col("doc_id"),
        // long counts: Spark's size() is int32, DuckDB's len() is int64 —
        // the dumped parquet must agree with the oracle frame dtype-for-dtype
        size(col("tok")).cast("long").as("n_words"),
        size(array_distinct(col("tok"))).cast("long").as("n_distinct"),
        topRun.as("top_bigram_count"))
      .withColumn("top_bigram_frac_e6",
        expr("(top_bigram_count * 1000000) DIV nullif(n_words - 1, 0)"))
      .withColumn("distinct_word_frac_e6",
        expr("(CAST(n_distinct AS BIGINT) * 1000000) DIV n_words"))
      // Gopher drops docs whose most common 2-gram exceeds 20% of the doc
      .withColumn("keep_repetition", col("top_bigram_frac_e6") <= 200000)
      .select("doc_id", "n_words", "n_distinct", "top_bigram_count",
        "top_bigram_frac_e6", "distinct_word_frac_e6", "keep_repetition")
  }

  private val repetitionMetricsSql =
    """WITH t AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
      |                     x -> length(x) > 0) AS tok
      |  FROM documents WHERE length(trim(text)) > 0),
      |b AS (
      |  SELECT doc_id, len(tok) AS n_words, len(list_distinct(tok)) AS n_distinct,
      |         list_transform(generate_series(1, len(tok) - 1),
      |                        i -> tok[i] || ' ' || tok[i + 1]) AS bigrams
      |  FROM t WHERE len(tok) > 0),
      |e AS (SELECT doc_id, unnest(bigrams) AS bigram FROM b),
      |c AS (SELECT doc_id, bigram, count(*) AS cnt FROM e GROUP BY 1, 2),
      |m AS (SELECT doc_id, max(cnt) AS top_bigram_count FROM c GROUP BY 1)
      |SELECT b.doc_id, b.n_words, b.n_distinct,
      |       coalesce(m.top_bigram_count, 0) AS top_bigram_count,
      |       (coalesce(m.top_bigram_count, 0) * 1000000) // nullif(b.n_words - 1, 0)
      |         AS top_bigram_frac_e6,
      |       (b.n_distinct * 1000000) // b.n_words AS distinct_word_frac_e6,
      |       (coalesce(m.top_bigram_count, 0) * 1000000) // nullif(b.n_words - 1, 0)
      |         <= 200000 AS keep_repetition
      |FROM b LEFT JOIN m USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ---- C4-style line filtering ----

  /** Planted multi-line docs exercising every rule bucket; the real corpus
    * is single-line so these carry the line-level coverage. Literals are
    * duplicated in the oracle SQL — they must stay byte-identical.
    */
  private val plantedLineDocs = Seq(
    (910000L,
      "This is a kept line with terminal punctuation.\n" +
        "short line\n" +
        "This line contains a { brace so it drops.\n" +
        "lorem ipsum dolor sit amet consectetur.\n" +
        "Another good line stays right here."),
    (910001L,
      "Ends without punctuation here indeed\n" +
        "Is this kept despite being a question?\n" +
        "tiny\n" +
        "The last good line survives the filter!"))

  /** Rule buckets, first-match-wins: short (< 5 words) → brace → lorem →
    * no terminal punctuation → kept. One pass over the lines array, pure
    * projection.
    */
  def lineFilterC4(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val planted = plantedLineDocs.toDF("doc_id", "text")
    val docs = Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("text"))
      .unionByName(planted)
    val lines = split(col("text"), "\n")
    def wordsOf(l: Column) = size(toksOf(l))
    def bucket(l: Column): Column =
      when(wordsOf(l) < 5, "short")
        .when(l.contains("{"), "brace")
        .when(lower(l).contains("lorem ipsum"), "lorem")
        .when(!trim(l).rlike("[.!?]$"), "nopunct")
        .otherwise("kept")
    val buckets = transform(lines, l => bucket(l))
    def n(b: String): Column = size(filter(buckets, x => x === b)).cast("long")
    // Sort EARLY on the narrow (doc_id, text) rows, project the expensive
    // line-bucket HOFs LATE: a tail `.orderBy` over the heavy projection
    // evaluates it TWICE (the range partitioner's sampling pass computes
    // the child, then the shuffle map tasks compute it again — measured
    // as two ~0.5 s stages on this row) and its post-AQE sort runs the
    // projection on coalesced near-single-task partitions. Range-
    // partitioning the cheap rows first keeps the same total doc_id
    // order (ordered range partitions + within-partition sort) while the
    // bucket HOFs run ONCE, spread over cluster-width tasks.
    docs
      .repartitionByRange(spark.sparkContext.defaultParallelism, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .select(
        col("doc_id"),
        size(lines).cast("long").as("n_lines"),
        n("kept").as("kept"),
        n("short").as("dropped_short"),
        n("brace").as("dropped_brace"),
        n("lorem").as("dropped_lorem"),
        n("nopunct").as("dropped_nopunct"),
        array_join(
          filter(zip_with(lines, buckets, (l, b) => when(b === "kept", l)),
            x => x.isNotNull), "\n").as("cleaned_text"))
  }

  private def sqlQuote(s: String): String =
    "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"

  private val plantedLineDocsSql = plantedLineDocs
    .map { case (id, text) => s"($id, ${sqlQuote(text)})" }
    .mkString(",\n    ")

  private val lineFilterC4Sql =
    s"""WITH docs AS (
       |  SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0
       |  UNION ALL
       |  SELECT * FROM (VALUES
       |    $plantedLineDocsSql) AS planted(doc_id, text)),
       |lb AS (
       |  SELECT doc_id, string_split(text, chr(10)) AS lines,
       |         list_transform(string_split(text, chr(10)), l ->
       |           CASE
       |             WHEN len(list_filter(string_split_regex(lower(l), '[^\\p{L}\\p{N}]+'),
       |                                  x -> length(x) > 0)) < 5 THEN 'short'
       |             WHEN contains(l, '{') THEN 'brace'
       |             WHEN contains(lower(l), 'lorem ipsum') THEN 'lorem'
       |             WHEN NOT regexp_matches(trim(l), '[.!?]$$') THEN 'nopunct'
       |             ELSE 'kept'
       |           END) AS buckets
       |  FROM docs)
       |SELECT doc_id, len(lines) AS n_lines,
       |       len(list_filter(buckets, b -> b = 'kept')) AS kept,
       |       len(list_filter(buckets, b -> b = 'short')) AS dropped_short,
       |       len(list_filter(buckets, b -> b = 'brace')) AS dropped_brace,
       |       len(list_filter(buckets, b -> b = 'lorem')) AS dropped_lorem,
       |       len(list_filter(buckets, b -> b = 'nopunct')) AS dropped_nopunct,
       |       coalesce(array_to_string(
       |         list_filter(
       |           list_transform(generate_series(1, len(lines)),
       |             i -> CASE WHEN buckets[i] = 'kept' THEN lines[i] END),
       |           l -> l IS NOT NULL), chr(10)), '') AS cleaned_text
       |FROM lb ORDER BY doc_id""".stripMargin

  // ---- PII redaction ----

  /** Planted documents carrying addresses; the 500 real docs (no digits, no
    * '@') prove the patterns fire zero false positives on clean text.
    */
  private val plantedPiiDocs = Seq(
    (920000L, "Contact alice@example.com or bob.smith@mail.example.org for details."),
    (920001L, "Server at 192.168.1.100 and 10.0.0.1 responded quickly."),
    (920002L, "Call +1 555-123-4567 or 555 987 6543 before noon."),
    (920003L, "Mixed case: carol@test.io connects from 172.16.254.3 phone 555-000-1111."))

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  private val PhoneRe = "\\+?\\d[\\d\\- ]{6,}\\d"

  /** Detection counts on the original text plus the redacted text (email →
    * ip → phone substitution order: each later pattern runs on the prior
    * pass's output, so an address never double-matches). Pure projection.
    */
  def piiRedaction(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val planted = plantedPiiDocs.toDF("doc_id", "text")
    val docs = Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("text"))
      .unionByName(planted)
    val afterEmail = regexp_replace(col("text"), EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "<IP>")
    val redacted = regexp_replace(afterIp, PhoneRe, "<PHONE>")
    // sort-early/project-late (see lineFilterC4): the regex cascade runs
    // ONCE, parallel, instead of twice around a tail orderBy
    docs
      .repartitionByRange(spark.sparkContext.defaultParallelism, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(afterEmail, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
        size(regexp_extract_all(afterIp, lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
        redacted.as("redacted_text"))
      .withColumn("has_pii",
        col("n_emails") + col("n_ips") + col("n_phones") > 0)
  }

  private val plantedPiiDocsSql = plantedPiiDocs
    .map { case (id, text) => s"($id, ${sqlQuote(text)})" }
    .mkString(",\n    ")

  private val piiRedactionSql =
    s"""WITH docs AS (
       |  SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0
       |  UNION ALL
       |  SELECT * FROM (VALUES
       |    $plantedPiiDocsSql) AS planted(doc_id, text)),
       |r AS (
       |  SELECT doc_id, text,
       |         regexp_replace(text, '$EmailRe', '<EMAIL>', 'g') AS after_email
       |  FROM docs),
       |r2 AS (
       |  SELECT *, regexp_replace(after_email, '$Ipv4Re', '<IP>', 'g') AS after_ip
       |  FROM r)
       |SELECT doc_id,
       |       len(regexp_extract_all(text, '$EmailRe')) AS n_emails,
       |       len(regexp_extract_all(after_email, '$Ipv4Re')) AS n_ips,
       |       len(regexp_extract_all(after_ip, '$PhoneRe')) AS n_phones,
       |       regexp_replace(after_ip, '$PhoneRe', '<PHONE>', 'g') AS redacted_text,
       |       len(regexp_extract_all(text, '$EmailRe'))
       |         + len(regexp_extract_all(after_email, '$Ipv4Re'))
       |         + len(regexp_extract_all(after_ip, '$PhoneRe')) > 0 AS has_pii
       |FROM r2 ORDER BY doc_id""".stripMargin

  // ---- URL / domain extraction ----

  /** Planted docs with URLs; the real corpus has none (no '/' or ':'), so
    * it again doubles as the no-false-positives case.
    */
  private val plantedUrlDocs = Seq(
    (930100L, "See https://docs.example.com/spark/tuning and http://example.com/faq for more."),
    (930101L, "Mirrors: https://cdn.mirror.org/a/b/c.html plus https://docs.example.com/other page."),
    (930102L, "Bare domain text example.com is not a link; ftp://old.example.net/file is."))

  private val UrlRe = "(?:https?|ftp)://[A-Za-z0-9.-]+(?:/[^ ]*)?"
  private val DomainRe = "(?:https?|ftp)://([A-Za-z0-9.-]+)"

  /** Per-domain link counts over the corpus — the domain-blocklist /
    * mixture-by-source signal every web-corpus pipeline computes. Explode
    * the extracted URLs, regex out the host, aggregate on (domain): one
    * equi-key shuffle of short strings, text never moves.
    */
  def urlDomains(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val planted = plantedUrlDocs.toDF("doc_id", "text")
    val docs = Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("text"))
      .unionByName(planted)
    docs
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit(UrlRe), lit(0))).as("url"))
      .select(col("doc_id"), regexp_extract(col("url"), DomainRe, 1).as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("domain")
  }

  private val plantedUrlDocsSql = plantedUrlDocs
    .map { case (id, text) => s"($id, ${sqlQuote(text)})" }
    .mkString(",\n    ")

  // ---- URL canonicalization + dedup ----

  /** Variant spellings of the SAME logical URLs — scheme/host case,
    * default ports, tracking params, param order, trailing slash,
    * fragments — plus one distinct singleton. The real corpus has no
    * URLs at all (no '/' or ':'), so it is the no-false-positives case. */
  private val plantedCanonDocs = Seq(
    (930200L, "Read https://Docs.Example.com:443/guide/?utm_source=tw&b=2&a=1#sec2 now."),
    (930201L, "Read https://docs.example.com/guide?a=1&b=2 too."),
    (930202L, "Also HTTP://EXAMPLE.COM:80/?fbclid=abc123 works."),
    (930203L, "And http://example.com/ matches it."),
    (930204L, "Distinct: https://example.com/other?a=1 stays alone."))

  /** Case-insensitive URL matcher for the canonicalization row — scheme
    * and host case AND an explicit `:port` must REACH the normalizer
    * (the `url_domains` matcher has no port group, which would truncate
    * `host:443/path` at the colon and silently lose the path before
    * normalization ever ran — caught by the planted collapse count). */
  private val UrlCiRe =
    "(?i)(?:https?|ftp)://[A-Za-z0-9.-]+(?::[0-9]+)?(?:/[^ ]*)?"

  /** URL canonicalization + dedup — the stage a web-corpus pipeline runs
    * BEFORE fetching/joining by URL (CommonCrawl-style): lowercase
    * scheme and host, strip the scheme's default port, strip the
    * fragment, strip trailing path slashes, drop tracking params
    * (`utm_*`, `fbclid`), sort the surviving query params. Path case is
    * deliberately PRESERVED (paths are case-sensitive by spec; hosts are
    * not). Emits per-canonical-URL link/doc counts — n_links > 1 on a
    * canonical group is exactly the dedup signal. Every transform is a
    * codegen regexp/array expression (no UDF) and the oracle replays the
    * identical normalization; a planted variant cluster (ports, case,
    * tracking params, ordering, trailing slash, fragments) collapses to
    * 2 canonical URLs + 1 singleton or the hash compare fails.
    *
    * Scale shape: pure per-row projection then ONE equi-key aggregation
    * on the canonical string — short strings shuffle, text never moves. */
  def urlCanonicalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val planted = plantedCanonDocs.toDF("doc_id", "text")
    val docs = Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("text"))
      .unionByName(planted)
    val urls = docs.select(col("doc_id"),
      explode(regexp_extract_all(col("text"), lit(UrlCiRe), lit(0)))
        .as("url"))
    val parts = urls
      .withColumn("scheme",
        lower(regexp_extract(col("url"), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)))
      .withColumn("host",
        lower(regexp_extract(col("url"), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)))
      .withColumn("path",
        regexp_extract(col("url"), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1))
      .withColumn("query", regexp_extract(col("url"), "\\?([^#]*)", 1))
    val canon = parts
      .withColumn("host", when(col("scheme") === "http",
          regexp_replace(col("host"), ":80$", ""))
        .when(col("scheme") === "https",
          regexp_replace(col("host"), ":443$", ""))
        .when(col("scheme") === "ftp",
          regexp_replace(col("host"), ":21$", ""))
        .otherwise(col("host")))
      .withColumn("path", regexp_replace(col("path"), "/+$", ""))
      .withColumn("params", array_sort(filter(split(col("query"), "&"),
        p => p =!= "" && !p.rlike("^(utm_[A-Za-z]+|fbclid)="))))
      .withColumn("canonical_url", concat(
        col("scheme"), lit("://"), col("host"), col("path"),
        when(size(col("params")) > 0,
          concat(lit("?"), array_join(col("params"), "&")))
          .otherwise(lit(""))))
    canon.groupBy("canonical_url")
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("canonical_url")
  }

  private val plantedCanonDocsSql = plantedCanonDocs
    .map { case (id, text) => s"($id, ${sqlQuote(text)})" }
    .mkString(",\n    ")

  private val urlCanonicalizeSql =
    s"""WITH docs AS (
       |  SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0
       |  UNION ALL
       |  SELECT * FROM (VALUES
       |    $plantedCanonDocsSql) AS planted(doc_id, text)),
       |u AS (
       |  SELECT doc_id, unnest(regexp_extract_all(text, '$UrlCiRe')) AS url
       |  FROM docs),
       |p AS (
       |  SELECT doc_id,
       |         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS host,
       |         regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
       |         regexp_extract(url, '\\?([^#]*)', 1) AS query
       |  FROM u),
       |c AS (
       |  SELECT doc_id, scheme,
       |         CASE WHEN scheme = 'http' THEN regexp_replace(host, ':80$$', '')
       |              WHEN scheme = 'https' THEN regexp_replace(host, ':443$$', '')
       |              WHEN scheme = 'ftp' THEN regexp_replace(host, ':21$$', '')
       |              ELSE host END AS host,
       |         regexp_replace(path, '/+$$', '') AS path,
       |         list_sort(list_filter(string_split(query, '&'),
       |           x -> x <> '' AND NOT regexp_matches(x, '^(utm_[A-Za-z]+|fbclid)='))) AS params
       |  FROM p),
       |k AS (
       |  SELECT doc_id,
       |         scheme || '://' || host || path ||
       |         CASE WHEN len(params) > 0
       |              THEN '?' || array_to_string(params, '&')
       |              ELSE '' END AS canonical_url
       |  FROM c)
       |SELECT canonical_url, count(*) AS n_links,
       |       count(DISTINCT doc_id) AS n_docs
       |FROM k GROUP BY 1 ORDER BY canonical_url""".stripMargin

  // ---- cross-document line dedup (corpus-level boilerplate removal) ----

  /** Three planted docs share one boilerplate line; their other lines are
    * unique — the multi-line structure the single-line corpus lacks.
    * Literals are duplicated in the oracle SQL, byte-identical. */
  private val plantedBoilerplateDocs = Seq(
    (920000L, "Unique alpha line number one.\n" +
      "SUBSCRIBE TO OUR NEWSLETTER NOW!\n" +
      "Unique alpha line number two."),
    (920001L, "Unique beta content sits here.\n" +
      "SUBSCRIBE TO OUR NEWSLETTER NOW!"),
    (920002L, "SUBSCRIBE TO OUR NEWSLETTER NOW!\n" +
      "Unique gamma line closes this."))

  private val MinBoilerplateDocs = 3

  /** Cross-document line dedup — the corpus-LEVEL boilerplate removal of
    * MassiveText (Rae et al. 2021, §A1.1) and RefinedWeb (Penedo et al.
    * 2023, §3.3): a line appearing in ≥ `MinBoilerplateDocs` DISTINCT
    * documents is scraper/template boilerplate (nav bars, cookie
    * banners, licence headers) and is removed from every document, with
    * the survivors reassembled in original order. The within-doc C4
    * rules (`line_filter_c4`) cannot catch these — a cookie banner is a
    * perfectly well-formed sentence; only corpus-wide frequency exposes
    * it.
    *
    * Scale shape: documents explode to (doc_id, pos, xxhash64(line)) —
    * the 8-byte hash crosses the exchange, the TEXT never does. The
    * frequency count is an equi-key aggregate with map-side partials;
    * removed POSITIONS (ints) flow back per doc and the reassembly is a
    * doc-local higher-order filter on the original text. Output is the
    * AFFECTED docs only (boilerplate carriers + whole-text exact dupes
    * the threshold also catches).
    */
  def crossDocLineDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("text"))
      .unionByName(plantedBoilerplateDocs.toDF("doc_id", "text"))
    val lines = docs.select(col("doc_id"),
        posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      .select(col("doc_id"), col("pos"), xxhash64(col("line")).as("lh"))
    val frequent = lines.groupBy("lh")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= MinBoilerplateDocs).select("lh")
    val removedPos = lines.join(frequent, Seq("lh"), "left_semi")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("removed"))
    docs.join(removedPos, Seq("doc_id")) // inner: affected docs only
      .withColumn("ls", split(col("text"), "\n"))
      .select(col("doc_id"),
        size(col("ls")).cast("long").as("n_lines"),
        size(col("removed")).cast("long").as("n_removed"),
        array_join(filter(col("ls"),
          (l, i) => !array_contains(col("removed"), i)), "\n").as("kept_text"))
      .orderBy("doc_id")
  }

  private val crossDocLineDedupSql =
    """WITH docs AS (
      |  SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0
      |  UNION ALL
      |  SELECT * FROM (VALUES
      |    (920000, 'Unique alpha line number one.' || chr(10) ||
      |      'SUBSCRIBE TO OUR NEWSLETTER NOW!' || chr(10) ||
      |      'Unique alpha line number two.'),
      |    (920001, 'Unique beta content sits here.' || chr(10) ||
      |      'SUBSCRIBE TO OUR NEWSLETTER NOW!'),
      |    (920002, 'SUBSCRIBE TO OUR NEWSLETTER NOW!' || chr(10) ||
      |      'Unique gamma line closes this.')) AS planted(doc_id, text)),
      |lines AS (
      |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM docs),
      |freq AS (
      |  SELECT line FROM lines GROUP BY line
      |  HAVING count(DISTINCT doc_id) >= 3),
      |freqlist AS (SELECT coalesce(list(line), []) AS fl FROM freq)
      |SELECT doc_id,
      |       len(string_split(text, chr(10)))::BIGINT AS n_lines,
      |       (len(string_split(text, chr(10))) -
      |        len(list_filter(string_split(text, chr(10)),
      |              l -> NOT list_contains(f.fl, l))))::BIGINT AS n_removed,
      |       array_to_string(list_filter(string_split(text, chr(10)),
      |         l -> NOT list_contains(f.fl, l)), chr(10)) AS kept_text
      |FROM docs CROSS JOIN freqlist f
      |WHERE len(list_filter(string_split(text, chr(10)),
      |        l -> list_contains(f.fl, l))) > 0
      |ORDER BY doc_id""".stripMargin

  private val urlDomainsSql =
    s"""WITH docs AS (
       |  SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0
       |  UNION ALL
       |  SELECT * FROM (VALUES
       |    $plantedUrlDocsSql) AS planted(doc_id, text)),
       |u AS (
       |  SELECT doc_id, unnest(regexp_extract_all(text, '$UrlRe')) AS url
       |  FROM docs)
       |SELECT regexp_extract(url, '$DomainRe', 1) AS domain,
       |       count(*) AS n_links, count(DISTINCT doc_id) AS n_docs
       |FROM u GROUP BY 1 ORDER BY domain""".stripMargin

  // ---- domain blocklist filter (suffix-set equi-join) ----

  /** The blocklist: a domain blocks itself AND every subdomain — but
    * ONLY on label boundaries (`goodtracker.net` is NOT blocked by
    * `tracker.net`; a naive endsWith would block it). */
  private val BlockedDomains = Seq("example.com", "tracker.net")

  private val plantedBlocklistDocs = Seq(
    (930300L, "Visit https://docs.example.com/a and https://mirror.org/b today."),
    (930301L, "See http://example.com/x for details."),
    (930302L, "Go https://sub.evil.tracker.net/y or https://goodtracker.net/z instead."),
    (930303L, "Clean https://open.mirror.org/ok only."))

  /** Domain-blocklist filtering — the removal stage every web corpus
    * runs (spam/adult/tracker domains): each link's host explodes into
    * its LABEL SUFFIXES (`a.b.c` → {a.b.c, b.c, c}) and the blocklist
    * joins on suffix EQUALITY, so subdomains block correctly and
    * `goodtracker.net` survives `tracker.net` (label boundaries, not
    * substring). Per doc: distinct link count, blocked count, keep flag.
    *
    * Scale shape: this is the pattern that survives a million-entry
    * blocklist — suffixes are ≤ host-label-count short strings per link
    * and the match is an EQUI-join (broadcast for small lists, shuffle
    * join for huge ones); the naive shapes are a LIKE/endsWith theta-
    * join (cartesian) or a regex alternation rebuilt per blocklist
    * change. Text never moves; only (doc_id, url, suffix) triples do. */
  def domainBlocklistFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val planted = plantedBlocklistDocs.toDF("doc_id", "text")
    val docs = Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("text"))
      .unionByName(planted)
    val urls = docs.select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit(UrlCiRe), lit(0)))
          .as("url"))
      .distinct()
    val sfx = urls
      .withColumn("host", lower(regexp_extract(col("url"),
        "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1)))
      .withColumn("labels", split(col("host"), "\\."))
      .select(col("doc_id"), col("url"),
        explode(expr("transform(sequence(1, size(labels)), " +
          "i -> array_join(slice(labels, i, size(labels) - i + 1), '.'))"))
          .as("sfx"))
    val blocked = sfx
      .join(broadcast(BlockedDomains.toDF("sfx")), Seq("sfx"), "left_semi")
      .select("doc_id", "url").distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_blocked"))
    urls.groupBy("doc_id").agg(count(lit(1)).as("n_links"))
      .join(blocked, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_blocked"))
      .withColumn("kept", col("n_blocked") === 0)
      .orderBy("doc_id")
  }

  private val plantedBlocklistDocsSql = plantedBlocklistDocs
    .map { case (id, text) => s"($id, ${sqlQuote(text)})" }
    .mkString(",\n    ")

  private val domainBlocklistFilterSql =
    s"""WITH docs AS (
       |  SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0
       |  UNION ALL
       |  SELECT * FROM (VALUES
       |    $plantedBlocklistDocsSql) AS planted(doc_id, text)),
       |u AS (
       |  SELECT DISTINCT doc_id,
       |         unnest(regexp_extract_all(text, '$UrlCiRe')) AS url
       |  FROM docs),
       |s AS (
       |  SELECT doc_id, url,
       |         unnest(list_transform(
       |           range(1, len(string_split(lower(regexp_extract(url,
       |             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1)), '.')) + 1),
       |           i -> array_to_string(string_split(lower(regexp_extract(url,
       |             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1)), '.')[i:],
       |             '.'))) AS sfx
       |  FROM u),
       |b AS (
       |  SELECT doc_id, count(DISTINCT url) AS n_blocked
       |  FROM s WHERE sfx IN (${BlockedDomains.map(d => s"'$d'").mkString(", ")})
       |  GROUP BY doc_id)
       |SELECT u.doc_id, count(*) AS n_links,
       |       COALESCE(any_value(b.n_blocked), 0) AS n_blocked,
       |       COALESCE(any_value(b.n_blocked), 0) = 0 AS kept
       |FROM u LEFT JOIN b ON u.doc_id = b.doc_id
       |GROUP BY u.doc_id ORDER BY u.doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "domain_blocklist_filter" -> domainBlocklistFilter,
    "repetition_metrics" -> repetitionMetrics,
    "line_filter_c4" -> lineFilterC4,
    "pii_redaction" -> piiRedaction,
    "cross_doc_line_dedup" -> crossDocLineDedup,
    "url_domains" -> urlDomains,
    "url_canonicalize" -> urlCanonicalize)

  def oracles: Map[String, String] = Map(
    "domain_blocklist_filter" -> domainBlocklistFilterSql,
    "repetition_metrics" -> repetitionMetricsSql,
    "line_filter_c4" -> lineFilterC4Sql,
    "pii_redaction" -> piiRedactionSql,
    "cross_doc_line_dedup" -> crossDocLineDedupSql,
    "url_domains" -> urlDomainsSql,
    "url_canonicalize" -> urlCanonicalizeSql)
}
