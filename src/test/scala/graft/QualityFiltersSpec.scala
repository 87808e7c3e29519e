package graft

import graft.ops.QualityFilters

class QualityFiltersSpec extends SparkSpec {

  test("repetition_metrics: hand-computed top bigram on the sf corpus shape") {
    val out = SparkEntry.queries("repetition_metrics")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nWords = r.getAs[Long]("n_words")
      val top = r.getAs[Long]("top_bigram_count")
      assert(nWords > 0)
      assert(top >= (if (nWords > 1) 1L else 0L) && top <= math.max(nWords - 1, 0))
      val frac = r.getAs[Long]("top_bigram_frac_e6")
      assert(frac >= 0 && frac <= 1000000)
      assert(r.getAs[Boolean]("keep_repetition") === (frac <= 200000))
      val distinctFrac = r.getAs[Long]("distinct_word_frac_e6")
      assert(distinctFrac > 0 && distinctFrac <= 1000000)
    }
  }

  test("repetition_metrics: a degenerate repeated doc is flagged for drop") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // "spam spam spam spam": top bigram "spam spam" = 3 of 3 bigrams
    val t = Seq((1L, "spam spam spam spam")).toDF("doc_id", "text")
    val toks = graft.ops.Dedup.tokensCol(col("text"))
    val bi = t.select(explode(zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))).as("bg"))
    assert(bi.collect().map(_.getString(0)).toSeq ===
      Seq("spam spam", "spam spam", "spam spam"))
  }

  test("line_filter_c4: planted docs land in the documented buckets") {
    val out = SparkEntry.queries("line_filter_c4")(spark, sf).collect()
    val d0 = out.find(_.getAs[Long]("doc_id") == 910000L).get
    assert(d0.getAs[Long]("n_lines") === 5)
    assert(d0.getAs[Long]("kept") === 2)
    assert(d0.getAs[Long]("dropped_short") === 1)
    assert(d0.getAs[Long]("dropped_brace") === 1)
    assert(d0.getAs[Long]("dropped_lorem") === 1)
    assert(d0.getAs[Long]("dropped_nopunct") === 0)
    assert(d0.getAs[String]("cleaned_text") ===
      "This is a kept line with terminal punctuation.\nAnother good line stays right here.")
    val d1 = out.find(_.getAs[Long]("doc_id") == 910001L).get
    assert(d1.getAs[Long]("kept") === 2) // the question and the exclamation
    assert(d1.getAs[Long]("dropped_nopunct") === 1)
    assert(d1.getAs[Long]("dropped_short") === 1) // "tiny"
  }

  test("line_filter_c4: single-line word-salad docs all drop as nopunct") {
    val out = SparkEntry.queries("line_filter_c4")(spark, sf)
      .filter("doc_id < 900000").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_lines") === 1)
      // word salad: >= 5 words but no terminal punctuation
      assert(r.getAs[Long]("kept") === 0)
      assert(r.getAs[String]("cleaned_text") === "")
    }
  }

  test("pii_redaction: planted addresses are counted and replaced") {
    val out = SparkEntry.queries("pii_redaction")(spark, sf).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    val emails = byId(920000L)
    assert(emails.getAs[Long]("n_emails") === 2)
    assert(emails.getAs[String]("redacted_text") ===
      "Contact <EMAIL> or <EMAIL> for details.")
    val ips = byId(920001L)
    assert(ips.getAs[Long]("n_ips") === 2)
    assert(ips.getAs[String]("redacted_text") ===
      "Server at <IP> and <IP> responded quickly.")
    val phones = byId(920002L)
    assert(phones.getAs[Long]("n_phones") === 2)
    assert(phones.getAs[String]("redacted_text") ===
      "Call <PHONE> or <PHONE> before noon.")
    val mixed = byId(920003L)
    assert(mixed.getAs[Long]("n_emails") === 1)
    assert(mixed.getAs[Long]("n_ips") === 1)
    assert(mixed.getAs[Long]("n_phones") === 1)
    assert(mixed.getAs[Boolean]("has_pii"))
    assert(mixed.getAs[String]("redacted_text") ===
      "Mixed case: <EMAIL> connects from <IP> phone <PHONE>.")
  }

  test("url_domains: planted links aggregate by host, corpus contributes none") {
    val out = SparkEntry.queries("url_domains")(spark, sf).collect()
    val byDomain = out.map(r => r.getAs[String]("domain") ->
      (r.getAs[Long]("n_links"), r.getAs[Long]("n_docs"))).toMap
    assert(byDomain("docs.example.com") === ((2L, 2L)))
    assert(byDomain("example.com") === ((1L, 1L)))
    assert(byDomain("cdn.mirror.org") === ((1L, 1L)))
    assert(byDomain("old.example.net") === ((1L, 1L)))
    assert(out.map(_.getAs[Long]("n_links")).sum === 5L) // nothing from the corpus
  }

  test("url_canonicalize: every planted variant axis collapses; the singleton survives; nothing from the corpus") {
    val out = SparkEntry.queries("url_canonicalize")(spark, sf).collect()
      .map(r => r.getAs[String]("canonical_url") ->
        (r.getAs[Long]("n_links"), r.getAs[Long]("n_docs"))).toMap
    // port + host-case + utm + param-order + trailing-slash + fragment
    // variants all fold into exactly these three canonical URLs — a
    // truncating extractor or a skipped normalization step changes the
    // collapse counts (this is what the route-agreeing oracle alone
    // cannot see: both engines truncating identically still compare
    // equal)
    assert(out === Map(
      "https://docs.example.com/guide?a=1&b=2" -> ((2L, 2L)),
      "http://example.com" -> ((2L, 2L)),
      "https://example.com/other?a=1" -> ((1L, 1L))),
      s"canonical collapse diverged: $out")
  }

  test("domain_blocklist_filter: subdomains block on label boundaries; goodtracker.net survives tracker.net") {
    val out = SparkEntry.queries("domain_blocklist_filter")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_links"), r.getAs[Long]("n_blocked"),
          r.getAs[Boolean]("kept")))).toMap
    assert(out === Map(
      930300L -> ((2L, 1L, false)), // docs.example.com blocked, mirror.org not
      930301L -> ((1L, 1L, false)), // exact-domain block
      930302L -> ((2L, 1L, false)), // sub.evil.tracker.net blocked; goodtracker.net SURVIVES
      930303L -> ((1L, 0L, true))), // clean doc kept
      s"blocklist semantics diverged: $out")
  }

  test("pii_redaction: zero false positives on the clean corpus") {
    val clean = SparkEntry.queries("pii_redaction")(spark, sf)
      .filter("doc_id < 900000 AND has_pii").count()
    assert(clean === 0L)
  }

  test("cross_doc_line_dedup: the shared boilerplate line is removed everywhere, unique lines survive in order") {
    val out = SparkEntry.queries("cross_doc_line_dedup")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_removed"),
          r.getAs[String]("kept_text"))).toMap
    assert(out.keySet.filter(_ >= 920000L) === Set(920000L, 920001L, 920002L))
    val (n0, r0, k0) = out(920000L)
    assert((n0, r0) === ((3L, 1L)))
    assert(k0 === "Unique alpha line number one.\nUnique alpha line number two.",
      "survivors must keep their original order with the boilerplate gone")
    assert(out(920001L)._3 === "Unique beta content sits here.")
    assert(out(920002L)._3 === "Unique gamma line closes this.")
    // every affected doc's accounting holds: removed + kept = total
    out.foreach { case (id, (n, rm, kept)) =>
      val keptN = if (kept.isEmpty) 0 else kept.split("\n", -1).length
      assert(rm + keptN === n, s"doc $id: $rm removed + $keptN kept != $n")
    }
  }
}
