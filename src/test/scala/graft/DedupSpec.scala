package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("dedup_exact keeps one survivor per distinct text, min doc_id") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma"), (4L, "alpha beta"))
      .toDF("doc_id", "text")
    val out = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap
    assert(out === Map(1L -> 3L, 3L -> 1L))
  }

  test("span removal: canonical keeps, copies lose the span, unique docs untouched") {
    val region = (1 to 12).map(i => s"w$i").mkString(" ") // 12 tokens → 5 shingles
    val docs = Seq(
      (1L, s"alpha beta $region gamma delta"),     // canonical owner
      (2L, s"x1 x2 x3 $region y1 y2"),             // copies the region → loses it
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),          // unique → untouched
      (4L, s"alpha beta $region gamma delta"))     // exact copy of 1 → fully removed
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.spanDedupOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1 is the (min doc_id, min start) owner of every shared span
    assert(out(1L)._2 === 0L, s"canonical doc lost tokens: ${out(1L)}")
    // doc 2 keeps only what its own spans cover exclusively; the copied
    // region (and the 8-token spans overlapping into its prefix/suffix)
    // is gone, and the remainder never contains a region token
    assert(out(2L)._2 >= 12L, s"copy kept the duplicated region: ${out(2L)}")
    assert(!out(2L)._3.contains("w5"), s"region token survived: ${out(2L)._3}")
    assert(out(3L) === ((9L, 0L, "u1 u2 u3 u4 u5 u6 u7 u8 u9")))
    // the exact copy shares every span with doc 1 → fully removed
    assert(out(4L) === ((0L, 16L, "")), s"exact copy not emptied: ${out(4L)}")
  }

  test("streaming admission: a real foreachBatch stream matches the sequential batch result") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf)
    val store = docs.filter(col("doc_id") < 300).select("doc_id", "text")
    // sequential reference: the driver row's two-batch result
    val expected = SparkEntry.queries("streaming_dedup_admission")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // real stream over the same two micro-batches, same admission body
    val path = java.nio.file.Files
      .createTempDirectory("mhstream_spec").toString + "/store"
    graft.ops.Dedup.buildMinhashStore(store, path)
    val mem = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        acc ++= graft.ops.Dedup.admitMicroBatch(spark, batch, store, path, bid)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        ()
      }
      .start()
    try {
      val rows = docs.filter(col("doc_id") >= 300 && col("doc_id") < 305)
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      mem.addData(rows.map { case (id, t) => (id + 200000L, t) }.toSeq: _*)
      q.processAllAvailable() // batch 1 admitted before batch 2 arrives
      mem.addData(rows.map { case (id, t) => (id + 300000L, t) }.toSeq: _*)
      q.processAllAvailable()
      // crash-replay: batch 1 redelivered verbatim (at-least-once). The
      // known-id anti-join must make it a full no-op — no new pairs, no
      // double admission into the store or the admitted log
      val sigsBefore = spark.read.parquet(path + "/sigs").count()
      val pairsBefore = acc.size
      mem.addData(rows.map { case (id, t) => (id + 200000L, t) }.toSeq: _*)
      q.processAllAvailable()
      assert(acc.size === pairsBefore, "a replayed batch emitted pairs")
      assert(spark.read.parquet(path + "/sigs").count() === sigsBefore,
        "a replayed batch double-admitted into the store")
      assert(spark.read.parquet(path + "/admitted")
        .groupBy("doc_id").count().filter(col("count") > 1).count() === 0,
        "a replayed batch duplicated the admitted log")
    } finally q.stop()
    assert(acc.sortBy(p => (p._1, p._2)) === expected.sortBy(p => (p._1, p._2)),
      s"stream result ${acc.toSeq} != sequential ${expected}")
    assert(acc.nonEmpty, "fixture must produce at least one admission-time dupe")
  }

  test("staged admission: a crash between the admitted log and the store append replays consistent") {
    val path = java.nio.file.Files
      .createTempDirectory("mhcrash_spec").toString + "/store"
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "pack my box with five dozen liquor jugs before the long journey"),
      (3L, "sphinx of black quartz judge my vow in the ancient stone temple"))
      .toDF("doc_id", "text")
    graft.ops.Dedup.buildMinhashStore(corpus, path)
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      (12L, "completely unrelated fresh material about distributed query engines"))
      .toDF("doc_id", "text")
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // crash DURING the very first admitted-log write: only a _temporary
    // dir exists under the batch's own epoch leaf — the replay must not
    // trip over the unreadable torn directory
    val admEpoch = (1L << 40) + 4L
    val torn = new java.io.File(path + s"/admitted/epoch=$admEpoch/_temporary")
    assert(torn.mkdirs(), "could not plant the torn first write")
    val first = collectPairs(
      graft.ops.Dedup.admitMicroBatch(spark, batch, corpus, path, batchId = 4L))
    assert(first === Set((1L, 10L, 1.0)), s"unexpected pairs: $first")
    // simulate the mid-sequence crash: the admitted text log landed, the
    // staged sigs/bands did not (kill between the writes)
    for (sub <- Seq(s"/sigs/epoch=$admEpoch", s"/bands/epoch=$admEpoch")) {
      val f = new java.io.File(path + sub)
      assert(f.exists(), s"$sub missing before simulated crash")
      java.nio.file.Files.walk(f.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    // at-least-once redelivery of the SAME batch id: the replay must not
    // be fooled by its own torn admitted write — same pairs re-emitted,
    // all three epoch-5 leaves rewritten, each survivor exactly once
    val replayed = collectPairs(
      graft.ops.Dedup.admitMicroBatch(spark, batch, corpus, path, batchId = 4L))
    assert(replayed === first, s"replay diverged: $replayed vs $first")
    val sigs = spark.read.parquet(path + "/sigs")
    assert(sigs.filter(col("doc_id") === 12L).count() === 1,
      "survivor must be in the store exactly once after the replay")
    assert(sigs.filter(col("doc_id") === 10L).count() === 0,
      "a rejected duplicate must never enter the store")
    assert(spark.read.parquet(path + "/admitted")
      .groupBy("doc_id").count().filter(col("count") > 1).count() === 0,
      "the replay duplicated the admitted log")
    // and the repaired store serves later batches
    val later = Seq(
      (20L, "completely unrelated fresh material about distributed query engines"))
      .toDF("doc_id", "text")
    val got2 = collectPairs(
      graft.ops.Dedup.admitMicroBatch(spark, later, corpus, path, batchId = 6L))
    assert(got2 === Set((12L, 20L, 1.0)),
      "an admitted doc must dedup later arrivals after the crash-replay")
    // lane isolation: maintenance appends allocate below the admission
    // base, so they can never land on (and overwrite) an admission epoch
    graft.ops.Dedup.appendToMinhashStore(spark,
      Seq((30L, "a brand new maintenance document about compilers and lattices"))
        .toDF("doc_id", "text"), path)
    val sigs2 = spark.read.parquet(path + "/sigs")
    assert(sigs2.filter(col("doc_id") === 30L).count() === 1)
    assert(sigs2.filter(col("doc_id") === 12L).count() === 1,
      "maintenance append clobbered an admission epoch")
  }

  test("incremental fixture margin: every oracle-qualifying pair sits at j >= 0.9") {
    // The driver rows' LSH no-miss argument (16 bands × 4 rows misses a
    // pair with probability (1-j⁴)¹⁶) is safe only while every qualifying
    // pair's exact Jaccard is far above the 0.5 oracle threshold — at
    // j = 0.95 the miss bound is ~4e-12, at j = 0.6 it is ~0.9. This pin
    // makes a data-generation change that erodes the assumption fail in
    // tests instead of as a flaky red driver row.
    val docs = graft.Tables.documents(spark, sf)
    val store = docs.filter(col("doc_id") < 300).select("doc_id", "text")
    val batch = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val sets = store.unionByName(batch)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), array_distinct(
        Dedup.shinglesCol(Dedup.tokensCol(col("text")), 3)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val batchIds = sets.keys.filter(_ >= 100000L).toSeq.sorted
    var qualifying = 0
    for (b <- batchIds; (a, sa) <- sets if a < b) {
      val sb = sets(b)
      val inter = (sa intersect sb).size
      val j = inter.toDouble / (sa.size + sb.size - inter)
      if (j >= 0.5) {
        qualifying += 1
        assert(j >= 0.9,
          f"pair ($a, $b) qualifies at j=$j%.3f — inside the LSH miss band; " +
            "the fixture's no-miss assumption no longer holds")
      }
    }
    assert(qualifying >= batchIds.size,
      "fixture must contain at least one qualifying pair per batch doc")
  }

  test("incremental_new_docs excludes all state ids (anti-join invariant)") {
    val out = SparkEntry.queries("incremental_new_docs")(spark, sf)
      .select("doc_id").as[Long].collect()
    assert(out.nonEmpty)
    assert(out.forall(_ % 10 >= 3), "no state id may survive the anti-join")
  }

  test("semantic_dedup: planted families collapse to the base exemplar, reals keep themselves") {
    val rows = SparkEntry.queries("semantic_dedup")(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("canonical_id")).toMap
    val nReal = graft.Tables.embeddings(spark, sf).count()
    assert(rows.size === nReal + 45)
    rows.foreach { case (id, canon) =>
      if (id >= 100000L) assert(canon === (id - 100000L) / 100,
        s"copy $id should collapse to its family base, got $canon")
      else assert(canon === id, s"real row $id must keep itself, got $canon")
    }
  }

  test("semanticDedupOf on a hand-built corpus: clique collapses, isolated rows survive") {
    // three identical unit vectors (one clique), one orthogonal singleton
    val v = Array.fill(64)(0.0f); v(0) = 1.0f
    val w = Array.fill(64)(0.0f); w(1) = 1.0f
    val df = Seq((10L, v.toSeq), (11L, v.toSeq), (12L, v.toSeq), (20L, w.toSeq))
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupOf(df, "embedding", "vec_id",
        numClusters = 2, tau = 0.8, seed = 7L)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(out === Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("shingles: short docs yield one shingle, others n-grams in order") {
    val df = Seq("a b", "a b c d").toDF("text")
      .select(Dedup.shinglesCol(Dedup.tokensCol(col("text")), 3).as("sh"))
    val rows = df.as[Seq[String]].collect()
    assert(rows(0) === Seq("a b"))
    assert(rows(1) === Seq("a b c", "b c d"))
  }

  test("minhash signature: identical text → identical sig; est jaccard sane") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content about spark shuffle partitions here"))
      .toDF("doc_id", "text")
    val sigs = df.select(col("doc_id"),
      Dedup.minhashSignature(array_distinct(
        Dedup.shinglesCol(Dedup.tokensCol(col("text")), 3))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(sigs(1L) === sigs(2L), "equal text must hash to equal signature")
    assert(sigs(1L).length === Dedup.NumHashes)
    val agree = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(agree < Dedup.NumHashes / 4, s"disjoint docs agreed on $agree slots")
  }

  test("fused text→sig path is bit-identical to the column path") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "a b",                      // fewer tokens than shingle width
      "!!! ...",                  // punctuation only → empty token list
      "Mixed CASE Text with   runs\tof\nwhitespace and 123 numbers 123",
      "")
    val df = texts.toDF("text")
    val both = df.select(
      Dedup.minhashSignature(array_distinct(
        Dedup.shinglesCol(Dedup.tokensCol(col("text")), 3))).as("col_path"),
      Dedup.minhashSignatureFromText(col("text"), 3).as("fused"))
      .collect()
    both.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1),
        s"signature mismatch for text: '$t'")
    }
  }

  test("fused shingleStrings is bit-identical to the shinglesCol column path") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "a b",                      // fewer tokens than shingle width
      "!!! ...",                  // punctuation only → empty token list
      "Mixed CASE Text with   runs\tof\nwhitespace and 123 numbers 123",
      "exactly eight tokens one two three four five")
    for (n <- Seq(3, 8)) {
      val both = texts.toDF("text").select(
        Dedup.shinglesCol(Dedup.tokensCol(col("text")), n).as("col_path"),
        udf((toks: Seq[String]) => Dedup.shingleStrings(toks, n))
          .apply(Dedup.tokensCol(col("text"))).as("fused"))
        .collect()
      both.zip(texts).foreach { case (r, t) =>
        assert(r.getSeq[String](0) === r.getSeq[String](1),
          s"shingle mismatch for n=$n text: '$t'")
      }
    }
  }

  test("minhash LSH finds planted near-duplicates") {
    val base = "spark executes queries as a dag of stages separated by " +
      "shuffle boundaries and each stage runs whole stage generated code " +
      "over columnar batches with partitions sized to fit executor memory"
    val docs = Seq(
      (0L, base),
      (1L, base + " with one extra trailing clause appended"),
      (2L, "entirely unrelated text about cooking pasta with tomato sauce " +
        "and fresh basil leaves in a large pot of salted boiling water"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("minhash_test_docs")
    val bands = Dedup.minhashBands(docs, "doc_id", "text", 3)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((0L, 1L)), "near-dup pair must share a band bucket")
    assert(!cand.contains((0L, 2L)) && !cand.contains((1L, 2L)),
      "unrelated doc must not collide in any band")
  }

  test("minhash store: incremental probe finds store and within-batch dupes, store read-only") {
    val path = java.nio.file.Files.createTempDirectory("mhstore").toString + "/store"
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "pack my box with five dozen liquor jugs before the long journey"),
      (3L, "sphinx of black quartz judge my vow in the ancient stone temple"))
      .toDF("doc_id", "text")
    Dedup.buildMinhashStore(corpus, path)
    def storeListing = new java.io.File(path + "/bands").listFiles()
      .map(f => (f.getName, f.length, f.lastModified)).toSet
    val before = storeListing
    // batch: a copy of store doc 1, a copy of itself (within-batch pair),
    // and a genuinely new doc
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      (11L, "the quick brown fox jumps over the lazy dog again and again today"),
      (12L, "completely unrelated fresh material about distributed query engines"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalMinhashDupes(spark, batch, path)
    assert(got.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "the store side must join broadcast — it may never shuffle")
    val pairs = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSet === Set((1L, 10L, 1.0), (1L, 11L, 1.0), (10L, 11L, 1.0)),
      s"got ${pairs.toSeq}")
    assert(storeListing === before, "the probe must not touch store files")
    // admit the survivors, then a later batch dedups against them
    Dedup.appendToMinhashStore(spark, batch.filter(col("doc_id") === 12L), path)
    val later = Seq(
      (20L, "completely unrelated fresh material about distributed query engines"))
      .toDF("doc_id", "text")
    val got2 = Dedup.incrementalMinhashDupes(spark, later, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got2.toSet === Set((12L, 20L, 1.0)),
      "an admitted doc must dedup later arrivals")
  }

  test("minhash store compaction: identical results, one leaf, age floor, abort recovery") {
    val path = java.nio.file.Files.createTempDirectory("mhcompact").toString + "/store"
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "pack my box with five dozen liquor jugs before the long journey"),
      (3L, "sphinx of black quartz judge my vow in the ancient stone temple"))
      .toDF("doc_id", "text")
    Dedup.buildMinhashStore(corpus, path)
    Dedup.appendToMinhashStore(spark,
      Seq((4L, "completely unrelated fresh material about distributed query engines"))
        .toDF("doc_id", "text"), path)
    Dedup.appendToMinhashStore(spark,
      Seq((5L, "yet another standalone document on columnar storage formats"))
        .toDF("doc_id", "text"), path)
    def leaves(sub: String) = new java.io.File(path + sub).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("epoch="))
    assert(leaves("/bands") === 3)
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      (11L, "completely unrelated fresh material about distributed query engines"))
      .toDF("doc_id", "text")
    def probe() = Dedup.incrementalMinhashDupes(spark, batch, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val before = probe()
    assert(before === Set((1L, 10L, 1.0), (4L, 11L, 1.0)), s"got $before")
    assert(Dedup.compactMinhashStore(spark, path) === 3)
    assert(leaves("/bands") === 1 && leaves("/sigs") === 1,
      "fold must leave exactly one committed leaf per table")
    assert(probe() === before, "fold changed the dedup answer")
    // age floor: a hot epoch stays out of the fold (and <2 aged = no-op)
    Dedup.appendToMinhashStore(spark,
      Seq((6L, "one more fresh doc arriving after the fold")).toDF("doc_id", "text"), path)
    assert(Dedup.compactMinhashStore(spark, path, minAgeMs = 3600L * 1000) === 0)
    assert(leaves("/bands") === 2, "hot epoch must survive an age-floored fold")
    // an aborted staging (no marker) is discarded, store still answers
    val aborted = new java.io.File(path + "/_compact/sigs")
    aborted.mkdirs()
    java.nio.file.Files.write(aborted.toPath.resolve("junk.parquet"), Array[Byte](1))
    assert(Dedup.compactMinhashStore(spark, path) === 2)
    assert(!new java.io.File(path + "/_compact").exists(), "staging must be cleaned")
    val after = probe()
    assert(after === before, s"recovery broke the store: $after")
  }

  test("minhash store fold: the admitted text log folds with the store and admission still dedups") {
    val path = java.nio.file.Files.createTempDirectory("mhfold_adm").toString + "/store"
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "pack my box with five dozen liquor jugs before the long journey"))
      .toDF("doc_id", "text")
    Dedup.buildMinhashStore(base, path)
    // two admitted micro-batches: each stages sigs+bands+admitted epochs
    Dedup.admitMicroBatch(spark,
      Seq((10L, "a streaming doc about adaptive execution")).toDF("doc_id", "text"),
      base, path, batchId = 0L)
    Dedup.admitMicroBatch(spark,
      Seq((11L, "a streaming doc about columnar layouts")).toDF("doc_id", "text"),
      base, path, batchId = 1L)
    def leaves(sub: String) = new java.io.File(path + sub).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("epoch="))
    assert(leaves("/admitted") === 2)
    assert(Dedup.compactMinhashStore(spark, path) === 3)
    assert(leaves("/bands") === 1 && leaves("/sigs") === 1 && leaves("/admitted") === 1,
      "all three tables must fold to one leaf")
    // a replayed doc 10 (fresh delivery id) must still dedup against the
    // FOLDED store — both its signature and its admitted text survived
    val pairs = Dedup.admitMicroBatch(spark,
      Seq((20L, "a streaming doc about adaptive execution")).toDF("doc_id", "text"),
      base, path, batchId = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((10L, 20L)), s"folded store missed the dupe: $pairs")
  }

  test("minhash store fold: a post-fold replay of an admission batch's OWN id re-admits nothing") {
    // the index-root stagers needed the BatchRoster to close this case
    // (their overwrite is blind); the admission path is safe by
    // CONSTRUCTION and this spec pins why: the fold moves the batch's
    // rows into epoch 0, the replay excludes only its own admission
    // epoch from the known-id reads, so every replayed doc is "known"
    // and the anti-join drops the whole batch — no duplicate admission,
    // no horizon arithmetic
    val path = java.nio.file.Files.createTempDirectory("mhfold_replay").toString + "/store"
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "pack my box with five dozen liquor jugs before the long journey"))
      .toDF("doc_id", "text")
    Dedup.buildMinhashStore(base, path)
    val batch = Seq((10L, "a streaming doc about adaptive execution"),
      (11L, "a streaming doc about columnar layouts")).toDF("doc_id", "text")
    Dedup.admitMicroBatch(spark, batch, base, path, batchId = 0L)
    assert(Dedup.compactMinhashStore(spark, path) === 2)
    def sigCount = spark.read.parquet(path + "/sigs").count()
    val before = sigCount
    // the at-least-once redelivery of the FOLDED batch, same batch id
    val pairs = Dedup.admitMicroBatch(spark, batch, base, path, batchId = 0L)
    assert(pairs.isEmpty, "a post-fold replay must admit and pair nothing")
    assert(sigCount === before,
      "a post-fold replay must not re-admit the batch beside its folded copy")
  }

  test("minhash store fold: an age-floored fold excluding a younger epoch never collides with it") {
    val path = java.nio.file.Files.createTempDirectory("mhfold_hot").toString + "/store"
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "pack my box with five dozen liquor jugs before the long journey"))
      .toDF("doc_id", "text")
    Dedup.buildMinhashStore(corpus, path)
    Dedup.appendToMinhashStore(spark,
      Seq((3L, "a first appended doc about columnar storage")).toDF("doc_id", "text"), path)
    Dedup.appendToMinhashStore(spark,
      Seq((4L, "a second appended doc about vectorized execution")).toDF("doc_id", "text"), path)
    // epoch 0 stays hot; epochs 1 and 2 age past the floor
    val old = System.currentTimeMillis() - 3600L * 1000
    Seq("/sigs", "/bands").foreach { sub =>
      Seq(1, 2).foreach(e =>
        new java.io.File(path + sub, s"epoch=$e").setLastModified(old))
    }
    def probe() = Dedup.incrementalMinhashDupes(spark,
        Seq((10L, "a first appended doc about columnar storage")).toDF("doc_id", "text"),
        path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = probe()
    assert(before === Set((3L, 10L)))
    assert(Dedup.compactMinhashStore(spark, path, minAgeMs = 600L * 1000) === 2)
    Seq("/sigs", "/bands").foreach { sub =>
      val leaves = new java.io.File(path + sub).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("epoch="))
        .map(_.getName).sorted
      assert(leaves.toSeq === Seq("epoch=0", "epoch=1"),
        s"$sub: fold must land on targets.min beside the hot base, got ${leaves.toSeq}")
    }
    assert(probe() === before, "the hot epoch or folded epochs' rows were lost")
  }

  test("simhash: identical → distance 0, near → small, far → large") {
    val t1 = "spark shuffle hash join broadcast exchange partition codegen stage task".split(" ").toSeq
    val t2 = t1.updated(3, "sort")
    val t3 = "pasta tomato basil olive garlic oven pizza dough flour yeast".split(" ").toSeq
    val s1 = Dedup.simhash64(t1)
    assert(s1 === Dedup.simhash64(t1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(s1, Dedup.simhash64(t2)) < ham(s1, Dedup.simhash64(t3)),
      "one-token edit must be closer than disjoint text")
  }

  test("driver queries: near-dup surfaces run and self-consistency holds") {
    // the raw pair frames (the driver rows are now their violation gates)
    val mh = ops.Dedup.minhashNearDupesQ(spark, sf).collect()
    mh.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val j = r.getAs[Double]("est_jaccard")
      assert(j >= 0.5 && j <= 1.0)
    }
    val sh = ops.Dedup.simhashNearDupesQ(spark, sf).collect()
    sh.foreach(r => assert(r.getAs[Int]("hamming") <= 3))
  }

  test("ngram jaccard pairs are symmetric-free and thresholded") {
    val out = SparkEntry.queries("ngram_jaccard_pairs")(spark, sf).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Double]("jaccard") >= 0.5)
    }
  }

  test("dedup_components: chain propagates min across full diameter, star and pair resolve") {
    val out = SparkEntry.queries("dedup_components")(spark, sf).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("component"), r.getAs[Long]("component_size"))).toMap
    // 5-node chain: min (800000) sits at one end, 4 hops from 800004
    (800000L to 800004L).foreach(n => assert(out(n) === ((800000L, 5L)), s"chain node $n"))
    // 4-node star centered on 800010
    (800010L to 800013L).foreach(n => assert(out(n) === ((800010L, 4L)), s"star node $n"))
    // isolated pair
    assert(out(800020L) === ((800020L, 2L)))
    assert(out(800021L) === ((800020L, 2L)))
  }

  test("dedup_canonical: one canonical per component, and it is the longest member") {
    val rows = SparkEntry.queries("dedup_canonical")(spark, sf).collect()
    val byComponent = rows.groupBy(_.getAs[Long]("component"))
    assert(byComponent.nonEmpty, "expected at least one near-dup cluster at sf0.001")
    byComponent.foreach { case (c, members) =>
      assert(members.length >= 2, s"component $c: clusters come from pairs")
      val canon = members.filter(_.getAs[Boolean]("is_canonical"))
      assert(canon.length === 1, s"component $c: exactly one canonical")
      val maxChars = members.map(_.getAs[Long]("n_chars")).max
      assert(canon.head.getAs[Long]("n_chars") === maxChars,
        s"component $c: canonical must be the longest member")
      assert(members.map(_.getAs[Long]("canonical_doc")).distinct.length === 1,
        s"component $c: members agree on the canonical doc")
    }
  }

  test("connectedComponents merges two chains linked by a bridge edge") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (3L, 10L))
      .toDF("src", "dst")
    val comp = graft.ops.Dedup.connectedComponents(edges).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    Seq(1L, 2L, 3L, 10L, 11L, 12L).foreach(n => assert(comp(n) === 1L))
  }

  test("dup_ngram_coverage: exact copies fully covered, unique doc untouched") {
    val base = (1 to 20).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, base),                                    // copy A
      (2L, base),                                    // copy B — every shingle dup
      (3L, (100 to 130).map(i => s"only$i").mkString(" ")), // unique
      (4L, base + " trailing unique suffix tokens here now extra")) // partial copy
      .toDF("doc_id", "text")
    val out = Dedup.dupNgramCoverageOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dup_frac_e6"), r.getAs[Boolean]("keep_dup_coverage"))).toMap
    assert(out(1L)._1 === 1000000L, "exact copy: all shingles duplicated")
    assert(out(2L)._1 === 1000000L)
    assert(!out(1L)._2 && !out(2L)._2, "full copies must be flagged for drop")
    assert(out(3L) === ((0L, true)), "unique doc has zero dup coverage")
    assert(out(4L)._1 > 500000L && !out(4L)._2,
      "a mostly-copied doc crosses the 50% coverage threshold")
  }

  test("semantic_incremental_dupes: held-out vectors admit, standing copies reject with the right exemplar") {
    val rows = SparkEntry.queries("semantic_incremental_dupes")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[String]("decision"),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
    assert(rows.filter(_._2 == "admit").map(_._1).toSeq ===
      (200000L until 200005L), "every held-out vector must admit")
    assert(rows.filter(_._2 == "reject")
        .map(t => (t._1, t._3)).toSeq ===
      (0 until 5).map(i => (300000L + i, Some(10L + i))),
      "every standing copy must reject against its identical exemplar")
  }

  test("semantic_incremental_dupes: the standing store scan is partition-pruned to the batch's clusters") {
    // warm the fixture, then audit the probe plan: the store read must
    // carry cluster_id partition filters — a corpus-wide standing scan
    // is exactly what the admission check must never pay
    SparkEntry.queries("semantic_incremental_dupes")(spark, sf).collect()
    val path = Tables.scratchPath("semdedup_store", sf)
    val probe = spark.read.parquet(path)
      .filter(org.apache.spark.sql.functions.col("cluster_id").isin(0, 1))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      !plan.replaceAll("(?s).*PartitionFilters: \\[", "").startsWith("]"),
      s"standing-store probe must push cluster_id partition filters:\n$plan")
  }
}
