package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("dsir_importance_weights: exact fifth selected; the selected fifth leans toward the boosted target tokens") {
    val out = SparkEntry.queries("dsir_importance_weights")(spark, sf).cache()
    val n = out.count()
    val sel = out.filter(col("selected")).count()
    assert(sel === n / 5, s"rank cut must select exactly floor(n/5): $sel of $n")
    // directional signal: the selected docs carry a higher fraction of
    // the target-boosted tokens than the rejected docs (the corpus is
    // iid synthetic noise, so the margin is small but must be positive
    // — a sign flip means the importance weight is inverted)
    val boosted = Seq("vector", "window", "merge", "hash")
    val frac = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), "[^\\p{L}\\p{N}]+"),
          t => length(t) > 0)).as("tok"))
      .groupBy("doc_id")
      .agg((sum(when(col("tok").isin(boosted: _*), 1L).otherwise(0L)) /
        count(lit(1))).as("bf"))
    val j = out.join(frac, "doc_id").groupBy("selected")
      .agg(avg(col("bf")).as("mbf")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(j(true) > j(false),
      s"selected fifth must lean toward the boosted tokens: $j")
  }

  test("dataset_split: exact per-stratum proportions, disjoint and exhaustive") {
    val out = SparkEntry.queries("dataset_split")(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    assert(out.count() === docs.count(), "every document gets exactly one split")
    assert(out.select("doc_id").distinct().count() === docs.count())
    val perStratum = out.groupBy("source")
      .pivot("split", Seq("train", "val", "test"))
      .count().na.fill(0L).collect()
    perStratum.foreach { r =>
      val (tr, va, te) = (r.getAs[Long]("train"), r.getAs[Long]("val"),
        r.getAs[Long]("test"))
      val n = tr + va + te
      assert(tr === n * 8 / 10, s"${r.getString(0)}: train $tr of $n")
      assert(va === n * 9 / 10 - n * 8 / 10, s"${r.getString(0)}: val $va of $n")
    }
  }

  test("dataset_split is invariant under input repartitioning") {
    val a = SparkEntry.queries("dataset_split")(spark, sf)
      .collect().map(_.toSeq).toSet
    val b = TextAnalysis.datasetSplit(spark, sf) // fresh plan, same answer
      .repartition(7).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("dataset_split_hashed: map-only, repartition-invariant, proportions within tolerance") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = Tables.documents(spark, sf)
    def splits(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), TextAnalysis.hashSplit(col("text")).as("split"))
    // repartition invariance: membership is a pure function of content
    val a = splits(docs).collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val b = splits(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a === b, "the hash split must not depend on partitioning")
    // disjoint + exhaustive by construction; proportions binomial around
    // 80/10/10 — at 500 docs, ±6% is > 4 standard deviations
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac.getOrElse("train", 0.0) - 0.8) < 0.06, s"$frac")
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.1) < 0.06, s"$frac")
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.1) < 0.06, s"$frac")
    // MAP-ONLY: the split projection plans with no exchange at all —
    // the whole point of the mega-strata fallback
    val plan = splits(docs).queryExecution.executedPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"the hash split must be a pure map:\n$plan")
  }

  test("dsir_threshold_selection: a superset of the exact fifth, extras all boundary ties") {
    val exact = SparkEntry.queries("dsir_importance_weights")(spark, sf)
      .collect()
    val exactSel = exact.filter(_.getAs[Boolean]("selected"))
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("logw_bits")).toMap
    val thr = exactSel.values.min
    val out = SparkEntry.queries("dsir_threshold_selection")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("logw_bits")).toMap
    assert(exactSel.keySet.subsetOf(out.keySet),
      "threshold selection must contain the exact fifth")
    assert(out.size >= exact.length / 5)
    val extras = out.keySet -- exactSel.keySet
    extras.foreach { d =>
      assert(out(d) === thr,
        s"doc $d selected beyond the fifth must tie at the boundary " +
          s"($thr), got ${out(d)}")
    }
    // the headline plan property, PINNED: the selection stage carries no
    // rank window — a refactor reintroducing one must fail here
    val plan = SparkEntry.queries("dsir_threshold_selection")(spark, sf)
      .queryExecution.executedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"threshold selection must not plan a rank window:\n$plan")
  }

  test("dsir_threshold_sampled: the GK estimate lands in the exact rank band; selection stays a pure filter") {
    // the gate itself: zero violations — the sampled T sits inside the
    // exact [75th, 85th] discrete percentile band and the selection
    // count is monotone-consistent with the band edges
    val out = SparkEntry.queries("dsir_threshold_sampled")(spark, sf)
      .collect()
    assert(out.isEmpty,
      s"sampled-threshold gate violations: ${out.mkString(", ")}")
    // the headline plan property, PINNED on the SHARED selection stage:
    // a pure filter, no rank window — the reason the sampled fallback
    // exists at all
    val lw = TextAnalysis.dsirLogWeights(spark, sf)
    val plan = TextAnalysis.dsirSelectAtThreshold(lw, 0L)
      .queryExecution.executedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"sampled selection must not plan a rank window:\n$plan")
  }

  test("text_quality metrics on a hand-computed sample") {
    val df = Seq((1L, "The cat sat on the mat, twice.")).toDF("doc_id", "text")
      .withColumn("toks", TextAnalysis.tokensCol(col("text")))
    val r = df.select(
      length(col("text")).as("n"),
      size(col("toks")).as("w"),
      size(regexp_extract_all(col("text"), lit("""[.,;:!?'"()\[\]{}-]"""), lit(0))).as("p"))
      .head()
    assert(r.getAs[Int]("n") === 30)
    assert(r.getAs[Int]("w") === 7)
    assert(r.getAs[Int]("p") === 2) // comma + period
  }

  test("token_counts: three tokenizers agree on simple text") {
    val out = Seq((1L, "hello world 42 foo-bar")).toDF("doc_id", "text")
    val r = out.select(
      size(split(trim(col("text")), "[ \\t\\n]+")).as("ws"),
      size(TextAnalysis.tokensCol(col("text"))).as("word"),
      size(regexp_extract_all(col("text"),
        lit("""\p{L}+|\p{N}+|[^\p{L}\p{N} \t\n]+"""), lit(0))).as("bpe"))
      .head()
    assert(r.getAs[Int]("ws") === 4)
    assert(r.getAs[Int]("word") === 5) // hello world 42 foo bar
    assert(r.getAs[Int]("bpe") === 6) // hello world 42 foo - bar
  }

  test("lang_id identifies real-language sentences") {
    val samples = Seq(
      ("en", "The quick brown fox jumps over the lazy dog and it was not seen again for a while."),
      ("en", "It is a truth universally acknowledged that a single man in possession of a good fortune must be in want of a wife."),
      ("de", "Der alte Mann und das Meer ist ein Buch das ich nicht mit einem anderen vergleichen kann und sie wissen das."),
      ("de", "Ich bin der Meinung dass die Sonne nicht mit dem Mond zu vergleichen ist und ein jeder das weiss."),
      ("fr", "Je ne pas comprendre pourquoi vous ne venez pas dans le jardin avec les enfants et une amie."),
      ("fr", "La vie est belle et je pense que vous ne devriez pas la passer dans une chambre sombre."),
      ("es", "El perro y el gato no son amigos pero viven en una casa con un jardin por el que pasean."),
      ("es", "No es que no quiera ir es que no puedo porque los trenes no pasan por la estacion."),
      ("zh", "今天天气很好我们一起去公园散步吧然后吃晚饭"),
      ("zh", "机器学习模型需要大量的训练数据才能达到良好的效果"),
      // kana priority: kanji-heavy Japanese must NOT fall to zh
      ("ja", "今日はとても良い天気なので公園へ散歩に行きましょう"),
      ("ja", "機械学習モデルには大量の学習データが必要です"),
      ("ru", "Сегодня хорошая погода и мы пойдем гулять в парк вместе"),
      ("ru", "Машинное обучение требует большого количества данных"),
      ("ar", "الطقس جميل اليوم فلنذهب الى الحديقة معا للتنزه"),
      ("ko", "오늘은 날씨가 좋아서 공원에 산책하러 갑니다"))
    val df = samples.zipWithIndex
      .map { case ((l, t), i) => (i.toLong, t, l) }
      .toDF("doc_id", "text", "expected")
      .withColumn("pred", TextAnalysis.langIdCol(col("text")))
    val rows = df.select(col("expected"), col("pred.lang").as("got")).collect()
    val correct = rows.count(r => r.getString(0) == r.getString(1))
    assert(correct === rows.length,
      s"misclassified: ${rows.filter(r => r.getString(0) != r.getString(1)).mkString(", ")}")
  }

  test("fingerprints: deterministic; identical docs share all, disjoint share none") {
    val df = Seq(
      (1L, "spark executes queries as a dag of stages separated by shuffles"),
      (2L, "spark executes queries as a dag of stages separated by shuffles"),
      (3L, "pasta tomato basil olive garlic oven pizza dough flour yeast salt"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.fingerprintCol(col("text")).as("fp"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L).intersect(fps(3L)).isEmpty)
    assert(fps(1L).nonEmpty)
  }

  test("fingerprint overlap finds planted containment") {
    val base = "the winnowing algorithm selects the minimum hash in each window " +
      "of consecutive k gram hashes guaranteeing that matches longer than the " +
      "guarantee threshold are always detected between documents"
    val df = Seq(
      (1L, base),
      (2L, base + " with extra appended commentary at the end of the document"),
      (3L, "unrelated text about gardening tomatoes peppers basil and the many " +
        "joys of watering plants every morning before the sun rises over the hill"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), explode(TextAnalysis.fingerprintCol(col("text"))).as("fp"))
    val byDoc = df.collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val c12 = byDoc(1L).intersect(byDoc(2L)).size.toDouble / math.min(byDoc(1L).size, byDoc(2L).size)
    val c13 = byDoc(1L).intersect(byDoc(3L)).size.toDouble / math.min(byDoc(1L).size, byDoc(3L).size)
    assert(c12 >= 0.5, s"containment of near-identical docs was $c12")
    assert(c13 < 0.3, s"containment of unrelated docs was $c13")
  }

  test("driver queries run and are internally consistent") {
    val q = SparkEntry.queries("text_quality")(spark, sf).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      val s = r.getAs[Double]("quality_score")
      assert(s >= 0.0 && s <= 1.0)
      assert(r.getAs[Double]("space_ratio") < 1.0)
    }
    val tc = SparkEntry.queries("token_counts")(spark, sf).collect()
    tc.foreach { r =>
      assert(r.getAs[Long]("n_word_tokens") >= r.getAs[Long]("n_ws_tokens") - 1)
      assert(r.getAs[Long]("n_bpe_pieces") >= r.getAs[Long]("n_word_tokens"))
    }
    assert(ops.TextAnalysis.docFingerprints(spark, sf).count() > 0)
  }

  test("quality_calibration: ordered percentiles, per-lang adaptive keep near 75%") {
    val rows = SparkEntry.queries("quality_calibration")(spark, sf).collect()
    val langs = Tables.documents(spark, sf)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_.getAs[String]("lang")).toSet === langs)
    rows.foreach { r =>
      val Seq(p10, p25, p50, p90) = Seq("p10_milli", "p25_milli", "p50_milli", "p90_milli")
        .map(r.getAs[Long])
      assert(p10 <= p25 && p25 <= p50 && p50 <= p90, s"percentiles ordered: $r")
      assert(p10 >= 0 && p90 <= 1000, "score_milli lives in [0, 1000]")
      val n = r.getAs[Long]("n_docs")
      val keep = r.getAs[Long]("n_keep")
      // at least everything at rank >= ceil(0.25 n) survives; ties only add
      assert(keep >= n - (n * 25 + 99) / 100 + 1 && keep <= n,
        s"lang ${r.getAs[String]("lang")}: keep $keep of $n")
    }
  }

  test("stratified sample: deterministic, rate near per-lang quota, subset of corpus") {
    val s1 = SparkEntry.queries("stratified_sample")(spark, sf).collect()
    val s2 = SparkEntry.queries("stratified_sample")(spark, sf).collect()
    assert(s1.map(_.getLong(0)).toSeq === s2.map(_.getLong(0)).toSeq)
    val total = Tables.documents(spark, sf).count().toDouble
    // blended expectation between the 25% and 50% quotas, loose bounds
    assert(s1.length > total * 0.15 && s1.length < total * 0.55,
      s"sample size ${s1.length} of $total out of expected band")
    s1.foreach { r =>
      val b = r.getInt(2)
      assert(b >= 0 && b < (if (r.getString(1) == "en") 8 else 4))
    }
  }

  test("pack_sequences: contiguous per-lang layout, offsets bounded by seqLen") {
    val out = SparkEntry.queries("pack_sequences")(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      var prevCum = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        // contiguous layout: each doc starts where the previous ended
        assert(r.getAs[Long]("cum_tokens") ===
          prevCum + r.getAs[Long]("n_tokens"))
        val start = r.getAs[Long]("cum_tokens") - r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("shard") === start / 4096)
        assert(r.getAs[Long]("offset_in_shard") === start % 4096)
        prevCum = r.getAs[Long]("cum_tokens")
      }
    }
  }

  test("decontamination flags exactly the planted benchmark copies") {
    val rows = SparkEntry.queries("decontaminate_planted")(spark, sf).collect()
    assert(rows.length === 40)
    rows.foreach { r =>
      assert(r.getLong(0) >= 700000L && r.getLong(0) < 700040L)
      assert(r.getDouble(1) === 1.0)
      assert(r.getLong(2) === 1L)
    }
  }

  test("top_ngrams_per_lang: 5 ranked rows per language, counts non-increasing") {
    val rows = SparkEntry.queries("top_ngrams_per_lang")(spark, sf).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).toSeq.sorted === (1L to rs.length),
        s"$lang: ranks must be 1..n")
      val counts = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("n"))
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
        s"$lang: counts must be non-increasing down the ranks")
    }
  }

  test("weighted_sample: deterministic and biased toward heavier docs") {
    val a = SparkEntry.queries("weighted_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = SparkEntry.queries("weighted_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a === b, "content-hash sampling must be exactly reproducible")
    assert(a.nonEmpty)
    // deterministic for this fixture: kept docs skew heavier than corpus
    val corpusMean = Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.avg("n_chars")).head().getDouble(0)
    val keptMean = a.map(_._2).sum.toDouble / a.length
    assert(keptMean > corpusMean,
      f"weighting had no effect: kept $keptMean%.1f vs corpus $corpusMean%.1f")
  }

  test("surprisal_scores: integer invariants and rare-vs-common ordering") {
    val rows = SparkEntry.queries("surprisal_scores")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, bits, mean) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 0 && bits >= 0)
      assert(mean === 1000000L * bits / n, "mean_mbits must be exact integer division")
    }
    // a corpus-wide sanity: the doc with the rarest vocabulary (highest
    // mean) must beat the most boilerplate one (lowest mean) strictly,
    // i.e. the signal differentiates
    val means = rows.map(_.getLong(3))
    assert(means.max > means.min)
  }

  test("embedding_norm_histogram: buckets partition all vectors") {
    val out = SparkEntry.queries("embedding_norm_histogram")(spark, sf)
    val total = out.agg(org.apache.spark.sql.functions.sum("n_vectors"))
      .head().getLong(0)
    assert(total === Tables.embeddings(spark, sf).count())
    out.collect().foreach(r => assert(r.getAs[Long]("norm_bucket") >= 0L))
  }

  test("dataset_shuffle_export: read-back physical order equals the rank witness; the write plans no global sort") {
    val out = SparkEntry.queries("dataset_shuffle_export")(spark, sf)
      .collect().map(r => (r.getAs[String]("shard"), r.getAs[Long]("pos"),
        r.getAs[Long]("doc_id"))).toSeq
    val witness = SparkEntry.queries("dataset_shuffle_shards")(spark, sf)
      .collect().map(r => (r.getAs[String]("shard"), r.getAs[Long]("pos"),
        r.getAs[Long]("doc_id"))).toSeq
    assert(out === witness,
      "the export's physical row order must BE the witnessed epoch order")
    // plan audit: one range exchange + partition-local sorts; a global
    // sort (Sort ..., true) or a rank window in the WRITE plan would be
    // the driver-bottleneck shape the export exists to avoid
    val plan = graft.ops.TextAnalysis.shuffleExportFrame(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"export must range-partition by shard:\n$plan")
    assert(!plan.matches("(?s).*Sort \\[[^\\]]*\\], true.*"),
      s"export must not plan a GLOBAL sort:\n$plan")
    assert(!plan.contains("Window"),
      s"the write path must not materialize ranks:\n$plan")
  }

  test("decontaminate_semantic: exactly the three unique sources flag; the novel bench item matches nothing") {
    val out = SparkEntry.queries("decontaminate_semantic")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("bench_id"))).toSeq
    assert(out.length === 3)
    assert(out.map(_._2).toSet === Set(1L, 2L, 3L),
      "the novel bench item (4) must never match a corpus doc")
    // each bench item flags exactly its own source (identical text ->
    // identical embedding -> rounded cosine 1.0), and no OTHER corpus
    // doc crosses the 0.999 near-verbatim threshold against any item —
    // the no-false-positives half of the construction
    assert(out.map(_._1).distinct.length === 3)
    // ROUTE EQUALITY (the router discipline): the ANN route — bench
    // items as batch queries over the persisted LSH index, contaminated
    // set = union of above-threshold neighbors — must serve the
    // broadcast route's exact pairs. At threshold 0.999 recall is
    // structural (identical vectors share every bucket), so any
    // divergence is a bug in the index build, probe join, or reduction.
    val ann = SparkEntry.queries("decontaminate_semantic_ann")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("bench_id"))).toSeq
    assert(ann === out,
      s"the ANN route diverged from the broadcast route: $ann vs $out")
  }

  test("shuffle export read-back order is faithful even when one shard spans several files") {
    // force multi-file shards (maxRecordsPerFile) and replicate the
    // row's read-back: (file_path, row_index) ordering must still
    // reproduce the rank witness — per-file row_index alone would alias
    // positions across a shard's files
    val out = java.nio.file.Files
      .createTempDirectory("shuffleexport_mf").toString + "/ep"
    graft.ops.TextAnalysis.shuffleExportFrame(spark, sf)
      .write.option("maxRecordsPerFile", 7)
      .mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files > 16, s"expected multi-file shards, got $files files")
    val readBack = spark.read.parquet(out)
      .select(col("shard"), col("doc_id"),
        col("_metadata.file_path").as("fp"),
        col("_metadata.row_index").as("ri"))
      .withColumn("pos", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("fp", "ri")).cast("long"))
      .select("shard", "pos", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val witness = SparkEntry.queries("dataset_shuffle_shards")(spark, sf)
      .collect().map(r => (r.getAs[String]("shard"), r.getAs[Long]("pos"),
        r.getAs[Long]("doc_id"))).toSeq
    assert(readBack === witness,
      "multi-file shards must still read back in the witnessed order")
  }

  test("bpe_pair_counts: top pair count matches an independent driver-side recount") {
    val out = SparkEntry.queries("bpe_pair_counts")(spark, sf).collect()
    assert(out.length === 20)
    val counts = out.map(_.getAs[Long]("cnt"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "counts must be non-increasing")
    out.foreach(r => assert(r.getAs[String]("pair").length === 2))
    // independent recount of the TOP pair: pure-Scala adjacent-pair scan
    // over the same tokenization, no Spark expressions shared with the
    // implementation
    val top = out.head
    val expected = Tables.documents(spark, sf).select("text").collect()
      .iterator.map(_.getString(0))
      .flatMap(_.toLowerCase.split("[^\\p{L}\\p{N}]+"))
      .filter(_.length > 1)
      .flatMap(w => w.sliding(2))
      .count(_ == top.getAs[String]("pair"))
    assert(top.getAs[Long]("cnt") === expected.toLong,
      s"top pair ${top.getAs[String]("pair")} recount mismatch")
  }

  test("bpe_learn_merges: five deterministic merges, non-increasing counts, step 1 is the corpus-top pair") {
    val out = SparkEntry.queries("bpe_learn_merges")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("step")).toSeq === (1L to 5L))
    // merging the argmax pair can only shrink other pairs' counts, and
    // every pair the new symbol creates is bounded by the merged count —
    // so the selected count sequence never increases
    val cnts = out.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
      s"selected merge counts must be non-increasing: ${cnts.toSeq}")
    // cross-row consistency: iteration 1 of the learn loop IS the
    // bpe_pair_counts statistic — its argmax must be that row's top pair
    // (both count corpus-weighted occurrences; dedup+freq is the same sum)
    val top = SparkEntry.queries("bpe_pair_counts")(spark, sf).head()
    val first = out.head
    assert(first.getAs[String]("left_sym") +
      first.getAs[String]("right_sym") === top.getAs[String]("pair"),
      "step 1 must merge the corpus-top adjacent pair")
    assert(first.getAs[Long]("cnt") === top.getAs[Long]("cnt"))
    // replay determinism
    val again = SparkEntry.queries("bpe_learn_merges")(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("bpeTrainWords matches an in-memory reference BPE on random vocabularies") {
    // reference implementation: Vector[String] segmentations, greedy
    // left-to-right merge — written independently of the marker-string
    // replace the engine uses, so a semantics bug in either surfaces
    def mergeLR(syms: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]; var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += syms(i); i += 1 }
      }
      b.result()
    }
    def refBpe(words: Map[String, Long],
        steps: Int): Seq[(String, String, Long)] = {
      var segs: Map[Vector[String], Long] =
        words.map { case (w, f) => w.map(_.toString).toVector -> f }
      (1 to steps).map { _ =>
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        for ((syms, f) <- segs; i <- 0 until syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
        }
        val ((l, r), c) = counts.toSeq
          .minBy { case ((a, b), n) => (-n, a + "|" + b) }
        segs = segs.map { case (syms, f) => mergeLR(syms, l, r) -> f }
        (l, r, c)
      }
    }
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(1234 + seed)
      val alphabet = "abcde"
      val vocab = (0 until 30).map { _ =>
        (2 + rnd.nextInt(7), 1L + rnd.nextInt(9))
      }.map { case (len, f) =>
        ((0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length)))
          .mkString, f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val words = vocab.toSeq.toDF("w", "freq")
      val got = graft.ops.TextAnalysis.bpeTrainWords(words, steps = 5)._1
        .map { case (_, l, r, c) => (l, r, c) }
      val want = refBpe(vocab, steps = 5)
      assert(got === want,
        s"seed $seed: distributed merges $got != reference $want " +
          s"over vocab $vocab")
    }
  }

  test("byte-level bpeTrainByteWords matches the in-memory reference over mixed-case/punctuated/multi-byte vocabularies") {
    // the same independently-written reference loop, generalized to an
    // arbitrary base segmentation — here UTF-8 bytes as hex pairs
    def mergeLR(syms: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]; var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += syms(i); i += 1 }
      }
      b.result()
    }
    def refBpe(segs0: Map[Vector[String], Long],
        steps: Int): Seq[(String, String, Long)] = {
      var segs = segs0
      val out = Seq.newBuilder[(String, String, Long)]
      var k = 0
      var done = false
      while (k < steps && !done) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        for ((syms, f) <- segs; i <- 0 until syms.length - 1) {
          val key = (syms(i), syms(i + 1))
          counts(key) = counts.getOrElse(key, 0L) + f
        }
        if (counts.isEmpty) done = true
        else {
          val ((l, r), c) = counts.toSeq
            .minBy { case ((a, b), n) => (-n, a + "|" + b) }
          segs = segs.groupMapReduce {
            case (syms, _) => mergeLR(syms, l, r) }(_._2)(_ + _)
          out += ((l, r, c)); k += 1
        }
      }
      out.result()
    }
    def hexSyms(w: String): Vector[String] =
      w.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").toVector
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(4321 + seed)
      // mixed case, punctuation, a leading space, and a multi-byte char
      // (é = C3 A9) — exactly what the char-level rows never see
      val alphabet = "aAbB.,é '!"
      val vocab = (0 until 30).map { _ =>
        (2 + rnd.nextInt(6), 1L + rnd.nextInt(9))
      }.map { case (len, f) =>
        ((0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length)))
          .mkString, f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        .filter { case (w, _) => w.getBytes("UTF-8").length > 1 }
      val words = vocab.toSeq.toDF("w", "freq")
      val got = graft.ops.TextAnalysis.bpeTrainByteWords(words, steps = 5)._1
        .map { case (_, l, r, c) => (l, r, c) }
      val want = refBpe(
        vocab.map { case (w, f) => hexSyms(w) -> f }, steps = 5)
      assert(got === want,
        s"seed $seed: byte merges $got != reference $want over $vocab")
    }
  }

  test("bpe_exhausted_merges: training stops at three of five requested steps; the merges are the planted chain") {
    val out = SparkEntry.queries("bpe_exhausted_merges")(spark, sf).collect()
    assert(out.map(r => (r.getAs[Long]("step"), r.getAs[String]("left_sym"),
      r.getAs[String]("right_sym"), r.getAs[Long]("cnt"))).toSeq ===
      Seq((1L, "a", "b", 4L), (2L, "ab", "c", 2L), (3L, "abc", "d", 1L)),
      "the {ab×2, abc, abcd} vocabulary merges fully in exactly 3 steps")
  }

  test("bpe_byte_learn_merges: pretokens preserve case and leading space; merges are hex-pair symbols") {
    val out = SparkEntry.queries("bpe_byte_learn_merges")(spark, sf).collect()
    assert(out.length === 5)
    val hexRe = "([0-9A-F]{2})+".r
    out.foreach { r =>
      assert(hexRe.matches(r.getAs[String]("left_sym")),
        s"non-hex symbol ${r.getAs[String]("left_sym")}")
      assert(hexRe.matches(r.getAs[String]("right_sym")))
    }
    val cnts = out.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }

  test("LocalBpe (the in-process production trainer) is merge-identical to the distributed loop; the vocab row extends the distributed row") {
    import graft.text.LocalBpe
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(9876 + seed)
      val alphabet = "aAb.é '"
      val vocab = (0 until 25).map { _ =>
        (2 + rnd.nextInt(6), 1L + rnd.nextInt(9))
      }.map { case (len, f) =>
        ((0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length)))
          .mkString, f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        .filter { case (w, _) => w.getBytes("UTF-8").length > 1 }
      val dist = graft.ops.TextAnalysis
        .bpeTrainByteWords(vocab.toSeq.toDF("w", "freq"), steps = 5)._1
      val local = LocalBpe.trainByteWords(vocab.toSeq, steps = 5)
      assert(local === dist,
        s"seed $seed: local $local != distributed $dist over $vocab")
    }
    // cross-row: the in-process row's first 5 merges ARE the distributed
    // row's 5 merges (same corpus, same semantics, deeper run)
    val vocabRow = SparkEntry.queries("bpe_byte_vocab_train")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val distRow = SparkEntry.queries("bpe_byte_learn_merges")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(vocabRow.length === 8)
    assert(vocabRow.take(5) === distRow,
      "the production trainer must extend, not diverge from, the " +
        "distributed loop")
  }

  test("LocalBpe at production depth: ~1k merges over a synthetic vocabulary, wall-clock-bounded, artifact round-trips exactly") {
    import graft.text.LocalBpe
    // a vocabulary deep enough that 1,000 merges never exhaust:
    // 2,000 distinct 16–24-char words over a 12-letter alphabet with
    // skewed frequencies (the Zipf-ish shape real pre-token counts have)
    val rnd = new scala.util.Random(424242)
    val alphabet = "abcdefghijkl"
    val vocab = (0 until 2000).map { i =>
      val len = 16 + rnd.nextInt(9)
      ((0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString, 1L + (10000L / (i + 1)))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap.toSeq
    val steps = 1000
    val t0 = System.nanoTime()
    val merges = LocalBpe.trainWords(vocab, steps)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.length === steps,
      s"the vocabulary must sustain $steps merges, got ${merges.length}")
    // the O(vocab)-per-step claim, pinned as a generous wall-clock
    // bound: 1,000 steps over a 2,000-word vocab is seconds in-process
    // (the reason the loop does NOT run as 1,000 cluster jobs); a
    // per-step cost that silently grew past O(vocab · len) blows this
    assert(secs < 120.0,
      f"1k in-process merges took $secs%.1f s — the per-step cost " +
        "regressed past O(vocab)")
    // merge steps are dense and deterministic
    assert(merges.map(_._1) === (1L to steps.toLong))
    assert(LocalBpe.trainWords(vocab, steps) === merges,
      "training must be deterministic at depth")
    // the persisted artifact format (the bpe_art_* merge-table schema)
    // round-trips the full depth bit-exactly — a tokenizer trained at
    // production depth is shipped THROUGH this parquet shape
    val spark2 = spark
    import spark2.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("bpe_depth").toString + "/merges"
    merges.toDF("step", "left_sym", "right_sym", "cnt")
      .repartition(1).write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path).orderBy("step").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[Long]("cnt"))).toSeq
    assert(back === merges,
      "the artifact parquet must round-trip 1k merges exactly")
  }

  test("bpe_byte_encode_unseen: symbols reassemble the exact pretoken bytes; multi-pair symbols are learned merges") {
    val out = SparkEntry.queries("bpe_byte_encode_unseen")(spark, sf)
      .collect()
    val learned = SparkEntry.queries("bpe_byte_learn_merges")(spark, sf)
      .collect()
      .map(r => r.getAs[String]("left_sym") + r.getAs[String]("right_sym"))
      .toSet
    out.map(_.getAs[String]("sym")).foreach { s =>
      assert(s.matches("([0-9A-F]{2})+"), s"non-hex symbol $s")
      if (s.length > 2)
        assert(learned.contains(s),
          s"symbol $s in the encoding is not a learned merge")
    }
    // lossless: concatenating each pretoken's symbols in order must
    // reproduce the pretoken's exact UTF-8 bytes (é = C3 A9 included —
    // the byte fallback), under the same pretokenizer run in-test
    val text = "Cafés don't RE-train byte-pairs, 42 times!"
    val m = java.util.regex.Pattern
      .compile(graft.ops.TextAnalysis.BytePretokenPattern).matcher(text)
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) toks += m.group()
    val byTok = out.groupBy(_.getAs[Int]("tok_pos"))
      .view.mapValues(_.sortBy(_.getAs[Int]("sym_pos"))
        .map(_.getAs[String]("sym")).mkString).toMap
    assert(byTok.size === toks.size, s"token count ${byTok.size} != ${toks.size}")
    toks.zipWithIndex.foreach { case (w, i) =>
      val hex = w.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString
      assert(byTok(i) === hex,
        s"token $i '$w': symbols ${byTok(i)} != bytes $hex")
    }
  }

  test("bpe_encode_tokens: every multichar symbol is a learned merge; counts ordered") {
    val merges = SparkEntry.queries("bpe_learn_merges")(spark, sf).collect()
    val learned = merges.map(r =>
      r.getAs[String]("left_sym") + r.getAs[String]("right_sym")).toSet
    val out = SparkEntry.queries("bpe_encode_tokens")(spark, sf).collect()
    assert(out.length === 20)
    val cnts = out.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    // the encoder may emit ONLY the base alphabet plus learned merges —
    // any other multichar symbol is a segmentation/replace defect
    out.map(_.getAs[String]("sym")).filter(_.length > 1).foreach(s =>
      assert(learned.contains(s),
        s"symbol '$s' in the encoding is not a learned merge"))
  }

  test("text_normalize: NFC composes the planted accent and angstrom; controls strip; ASCII corpus is a no-op") {
    val out = SparkEntry.queries("text_normalize")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // the decomposed accent composes: 11 raw code points -> 9 clean
    // ("Cafe"+combining+2 spaces+"menu" -> "Café menu")
    val a = out(9000001L)
    assert(a.getAs[Boolean]("nfc_changed"))
    assert(a.getAs[Long]("n_chars_raw") === 11L)
    assert(a.getAs[Long]("n_chars_clean") === 9L)
    assert(a.getAs[String]("clean_prefix") === "Caf\u00E9 menu")
    // ANGSTROM SIGN folds to Å: changed, same length
    val b = out(9000002L)
    assert(b.getAs[Boolean]("nfc_changed"))
    assert(b.getAs[String]("clean_prefix") === "unit \u00C5 angstrom")
    // controls strip + runs collapse; NFC itself is a no-op here
    val c = out(9000003L)
    assert(!c.getAs[Boolean]("nfc_changed"))
    assert(c.getAs[String]("clean_prefix") === "badtext here")
    // the synthetic corpus is ASCII: NFC must change nothing
    assert(out.values.count(_.getAs[Boolean]("nfc_changed")) === 2,
      "only the two planted non-NFC docs may change under NFC")
  }

  test("NfcNormalize evaluates identically interpreted and codegen'd, and keeps the fast path") {
    val df = Seq("Cafe\u0301", "plain ascii", "unit \u212B", null)
      .toDF("t")
    val expr = org.apache.spark.sql.graft.NfcNormalize(col("t"))
    val out = df.select(expr.as("n")).collect().map(_.getString(0))
    assert(out(0) === "Caf\u00E9")
    assert(out(1) === "plain ascii")
    assert(out(2) === "unit \u00C5")
    assert(out(3) === null)
    // the expression must run INSIDE whole-stage codegen (it has a real
    // doGenCode \u2014 a fallback would interpret per row on the corpus's
    // widest column). A literal frame constant-folds to a
    // LocalTableScan, so pin the plan over a range source, and check
    // the generated path agrees with the interpreted values above.
    val ranged = spark.range(4).select(
      concat(lit("x"), col("id").cast("string")).as("t"))
    val rangedOut = ranged.select(
      org.apache.spark.sql.graft.NfcNormalize(col("t")).as("n"))
    val plan = rangedOut.queryExecution.executedPlan
    val codegenSpans = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.exists(_.toString.contains("nfc_normalize")),
      s"nfc_normalize must plan inside a WholeStageCodegen span:\n$plan")
    assert(rangedOut.collect().map(_.getString(0)).sorted ===
      Array("x0", "x1", "x2", "x3"))
  }

  test("NfcNormalize.isAscii: byte-exact over stride boundaries, empty strings, and high bytes in every lane") {
    import org.apache.spark.unsafe.types.UTF8String
    def ascii(s: String) = org.apache.spark.sql.graft.NfcNormalize
      .isAscii(UTF8String.fromString(s))
    assert(ascii(""))
    // lengths straddling the 8-byte stride + tail loop
    (1 to 20).foreach(n => assert(ascii("a" * n), s"len $n"))
    // a non-ASCII byte in EVERY position of a 17-byte string must trip
    // whichever lane (stride word or tail byte) covers it
    (0 until 17).foreach { i =>
      val s = "a" * i + "é" + "a" * (16 - i)
      assert(!ascii(s), s"high byte at $i missed")
    }
    // DEL (0x7F) is still ASCII; 0x80 is the first non-ASCII code point
    assert(ascii("\u007F"))
    assert(!ascii("\u0080"))
  }

  test("decontaminate_paraphrase: margins, measured multiprobe recall, cap guard, and route equality — all pinned in absolute terms") {
    import graft.ops.{TextAnalysis => TA}
    val dim = 256
    def emb(t: String) = graft.vector.Embedding.hashingEmbed(t, dim)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i); i += 1 }
      acc
    }
    val lsh = new graft.vector.IndexBuilder.RandomHyperplaneLsh(dim, 6, 42L)
    val pairs = (0 until 20).map { i =>
      val full = emb(TA.paraphraseTokens(i).mkString(" "))
      val pref = emb(TA.paraphraseTokens(i).take(54).mkString(" "))
      (cos(full, pref), Integer.bitCount(
        lsh.signature(full.toSeq) ^ lsh.signature(pref.toSeq)))
    }
    // the pairs are genuinely NON-identical (below 0.999's regime) but
    // clear the paraphrase threshold with margin — the construction's
    // whole point, pinned so a drifting embedder fails here, not as a
    // silent oracle mismatch
    assert(pairs.forall { case (c, _) =>
      c >= TA.ParaphraseThreshold + 0.03 && c <= 0.99 },
      s"pair cosines out of the paraphrase band: ${pairs.map(_._1)}")
    // the MEASURED radius covers every pair, and at least one pair
    // needs radius >= 1 — multiprobe recall is load-bearing, not
    // decorative (the 0.999 row's structural radius-0 argument does
    // not apply here)
    assert(pairs.forall(_._2 <= TA.ParaphraseRadius),
      s"a pair exceeds the measured radius: ${pairs.map(_._2)}")
    assert(pairs.exists(_._2 >= 1),
      "every pair hashed identically — the construction no longer " +
        "exercises the paraphrase (recall < 1) regime")
    // no false positive can reach the threshold: cross-pairs and the
    // natural corpus sit far below (measured 0.21 / 0.29 at all SFs)
    val benchVecs = (0 until 20).map(i =>
      emb(TA.paraphraseTokens(i).take(54).mkString(" ")))
    val fullVecs = (0 until 20).map(i =>
      emb(TA.paraphraseTokens(i).mkString(" ")))
    val crossMax = (for {
      i <- 0 until 20; j <- 0 until 20 if i != j
    } yield cos(fullVecs(i), benchVecs(j))).max
    assert(crossMax < TA.ParaphraseThreshold - 0.3,
      s"cross-pair scores creeping toward the threshold: $crossMax")
    val spark2 = spark
    import spark2.implicits._
    val embUdf = udf((t: String) => emb(t))
    val naturalMax = Tables.documents(spark, sf)
      .select(embUdf(col("text")).as("dvec"))
      .crossJoin(broadcast(benchVecs.zipWithIndex
        .map { case (v, i) => (i + 1L, v.toSeq) }.toDF("bench_id", "bvec")))
      .select(graft.vector.VectorFunctions
        .cosineUnit(col("dvec"), col("bvec")).as("score"))
      .agg(max("score")).head().getDouble(0)
    assert(naturalMax < TA.ParaphraseThreshold - 0.3,
      s"a natural doc scores near the threshold: $naturalMax")
    // route equality on the planted construction: broadcast == ANN
    val broadcastRows = SparkEntry.queries("decontaminate_paraphrase")(
      spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val annRows = SparkEntry.queries("decontaminate_paraphrase_ann")(
      spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(broadcastRows === annRows, "the two routes diverged")
    assert(broadcastRows ===
      (0 until 20).map(i => (750000L + i, i + 1L)),
      s"the flagged set must be exactly the planted pairs: $broadcastRows")
    // radius 0 genuinely MISSES pairs here (the regime's signature):
    // the spec pins the loss so a construction drift that collapses
    // all pairs into shared buckets fails loudly
    val radius0 = TA.decontaminateParaphraseAnnWith(spark, sf,
      k = 10, radius = 0).collect()
    assert(radius0.length < 20,
      s"radius 0 found all pairs — multiprobe is no longer load-bearing")
    assert(radius0.length >= 8,
      s"radius 0 lost nearly everything — construction drifted: ${radius0.length}")
    // the top-k cap guard REFUSES loudly instead of silently dropping
    // above-threshold pairs (r19 ADVICE): k = 1 makes the cap bind iff
    // any bucket holds a pair plus anything else above threshold — and
    // k = 0-style truncation is exactly what the guard exists for; at
    // k = 1 each item returns at most its single pair, so counts == k
    // and the guard must throw
    assertThrows[IllegalArgumentException] {
      TA.decontaminateParaphraseAnnWith(spark, sf, k = 1,
        radius = TA.ParaphraseRadius).collect()
    }
  }

  test("dataset_shuffle_shards: a seeded permutation — exhaustive, contiguous ranks, seed-sensitive, replayable") {
    val out = SparkEntry.queries("dataset_shuffle_shards")(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    assert(out.count() === docs.count(), "every doc gets exactly one slot")
    assert(out.select("doc_id").distinct().count() === docs.count())
    // ranks are 1..n_shard contiguous per shard
    val byShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    byShard.foreach { r =>
      assert(r.getAs[Long]("lo") === 1L &&
        r.getAs[Long]("hi") === r.getAs[Long]("n"),
        s"shard ${r.getAs[String]("shard")} ranks must be contiguous 1..n")
    }
    // replayable: the same seed is byte-identical across runs
    val replay = SparkEntry.queries("dataset_shuffle_shards")(spark, sf)
    assert(out.exceptAll(replay).isEmpty, "same seed must replay identically")
    // a new seed is a new epoch's order: some doc changes slot
    val epoch2 = graft.ops.TextAnalysis
      .datasetShuffleShards(spark, sf, seed = "epoch:2")
    assert(out.exceptAll(epoch2).count() > 0L,
      "a different seed must produce a different permutation")
    out.unpersist()
  }
}
