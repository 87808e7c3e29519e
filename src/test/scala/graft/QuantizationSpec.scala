package graft

import org.apache.spark.sql.functions._
import graft.vector.Quantization

class QuantizationSpec extends SparkSpec {

  private def randVec(seed: Int, dim: Int = 64): Array[Float] = {
    val r = new scala.util.Random(seed)
    val v = Array.fill(dim)(r.nextGaussian().toFloat)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  test("quantize round-trip error is bounded by scale/2 per component") {
    (0 until 50).foreach { s =>
      val v = randVec(s)
      val (scale, codes) = Quantization.quantize(v.toSeq)
      v.zip(codes).foreach { case (x, c) =>
        assert(math.abs(x - c * scale) <= scale / 2 + 1e-7)
      }
    }
  }

  test("quantized dot approximates the exact dot within the error envelope") {
    (0 until 50).foreach { s =>
      val a = randVec(s); val b = randVec(s + 1000)
      val (sa, ca) = Quantization.quantize(a.toSeq)
      val (sb, cb) = Quantization.quantize(b.toSeq)
      val exact = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val approx = Quantization.dotQ(sa, ca, sb, cb)
      // per-component error <= scale/2 each side; envelope is loose but
      // catches sign/scale bugs instantly
      val bound = 64 * (sa / 2.0 + sb / 2.0) + 0.01
      assert(math.abs(exact - approx) <= bound,
        s"exact $exact vs approx $approx (bound $bound)")
    }
  }

  test("zero and empty vectors quantize safely") {
    val (se, ce) = Quantization.quantize(Seq.empty)
    assert(se === 0f && ce.isEmpty)
    val (s0, c0) = Quantization.quantize(Seq(0f, 0f, 0f))
    assert(s0 === 0f && c0.forall(_ === 0))
    assert(Quantization.dotQ(0f, c0, 0f, c0) === 0.0)
  }

  test("quantized coarse + exact rescore reproduces the exact top-10 on test data") {
    val got = SparkEntry.queries("quantized_knn_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = SparkEntry.queries("knn_exact_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === exact)
  }

  test("pq: codebooks have the declared shape and encoding is deterministic") {
    import graft.vector.ProductQuantization
    val e = Tables.embeddings(spark, sf)
    val books = ProductQuantization.fitCodebooks(e, "embedding", m = 16, ksub = 64, seed = 42L)
    assert(books.length === 16)
    books.foreach { cents =>
      assert(cents.length <= 64 && cents.nonEmpty)
      cents.foreach(c => assert(c.length === 4)) // 64 / 16 subdims
    }
    val v = e.filter(org.apache.spark.sql.functions.col("vec_id") === 1L)
      .select("embedding").head().getSeq[Float](0)
    val c1 = ProductQuantization.encode(books, v)
    val c2 = ProductQuantization.encode(books, v)
    assert(c1.toSeq === c2.toSeq && c1.length === 16)
  }

  test("pq: ADC via the LUT equals the direct query·centroid dot per code") {
    import graft.vector.ProductQuantization
    val e = Tables.embeddings(spark, sf)
    val books = ProductQuantization.fitCodebooks(e, "embedding", m = 16, ksub = 64, seed = 42L)
    val v = e.filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    val lut = ProductQuantization.adcTable(books, v)
    val code = ProductQuantization.encode(books, v)
    val viaLut = code.zipWithIndex.map { case (c, s) => lut(s)(c & 0xff) }.sum
    val direct = code.zipWithIndex.map { case (c, s) =>
      val cent = books(s)(c & 0xff)
      cent.indices.map(i => v(s * cent.length + i) * cent(i)).sum
    }.sum
    assert(math.abs(viaLut - direct) < 1e-12, s"LUT $viaLut vs direct $direct")
  }

  test("AdcScore expression matches the direct LUT sum and stays in codegen") {
    import graft.vector.ProductQuantization
    import org.apache.spark.sql.functions.col
    val e = Tables.embeddings(spark, sf)
    val books = ProductQuantization.fitCodebooks(e, "embedding", m = 16, ksub = 64, seed = 42L)
    val v = e.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    val lut = ProductQuantization.adcTable(books, v)
    val scored = ProductQuantization.adcScores(
      ProductQuantization.withPqCodes(e, "embedding", books), lut)
    // expression result == driver-side recomputation for a sample of rows
    val rows = scored.select(col("vec_id"), col("pq_codes"), col("adc_score"))
      .orderBy("vec_id").limit(20).collect()
    rows.foreach { r =>
      val codes = r.getAs[Array[Byte]](1)
      val direct = codes.zipWithIndex.map { case (c, s) => lut(s)(c & 0xff) }.sum
      assert(math.abs(r.getDouble(2) - direct) < 1e-12,
        s"vec ${r.getLong(0)}: expr ${r.getDouble(2)} vs direct $direct")
    }
    // the scoring projection runs inside a WholeStageCodegen stage
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("adc_score"), s"expression missing from plan:\n$plan")
    assert(!plan.contains("BatchEvalPython") && plan.contains("*("),
      s"ADC scoring fell out of codegen:\n$plan")
  }

  test("pq ADC coarse + exact rescore reproduces the exact top-10 on test data") {
    val got = SparkEntry.queries("pq_knn_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = SparkEntry.queries("knn_exact_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === exact)
  }

  test("ivf-pq composed: raw-corpus recall matches the plain IVF path's") {
    import org.apache.spark.sql.functions.col
    val e = Tables.embeddings(spark, sf)
    val qv = e.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    val exact = SparkEntry.queries("knn_exact_topk")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    // PQ's overscan margin covers quantization error, so composed recall
    // must equal the IVF pruning's own recall (PQ adds no loss here)
    val ivf = graft.vector.IndexBuilder.ivfTopK(e, "embedding", "vec_id",
        qv, k = 10, numClusters = 16, nProbe = 6, seed = 42L)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val composed = graft.vector.ProductQuantization.ivfPqTopK(e, "embedding",
        "vec_id", qv, k = 10, numClusters = 16, nProbe = 6, seed = 42L)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert((composed & exact).size >= (ivf & exact).size - 1,
      s"PQ coarse pass lost recall beyond its overscan margin: " +
        s"ivf=${(ivf & exact).size} composed=${(composed & exact).size}")
    // the self-match always survives (its cluster is probed, its code is
    // the query's own encoding, rescore is unbeatable)
    assert(composed.contains(0L))
  }

  test("ivf-pq persisted: sidecars round-trip and serving equals the in-memory path") {
    import org.apache.spark.sql.functions.col
    import graft.vector.{IndexBuilder, ProductQuantization => PQ}
    val e = Tables.embeddings(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("graft_pqidx_spec").toString + "/idx"
    PQ.buildIvfPqIndex(e, "embedding", numClusters = 16, seed = 42L, path)
    // trained state round-trips exactly (Double.toString is lossless)
    val books = PQ.fitCodebooks(e, "embedding", m = 16, ksub = 64, seed = 42L)
    val loaded = PQ.loadPqCodebooks(path)
    assert(loaded.length === books.length)
    assert(loaded.flatten.flatten.toSeq === books.flatten.flatten.toSeq)
    // serving from stored codes returns what the fit-per-call path returns
    val qv = e.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    val served = PQ.ivfPqIndexTopK(spark, path, "embedding", "vec_id", qv,
        k = 10, nProbe = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inMem = PQ.ivfPqTopK(e, "embedding", "vec_id", qv,
        k = 10, numClusters = 16, nProbe = 6, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served === inMem)
    // add-after-train: appended copies of vec 0 land queryable, no retrain
    val copies = spark.range(200000L, 200003L).toDF("vec_id")
      .crossJoin(e.filter(col("vec_id") === 0L).select(col("embedding")))
      .select(col("vec_id"), col("embedding"))
    PQ.appendToIvfPqIndex(copies, "embedding", path)
    val after = PQ.ivfPqIndexTopK(spark, path, "embedding", "vec_id", qv,
        k = 4, nProbe = 6)
      .collect().map(_.getLong(0)).toSet
    assert(after === Set(0L, 200000L, 200001L, 200002L),
      s"appended copies must dominate the self-query top-4, got $after")
  }

  test("pq/sq8: an empty candidate set returns an empty result, not an NPE") {
    import org.apache.spark.sql.functions.col
    import graft.vector.{ProductQuantization => PQ}
    val e = Tables.embeddings(spark, sf)
    val qv = e.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    val books = PQ.fitCodebooks(e, "embedding", m = 16, ksub = 64, seed = 42L)
    val empty = e.filter(col("vec_id") < 0) // fully-pruned scan analog
    assert(PQ.pqSearchEncoded(PQ.withPqCodes(empty, "embedding", books),
      "embedding", "vec_id", books, qv, k = 10, overscan = 16).count() === 0)
    assert(Quantization.quantizedKnn(empty, "embedding", "vec_id", qv,
      k = 10).count() === 0)
  }
}
