package graft

import graft.vector.{Embedding, VectorFunctions => V}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EmbeddingSpec extends AnyFunSuite {

  test("embedding is unit-norm for non-empty text") {
    val v = Embedding.hashingEmbed("the quick brown fox", 128)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(v.length === 128)
  }

  test("embedding is deterministic and input-sensitive") {
    val a1 = Embedding.hashingEmbed("spark catalyst optimizer", 256)
    val a2 = Embedding.hashingEmbed("spark catalyst optimizer", 256)
    val b = Embedding.hashingEmbed("completely different words here", 256)
    assert(a1.toSeq === a2.toSeq)
    assert(a1.toSeq !== b.toSeq)
  }

  test("null/empty text embeds to the zero vector") {
    assert(Embedding.hashingEmbed(null, 64).forall(_ == 0f))
    assert(Embedding.hashingEmbed("", 64).forall(_ == 0f))
    assert(Embedding.hashingEmbed("  !!! ", 64).forall(_ == 0f))
  }

  test("similar texts score higher than dissimilar ones") {
    val q = Embedding.hashingEmbed("hash join shuffle partition", 512)
    val near = Embedding.hashingEmbed("the hash join shuffle partition plan", 512)
    val far = Embedding.hashingEmbed("violets are blue roses are red", 512)
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(dot(q, near) > dot(q, far))
  }

  test("tokenizer lowercases and splits on non-alphanumerics") {
    assert(Embedding.tokenize("Hello, World! 123").toSeq === Seq("hello", "world", "123"))
    assert(Embedding.tokenize(null).isEmpty)
  }
}

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot/cosine columns match a driver-side computation") {
    val df = Seq(
      (Array(1.0f, 0f, 0f), Array(0.6f, 0.8f, 0f)),
      (Array(0f, 1.0f, 0f), Array(0.6f, 0.8f, 0f))).toDF("a", "b")
    val got = df.select(V.dot($"a", $"b").as("d"), V.cosine($"a", $"b").as("c"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(math.abs(got(0)._1 - 0.6) < 1e-6 && math.abs(got(0)._2 - 0.6) < 1e-6)
    assert(math.abs(got(1)._1 - 0.8) < 1e-6 && math.abs(got(1)._2 - 0.8) < 1e-6)
  }

  test("l2Normalize produces unit vectors and zero stays zero") {
    val df = Seq(Tuple1(Array(3.0f, 4.0f)), Tuple1(Array(0f, 0f))).toDF("a")
    val norms = df.select(sqrt(V.normSq(V.l2Normalize($"a"))).as("n"))
      .collect().map(_.getDouble(0))
    assert(math.abs(norms(0) - 1.0) < 1e-9)
    assert(norms(1) === 0.0)
  }

  test("native DotProduct expression is bit-identical to the HOF formulation") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 0L).select(col("embedding").as("qe"))
    val both = e.crossJoin(broadcast(q))
      .select(V.dot($"embedding", $"qe").as("native"), V.dotHof($"embedding", $"qe").as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) === r.getDouble(1),
      s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}"))
  }

  test("native DotProduct evaluates null-safely and in codegen") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f))),
      (Some(Array(1.0f)), None)).toDF("a", "b")
    val rows = df.select(V.dot($"a", $"b").as("d")).collect()
    assert(rows(0).getDouble(0) === 11.0)
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(0))
    val plan = Tables.embeddings(spark, sf)
      .select(V.dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_dot"),
      s"expected the projection inside a codegen stage:\n$plan")
  }
}

class VectorSearchSpec extends SparkSpec {

  test("knn_exact_topk: self is rank 1 with score 1.0") {
    val rows = SparkEntry.queries("knn_exact_topk")(spark, sf).collect()
    assert(rows.length === 10)
    assert(rows.head.getAs[Long]("vec_id") === 0L)
    assert(math.abs(rows.head.getAs[Double]("score") - 1.0) < 1e-4)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted.reverse), "descending by score")
  }

  test("knn_batch_topk: 10 queries x 5 neighbors, no self-matches") {
    val df = SparkEntry.queries("knn_batch_topk")(spark, sf).cache()
    assert(df.count() === 50)
    assert(df.filter(col("vec_id") === col("query_id")).count() === 0)
    assert(df.groupBy("query_id").count().filter(col("count") =!= 5).count() === 0)
  }

  test("knn_relevance_threshold keeps only relevance >= 0.75 (self qualifies)") {
    val rows = SparkEntry.queries("knn_relevance_threshold")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("relevance") >= 0.75))
    assert(rows.exists(_.getAs[Long]("vec_id") == 0L))
  }

  test("embed_documents_knn: self-query top-10 is doc 0 then the planted copies") {
    val rows = SparkEntry.queries("embed_documents_knn")(spark, sf).collect()
      .map(r => r.getAs[Int]("rank") -> r.getAs[Long]("top_doc_id")).sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1 to 10))
    assert(rows.map(_._2).toSeq === (0L +: (100000L to 100008L)))
  }

  test("embedding_drift: one worst dimension per label, integer metric well-formed") {
    val rows = SparkEntry.queries("embedding_drift")(spark, sf).collect()
    val labels = Tables.embeddings(spark, sf)
      .select("label").distinct().count()
    assert(rows.length === labels)
    rows.foreach { r =>
      assert(r.getAs[Long]("j") >= 0L && r.getAs[Long]("j") < 64L)
      // snapshots genuinely differ (A is half of B), so the worst
      // dimension's cross-multiplied shift is strictly positive
      assert(r.getAs[Long]("drift_x") > 0L)
    }
  }

  test("mmr_rerank: greedy picks are distinct, rank-1 is the pure-relevance max, scores non-increasing") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("mmr_rerank")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("rank")).toSeq === (1L to 5L))
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length === 5)
    // each greedy step sees more penalties over a smaller pool, so the
    // selected MMR sequence can never increase
    val scores = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("mmr_e6"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      s"MMR picks must be non-increasing: ${scores.toSeq}")
  }

  test("embedding_projection: JL map preserves relative distances on average") {
    import org.apache.spark.sql.functions.col
    // long form (vec_id, j, proj_e6) — reassemble per-vector arrays
    val proj = SparkEntry.queries("embedding_projection")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("j"),
        r.getAs[Long]("proj_e6") / 1e6))
      .groupBy(_._1)
      .map { case (id, rows) => id -> rows.sortBy(_._2).map(_._3) }
      .toMap
    val orig = Tables.embeddings(spark, sf).filter(col("vec_id") < 200)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    assert(proj.keySet === orig.keySet)
    assert(proj.values.forall(_.length === 16))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // JL with k=16: individual pair error can be large, the MEAN over many
    // pairs concentrates. Pairs (i, i+1): mean |cos_proj - cos_orig| small.
    val ids = proj.keys.toSeq.sorted
    val errs = ids.sliding(2).collect { case Seq(a, b) =>
      math.abs(cos(proj(a), proj(b)) - cos(orig(a), orig(b)))
    }.toSeq
    val meanErr = errs.sum / errs.size
    // k=16 JL: per-pair |Δcos| has mean ≈ √(2/π)/√k ≈ 0.20 — bound well
    // above the expectation but far below what a broken map produces
    assert(meanErr < 0.3, f"mean cosine distortion $meanErr%.3f too large for k=16")
  }

  test("planted self-knn: every planted query's top-1 is its original doc") {
    val rows = SparkEntry.queries("embed_selfknn_planted")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) === r.getLong(1) + 100000,
        s"query ${r.getLong(0)} retrieved ${r.getLong(1)}")
    }
  }
}
