package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns (the FAISS SQ8 shape):
  * per-vector symmetric quantization `code_i = round(v_i / scale)` with
  * `scale = maxAbs / 127`, stored as a 4-byte scale + a `binary` code
  * column — 4× smaller than float32 at rest and in shuffle.
  *
  * Query shape: coarse top-(k·overscan) by QUANTIZED dot product (cheap,
  * reads only the codes), then EXACT rescore of the survivors on the
  * float column, then top-k. Quantization error only costs recall if a
  * true neighbor falls outside the overscan margin; the planted-pair
  * oracle and the recall spec pin both ends.
  *
  * The quantized dot is a UDF over two byte arrays: there is no built-in
  * over binary, and the alternative — decoding codes back to
  * array<float> and reusing graft_dot — rematerializes the 4× data the
  * codes exist to avoid.
  */
object Quantization {

  /** Quantize one vector: (scale, codes). Zero vector → scale 0, zero codes. */
  def quantize(v: Seq[Float]): (Float, Array[Byte]) = {
    if (v == null || v.isEmpty) return (0f, Array.empty)
    var maxAbs = 0f
    v.foreach(x => if (math.abs(x) > maxAbs) maxAbs = math.abs(x))
    if (maxAbs == 0f) return (0f, new Array[Byte](v.length))
    val scale = maxAbs / 127f
    val codes = new Array[Byte](v.length)
    var i = 0
    v.foreach { x =>
      codes(i) = math.max(-127, math.min(127, math.round(x / scale))).toByte
      i += 1
    }
    (scale, codes)
  }

  /** Approximate dot product from two quantized vectors. */
  def dotQ(scaleA: Float, a: Array[Byte], scaleB: Float, b: Array[Byte]): Double = {
    if (a == null || b == null) return 0.0
    val n = math.min(a.length, b.length)
    var acc = 0L // int8·int8 products stay in Long exactly
    var i = 0
    while (i < n) { acc += a(i).toLong * b(i).toLong; i += 1 }
    acc.toDouble * scaleA * scaleB
  }

  private val quantizeUdf = udf((v: Seq[Float]) => quantize(v))
  private val dotQUdf = udf(dotQ _)

  /** Add `q_scale: float` and `q_codes: binary` columns. Narrow map. */
  def withQuantized(df: DataFrame, embCol: String): DataFrame = {
    val q = quantizeUdf(col(embCol))
    df.withColumn("q_scale", q.getField("_1"))
      .withColumn("q_codes", q.getField("_2"))
  }

  def dotQCol(sa: Column, a: Column, sb: Column, b: Column): Column =
    dotQUdf(sa, a, sb, b)

  /** Quantized-coarse / exact-fine top-k: rank by the quantized dot, keep
    * `k * overscan` candidates, rescore those exactly, return top-k. The
    * corpus float column is only read for the overscan survivors — at
    * scale, pair this with a quantized-only projection of the index table
    * so the coarse pass never touches float data.
    */
  def quantizedKnn(corpus: DataFrame, embCol: String, idCol: String,
      queryVec: Array[Float], k: Int, overscan: Int = 4): DataFrame = {
    val (qs, qc) = quantize(queryVec.toSeq)
    val coarse = withQuantized(corpus, embCol)
      .withColumn("q_score",
        dotQCol(lit(qs), lit(qc), col("q_scale"), col("q_codes")))
      .orderBy(col("q_score").desc, col(idCol).asc)
      .limit(k * overscan)
    coarse
      .withColumn("score", round(
        VectorFunctions.cosineUnit(col(embCol), typedlit(queryVec.toSeq)), 6))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }
}
