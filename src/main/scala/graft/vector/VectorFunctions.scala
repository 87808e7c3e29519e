package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math (SURVEY.md §2.9 V3/V4).
  *
  * All built from SQL higher-order functions (`zip_with` / `aggregate` /
  * `transform`) so they stay inside Catalyst and whole-stage codegen — no
  * Scala UDF deserialization in the scoring hot path. Products and sums are
  * computed in DOUBLE regardless of the array element type so results align
  * with the DuckDB oracle (both engines then do a sequential double sum).
  */
object VectorFunctions {

  /** Dot product of two float/double array columns, computed in double.
    * Backed by the native codegen'd expression (org.apache.spark.sql.graft
    * .DotProduct); dotHof is the pure-SQL formulation it replaced — same
    * left-to-right double summation, so results are bit-identical (asserted
    * in VectorFunctionsSpec).
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.dot(a, b)

  /** Higher-order-function dot product (interpreted lambda path; kept for
    * cross-checking the native expression).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** Full cosine similarity (not assuming unit vectors); null-safe via
    * NaN on zero norms being filtered by callers if needed.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Cosine for unit-norm vectors = dot product (the reference's case:
    * embeddings are L2-normalized at encode time).
    */
  def cosineUnit(a: Column, b: Column): Column = dot(a, b)

  /** Chroma/LangChain-style relevance score in [0,1] from unit-vector
    * cosine: relevance = 1 - distance/2 with distance = 1 - cos
    * (`Auto_query_rag_database.py:434-436` validates the 0–1 domain).
    */
  def relevance(a: Column, b: Column): Column =
    (lit(1.0) + cosineUnit(a, b)) / lit(2.0)

  /** L2-normalize an array column (double elements). */
  def l2Normalize(a: Column): Column = {
    val n = sqrt(normSq(a))
    when(n > 0, transform(a, x => x.cast("double") / n))
      .otherwise(transform(a, x => lit(0.0)))
  }
}
