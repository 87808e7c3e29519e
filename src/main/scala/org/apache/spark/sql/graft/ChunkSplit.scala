package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Chunker

/** Native Catalyst Generator for recursive-character chunking (SURVEY.md
  * §2.9 V1, §2.10 — "a Catalyst Generator is the performance upgrade" over
  * UDF + posexplode): one source row fans out to one row per chunk,
  * emitted lazily as (pos, total, chunk).
  *
  * vs. the array-UDF + posexplode formulation:
  *  - no intermediate array<string> materialized per document (for a 1 MB
  *    document that array is ~1 MB of extra copies held until the explode);
  *  - total_chunks is emitted per row at split time — the alternative
  *    needs either the array (size before explode) or a per-doc window
  *    (a shuffle);
  *  - evaluation is a single pass fused into the Generate operator.
  */
case class ChunkSplit(child: Expression, chunkSize: Int, overlap: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("total", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"chunk_split requires a string input, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    if (text == null) Nil
    else {
      val chunks = Chunker.split(text.asInstanceOf[UTF8String].toString,
        chunkSize, overlap)
      val n = chunks.length
      chunks.iterator.zipWithIndex.map { case (c, i) =>
        InternalRow(i, n, UTF8String.fromString(c))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkSplit =
    copy(child = newChild)

  override def prettyName: String = "chunk_split"
}

object ChunkSplit {
  /** Column wrapper; use in select() exactly like posexplode —
    * `.as(Seq("pos", "total", "chunk"))`.
    */
  def apply(text: Column, chunkSize: Int, overlap: Int): Column =
    ExpressionUtils.column(
      new ChunkSplit(ExpressionUtils.expression(text), chunkSize, overlap))
}
