package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k buffer: at most k (score, payload) entries, best-k under
  * the total order (score DESC, payload ASC). Kept as a plain array with
  * a tracked worst slot — k is small (single digits to hundreds), so O(k)
  * insert beats heap bookkeeping and serializes trivially.
  */
final class TopKBuffer(val k: Int) {
  var scores: Array[Long] = new Array[Long](k)
  var payloads: Array[UTF8String] = new Array[UTF8String](k)
  var size: Int = 0

  /** true if (s1,p1) ranks strictly worse than (s2,p2). */
  private def worse(s1: Long, p1: UTF8String, s2: Long, p2: UTF8String): Boolean =
    s1 < s2 || (s1 == s2 && p1.compareTo(p2) > 0)

  private def worstIdx: Int = {
    var w = 0
    var i = 1
    while (i < size) {
      if (worse(scores(i), payloads(i), scores(w), payloads(w))) w = i
      i += 1
    }
    w
  }

  def insert(s: Long, p: UTF8String): Unit = {
    if (size < k) {
      scores(size) = s; payloads(size) = p; size += 1
    } else if (k > 0) {
      val w = worstIdx
      if (worse(scores(w), payloads(w), s, p)) { scores(w) = s; payloads(w) = p }
    }
  }

  def mergeFrom(other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.payloads(i)); i += 1 }
    this
  }

  /** Entries sorted best-first: (score DESC, payload ASC). */
  def sorted: Array[(Long, UTF8String)] =
    (0 until size).map(i => (scores(i), payloads(i))).toArray
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2.compareTo(b._2) < 0))
}

/** Native top-k-per-group aggregate (SURVEY.md §2.6 T1/T2 generalized to
  * grouped data; reference takes top-k only globally —
  * query_rag_database.py:361 `search(..., k)`).
  *
  * Why a custom `TypedImperativeAggregate` instead of the window-rank
  * idiom (`row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k`):
  * the window plan shuffles EVERY row to its group's partition and sorts
  * whole groups, so at 100 TB the exchange carries the full table. This
  * aggregate keeps a bounded k-entry buffer per group with map-side
  * partial aggregation (ObjectHashAggregate partial → final), so at most
  * k entries per group PER PARTITION cross the exchange — shuffle volume
  * drops from O(rows) to O(groups × k × partitions), and no sort ever
  * sees more than k live entries per buffer.
  *
  * Determinism contract: result is the best k under the TOTAL order
  * (score DESC, payload ASC) — ties cannot make the output depend on
  * partitioning, which is what lets a DuckDB `row_number()` oracle
  * hash-match it exactly. Score is a LONG (callers pre-scale doubles to
  * integer micro-units, the repo-wide convention); payload is a STRING.
  * Null score or payload rows are ignored (SQL aggregate convention).
  */
case class GroupTopK(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ExpectsInputTypes {

  require(k > 0, s"group_topk requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, payload)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, StringType)
  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("payload", StringType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      // copy: UTF8String from an unsafe row is backed by reused memory
      buf.insert(s.asInstanceOf[Long], p.asInstanceOf[UTF8String].clone())
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer =
    buf.mergeFrom(other)

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, p) =>
      InternalRow(s, p)
    }.toSeq)

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeLong(buf.scores(i))
      val b = buf.payloads(i).getBytes
      out.writeInt(b.length)
      out.write(b)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val s = in.readLong()
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.insert(s, UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GroupTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GroupTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GroupTopK =
    copy(score = newChildren(0), payload = newChildren(1))

  override def prettyName: String = "group_topk"
}

object GroupTopK {
  /** Column API: `df.groupBy(g).agg(GroupTopK.topK($"score_e6", $"id", 3))`.
    * Returns ARRAY<STRUCT<score BIGINT, payload STRING>> sorted
    * (score DESC, payload ASC), length ≤ k.
    */
  def topK(score: Column, payload: Column, k: Int): Column =
    ExpressionUtils.column(
      GroupTopK(ExpressionUtils.expression(score), ExpressionUtils.expression(payload), k)
        .toAggregateExpression(isDistinct = false))
}
