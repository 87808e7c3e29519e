package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the first
  * cleaning step of a web-corpus pipeline (canonical composition: a
  * decomposed `e`+COMBINING ACUTE and a precomposed `é` are the same
  * text to dedup/fingerprint/tokenize, and ANGSTROM SIGN folds to Å).
  * Neither Spark SQL nor its function library exposes a normalizer, and
  * a Scala UDF here would pay ser/de per row on the widest column in the
  * corpus; this generates a straight `java.text.Normalizer` call fused
  * into whole-stage codegen, with a TWO-TIER fast path: a raw UTF-8
  * byte scan first (all bytes < 0x80 ⇒ the string is pure ASCII ⇒
  * already NFC, zero allocation — at web scale most rows), then the
  * `isNormalized` quick-check (one `toString` decode, no normalize
  * buffer) for non-ASCII rows that are already composed.
  *
  * NFC, not NFKC, deliberately: canonical equivalence is lossless (the
  * reading of the text is unchanged), while compatibility folding (Ⅸ→IX,
  * ﬁ→fi) is a destructive editorial choice a pipeline should opt into
  * separately — and NFC is what the DuckDB oracle (`nfc_normalize`)
  * replays exactly.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    if (NfcNormalize.isAscii(u)) input
    else {
      val s = u.toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
        input
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |if (org.apache.spark.sql.graft.NfcNormalize.isAscii($c)) {
         |  ${ev.value} = $c;
         |} else {
         |  String $s = $c.toString();
         |  ${ev.value} = java.text.Normalizer.isNormalized(
         |      $s, java.text.Normalizer.Form.NFC)
         |    ? $c
         |    : org.apache.spark.unsafe.types.UTF8String.fromString(
         |        java.text.Normalizer.normalize(
         |          $s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  def apply(text: Column): Column =
    ExpressionUtils.column(new NfcNormalize(ExpressionUtils.expression(text)))

  /** True iff every byte is < 0x80 — pure ASCII, which NFC cannot
    * change (no combining marks, no compatibility points below U+0080),
    * checked directly against the UTF8String's backing bytes with ZERO
    * allocation. Public static-style because the generated code calls
    * it from compiled query classes. */
  def isAscii(s: UTF8String): Boolean = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val n = s.numBytes()
    var i = 0
    // 8-byte strides over the high-bit mask; Platform reads are the
    // same primitive the rest of Tungsten row access uses
    while (i + 8 <= n) {
      if ((org.apache.spark.unsafe.Platform.getLong(base, offset + i)
          & 0x8080808080808080L) != 0L) return false
      i += 8
    }
    while (i < n) {
      if ((org.apache.spark.unsafe.Platform.getByte(base, offset + i)
          & 0x80) != 0) return false
      i += 1
    }
    true
  }
}
