package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression for the PQ-ADC coarse scoring hot path
  * (graft.vector.ProductQuantization): score = Σ_s lut[s·ksub + code_s]
  * over a vector's m code bytes, with the per-query lookup table carried
  * as a plan reference object — m array reads + adds per row, fused into
  * whole-stage codegen.
  *
  * Why a custom expression: the scoring runs once per stored vector per
  * query — THE inner loop of a PQ scan. A Scala UDF pays per-row
  * serialization and closure dispatch exactly where the format's point
  * is to make scoring a few cache-friendly lookups. Same rationale and
  * packaging as DotProduct.
  *
  * Out-of-range codes (corrupt persisted bytes; honest encoders can't
  * produce them) score 0 contribution rather than reading out of
  * bounds.
  */
case class AdcScore(child: Expression, lut: Array[Double], ksub: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[Array[Byte]]
    var acc = 0.0
    var s = 0
    while (s < codes.length) {
      val c = codes(s) & 0xff
      // guard per subspace: an overlong flat-index check would silently
      // read a LATER subspace's entry for a corrupt byte
      val idx = s * ksub + c
      if (c < ksub && idx < lut.length) acc += lut(idx)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("adcLut", lut, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val idx = ctx.freshName("idx")
      val code = ctx.freshName("code")
      s"""
         |double $acc = 0.0;
         |for (int $s = 0; $s < $c.length; $s++) {
         |  int $code = $c[$s] & 0xff;
         |  int $idx = $s * $ksub + $code;
         |  if ($code < $ksub && $idx < $lutRef.length) $acc += $lutRef[$idx];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AdcScore =
    copy(child = newChild)

  override def prettyName: String = "adc_score"

  // Array fields compare by reference in case-class equality, which would
  // break semanticEquals/canonicalization (identical scoring branches
  // would never deduplicate); compare LUT contents instead.
  override def equals(other: Any): Boolean = other match {
    case a: AdcScore =>
      a.child == child && a.ksub == ksub && java.util.Arrays.equals(a.lut, lut)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode + ksub) + java.util.Arrays.hashCode(lut)
}

object AdcScore {
  /** Column API over a flattened [subspace-major] lookup table. */
  def apply(codes: Column, lut: Array[Array[Double]]): Column = {
    val ksub = lut.map(_.length).max
    val flat = new Array[Double](lut.length * ksub)
    for (s <- lut.indices; c <- lut(s).indices) flat(s * ksub + c) = lut(s)(c)
    ExpressionUtils.column(
      AdcScore(ExpressionUtils.expression(codes), flat, ksub))
  }
}
