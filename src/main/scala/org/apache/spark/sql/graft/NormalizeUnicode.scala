package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen'd
  * expression — Spark has no built-in for it, and the LLM-corpus cleanup
  * step (SURVEY.md §2.12 L4/L6) needs canonical composition before
  * hashing/dedup: the decomposed `e`+U+0301 and precomposed U+00E9 spell
  * the same text but hash differently until normalized.
  *
  * Preference order (SURVEY §4.3): a scalar function over one column with
  * no state is exactly the custom-`Expression` case — row-local, stays
  * inside whole-stage codegen, nothing to shuffle. `java.text.Normalizer`
  * is allocation-light for the dominant already-NFC case (its quick-check
  * fast path returns the input object unchanged).
  */
case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {

  require(NormalizeUnicode.Forms.contains(form),
    s"unknown normalization form '$form' (want one of ${NormalizeUnicode.Forms.mkString("/")})")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override protected def nullSafeEval(s: Any): Any = {
    val in = s.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      Normalizer.normalize(in, Normalizer.Form.valueOf(form)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeUnicode {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Column-API entry point. */
  def column(c: Column, form: String = "NFC"): Column =
    ExpressionUtils.column(NormalizeUnicode(ExpressionUtils.expression(c), form))
}
