package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode normalization (NFC/NFKC/NFD/NFKD) for corpus text.
  *
  * Web-crawl text mixes composed and decomposed code-point sequences
  * ("é" as U+00E9 vs U+0065 U+0301) and compatibility variants
  * (full-width ASCII, ligatures); every downstream hash — exact dedup,
  * shingles, MinHash bands, segment hashes — treats those as distinct
  * documents unless the corpus is normalized FIRST, which is why
  * normalization is step one of public corpus pipelines (e.g. CCNet's
  * preprocessing, Wenzek et al. 2020). The JDK's `java.text.Normalizer`
  * does the actual Unicode work; this expression gives it codegen +
  * null-safety so normalization runs inside whole-stage codegen like
  * every other per-row hot loop in this engine.
  *
  * The fast path skips allocation entirely: `Normalizer.isNormalized`
  * is O(n) with no copy, and clean-ASCII corpora (the common case by
  * volume) return the input UTF8String unchanged. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  UnicodeNormalize.formOf(form) // eager validation at construction

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unicode_normalize expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("form", form, "java.lang.String")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.UnicodeNormalize.compute($a, $f);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {

  private[functions] def formOf(name: String): Normalizer.Form =
    name.toUpperCase match {
      case "NFC" => Normalizer.Form.NFC
      case "NFD" => Normalizer.Form.NFD
      case "NFKC" => Normalizer.Form.NFKC
      case "NFKD" => Normalizer.Form.NFKD
      case other => throw new IllegalArgumentException(
        s"unknown Unicode normalization form '$other' " +
          "(expected NFC, NFD, NFKC, or NFKD)")
    }

  /** Shared by interpreted + codegen paths. Already-normalized input
    * (all of clean-ASCII web text) returns the SAME UTF8String — one
    * decode for the O(n) `isNormalized` check, but no normalization
    * pass and no UTF-8 re-encode. */
  def compute(input: UTF8String, form: String): UTF8String = {
    val f = formOf(form)
    val s = input.toString
    if (Normalizer.isNormalized(s, f)) input
    else UTF8String.fromString(Normalizer.normalize(s, f))
  }

  /** Column form: `unicodeNormalize($"text", "NFC")`. */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    ColumnBridge.column(
      UnicodeNormalize(ColumnBridge.expression(text), form))
}
