package graft.text

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization as native codegen expressions — the
  * first stage of any text pipeline (crawled corpora mix composed and
  * decomposed code points, fullwidth forms, and curly quotes; every dedup
  * and hash operator downstream assumes one canonical byte form).
  *
  * Spark has no built-in UAX#15 normalizer; a HOF/UDF formulation would be
  * CodegenFallback (see [[TextHashExpressions]] for why that poisons a
  * shared-JVM run). These call `java.text.Normalizer` — the JDK's ICU-
  * derived implementation of the same standard DuckDB's `nfc_normalize`
  * implements — inside whole-stage codegen.
  */
object NormalizeExpression {

  /** UAX#15 normalization of `s` to the named form (NFC/NFD/NFKC/NFKD). */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    val f = Normalizer.Form.valueOf(form)
    // fast path: most real text is already normalized — skip the rewrite
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  /** NFD + strip combining marks (Latin accent folding: é→e, ü→u; code
    * points with no canonical decomposition, e.g. ø, pass through — same
    * contract as the standard Lucene ASCIIFoldingFilter's NFD subset).
    */
  def foldAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val decomposed = Normalizer.normalize(str, Normalizer.Form.NFD)
    val out = new java.lang.StringBuilder(str.length)
    var i = 0
    val n = decomposed.length
    while (i < n) {
      val cp = decomposed.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        out.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(Normalizer.normalize(out.toString, Normalizer.Form.NFC))
  }

  def nfc(text: Column): Column =
    ExpressionBridge.column(UnicodeNormalizeExpr(
      ExpressionBridge.expression(text), "NFC"))

  def nfkc(text: Column): Column =
    ExpressionBridge.column(UnicodeNormalizeExpr(
      ExpressionBridge.expression(text), "NFKC"))

  def accentFold(text: Column): Column =
    ExpressionBridge.column(AccentFoldExpr(ExpressionBridge.expression(text)))

  /** The composed canonical form for dedup/hash pipelines: NFC, lowercase,
    * accent fold, curly quote/dash folding, whitespace collapse + trim.
    * Idempotent: canonicalText(canonicalText(x)) == canonicalText(x).
    */
  def canonicalText(text: Column): Column = {
    import org.apache.spark.sql.functions._
    trim(regexp_replace(
      translate(accentFold(lower(nfc(text))),
        "‘’“”–—", "''\"\"--"),
      "\\s+", " "))
  }
}

/** UAX#15 normalization to a fixed form (validated at construction). */
final case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {
  Normalizer.Form.valueOf(form) // fail fast on a bad form name

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeExpression.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"""graft.text.NormalizeExpression.normalize($s, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalizeExpr =
    copy(child = newChild)
}

/** NFD-decompose, drop combining marks, NFC-recompose. */
final case class AccentFoldExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "accent_fold"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeExpression.foldAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.text.NormalizeExpression.foldAccents($s)")

  override protected def withNewChildInternal(newChild: Expression): AccentFoldExpr =
    copy(child = newChild)
}
