package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass character-distribution entropy (see
  * [[TextStats.charEntropyColumns]] for the signal's rationale). The
  * 29-regexp_count column formulation re-scans every document 29 times —
  * the 20x probe measured 183 s per 100k docs, a non-starter against a
  * 100 TB corpus. This native expression produces the identical
  * (n_binned, entropy_micro) pair in ONE scan over the string's code
  * points, composed into whole-stage codegen; the bin definitions and the
  * fixed bin-order summation match the regex formulation (and the DuckDB
  * oracle) bit for bit.
  */
object CharEntropyExpression {

  /** Returns [n_chars_binned, entropy_micro]. Bins: a-z case-folded
    * (0-25), ASCII digit (26), ASCII whitespace incl. \v — the Java/RE2
    * \s intersection (27), other (28). Every code point lands in exactly
    * one bin, so n = total code points.
    */
  def charEntropy(s: UTF8String): Array[Long] = {
    val str = s.toString
    val counts = new Array[Long](29)
    var i = 0
    val len = str.length
    var n = 0L
    while (i < len) {
      val cp = str.codePointAt(i)
      val bin =
        if (cp >= 'a' && cp <= 'z') cp - 'a'
        else if (cp >= 'A' && cp <= 'Z') cp - 'A'
        else if (cp >= '0' && cp <= '9') 26
        else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
          cp == '\f' || cp == '\r') 27
        else 28
      counts(bin) += 1L
      n += 1L
      i += Character.charCount(cp)
    }
    if (n == 0L) return Array(0L, 0L)
    var h = 0.0
    var b = 0
    while (b < 29) {
      if (counts(b) > 0L) {
        val p = counts(b).toDouble / n.toDouble
        h += (-p) * math.log(p) // (-p)*ln(p): the oracle's exact term shape
      }
      b += 1
    }
    Array(n, math.floor(h * 1000000.0).toLong)
  }

  def charEntropyColumn(text: Column): Column =
    org.apache.spark.sql.graft.ExpressionBridge.column(
      CharEntropyExpr(org.apache.spark.sql.graft.ExpressionBridge.expression(text)))
}

final case class CharEntropyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars_binned", LongType, nullable = false),
    StructField("entropy_micro", LongType, nullable = false)))
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any = {
    val r = CharEntropyExpression.charEntropy(input.asInstanceOf[UTF8String])
    new GenericInternalRow(Array[Any](r(0), r(1)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val pair = ctx.freshName("entropyPair")
      s"""long[] $pair = graft.text.CharEntropyExpression.charEntropy($s);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{(Object) $pair[0], (Object) $pair[1]});""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}
