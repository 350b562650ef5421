package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the per-document text hashes.
  *
  * Same motivation as [[MinHashSignatureExpr]]: the higher-order-function
  * formulations (`aggregate(filter(split(text, "")), ...)` char folds) are
  * CodegenFallback — evaluated interpreted, allocating a per-character array
  * of single-char strings per row. Fine at 5k docs, a bottleneck at 100 TB.
  * These expressions keep the EXACT arithmetic of the HOF versions (the
  * DuckDB oracles replicate it digit for digit) but run it as a single
  * JIT-friendly scan over the string's code points, composed into
  * whole-stage codegen via `defineCodeGen`.
  */
object TextHashExpressions {

  private val Mod32 = 0xffffffffL // h mod 2^32 == h & Mod32 for non-negative h

  /** 32-bit polynomial rolling hash: h = (h*31 + codepoint) mod 2^32, seed
    * 17 — identical to the `aggregate(split(text, ""), 17, ...)` fold (empty
    * strings contribute nothing, matching the HOF's filter).
    */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 17L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) & Mod32
      i += Character.charCount(cp)
    }
    h
  }

  /** 64-bit SimHash over single-space-separated words, identical to
    * [[Dedup.simHash]]'s HOF arithmetic: word hash = [[polyHash]]; bit i's
    * derived hash g_i(w) = (h*(2i+1) + i^2*2654435761) mod 2^32, vote +1
    * when g_i >= 2^31; empty words (consecutive/trailing separators, as
    * Spark's split with limit -1 produces) vote with h = 17. Returns the
    * packed non-negative halves [hi, lo].
    */
  def simHash(s: UTF8String): Array[Long] = {
    val str = s.toString
    val votes = new Array[Int](64)
    var start = 0
    var continue = true
    while (continue) {
      val sep = str.indexOf(' ', start)
      val end = if (sep < 0) str.length else sep
      // polyHash of str[start, end)
      var h = 17L
      var i = start
      while (i < end) {
        val cp = str.codePointAt(i)
        h = (h * 31 + cp) & Mod32
        i += Character.charCount(cp)
      }
      var b = 0
      while (b < 64) {
        val g = (h * (2 * b + 1) + b.toLong * b * 2654435761L) & Mod32
        votes(b) += (if (g >= 0x80000000L) 1 else -1)
        b += 1
      }
      if (sep < 0) continue = false else start = sep + 1
    }
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) lo |= 1L << b
      if (votes(b + 32) > 0) hi |= 1L << b
      b += 1
    }
    Array(hi, lo)
  }

  def fingerprint(text: Column): Column =
    org.apache.spark.sql.graft.ExpressionBridge.column(
      PolyHashExpr(org.apache.spark.sql.graft.ExpressionBridge.expression(text)))

  def simHashColumn(text: Column): Column =
    org.apache.spark.sql.graft.ExpressionBridge.column(
      SimHashExpr(org.apache.spark.sql.graft.ExpressionBridge.expression(text)))
}

/** Rolling 32-bit polynomial hash of a string column (document
  * fingerprinting; also the word hash underlying [[SimHashExpr]]).
  */
final case class PolyHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    TextHashExpressions.polyHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.text.TextHashExpressions.polyHash($s)")

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

/** 64-bit SimHash of a string column as struct(hi, lo) of non-negative
  * 32-bit halves (cross-engine-safe packing).
  */
final case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false)))
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val halves = TextHashExpressions.simHash(input.asInstanceOf[UTF8String])
    new GenericInternalRow(Array[Any](halves(0), halves(1)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val halves = ctx.freshName("simhashHalves")
      s"""long[] $halves = graft.text.TextHashExpressions.simHash($s);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{(Object) $halves[0], (Object) $halves[1]});""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}
