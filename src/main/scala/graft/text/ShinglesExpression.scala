package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing distinct word n-gram shingles in one
  * pass over the document.
  *
  * Replaces the HOF formulation (split + transform(sequence) of concat_ws of
  * element_at + array_distinct): interpreted HOF lambdas re-evaluate the
  * `split` per element access, so a ~60-word document paid ~290 grams x 3
  * element_at x split-of-the-whole-text — measured ~60 ms/doc, which
  * multiplied into minutes whenever a plan evaluated the shingle projection
  * more than once (self-join sides, verify sides). Here it is one tokenize +
  * one LinkedHashSet pass per document, inside whole-stage codegen.
  *
  * Semantics are identical to the HOF version (and to the DuckDB oracle's
  * string_split replication): words are single-space splits with empties
  * kept (split's limit=-1), documents shorter than `n` words contribute
  * their whole text as a single shingle, distinct keeps first-occurrence
  * order.
  */
final case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShinglesExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.text.ShinglesExpr.compute($s, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {

  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val str = text.toString
    // single-space split keeping empty tokens, trailing included (limit -1)
    val words = new java.util.ArrayList[String]()
    var start = 0
    var i = str.indexOf(' ')
    while (i >= 0) {
      words.add(str.substring(start, i))
      start = i + 1
      i = str.indexOf(' ', start)
    }
    words.add(str.substring(start))
    val m = words.size()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (m >= n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j <= m - n) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(words.get(j + k))
          k += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        j += 1
      }
    } else {
      out.add(text) // whole text: join of ALL single-space tokens == input
    }
    new GenericArrayData(out.toArray)
  }

  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ExpressionBridge.column(
      ShinglesExpr(org.apache.spark.sql.graft.ExpressionBridge.expression(text), n))
}
