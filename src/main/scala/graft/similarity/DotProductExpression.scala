package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen dot product over two numeric array columns, accumulated in
  * double in ascending index order — bit-identical to the sequential
  * zip_with/aggregate formulation (and to the DuckDB oracle's arithmetic)
  * but ~100x faster: the HOF formulation is CodegenFallback (interpreted,
  * per-element boxing), which dominates brute-force all-pairs scoring.
  *
  * Null semantics mirror zip_with + aggregate: any null element or a length
  * mismatch yields null.
  */
final case class DoubleDotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_dot_product"

  // The result can be null even when both inputs are non-null (length
  // mismatch / null element), so this must not inherit BinaryExpression's
  // children-derived nullability: with non-nullable children Catalyst would
  // allocate no isNull slot and the generated `ev.isNull = true` assignment
  // fails janino compilation (whole-stage falls back to interpreted).
  override def nullable: Boolean = true

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    DoubleDotProductExpr.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArray(left), isFloatArray(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = isFloatArray(left)
    val rf = isFloatArray(right)
    // compute() may return null (element null / length mismatch) — route
    // through the boxed result and fold into the expression's null flag
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dotBoxed")
      s"""
         |Object $boxed = graft.similarity.DoubleDotProductExpr.compute($a, $b, $lf, $rf);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $boxed).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DoubleDotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DoubleDotProductExpr {

  /** Sequential multiply-add in double; null on null element or length
    * mismatch (zip_with parity).
    */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ExpressionBridge.column(
      DoubleDotProductExpr(
        org.apache.spark.sql.graft.ExpressionBridge.expression(a),
        org.apache.spark.sql.graft.ExpressionBridge.expression(b)))
}
