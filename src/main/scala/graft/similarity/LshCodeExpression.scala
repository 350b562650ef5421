package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen sign-LSH bucket code for an embedding column.
  *
  * Computes the SAME arithmetic as the HOF formulation
  * (`Similarity.lshBits` + MSB-first fold): for plane p the hyperplane
  * component at dim d is derived by the MINSTD → xorshift → MINSTD integer
  * mix — h1 = ((p*131071 + d + 1) * 48271) mod (2^31-1),
  * h2 = ((h1 xor (h1 >> 15)) * 48271) mod (2^31-1),
  * comp = ((h2 mod 2e6) - 1e6) / 1e6 — the dot product is accumulated in
  * double in ascending dim order, bit p = [dot >= 0], and the code packs the
  * bits MSB-first (bit 0 is the most significant). The DuckDB oracle
  * replicates the identical integer arithmetic, so the bucketed plan stays
  * hash-checkable end to end.
  *
  * Exists because the HOF version evaluates ~numPlanes * dim interpreted
  * expression nodes per row (HOF lambdas are CodegenFallback) — measured
  * ~7 ms/row at 8 planes x 64 dims, which made a 2000-vector near-dup query
  * a 14 s job. Here the plane components are memoized per (numPlanes, dim)
  * in a shared table and the hot loop is a JIT-friendly multiply-add.
  *
  * Null semantics mirror the HOF chain: a null element poisons the fold
  * (null sum), and `when(null >= 0, 1).otherwise(0)` yields bit 0 — so any
  * null element (or an empty vector, whose `sequence(0, size-1)` zip pads
  * with nulls) produces code 0. A null vector yields null.
  */
final case class LshCodeExpr(child: Expression, numPlanes: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket_code"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  // The eval reads elements as float or double directly (no per-element
  // cast), so any other element type must fail at analysis time instead of
  // a runtime ClassCastException deep in a task.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    LshCodeExpr.compute(input.asInstanceOf[ArrayData], numPlanes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = isFloat
    defineCodeGen(ctx, ev, arr =>
      s"graft.similarity.LshCodeExpr.compute($arr, $numPlanes, $f)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshCodeExpr =
    copy(child = newChild)
}

object LshCodeExpr {

  private val Minstd = 48271L
  private val Mersenne31 = 2147483647L

  /** comp(p, d) for all planes x dims, memoized: the table depends only on
    * the geometry, never the data. ConcurrentHashMap because the expression
    * object (and thus this call site) is shared by every task thread of a
    * stage.
    */
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  private def componentTable(numPlanes: Int, dims: Int): Array[Double] =
    tables.computeIfAbsent((numPlanes, dims), { case (np, nd) =>
      val t = new Array[Double](np * nd)
      var p = 0
      while (p < np) {
        var d = 0
        while (d < nd) {
          val h1 = java.lang.Math.floorMod((p * 131071L + d + 1L) * Minstd, Mersenne31)
          val h2 = java.lang.Math.floorMod((h1 ^ (h1 >> 15)) * Minstd, Mersenne31)
          t(p * nd + d) = (java.lang.Math.floorMod(h2, 2000000L) - 1000000L).toDouble / 1000000.0
          d += 1
        }
        p += 1
      }
      t
    })

  /** MSB-first packed sign bits of `numPlanes` hyperplane dot products. */
  def compute(vec: ArrayData, numPlanes: Int, isFloat: Boolean): Long = {
    val n = vec.numElements()
    if (n == 0) return 0L // HOF parity: empty vec -> null sums -> all bits 0
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return 0L // HOF parity: null element poisons every fold
      i += 1
    }
    val comp = componentTable(numPlanes, n)
    var code = 0L
    var p = 0
    while (p < numPlanes) {
      var s = 0.0
      var d = 0
      val off = p * n
      while (d < n) {
        val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
        s += x * comp(off + d)
        d += 1
      }
      code = code * 2 + (if (s >= 0) 1L else 0L)
      p += 1
    }
    code
  }

  def code(vec: Column, numPlanes: Int): Column =
    org.apache.spark.sql.graft.ExpressionBridge.column(
      LshCodeExpr(
        org.apache.spark.sql.graft.ExpressionBridge.expression(vec), numPlanes))

  /** The pre-sign hyperplane projections of [[compute]], scaled by
    * 1/sqrt(outDim) — the Johnson–Lindenstrauss map over the same
    * deterministic component table. Null on an empty vector or null
    * element (a projection of poisoned sums would silently look like a
    * real point; sign-LSH's code-0 convention does not transfer).
    */
  def project(vec: ArrayData, outDim: Int, isFloat: Boolean): ArrayData = {
    val n = vec.numElements()
    if (n == 0) return null
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    val comp = componentTable(outDim, n)
    val scale = 1.0 / java.lang.Math.sqrt(outDim.toDouble)
    val out = new Array[Any](outDim)
    var p = 0
    while (p < outDim) {
      var s = 0.0
      var d = 0
      val off = p * n
      while (d < n) {
        val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
        s += x * comp(off + d)
        d += 1
      }
      out(p) = s * scale
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Native codegen Johnson–Lindenstrauss random projection: `outDim`
  * deterministic ±[-1,1) hyperplane dot products (the SAME component table
  * as [[LshCodeExpr]] — sign-LSH is exactly the sign of this map), scaled
  * by 1/sqrt(outDim). Cosine is scale-invariant, so downstream ANN over
  * the projected vectors needs no further normalization.
  *
  * Can return null (empty vector / null element) even for a non-nullable
  * child, so `nullable` is overridden — without it Catalyst allocates no
  * isNull slot and whole-stage codegen fails compilation (the
  * DoubleDotProductExpr lesson).
  */
final case class JlProjectExpr(child: Expression, outDim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "jl_project"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    LshCodeExpr.project(input.asInstanceOf[ArrayData], outDim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = isFloat
    nullSafeCodeGen(ctx, ev, arr => {
      val boxed = ctx.freshName("jlBoxed")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $boxed =
         |  graft.similarity.LshCodeExpr.project($arr, $outDim, $f);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): JlProjectExpr =
    copy(child = newChild)
}

object JlProjectExpr {
  def project(vec: Column, outDim: Int): Column =
    org.apache.spark.sql.graft.ExpressionBridge.column(
      JlProjectExpr(
        org.apache.spark.sql.graft.ExpressionBridge.expression(vec), outDim))
}
