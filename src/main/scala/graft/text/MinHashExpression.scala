package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Native Catalyst expression computing a MinHash signature in ONE pass over
  * the shingle array: for each shingle, one 32-bit Murmur3 hash of its bytes,
  * then `numHashes` affine permutations ((a_i*h + b_i) mod 2^31-1) folded
  * into running minimums.
  *
  * Exists because the higher-order-function formulation
  * (transform(sequence(0,n-1), i -> array_min(transform(...)))) is evaluated
  * interpreted (HOFs are CodegenFallback) and re-materializes the constant
  * tables per element — ~60x slower at sf0.1. Here the permutation constants
  * are computed once at construction and the hot loop is a branch-free
  * while-loop the JIT vectorizes; doGenCode emits a single static call so
  * the expression composes with whole-stage codegen instead of breaking the
  * pipeline into interpreted islands.
  */
final case class MinHashSignatureExpr(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  // input contract: array<string> (built by Dedup.shingles — no general
  // SQL-surface registration, so ExpectsInputTypes coercion is unnecessary)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val tables: (Array[Long], Array[Long]) =
    MinHashSignatureExpr.permutationTables(numHashes, seed)

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignatureExpr.compute(input.asInstanceOf[ArrayData], tables._1, tables._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tablesRef = ctx.addReferenceObj("minhashTables", tables,
      "scala.Tuple2<long[], long[]>")
    defineCodeGen(ctx, ev, arr =>
      s"graft.text.MinHashSignatureExpr.compute($arr, " +
        s"(long[])$tablesRef._1(), (long[])$tablesRef._2())")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

object MinHashSignatureExpr {

  val MersennePrime31: Long = 2147483647L // 2^31 - 1

  /** Deterministic affine constants from `seed` via splitmix64. */
  def permutationTables(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    def splitmix64(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    val as = Array.tabulate(numHashes)(i =>
      1L + java.lang.Math.floorMod(splitmix64(seed + 2L * i), MersennePrime31 - 1))
    val bs = Array.tabulate(numHashes)(i =>
      java.lang.Math.floorMod(splitmix64(seed + 2L * i + 1), MersennePrime31))
    (as, bs)
  }

  /** One pass: |shingles| hashes + |shingles| * numHashes multiply-mods. */
  def compute(shingles: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val n = as.length
    val sig = new Array[Long](n)
    java.util.Arrays.fill(sig, MersennePrime31)
    val numShingles = shingles.numElements()
    var j = 0
    while (j < numShingles) {
      val s = shingles.getUTF8String(j)
      if (s != null) {
        // 31-bit non-negative base hash of the shingle bytes
        val h = (Murmur3_x86_32.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes(), 42) & 0x7fffffff).toLong
        var i = 0
        while (i < n) {
          val v = (as(i) * h + bs(i)) % MersennePrime31
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Column API entry point. */
  def signature(shingles: Column, numHashes: Int, seed: Long): Column =
    org.apache.spark.sql.graft.ExpressionBridge.column(
      MinHashSignatureExpr(
        org.apache.spark.sql.graft.ExpressionBridge.expression(shingles),
        numHashes, seed))
}
