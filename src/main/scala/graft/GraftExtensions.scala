package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.similarity.{DoubleDotProductExpr, LshCodeExpr}
import graft.text.{AccentFoldExpr, MinHashSignatureExpr, PolyHashExpr, ShinglesExpr, SimHashExpr, UnicodeNormalizeExpr}

/** `SparkSessionExtensions` wiring: exposes the engine's native Catalyst
  * expressions as SQL functions, so `spark.sql` users (and SQL-only
  * surfaces like Thrift/Connect) reach the same codegen'd hot paths as the
  * Column API — no UDF lane anywhere. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` (cluster config) or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * Geometry arguments (shingle size, hash counts, planes) must be integer
  * literals: they parameterize codegen and the memoized constant tables,
  * exactly like the Column API's Int parameters.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def longLit(e: Expression, fn: String, pos: Int): Long = e match {
    case Literal(v: Int, _)  => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  private def intLit(e: Expression, fn: String, pos: Int): Int = {
    val v = longLit(e, fn, pos)
    require(v >= Int.MinValue && v <= Int.MaxValue,
      s"$fn: argument $pos out of int range: $v")
    v.toInt
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  private def fd(name: String, usage: String)(builder: Seq[Expression] => Expression)
    : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
      args => builder(args))

  /** The injected function set (also reusable by tests). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fd("graft_fingerprint", "polynomial rolling hash of a string") { args =>
      arity("graft_fingerprint", args, 1); PolyHashExpr(args.head)
    },
    fd("graft_simhash", "64-bit SimHash as struct(hi, lo)") { args =>
      arity("graft_simhash", args, 1); SimHashExpr(args.head)
    },
    fd("graft_shingles", "distinct word n-gram shingles") { args =>
      arity("graft_shingles", args, 2)
      ShinglesExpr(args.head, intLit(args(1), "graft_shingles", 2))
    },
    fd("graft_minhash", "MinHash signature of a shingle array") { args =>
      arity("graft_minhash", args, 3)
      // seed is a LONG: longLit, not an int truncation (a >2^31 seed would
      // silently produce different signatures than the Column API)
      MinHashSignatureExpr(args.head, intLit(args(1), "graft_minhash", 2),
        longLit(args(2), "graft_minhash", 3))
    },
    fd("graft_lsh_code", "sign-LSH bucket code of an embedding") { args =>
      arity("graft_lsh_code", args, 2)
      LshCodeExpr(args.head, intLit(args(1), "graft_lsh_code", 2))
    },
    fd("graft_dot", "double-precision dot product of two numeric arrays") { args =>
      arity("graft_dot", args, 2); DoubleDotProductExpr(args.head, args(1))
    },
    fd("graft_normalize", "UAX#15 unicode normalization to the given form") { args =>
      arity("graft_normalize", args, 2)
      val form = args(1) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(
          s"graft_normalize: form must be a string literal, got $other")
      }
      UnicodeNormalizeExpr(args.head, form)
    },
    fd("graft_accent_fold", "NFD-decompose and strip combining marks") { args =>
      arity("graft_accent_fold", args, 1); AccentFoldExpr(args.head)
    },
    fd("graft_bpe_merge", "greedy adjacent-pair merge over a symbol array") { args =>
      arity("graft_bpe_merge", args, 3)
      graft.text.BpeMergeExpr(args.head, args(1), args(2))
    },
    fd("graft_char_entropy", "character-bin entropy as struct(n_chars_binned, entropy_micro)") { args =>
      arity("graft_char_entropy", args, 1)
      graft.text.CharEntropyExpr(args.head)
    })

  /** Register the same function set on an already-built session. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.ExpressionBridge.registerFunction(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], id, info, builder)
    }
}
