package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bit-equality gate for the r16 mapPartitions kernels: each kernelized
  * operator must return EXACTLY the rows of its expression formulation —
  * same values, same double bits (doubleToLongBits, so ±0.0 stays
  * distinguished and NaN canonicalizes the way Spark's own comparisons do).
  *
  * The data deliberately contains exact duplicate vectors so the 6-dp/9-dp
  * rounded cosines produce real ties and the id tiebreaks + proven-margin
  * fast-reject paths are exercised, and clustered directions so top-k
  * selections are non-trivial.
  */
class BruteKernelSpec extends SparkSpec {

  import spark.implicits._

  private def data: DataFrame = {
    val rnd = new scala.util.Random(11)
    val base = (0 until 240).map { i =>
      val b = Array.fill(16)(0.0f)
      b(i % 4) = 1.0f
      (i.toLong, b.map(x => x + rnd.nextFloat() * 0.3f).toSeq)
    }
    // exact duplicates of the first 12 vectors under fresh ids: identical
    // cosines against every partner -> rounded-cosine ties broken by id
    val dups = (0 until 12).map(i => (240L + i, base(i)._2))
    (base ++ dups).toDF("vec_id", "embedding")
  }

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq.map {
      case d: Double => java.lang.Double.doubleToLongBits(d)
      case x => x
    }).sortBy(_.mkString("|"))

  private def assertBitEqual(kernel: DataFrame, expr: DataFrame): Unit = {
    assert(kernel.schema.map(f => (f.name, f.dataType)) ===
      expr.schema.map(f => (f.name, f.dataType)))
    val a = canon(kernel)
    val b = canon(expr)
    assert(a.size === b.size, s"row count ${a.size} vs ${b.size}")
    a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
      assert(ra === rb, s"row $i differs: $ra vs $rb")
    }
  }

  test("seedQualityScore kernel is bit-equal to the expression formulation") {
    val d = data
    val seeds = d.where("vec_id % 7 = 0")
    assertBitEqual(
      BruteKernels.seedQuality(d, seeds, "vec_id", "embedding", 3, 0.2),
      Similarity.seedQualityScoreExpr(d, seeds, "vec_id", "embedding", 3, 0.2))
  }

  test("hardNegatives kernel is bit-equal to the expression formulation") {
    val d = data
    val queries = d.where("vec_id % 9 = 0")
    val kernel = Similarity.hardNegatives(d, queries, "vec_id", "embedding",
      k = 5, floor = 0.1, ceiling = 0.6)
    val expr = Similarity.hardNegativesExpr(d, queries, "vec_id", "embedding",
      k = 5, floor = 0.1, ceiling = 0.6)
    assertBitEqual(kernel, expr)
  }

  test("ivfKnn kernel is bit-equal to the expression formulation") {
    val d = data
    val queries = d.where("vec_id < 10")
    val cents = d.where("vec_id % 13 = 0")
    assertBitEqual(
      Similarity.ivfKnn(d, queries, cents, "vec_id", "embedding", k = 5, nProbe = 3),
      Similarity.ivfKnnExpr(d, queries, cents, "vec_id", "embedding", k = 5, nProbe = 3))
  }

  test("ivfPqKnn kernel is bit-equal to the expression formulation") {
    val d = data
    val queries = d.where("vec_id < 10")
    val cents = d.where("vec_id % 13 = 0")
    val cb = d.where("vec_id < 16")
    assertBitEqual(
      Similarity.ivfPqKnn(d, queries, cents, cb, "vec_id", "embedding",
        dim = 16, numSubspaces = 4, k = 5, nProbe = 3),
      Similarity.ivfPqKnnExpr(d, queries, cents, cb, "vec_id", "embedding",
        dim = 16, numSubspaces = 4, k = 5, nProbe = 3))
  }

  test("kernels survive a single-row and an empty-side corpus edge") {
    val d = data.limit(1)
    val seeds = data.where("vec_id % 7 = 0")
    assertBitEqual(
      BruteKernels.seedQuality(d, seeds, "vec_id", "embedding", 3, 0.2),
      Similarity.seedQualityScoreExpr(d, seeds, "vec_id", "embedding", 3, 0.2))
    // a query set whose ONLY member is also the only corpus row: the
    // self-pair is excluded on both paths -> empty output
    val one = data.where("vec_id = 0")
    assertBitEqual(
      Similarity.hardNegatives(one, one, "vec_id", "embedding", 5, 0.0, 0.9),
      Similarity.hardNegativesExpr(one, one, "vec_id", "embedding", 5, 0.0, 0.9))
  }
}
