package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** One-off probe for the round-8 ANN additions (SQ8, JL projection,
  * IVF-PQ): replicates the sf embeddings `factor`x with deterministic
  * jitter (near-dup clusters — the stress shape) and reports wall times to
  * stdout for SCALE.md.
  *
  * Usage: runMain graft.tools.AnnProbe [sfDir] [factor]
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 20
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val embs = base
      .crossJoin(spark.range(factor).select(col("id").as("r")))
      .select((col("vec_id") * factor + col("r")).as("vec_id"),
        when(col("r") === 0, col("embedding")).otherwise(
          transform(col("embedding"), (x, d) =>
            (x + pmod(col("vec_id") * 31L + col("r") * 7L + d, lit(97)).cast("float") / 1000.0f)
              .cast("float"))).as("embedding"))
      .localCheckpoint()
    val n = embs.count()
    println(s"[ann-probe] $n embeddings (factor $factor)")
    val q = embs.where(col("vec_id") < 10)
    val tJl = timed(embs.select(Similarity.jlProject(col("embedding"), 16)).count())
    println(f"[ann-probe] jlProject 64->16: $tJl%.1f s")
    val tSq = timed(Similarity.sqEncode(embs, "vec_id", "embedding", dim = 64).count())
    println(f"[ann-probe] sqEncode: $tSq%.1f s")
    val tSqKnn = timed(Similarity.sqKnn(embs, q, "vec_id", "embedding",
      dim = 64, k = 5).count())
    println(f"[ann-probe] sqKnn k=5 x 10 queries: $tSqKnn%.1f s")
    val tIvfPq = timed(Similarity.ivfPqKnn(embs, q,
      centroids = embs.where(col("vec_id") % (50L * factor) === 0),
      codebook = embs.where(col("vec_id") < 16),
      "vec_id", "embedding", dim = 64, numSubspaces = 4, k = 5, nProbe = 3).count())
    println(f"[ann-probe] ivfPqKnn: $tIvfPq%.1f s")
    spark.stop()
  }
}
