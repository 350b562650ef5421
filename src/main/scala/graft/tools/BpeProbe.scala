package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off probe: batched vs sequential BPE training wall-clock and job
  * count at a fixed merge budget. Appends a SCALE.md-style block to stdout
  * (copied into SCALE.md by hand after a run).
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val numMerges = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm the session
    for (batch <- Seq(1, 8, 32)) {
      val t0 = System.nanoTime()
      val n = graft.text.Bpe.trainBpe(docs, "text", numMerges, batch).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[bpe-probe] numMerges=$numMerges batch=$batch merges=$n wall=$secs%.1fs rounds=${(numMerges + batch - 1) / batch}")
    }
    spark.stop()
  }
}
