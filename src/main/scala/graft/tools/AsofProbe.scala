package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.rules.AsofJoin

/** Hot-key probe for the as-of join: a power-law key set (one key holding
  * half of all rows) at millions of rows, comparing the plain
  * union-sort-carry plan (one sorted task per key) against the two-level
  * (key, hour-bucket) carry. Verifies bit-identical output via a full-row
  * hash before trusting either timing.
  *
  * Usage: runMain graft.tools.AsofProbe [rowsPerSide]
  */
object AsofProbe {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val hotPct = if (args.length > 1) args(1).toInt else 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 50% of rows on ONE key, the rest uniform over 10k keys; timestamps
    // spread over ~1000 hours so hour-bucketing yields ~1000 buckets.
    val base = lit("2024-01-01 00:00:00").cast("timestamp")
    def side(tag: String) = spark.range(n)
      .select(col("id"),
        when(col("id") % 100 < hotPct, "hot")
          .otherwise(concat(lit("u"), pmod(xxhash64(col("id"), lit(tag)), lit(10000))))
          .as("k"),
        timestamp_seconds(unix_timestamp(base) +
          pmod(xxhash64(col("id"), lit(tag), lit("ts")), lit(1000L * 3600))).as("ts"))
    val left = side("l").withColumnRenamed("id", "event_id")
    val right = side("r").withColumnRenamed("id", "rid")
      .withColumn("v", (pmod(xxhash64(col("rid")), lit(100000)) / lit(100.0)))

    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      // order-independent full-row checksum; XOR cannot overflow under ANSI
      val r = df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).head()
      (r.getLong(0), r.getLong(1))
    }
    val plainDf = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "ts",
      rightPayload = Seq("rid", "v"), rightTieBreak = "rid")
    val bucketedDf = AsofJoin.asofJoinBucketed(left, right, Seq("k"), "ts", "ts",
      rightPayload = Seq("rid", "v"), rightTieBreak = "rid",
      bucket = t => date_trunc("hour", t))
    val (plainSum, plainSec) = timed(checksum(plainDf))
    val (bucketedSum, bucketedSec) = timed(checksum(bucketedDf))
    println(f"# As-of hot-key probe: ${n} rows/side, one key = ${hotPct}%% of rows, ~1000 hour buckets")
    println(f"plain (one sorted task per key): ${plainSec}%.1f s, rows/hash ${plainSum}")
    println(f"bucketed (two-level carry):      ${bucketedSec}%.1f s, rows/hash ${bucketedSum}")
    println(s"outputs identical: ${plainSum == bucketedSum}")
    spark.stop()
  }
}
