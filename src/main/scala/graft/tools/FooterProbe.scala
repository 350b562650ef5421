package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.readers.{ParquetRecordIndex, Readers}

/** Footer-count path probe: time the record-index PLANNING step (which
  * embeds the per-file footer row counts) against file count, on the
  * driver-loop path vs the distributed path, so the
  * driverFooterMaxFiles=1000 crossover is a recorded number rather than a
  * guess. Local-FS footer RPCs are ~free, so the local numbers bound the
  * JOB-LAUNCH overhead of the distributed path (its scaling win appears on
  * object stores where each footer open is a network round trip).
  *
  * Usage: runMain graft.tools.FooterProbe [fileCounts]
  */
object FooterProbe {
  def main(args: Array[String]): Unit = {
    val counts = args.headOption.map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(200, 1200, 2400))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_footer_").toString
    counts.foreach { n =>
      val dir = s"$base/t$n"
      (1 to n).map(i => (i.toLong, s"v$i")).toDF("k", "v")
        .coalesce(4).write.option("maxRecordsPerFile", 1).parquet(dir)
      def plan(threshold: Int): Double = {
        spark.conf.set("spark.graft.recordIndex.driverFooterMaxFiles", threshold.toString)
        val t0 = System.nanoTime()
        val idx = ParquetRecordIndex.tryAddIndex(
          spark.read.parquet(dir), Readers.RecordIndexColumn)
        require(idx.isDefined)
        (System.nanoTime() - t0) / 1e9
      }
      val driver = plan(Int.MaxValue)
      val job = plan(0)
      println(f"files=$n%5d driver-loop=$driver%6.2f s  spark-job=$job%6.2f s")
    }
    spark.stop()
  }
}
