package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage split for the near-dup clustering family (q_dedup_components):
  * clone collapse vs PPJoin pair generation vs the label-propagation loop,
  * with the loop's round count — backs the sf1 scaling adjudication with a
  * measured breakdown instead of a guess.
  *
  * Usage: runMain graft.tools.CcProbe [sfDir]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeIt[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-18s ${(System.nanoTime() - t0) / 1e9}%7.1f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val memb = docs.select(col("doc_id"), sha2(col("text").cast("binary"), 256).as("ch"))
      .withColumn("rep", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("ch"))))
      .select(col("doc_id"), col("rep")).persist()
    timeIt("clone-collapse")(memb.count())
    val repDocs = docs.join(
      memb.where(col("doc_id") === col("rep")).select("doc_id"), Seq("doc_id"), "left_semi")
    graft.text.Dedup.prefixFilterJoinWith(repDocs, "doc_id", "text", 3, 0.5) { pairs0 =>
      val pairs = pairs0.persist()
      val np = timeIt("ppjoin-pairs")(pairs.count())
      println(s"pairs=$np")
      val nodes = pairs.select(col("a").as("doc_id"))
        .union(pairs.select(col("b").as("doc_id"))).distinct().persist()
      timeIt("node-extract")(nodes.count())
      val comp = timeIt("label-loop") {
        val c = graft.text.Dedup.connectedComponents(nodes, pairs, "doc_id")
        c.count(); c
      }
      println(s"components=${comp.select("component").distinct().count()}")
      pairs.unpersist(); nodes.unpersist()
    }
    memb.unpersist()
    spark.stop()
  }
}
