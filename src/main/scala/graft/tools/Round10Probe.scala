package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 scale probes: entity resolution (collapsed pair lane + full
  * cluster lane) and the line-grain cleaners, at a replication factor over
  * the sf dir — measured wall + cardinality evidence for SCALE.md.
  *
  * Usage: runMain graft.tools.Round10Probe [sfDir] [factor]
  */
object Round10Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // --- entity resolution at factor x rows, SATURATED name space --------
    // The name space stays 12^3 = 1728 while records grow with the factor:
    // exactly the clone-cluster regime the pre-collapse exists for. The
    // vocabulary IS the query fixture's (shared, so the probe's distance
    // properties cannot drift from what the oracle verifies).
    val wArr = array(graft.queries.LlmQueries.EntityWords.map(lit): _*)
    def pick(e: String) = element_at(wArr, (expr(e) % 12 + 1).cast("int"))
    val base = spark.read.parquet(s"$sfDir/customer.parquet")
      .crossJoin(spark.range(0, factor).toDF("r"))
      .select((col("c_custkey") + col("r") * 10000000L).as("id"),
        concat_ws(" ", pick("c_custkey"), pick("c_custkey div 12"),
          pick("c_custkey div 144")).as("name"))
    val dirty = base.select((col("id") + 1000000000L).as("id"),
      when(col("id") % 3 === 0, expr("substring(name, 1, length(name) - 1)"))
        .when(col("id") % 3 === 1, expr("substring(name, 2)"))
        .otherwise(col("name")).as("name"))
    val records = base.unionByName(dirty)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = records.count()
    println(s"[probe] records = $n (factor $factor), distinct names = " +
      records.select("name").distinct().count())

    val pairs = timed(s"collapsedPairs ${factor}x") {
      graft.text.EntityResolution.collapsedPairs(records, "id", "name", 1, 8).count()
    }
    println(s"[probe] pair rows = $pairs (output-demanded expansion)")
    val clusters = timed(s"resolveClusters ${factor}x") {
      graft.text.EntityResolution.resolveClusters(records, "id", "name",
        length(col("name")).cast("double"), 1, 8)
        .agg(count(lit(1)), count_distinct(col("entity_id"))).head()
    }
    println(s"[probe] rows=${clusters.getLong(0)} entities=${clusters.getLong(1)}")
    records.unpersist()

    // --- line-grain cleaners at factor x docs ---------------------------
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .crossJoin(spark.range(0, factor).toDF("r"))
      .select((col("doc_id") + col("r") * 10000000L).as("doc_id"),
        concat_ws("\n", substring(col("text"), 1, 60),
          lit("SHARE THIS ARTICLE"), substring(col("text"), 1, 60),
          lit("Home | About | Contact"), col("text")).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] docs = ${docs.count()}")
    timed(s"intraDocLineDedup ${factor}x") {
      graft.text.TextStats.intraDocLineDedup(docs, "doc_id", "text")
        .agg(sum(col("n_dup_lines"))).head()
    }
    timed(s"c4LineClean ${factor}x") {
      graft.text.TextStats.c4LineClean(docs, "doc_id", "text")
        .agg(sum(col("n_kept_lines"))).head()
    }
    docs.unpersist()

    // --- chat family at factor x conversations --------------------------
    val convs = spark.read.parquet(s"$sfDir/documents.parquet")
      .crossJoin(spark.range(0, factor).toDF("r"))
      .select((col("doc_id") + col("r") * 10000000L).as("doc_id"),
        when(col("doc_id") % 17 === 0,
          array(struct(lit("user").as("role"), lit("common question").as("content")),
            struct(lit("assistant").as("role"), substring(col("text"), 1, 50).as("content"))))
          .otherwise(array(
            struct(lit("user").as("role"), substring(col("text"), 1, 40).as("content")),
            struct(lit("assistant").as("role"), substring(col("text"), 41, 80).as("content")),
            struct(lit("user").as("role"), substring(col("text"), 121, 40).as("content")),
            struct(lit("assistant").as("role"), substring(col("text"), 161, 80).as("content"))))
          .as("turns"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] conversations = ${convs.count()}")
    timed(s"chat validate ${factor}x") {
      graft.text.Conversations.validate(convs, "doc_id", "turns")
        .agg(count(when(col("chat_ok"), 1))).head()
    }
    timed(s"chat dedupByPrompt ${factor}x") {
      graft.text.Conversations.dedupByPrompt(convs, "doc_id", "turns",
        size(col("turns")).cast("double"))
        .agg(count(when(col("keep"), 1))).head()
    }
    convs.unpersist()
    spark.stop()
  }
}
