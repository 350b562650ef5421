package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage-by-stage timing probe for a registered query's subplans.
  * Not part of the engine: a developer tool for finding where a bench line's
  * seconds actually go (run with `sbt "runMain graft.tools.Probe"`).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import graft.contract.{Contract, EntitySpec, FieldSpec}
    import graft.readers.Readers
    import org.apache.spark.sql.functions._

    val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")
    t("base count")(base.count())
    val stringified = Contract.stringify(base)
    t("stringify count")(stringified.count())
    val indexed = Readers.addRecordIndex(stringified)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("indexed persist+count")(indexed.count())
    val spec = EntitySpec("lineitem", Seq(
      FieldSpec("l_orderkey", "long", mandatory = true),
      FieldSpec("l_linenumber", "long", mandatory = true),
      FieldSpec("l_quantity", "double", le = Some(BigDecimal(49))),
      FieldSpec("l_returnflag", "str", regex = Some("^[AN]$")),
      FieldSpec("l_shipdate", "datetime")))
    val (typed, messages) = Contract(indexed, spec)
    t("typed count")(typed.count())
    t("messages count")(messages.count())
    t("messages count again")(messages.count())
    val out = Contract.filterContractErrors(typed, messages).select("l_orderkey", "l_linenumber")
    t("reject anti-join count")(out.count())
    t("reject anti-join count again")(out.count())
    spark.stop()
  }
}
