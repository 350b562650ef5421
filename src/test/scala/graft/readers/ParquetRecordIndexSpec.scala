package graft.readers

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass parquet record indexing (`_metadata.row_index` + footer
  * offsets) and the record-index determinism invariants the golden
  * scenarios rely on (identical indices on re-read and under a different
  * partition layout, for both the parquet path and the zipWithIndex path).
  */
class ParquetRecordIndexSpec extends SparkSpec {

  private val Idx = Readers.RecordIndexColumn

  private def tmpDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_pri_")

  private def indexMap(df: DataFrame): Map[Long, Seq[Any]] =
    df.collect().map(r => r.getAs[Long](Idx) -> r.toSeq.dropRight(1)).toMap

  test("single-file parquet: indices are 1..n contiguous in file order, no zipWithIndex pass") {
    val d = tmpDir()
    import spark.implicits._
    // write in a known order via one partition
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$d/t")
    val src = spark.read.parquet(s"$d/t")
    val viaMeta = ParquetRecordIndex.tryAddIndex(src, Idx)
    assert(viaMeta.isDefined, "parquet scan must take the metadata path")
    val out = viaMeta.get.collect().sortBy(_.getAs[Long](Idx))
    assert(out.map(_.getAs[Long](Idx)).toSeq == (1L to 100L))
    // file order == write order for the single coalesced file
    assert(out.map(_.getAs[Long]("k")).toSeq == (1L to 100L))
    // and the plan carries no RDD zip stage — it is the one parquet scan
    val plan = viaMeta.get.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), s"metadata path must not materialize an RDD:\n$plan")
  }

  test("multi-file parquet: offsets follow lexical file order and are contiguous") {
    val d = tmpDir()
    import spark.implicits._
    // three files with distinct sizes so lexical order != size order
    Seq((3, 40), (1, 10), (2, 25)).foreach { case (file, n) =>
      (1 to n).map(i => (file.toLong, i.toLong)).toDF("file", "pos")
        .coalesce(1).write.parquet(s"$d/t/part_$file")
    }
    val src = spark.read.parquet(s"$d/t/part_1", s"$d/t/part_2", s"$d/t/part_3")
    val out = Readers.addRecordIndex(src)
    val byIdx = out.collect().sortBy(_.getAs[Long](Idx))
    assert(byIdx.map(_.getAs[Long](Idx)).toSeq == (1L to 75L))
    // lexical dir order part_1 < part_2 < part_3 → file 1 rows first, then 2, then 3
    assert(byIdx.map(r => (r.getAs[Long]("file"), r.getAs[Long]("pos"))).toSeq ==
      Seq.tabulate(10)(i => (1L, i + 1L)) ++ Seq.tabulate(25)(i => (2L, i + 1L)) ++
        Seq.tabulate(40)(i => (3L, i + 1L)))
  }

  test("projections over a parquet scan keep the single-pass path; filters fall back") {
    val d = tmpDir()
    import spark.implicits._
    (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v").coalesce(1).write.parquet(s"$d/t")
    val src = spark.read.parquet(s"$d/t")
    val projected = src.select(concat(col("v"), lit("!")).as("v2"), col("k"))
    assert(ParquetRecordIndex.tryAddIndex(projected, Idx).isDefined)
    // a filter changes which rows exist — reference semantics number the
    // ingested rows, so the metadata path must refuse and zipWithIndex runs
    assert(ParquetRecordIndex.tryAddIndex(src.filter(col("k") > 10), Idx).isEmpty)
    assert(ParquetRecordIndex.tryAddIndex(src.limit(5), Idx).isEmpty)
    // non-file frames refuse too
    assert(ParquetRecordIndex.tryAddIndex(Seq((1, "a")).toDF("k", "v"), Idx).isEmpty)
    // and addRecordIndex still indexes the filtered frame via the fallback
    val fb = Readers.addRecordIndex(src.filter(col("k") > 10))
    assert(fb.agg(min(col(Idx)), max(col(Idx))).head.toSeq == Seq(1L, 40L))
  }

  test("parquet path equals the zipWithIndex path on a single file") {
    val d = tmpDir()
    import spark.implicits._
    (1 to 200).map(i => (i.toLong, s"v$i")).toDF("k", "v").coalesce(1).write.parquet(s"$d/t")
    val src = spark.read.parquet(s"$d/t")
    val viaMeta = indexMap(ParquetRecordIndex.tryAddIndex(src, Idx).get.select("k", "v", Idx))
    val viaZip = indexMap(org.apache.spark.sql.graft.RecordIndexBridge
      .zipWithRecordIndex(src.select("k", "v"), Idx))
    assert(viaMeta == viaZip)
  }

  test("record-index determinism: identical indices on re-read and under a different split layout") {
    val d = tmpDir()
    // a CSV big enough to split when maxPartitionBytes is tiny
    val lines = (1 to 2000).map(i => s"$i,name_$i,city_${i % 7}")
    java.nio.file.Files.writeString(d.resolve("people.csv"),
      lines.mkString("\n") + "\n")
    val spec = graft.contract.EntitySpec("people", Seq(
      graft.contract.FieldSpec("id", "long"), graft.contract.FieldSpec("name", "str"),
      graft.contract.FieldSpec("city", "str")))
    def readCsvIdx(): Map[Long, Seq[Any]] = indexMap(
      Readers.readCsv(spark, d.resolve("people.csv").toString, spec,
        Readers.CsvOptions(header = false)))
    val first = readCsvIdx()
    val second = readCsvIdx()
    assert(first == second, "re-read must assign identical record indices")
    assert(first.size == 2000 && first.keySet == (1L to 2000L).toSet)
    assert(first(1L).head == "1" && first(2000L).head == "2000")
    // force a multi-split read of the same file: indices must not move
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
      val split = readCsvIdx()
      assert(split == first, "a different split layout must not move record indices")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)

    // same invariant for the parquet metadata path
    import spark.implicits._
    (1 to 2000).map(i => (i.toLong, s"v$i")).toDF("k", "v").coalesce(1).write.parquet(s"$d/t")
    val src = spark.read.parquet(s"$d/t")
    val p1 = indexMap(Readers.addRecordIndex(src))
    val p2 = try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
      indexMap(Readers.addRecordIndex(spark.read.parquet(s"$d/t")))
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
    assert(p1 == p2)
  }

  test("footer counting above the driver threshold runs as a Spark job with identical indices") {
    // a ~1.2k-file table: one footer RPC per file is where the driver-side
    // loop stops scaling (a 100 TB table is 10^5 files) — above
    // spark.graft.recordIndex.driverFooterMaxFiles the file list becomes a
    // small Spark job. Indices must be bit-identical on both paths.
    val d = tmpDir()
    import spark.implicits._
    val nFiles = 1200
    // maxRecordsPerFile=1 guarantees exactly nFiles one-row files
    // (repartition(n) leaves empty partitions, which write no file)
    (1 to nFiles).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .coalesce(4).write.option("maxRecordsPerFile", 1).parquet(s"$d/t")
    val files = new java.io.File(s"$d/t").listFiles().count(_.getName.endsWith(".parquet"))
    assert(files > 1000, s"fixture must exceed the threshold, got $files files")
    val src = spark.read.parquet(s"$d/t")
    // distributed path (default threshold 1000 < 1200 files)
    val viaJob = ParquetRecordIndex.tryAddIndex(src, Idx)
    assert(viaJob.isDefined)
    val distributed = indexMap(viaJob.get.select("k", "v", Idx))
    assert(distributed.size == nFiles && distributed.keySet == (1L to nFiles.toLong).toSet)
    // force the driver path on the SAME table and compare
    val driverSide = try {
      spark.conf.set("spark.graft.recordIndex.driverFooterMaxFiles", "100000")
      indexMap(ParquetRecordIndex.tryAddIndex(spark.read.parquet(s"$d/t"), Idx)
        .get.select("k", "v", Idx))
    } finally spark.conf.unset("spark.graft.recordIndex.driverFooterMaxFiles")
    assert(distributed == driverSide,
      "distributed footer counting must produce identical indices to the driver loop")
  }

  test("the multi-file index plan carries the loud normalization guard, not a silent inner join") {
    // the multi-file index joins `_metadata.file_path` against normalized
    // inputFiles paths; the failure mode being guarded is a normalization
    // mismatch SILENTLY dropping rows through an inner join. A real
    // mismatch cannot be staged through the public surface (both sides
    // normalize consistently on every local filesystem — which is the
    // point), so this pins the guard structurally: the join is LEFT outer
    // and a raise_error names the offset map on the null branch.
    val d = tmpDir()
    import spark.implicits._
    Seq(1, 2).foreach { i =>
      (1 to 10).map(j => (i.toLong, j.toLong)).toDF("f", "p")
        .coalesce(1).write.parquet(s"$d/t/part_$i")
    }
    val src = spark.read.parquet(s"$d/t/part_1", s"$d/t/part_2")
    val planned = ParquetRecordIndex.tryAddIndex(src, Idx).get
    val analyzed = planned.queryExecution.analyzed.toString
    assert(analyzed.contains("raise_error"),
      s"multi-file plan must carry the raise_error guard:\n$analyzed")
    assert(analyzed.contains("LeftOuter"),
      s"multi-file plan must left-join the offset map (inner drops rows silently):\n$analyzed")
    // and the guarded plan still computes the right indices
    val out = planned.collect().sortBy(_.getAs[Long](Idx))
    assert(out.map(_.getAs[Long](Idx)).toSeq == (1L to 20L))
  }
}
