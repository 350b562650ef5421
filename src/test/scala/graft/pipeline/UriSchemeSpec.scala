package graft.pipeline

import graft.SparkSpec
import graft.audit.Auditing
import graft.contract.{EntitySpec, FieldSpec}
import graft.readers.Readers
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A distinct URI scheme backed by the local filesystem — stands in for
  * S3/DBFS/HDFS in tests (the reference ships boto3/DBFS adapters,
  * ref: parser/file_handling/implementations/{file,s3,dbfs}.py; our engine
  * reaches object stores through Hadoop's scheme-resolved FileSystem, so
  * the code path under test is exactly the one a real `s3a://` URI takes:
  * `Path.getFileSystem` resolution by `fs.<scheme>.impl`, then FS API
  * calls, never java.io).
  */
class MockObjectStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")

  // RawLocalFileSystem's lazy permission loading builds java.io.File from
  // the scheme-qualified URI (which java.io.File rejects for non-file
  // schemes); return eager plain statuses instead — consumers here never
  // read permissions.
  private def plain(s: org.apache.hadoop.fs.FileStatus): org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(s.getLen, s.isDirectory, s.getReplication,
      s.getBlockSize, s.getModificationTime, s.getPath)
  override def listStatus(p: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(p).map(plain)
  override def getFileStatus(p: Path): org.apache.hadoop.fs.FileStatus =
    plain(super.getFileStatus(p))
}

class UriSchemeSpec extends SparkSpec {

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def register(): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", classOf[MockObjectStoreFs].getName)

  test("discovery pairs and moves submissions under a non-file URI scheme") {
    register()
    val base = tmpDir("graft_mockfs_disc")
    val landing = s"$base/landing"
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(landing))
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$landing/a.csv"), "x\n1\n")
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$landing/a.metadata.json"),
      """{"dataset_id": "ds1"}""")

    val result = Discovery.discover(spark, s"mockfs://$landing", s"mockfs://$base/processed",
      newId = () => "fixed-id")
    assert(result.received.size == 1)
    val r = result.received.head
    assert(r.dataFile.startsWith("mockfs:/")) // no authority -> single slash
    assert(r.info.datasetId.contains("ds1"))
    // the move really happened on the backing store
    assert(!new java.io.File(s"$landing/a.csv").exists())
    assert(new java.io.File(s"$base/processed/fixed-id/a.csv").exists())
  }

  test("audit append + latest-status read round-trip through the scheme") {
    register()
    val base = tmpDir("graft_mockfs_audit")
    val mgr = new graft.audit.AuditManager(spark, s"mockfs://$base/audit")
    mgr.markStatus("sub-1", "received")
    mgr.markStatus("sub-1", "finished")
    assert(mgr.statusOf("sub-1").contains("finished"))
    // parquet files landed under the backing store path
    val files = new java.io.File(s"$base/audit/processing_status").listFiles()
    assert(files != null && files.nonEmpty)
  }

  test("CSV reader reads a declared-schema entity from the scheme") {
    register()
    val base = tmpDir("graft_mockfs_csv")
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$base/n.csv"),
      "n_nationkey,n_name\n0,ALGERIA\n1,ARGENTINA\n")
    val spec = EntitySpec("nation", Seq(
      FieldSpec("n_nationkey", "long"), FieldSpec("n_name", "str")))
    val df = Readers.readCsv(spark, s"mockfs://$base/n.csv", spec)
    assert(df.count() == 2)
    assert(df.columns.contains(Readers.RecordIndexColumn))
  }

  test("latestStatus resolves audit history written across appends") {
    register()
    val base = tmpDir("graft_mockfs_latest")
    val path = s"mockfs://$base/t"
    import spark.implicits._
    def row(id: String, st: String, ts: Long) =
      Seq((id, st, new java.sql.Timestamp(ts))).toDF("submission_id", "processing_status", "updated_at")
    Auditing.appendAudit(row("s1", "received", 1000L), path)
    Auditing.appendAudit(row("s1", "finished", 2000L), path)
    val latest = Auditing.latestStatus(spark, path, Seq("submission_id"))
    assert(latest.select("processing_status").collect().map(_.getString(0)).toSeq == Seq("finished"))
  }
}
