package graft.readers

import scala.annotation.tailrec
import scala.collection.parallel.CollectionConverters._
import scala.util.Try

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._

/** Single-pass record indexing for parquet-backed frames.
  *
  * The portable path (`zipWithIndex`, [[Readers.addRecordIndex]]) costs TWO
  * scans of the ingest bytes: one to count partition sizes, one to emit —
  * and forces a persist when two lineages consume the indexed frame. For
  * parquet scans Spark generates `_metadata.row_index` (the row's ordinal
  * within its file) directly inside the reader, so the 1-based contiguous
  * `__record_index__` is
  *
  *   per-file offset (footer-only row counts, lexical path order)
  *     + _metadata.row_index + 1
  *
  * with ZERO extra data passes: footers are metadata reads (no column IO),
  * and the index is attached inside the one real scan. Because the index is
  * a pure function of (file, position) it is also deterministic under task
  * retry and under any partition/split layout — strictly stronger than
  * zipWithIndex, whose order follows Spark's size-desc split packing.
  *
  * DELIBERATE DEVIATION (multi-file inputs only): rows are numbered in
  * LEXICAL file-path order, while the zipWithIndex fallback (and the
  * reference, which numbers whatever order the engine scans) follows
  * Spark's size-desc split packing. A submission is ONE file — there the
  * two paths agree byte-for-byte — and on multi-file tables a
  * content-independent, layout-stable order is the property worth keeping
  * (identical indices across repartitions and retries). Documented in
  * COVERAGE.md; see ParquetRecordIndexSpec for the agreement matrix.
  *
  * Applies only when the frame is deterministic per-row projections over ONE
  * parquet scan (no filter/limit/join/aggregate — those change which rows
  * exist, and the reference semantics (ref: spark_helpers.py:489-499) number
  * the rows actually ingested). Anything else returns None and the caller
  * falls back to zipWithIndex.
  */
object ParquetRecordIndex {

  def tryAddIndex(df: DataFrame, colName: String): Option[DataFrame] =
    Try(attempt(df, colName)).toOption.flatten

  private def attempt(df: DataFrame, colName: String): Option[DataFrame] = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = classic.sparkSession

    @tailrec def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case Project(exprs, child) if exprs.forall(_.deterministic) => unwrap(child)
      case SubqueryAlias(_, child)                                => unwrap(child)
      case other                                                  => other
    }

    unwrap(classic.queryExecution.analyzed) match {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation if fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
            // Normalize to the URI form `_metadata.file_path` reports
            // (`file:/x/y`), not the `file:///x/y` form inputFiles returns.
            val files = fs.location.inputFiles
              .map(f => new Path(new java.net.URI(f)).toString).sorted
            if (files.isEmpty) return None
            val counts = footerCounts(spark, files)
            val offsets = files.zip(files.scanLeft(0L)((acc, f) => acc + counts(f))).toMap
            val withIdx =
              if (files.length == 1)
                df.withColumn(colName, col("_metadata.row_index") + 1L)
              else {
                // Broadcast map-side lookup (O(1) hash probe per row); a
                // literal-map element_at would be a per-row linear scan over
                // the file list. Both metadata subfields must be projected
                // to plain columns BEFORE the join — `_metadata` is only
                // resolvable against the file-source relation itself.
                // LEFT join + raise_error on a miss: the map key is our
                // NORMALIZED inputFiles path and the probe is what the
                // reader reports as `_metadata.file_path` — if those two
                // renderings ever diverge (URL-encoding, scheme shorthand on
                // some filesystem), an inner join would silently DROP the
                // rows of the mismatched file and downstream record counts
                // would be quietly wrong. Failing loudly names the defect
                // and the remedy instead.
                import spark.implicits._
                val offsetsDf = broadcast(
                  offsets.toSeq.toDF("__graft_file__", "__graft_off__"))
                df.withColumn("__graft_file__", col("_metadata.file_path"))
                  .withColumn("__graft_ri__", col("_metadata.row_index"))
                  .join(offsetsDf, Seq("__graft_file__"), "left")
                  .withColumn("__graft_off__", coalesce(
                    col("__graft_off__"),
                    raise_error(concat(
                      lit("graft record index: _metadata.file_path '"),
                      col("__graft_file__"),
                      lit("' is not in the footer offset map — path normalization " +
                        "mismatch between inputFiles and the parquet reader; " +
                        "use Readers.addRecordIndex's zipWithIndex fallback")))
                      .cast("long")))
                  .withColumn(colName, col("__graft_ri__") + col("__graft_off__") + 1L)
                  .drop("__graft_file__", "__graft_off__", "__graft_ri__")
              }
            Some(withIdx.select(df.columns.map(c => col(s"`$c`")) :+ col(s"`$colName`"): _*))
          case _ => None
        }
      case _ => None
    }
  }

  /** Per-file footer row counts. Footer reads are metadata-only (no data
    * pages touched), but each is one filesystem RPC: a driver-side loop is
    * fine at 10³ files and a driver RPC fan-out bottleneck at a 100 TB
    * table's 10⁵. Above `spark.graft.recordIndex.driverFooterMaxFiles`
    * (default 1000) the FILE LIST itself becomes a tiny Spark job — each
    * task opens its own slice of footers and ships back (path, rowCount)
    * pairs, which is #files tuples of metadata, not data. Below it the
    * driver's parallel loop avoids a job launch entirely.
    */
  private[readers] def footerCounts(
      spark: org.apache.spark.sql.SparkSession, files: Seq[String]): Map[String, Long] = {
    val threshold = spark.conf.getOption("spark.graft.recordIndex.driverFooterMaxFiles")
      .map(_.toInt).getOrElse(1000)
    val conf = spark.sparkContext.hadoopConfiguration
    if (files.length <= threshold)
      files.toIndexedSeq.par.map { f =>
        val rdr = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
        try f -> rdr.getRecordCount finally rdr.close()
      }.seq.toMap
    else {
      // Hadoop Configuration is a Writable, not Serializable — ship it the
      // way Spark's own datasources do.
      val serConf = new org.apache.spark.SerializableWritable(conf)
      val slices = math.min(files.length, spark.sparkContext.defaultParallelism * 4)
      spark.sparkContext.parallelize(files, slices).map { f =>
        val rdr = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f), serConf.value))
        try f -> rdr.getRecordCount finally rdr.close()
      }.collect().toMap
    }
  }
}
