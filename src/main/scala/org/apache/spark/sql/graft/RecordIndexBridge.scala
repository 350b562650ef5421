package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Contiguous 1-based record-index assignment at the InternalRow level.
  *
  * The portable formulation (`df.rdd.zipWithIndex` + `createDataFrame`)
  * decodes every row to external `Row` objects and re-encodes them — two
  * full serialization passes over the ingest. Here the index is zipped onto
  * the query's internal rows directly (`queryExecution.toRdd`) and handed
  * back through `internalCreateDataFrame`, so the only extra work over the
  * unavoidable zipWithIndex partition-count pass is one long per row.
  * Rows are appended via a reused `JoinedRow`, consistent with the scan
  * contract (buffering operators copy, as they do for any source scan).
  *
  * Lives under org.apache.spark.sql because `internalCreateDataFrame` is
  * private[sql] — same access pattern as [[ExpressionBridge]].
  */
object RecordIndexBridge {

  def zipWithRecordIndex(df: DataFrame, colName: String): DataFrame =
    zipWithRecordIndex(df, colName, 0L)

  /** `offset` shifts the assigned indices (first row = offset + 1): the
    * multi-file lexical-order reader path ([[graft.readers.Readers]])
    * indexes each file separately and stitches the per-file ranges together
    * with prior-file row counts.
    */
  def zipWithRecordIndex(df: DataFrame, colName: String, offset: Long): DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = classic.sparkSession
    val newSchema = StructType(df.schema.fields :+ StructField(colName, LongType, nullable = false))
    val rdd = classic.queryExecution.toRdd.zipWithIndex().mapPartitions[org.apache.spark.sql.catalyst.InternalRow] { it =>
      val joined = new JoinedRow
      val idxRow = new GenericInternalRow(1)
      it.map { case (row, i) =>
        idxRow.update(0, offset + i + 1L)
        joined(row, idxRow)
      }
    }
    spark.internalCreateDataFrame(rdd, newSchema)
  }
}
