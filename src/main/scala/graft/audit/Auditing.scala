package graft.audit

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Audit-table helpers (ref: spark/auditing.py:41-212): append-only status
  * tables partitioned by update date, queried through a latest-record window.
  * Parquet-backed here (Delta-compatible schema); the latest-record pattern is
  * the reference's only window use (ref: spark/auditing.py:143-163).
  */
object Auditing {

  /** Latest record per partition: `row_number() over (partition by ... order
    * by ... desc) == 1`. Callers supply a total order (include a unique
    * tiebreaker) for determinism.
    */
  def latestRecords(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy.map(_.desc): _*)
    df.withColumn("__rn__", row_number().over(w)).where(col("__rn__") === 1).drop("__rn__")
  }

  /** Append audit rows partitioned by `date_updated` (ref: auditing.py:33-38,
    * 122-131 — the reference coalesces to 1 file per append to keep audit
    * tables small-file-friendly; same here).
    */
  def appendAudit(df: DataFrame, path: String): Unit =
    df.withColumn("date_updated", to_date(col("updated_at")))
      .coalesce(1)
      .write.mode("append").partitionBy("date_updated").parquet(path)

  /** Read an audit table and reduce to the latest status per key. */
  def latestStatus(spark: org.apache.spark.sql.SparkSession, path: String,
                   keyCols: Seq[String]): DataFrame = {
    val df = spark.read.parquet(path)
    latestRecords(df, keyCols.map(col), Seq(col("updated_at")))
  }
}
