package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: co-located joins without a shuffle.
  *
  * At 100 TB the dominant cost of a repeated big-big equi-join is the
  * shuffle of both sides on every run. Writing both tables bucketed (and
  * sorted) on the join key pins a consistent hash partitioning into the
  * table layout, so Catalyst plans the join with ZERO Exchange nodes — each
  * task sort-merges bucket i of both sides. The reference has no analogue
  * (its per-submission files are small); this is the Spark-native design
  * for the engine's refdata-at-scale and dedup-corpus joins.
  *
  * Bucket metadata lives in the session catalog (`saveAsTable` with an
  * explicit `path`), which is the mechanism Spark uses to trust the layout
  * — a plain `spark.read.parquet` of the same files would not know the
  * bucketing and would shuffle again.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted parquet table at `path`,
    * registered as `table` in the session catalog.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    keys: Seq[String], numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata comes from the catalog). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
