package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.contract.{Contract, EntitySpec}

/** Structured Streaming front-end for the engine.
  *
  * The reference has no streaming dataflow — its pipeline polls a landing
  * prefix for file pairs and threads per submission
  * (ref: pipeline/pipeline.py:164-196), i.e. micro-batching by files. The
  * Spark-native equivalent is a file-source stream feeding the SAME contract
  * column logic (validate + cast are pure projections, so they lift to
  * streaming unchanged), plus the streaming-only operators a training-data
  * pipeline needs: watermarked event-time aggregation and stateful
  * streaming dedup.
  */
object Streaming {

  /** Continuously ingest files appearing under `inputDir` through the data
    * contract: declared (never inferred) schema, validate + cast, typed
    * parquet out. One streaming query per entity, micro-batch = new files.
    */
  def contractStream(spark: SparkSession, inputDir: String, spec: EntitySpec,
                     format: String, outDir: String, checkpointDir: String,
                     trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(
      spec.fields.map(f => org.apache.spark.sql.types.StructField(
        f.name, org.apache.spark.sql.types.StringType)))
    val raw = format match {
      case "csv"  => spark.readStream.schema(schema).option("header", true).csv(inputDir)
      case "json" => spark.readStream.schema(schema).json(inputDir)
      case other  => throw new IllegalArgumentException(s"unsupported stream format: '$other'")
    }
    Contract.cast(raw, spec)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .start()
  }

  /** Watermarked event-time windowed aggregation — late data beyond the
    * watermark is dropped and state is bounded, so the aggregation runs
    * indefinitely at constant memory.
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowDuration: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("cnt").cast("bigint").as("cnt"))

  /** Streaming exact-dedup on key columns via the engine's own state-store
    * operator (`dropDuplicates` on a stream): codegen'd, no typed
    * serialization, watermark-evictable state when the caller adds
    * `withWatermark` upstream. Prefer this for plain first-row-wins dedup;
    * [[streamingDedup]] below shows the custom-state escape hatch.
    */
  def streamingDedupExact(rows: DataFrame, keyCols: String*): DataFrame =
    rows.dropDuplicates(keyCols)

  /** Stateful streaming exact-dedup: only the FIRST row per key passes.
    * flatMapGroupsWithState holds one boolean per key; with an event-time
    * watermark upstream the state can be timed out for bounded memory on
    * unbounded key spaces. Kept as the custom-state pattern (arbitrary
    * per-key logic); for plain dedup use [[streamingDedupExact]].
    */
  def streamingDedup(rows: DataFrame, keyCol: String): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val encoder = org.apache.spark.sql.Encoders.row(rows.schema)
    val keyIdx = rows.schema.fieldIndex(keyCol)
    rows
      .groupByKey(r => String.valueOf(r.get(keyIdx)))
      .flatMapGroupsWithState[Boolean, Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[Row], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            it.take(1) // first occurrence wins; later rows in the same batch drop too
          }
      }(implicitly[org.apache.spark.sql.Encoder[Boolean]], encoder)
  }
}
