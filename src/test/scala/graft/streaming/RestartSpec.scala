package graft.streaming

import graft.SparkSpec
import graft.audit.Auditing
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Restart / exactly-once semantics of the committed-append streaming sink:
  * the operational claim "restartable" — a stream stopped between
  * micro-batches resumes from its checkpoint without reprocessing, and a
  * batch that crashed AFTER the sink write but BEFORE the checkpoint commit
  * replays on restart, with the `batch_id` stamp restoring an exactly-once
  * consumer view (the dedup discipline Streaming.committedSink documents).
  */
class RestartSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft_restart_").toString

  private def writeInput(dir: String, name: String, ids: Range): Unit =
    ids.map(_.toLong).toDF("id").coalesce(1).write.parquet(s"$dir/$name")

  private def fileStream(in: String) =
    spark.readStream.schema("id LONG").parquet(s"$in/*")

  test("stop between micro-batches + restart from the same checkpoint: no duplicate, no missing") {
    val base = tmp()
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    val (out, ckpt) = (s"$base/out", s"$base/ckpt")

    // run 1: only the first file exists; AvailableNow drains it and stops —
    // exactly the state a deliberate stop between micro-batches leaves behind
    writeInput(in, "f1", 1 to 5)
    Streaming.committedSink(fileStream(in), out, ckpt).awaitTermination(60000)
    val afterFirst = Auditing.readCommitted(spark, out)
    assert(afterFirst.select("id").as[Long].collect().sorted.toSeq == (1L to 5L))

    // run 2: new input lands, stream restarts from the SAME checkpoint
    writeInput(in, "f2", 6 to 10)
    Streaming.committedSink(fileStream(in), out, ckpt).awaitTermination(60000)
    val ids = Auditing.readCommitted(spark, out).select("id").as[Long].collect().sorted.toSeq
    // no missing (f2 arrived), no duplicate (f1 NOT reprocessed)
    assert(ids == (1L to 10L))
    // and the two runs are distinct batches in the stamp column
    assert(Auditing.readCommitted(spark, out).select("batch_id").distinct().count() == 2)
  }

  test("crash after sink write, before checkpoint commit: batch replays; batch_id dedup restores exactly-once") {
    val base = tmp()
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    val (out, ckpt) = (s"$base/out", s"$base/ckpt")
    writeInput(in, "f1", 1 to 8)

    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def start() = fileStream(in).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // the committedSink protocol: audit-append with the batch stamp...
        Auditing.appendAuditCommitted(
          batch.withColumn("batch_id", lit(batchId))
            .withColumn("updated_at", current_timestamp()), out)
        // ...then die before Structured Streaming records the batch commit —
        // the worst-ordered crash for a non-transactional sink
        if (crashed.compareAndSet(false, true))
          throw new RuntimeException("injected crash between sink commit and checkpoint commit")
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()

    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      start().awaitTermination()
    }
    start().awaitTermination(60000) // restart: batch 0 replays (same batchId)

    val raw = Auditing.readCommitted(spark, out)
    // at-least-once really happened: the replay is VISIBLE as duplicate rows
    assert(raw.count() == 16, "replayed batch must have appended a second committed copy")
    // the documented consumer discipline recovers exactly-once
    val exact = raw.dropDuplicates("batch_id", "id")
    assert(exact.count() == 8)
    assert(exact.select("id").as[Long].collect().sorted.toSeq == (1L to 8L))
  }
}
