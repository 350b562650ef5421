package graft.streaming

import graft.SparkSpec
import graft.contract.{EntitySpec, FieldSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft_stream_").toString

  test("contractStream ingests files through validate+cast to typed parquet") {
    val base = tmp()
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$in/batch1.csv"),
      "id,name\n1,ada\nx,broken\n")
    val spec = EntitySpec("people", Seq(FieldSpec("id", "long"), FieldSpec("name", "str")))
    val q = Streaming.contractStream(spark, in, spec, "csv", s"$base/out", s"$base/ckpt")
    q.awaitTermination(60000)
    val out = spark.read.parquet(s"$base/out")
    assert(out.schema("id").dataType.simpleString == "bigint")
    assert(rows(out) == Set(Seq(1L, "ada"), Seq(null, "broken"))) // failed cast -> null
  }

  test("windowedCounts aggregates per event-time window with a watermark") {
    val stream = MemoryStream[(java.sql.Timestamp, String)](spark)
    val df = Streaming.windowedCounts(
      stream.toDF().toDF("ts", "k"), "ts", "k", "10 minutes", "5 minutes")
    val q = df.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append()).start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    stream.addData((t(1), "a"), (t(2), "a"), (t(11), "b"))
    q.processAllAvailable()
    stream.addData((t(40), "a")) // advances the watermark past the first windows
    q.processAllAvailable()
    val got = spark.table("win_counts")
      .select("window_start", "k", "cnt").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(got == Set(
      ("2024-01-01 10:00:00.0", "a", 2L),
      ("2024-01-01 10:10:00.0", "b", 1L)))
  }

  test("windowedCounts sliding: each event lands in window/slide overlapping windows") {
    val stream = MemoryStream[(java.sql.Timestamp, String)](spark)
    val df = Streaming.windowedCounts(
      stream.toDF().toDF("ts", "k"), "ts", "k", "30 minutes", "5 minutes",
      slideDuration = Some("10 minutes"))
    val q = df.writeStream.format("memory").queryName("win_sliding")
      .outputMode(OutputMode.Append()).start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    stream.addData((t(1), "a"), (t(20), "a"))
    q.processAllAvailable()
    stream.addData((t(59), "a")) // advances watermark past every earlier window
    q.processAllAvailable()
    val got = spark.table("win_sliding")
      .select("window_start", "k", "cnt").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(2))).toMap
    q.stop()
    // 10:01 -> windows starting 09:40, 09:50, 10:00; 10:20 -> 10:00, 10:10, 10:20
    assert(got("2024-01-01 09:40:00.0") == 1L && got("2024-01-01 09:50:00.0") == 1L)
    assert(got("2024-01-01 10:00:00.0") == 2L) // both events overlap here
    assert(got("2024-01-01 10:10:00.0") == 1L && got("2024-01-01 10:20:00.0") == 1L)
  }

  test("windowedCounts accepts a TIMESTAMP_NTZ event-time column (casts to LTZ)") {
    // parquet timestamp[us] without UTC adjustment surfaces as NTZ; the
    // operator owns the LTZ normalization so watermarks still work
    val stream = MemoryStream[(java.time.LocalDateTime, String)](spark)
    val src = stream.toDF().toDF("ts", "k")
    assert(src.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    val df = Streaming.windowedCounts(src, "ts", "k", "10 minutes", "5 minutes")
    val q = df.writeStream.format("memory").queryName("win_counts_ntz")
      .outputMode(OutputMode.Append()).start()
    def t(m: Int) = java.time.LocalDateTime.parse(f"2024-01-01T10:$m%02d:00")
    stream.addData((t(1), "a"), (t(2), "a"))
    q.processAllAvailable()
    stream.addData((t(40), "a"))
    q.processAllAvailable()
    val got = spark.table("win_counts_ntz")
      .select("window_start", "k", "cnt").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(got == Set(("2024-01-01 10:00:00.0", "a", 2L)))
  }

  test("intervalJoin matches right rows inside [leftTs, leftTs + within] per key") {
    val views = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val buys = MemoryStream[(Long, java.sql.Timestamp)](spark)
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val joined = Streaming.intervalJoin(
      views.toDF().toDF("user_id", "view_ts"),
      buys.toDF().toDF("user_id", "purchase_ts"),
      "user_id", "view_ts", "purchase_ts",
      watermarkDelay = "2 hours", within = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("ij_out")
      .outputMode(OutputMode.Append()).start()
    views.addData((1L, t(0)), (2L, t(0)))
    buys.addData((1L, t(10)), // in window -> match
      (1L, t(45)), // past view_ts+30m -> no match
      (2L, t(0)), // boundary: equal timestamps match
      (3L, t(5))) // no view for user 3
    q.processAllAvailable()
    val got = spark.table("ij_out")
      .select("user_id", "view_ts", "purchase_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString))
      .toSet
    q.stop()
    assert(got == Set(
      (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0"),
      (2L, "2024-01-01 10:00:00.0", "2024-01-01 10:00:00.0")))
  }

  test("intervalJoinLeftOuter emits unmatched left rows after the watermark passes") {
    val views = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val buys = MemoryStream[(Long, java.sql.Timestamp)](spark)
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")
    val joined = Streaming.intervalJoinLeftOuter(
      views.toDF().toDF("user_id", "view_ts"),
      buys.toDF().toDF("user_id", "purchase_ts"),
      "user_id", "view_ts", "purchase_ts",
      watermarkDelay = "10 minutes", within = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("ijo_out")
      .outputMode(OutputMode.Append()).start()
    views.addData((1L, t(0)), (2L, t(0))) // user 2 never converts
    buys.addData((1L, t(10)))
    q.processAllAvailable()
    // advance BOTH watermarks far past t0+30m: the unmatched view flushes
    views.addData((9L, t(120)))
    buys.addData((9L, t(121)))
    q.processAllAvailable()
    val got = spark.table("ijo_out")
      .select("user_id", "view_ts", "purchase_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        Option(r.getTimestamp(2)).map(_.toString))).toSet
    q.stop()
    assert(got.contains((1L, "2024-01-01 10:00:00.0", Some("2024-01-01 10:10:00.0"))))
    assert(got.contains((2L, "2024-01-01 10:00:00.0", None)), s"unmatched row missing: $got")
    assert(got.contains((9L, "2024-01-01 12:00:00.0", Some("2024-01-01 12:01:00.0"))))
  }

  test("sessionize merges gap-windows per key and emits once the watermark passes") {
    val stream = MemoryStream[(java.sql.Timestamp, Long)](spark)
    val df = Streaming.sessionize(
      stream.toDF().toDF("ts", "user_id"), "ts", "user_id",
      gap = "10 minutes", watermarkDelay = "1 minute")
    val q = df.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // user 1: two events 5 min apart (one session), arriving OUT of order;
    // then an event 15 min later (new session). user 2: lone event.
    stream.addData((t(5), 1L), (t(0), 1L), (t(2), 2L))
    q.processAllAvailable()
    // batch 1 watermark is 10:04 — no session end (+gap) passed, none emit
    assert(spark.table("sess_out").count() == 0)
    stream.addData((t(20), 1L)) // watermark -> 10:19: closes both early sessions
    q.processAllAvailable()
    def snap() = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
    assert(snap() == Set(
      (1L, "2024-01-01 10:00:00.0", 2L), // 10:00+10:05 merged despite disorder
      (2L, "2024-01-01 10:02:00.0", 1L)))
    stream.addData((t(59), 9L)) // watermark -> 10:58, closes user 1's 2nd session
    q.processAllAvailable()
    val got = snap()
    q.stop()
    assert(got == Set(
      (1L, "2024-01-01 10:00:00.0", 2L),
      (1L, "2024-01-01 10:20:00.0", 1L),
      (2L, "2024-01-01 10:02:00.0", 1L)))
  }

  test("windowSpikes emits closed windows with adjacent-prev counts and gap resets") {
    val stream = MemoryStream[(java.sql.Timestamp, String)](spark)
    val df = Streaming.windowSpikes(
      stream.toDF().toDF("ts", "k"), "ts", "k",
      windowMs = 10 * 60 * 1000L, watermarkDelay = "5 minutes")
    val q = df.writeStream.format("memory").queryName("spikes_out")
      .outputMode(OutputMode.Append()).start()
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // key a: 2 events in w10:00, 1 in w10:10, gap at w10:20, 1 in w10:30
    stream.addData((t(10, 1), "a"), (t(10, 2), "a"), (t(10, 12), "a"), (t(10, 31), "a"))
    q.processAllAvailable()
    stream.addData((t(11, 30), "z")) // watermark -> 11:25, closes a's windows
    q.processAllAvailable()
    val got = spark.table("spikes_out").where("key = 'a'").collect()
      .map(r => (r.getTimestamp(1).toString, r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      ("2024-01-01 10:00:00.0", 2L, 0L, 2000L), // first window: prev 0
      ("2024-01-01 10:10:00.0", 1L, 2L, 500L),  // adjacent: ratio vs 2
      ("2024-01-01 10:30:00.0", 1L, 0L, 1000L))) // after a gap: prev resets to 0
    // the z window (ends 11:40) is still open — nothing emitted for it
    assert(spark.table("spikes_out").where("key = 'z'").count() == 0)
    q.stop()
  }

  test("windowSpikes keeps a closed window's count for its late-closing successor") {
    val stream = MemoryStream[(java.sql.Timestamp, String)](spark)
    val df = Streaming.windowSpikes(
      stream.toDF().toDF("ts", "k"), "ts", "k",
      windowMs = 10 * 60 * 1000L, watermarkDelay = "1 minute")
    val q = df.writeStream.format("memory").queryName("spikes_adj")
      .outputMode(OutputMode.Append()).start()
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    stream.addData((t(10, 5), "b"))
    q.processAllAvailable()
    stream.addData((t(10, 16), "z")) // wm 10:15: b's w10:00 closes (prev 0)
    q.processAllAvailable()
    // b's w10:10 data arrives ON TIME (10:17 >= wm) but AFTER its
    // predecessor already closed: the retained closed count must still
    // supply prev = 1 when w10:10 eventually closes
    stream.addData((t(10, 17), "b"))
    q.processAllAvailable()
    stream.addData((t(10, 31), "z")) // wm 10:30: b's w10:10 closes via timeout
    q.processAllAvailable()
    val got = spark.table("spikes_adj").where("key = 'b'").collect()
      .map(r => (r.getTimestamp(1).toString, r.getLong(2), r.getLong(3))).toSet
    q.stop()
    assert(got == Set(
      ("2024-01-01 10:00:00.0", 1L, 0L),
      ("2024-01-01 10:10:00.0", 1L, 1L)))
  }

  test("committedSink writes each micro-batch through the commit-marker protocol") {
    val base = tmp()
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$in/b1.csv"), "id\n1\n2\n")
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$in/b2.csv"), "id\n3\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val stream = spark.readStream.schema(schema)
      .option("header", true).option("maxFilesPerTrigger", 1).csv(in)
    val q = Streaming.committedSink(stream, s"$base/audit", s"$base/ckpt")
    q.awaitTermination(120000)
    // committed reads see every row exactly once, stamped with a batch id
    val back = graft.audit.Auditing.readCommitted(spark, s"$base/audit")
    assert(back.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(back.select("batch_id").distinct().count() == 2) // one per file batch
    // every data file is covered by a commit marker (no torn batch visible)
    val commits = new java.io.File(s"$base/audit/_commits").listFiles()
      .filterNot(_.getName.startsWith(".")) // local-FS .crc sidecars
    assert(commits.length == 2, commits.mkString(","))
  }

  test("streamingDedup dedups within the horizon and re-emits after state eviction") {
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)](spark)
    val df = stream.toDF().toDF("ts", "id", "v").withWatermark("ts", "0 seconds")
    val deduped = Streaming.streamingDedup(df, "id", "ts", horizonMs = 10 * 60 * 1000)
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    stream.addData((t(1), 1L, "first"), (t(1), 1L, "dup-same-batch"), (t(2), 2L, "two"))
    q.processAllAvailable()
    stream.addData((t(3), 1L, "dup-within-horizon"), (t(5), 3L, "three"))
    q.processAllAvailable()
    // watermark jumps to 10:40, past every key's firstSeen + 10 min —
    // their state times out and is dropped (bounded state on unbounded keys)
    stream.addData((t(40), 9L, "advance"))
    q.processAllAvailable()
    // key 1 re-emits: its state was evicted, so this is a fresh first-seen
    stream.addData((t(41), 1L, "after-horizon"))
    q.processAllAvailable()
    val got = spark.table("dedup_out").collect().map(r => (r.getLong(1), r.getString(2))).toSet
    q.stop()
    assert(got == Set((1L, "first"), (2L, "two"), (3L, "three"),
      (9L, "advance"), (1L, "after-horizon")))
  }

  test("crossDedupSink flags batch-vs-reference near-dups only, per micro-batch") {
    val wd = java.nio.file.Files.createTempDirectory("graft_cross_sink").toString
    val reference = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "one two three four five six")).toDF("doc_id", "text")
    val stream = MemoryStream[(Long, String)](spark)
    val q = Streaming.crossDedupSink(stream.toDF().toDF("doc_id", "text"),
      reference, "doc_id", "text", s"$wd/out", s"$wd/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    // batch 0: one near-dup of ref 100, one novel doc, and an exact pair
    // WITHIN the batch (1, 2) that must NOT be flagged (cross-side only)
    stream.addData(
      (1L, "alpha beta gamma delta epsilon eta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "totally different words entirely here now"))
    q.processAllAvailable()
    // batch 1: a near-dup of ref 101 arrives later
    stream.addData((4L, "one two three four five seven"))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(s"$wd/out")
      .select("a", "b", "batch_id").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 100L, 0L), (2L, 100L, 0L), (4L, 101L, 1L)), got.toString)
  }

  test("streamingDedupWithinWatermark dedups inside the delay and re-emits after expiry") {
    // the engine-native bounded-state dedup: a key's state lives until the
    // watermark passes first-seen + delay; a later duplicate is a fresh row
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)](spark)
    val df = stream.toDF().toDF("ts", "id", "v").withWatermark("ts", "10 minutes")
    val deduped = Streaming.streamingDedupWithinWatermark(df, "id")
    val q = deduped.writeStream.format("memory").queryName("dedup_wm_out")
      .outputMode(OutputMode.Append()).start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    stream.addData((t(1), 1L, "first"), (t(1), 1L, "dup-same-batch"), (t(2), 2L, "two"))
    q.processAllAvailable()
    stream.addData((t(3), 1L, "dup-within-delay"))
    q.processAllAvailable()
    // watermark jumps far past first-seen + 10 min: state evicts
    stream.addData((t(40), 9L, "advance"))
    q.processAllAvailable()
    stream.addData((t(41), 1L, "after-expiry"))
    q.processAllAvailable()
    val got = spark.table("dedup_wm_out").collect()
      .map(r => (r.getLong(1), r.getString(2))).toSet
    q.stop()
    assert(got == Set((1L, "first"), (2L, "two"), (9L, "advance"), (1L, "after-expiry")))
  }

  test("streamingDedup survives rows with a null event time") {
    val stream = MemoryStream[(Option[java.sql.Timestamp], Long, String)](spark)
    val df = stream.toDF().toDF("ts", "id", "v").withWatermark("ts", "0 seconds")
    val deduped = Streaming.streamingDedup(df, "id", "ts", horizonMs = 10 * 60 * 1000)
    val q = deduped.writeStream.format("memory").queryName("dedup_nullts")
      .outputMode(OutputMode.Append()).start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    stream.addData((None, 7L, "null-ts-first"), (Some(t(1)), 8L, "timed"))
    q.processAllAvailable()
    stream.addData((None, 7L, "null-ts-dup"))
    q.processAllAvailable()
    val got = spark.table("dedup_nullts").collect()
      .map(r => (r.getLong(1), r.getString(2))).toSet
    q.stop()
    assert(got == Set((7L, "null-ts-first"), (8L, "timed"))) // no NPE, deduped
  }
}
