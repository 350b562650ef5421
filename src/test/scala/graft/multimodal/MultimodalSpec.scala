package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def media = Seq(
    (1L, "a short payload"),
    (2L, "a much longer payload with enough bytes to produce several frames of data")
  ).toDF("id", "text").withColumn("payload", col("text").cast("binary"))

  test("mediaMeta computes byte length, content hash, and magic prefix") {
    val out = media.select(col("id"), Multimodal.mediaMeta(col("payload")).as("m"))
      .select("id", "m.byte_len", "m.content_sha256", "m.magic_hex")
    val r1 = out.where("id = 1").head()
    assert(r1.getAs[Long]("byte_len") == 15L)
    assert(r1.getAs[String]("content_sha256").length == 64)
    // "a short " -> hex
    assert(r1.getAs[String]("magic_hex") == "612073686f727420")
  }

  test("frameSample slides fixed windows; short payloads yield one whole frame") {
    val out = media.select(col("id"),
      Multimodal.frameSample(col("payload"), frameSize = 32, stride = 16).as("frames"))
    val short = out.where("id = 1").select(size(col("frames"))).as[Int].head()
    assert(short == 1)
    val longFrames = out.where("id = 2").select(col("frames")).as[Seq[Array[Byte]]].head()
    // 74 bytes -> floor((74-32)/16)+1 = 3 frames of 32 bytes
    assert(longFrames.size == 3)
    assert(longFrames.forall(_.length == 32))
  }

  test("decodeFeatures emits deterministic fixed-dim normalized features") {
    val out1 = Multimodal.decodeFeatures(media, "payload", "features", dim = 16)
      .select("id", "features").as[(Long, Seq[Float])].collect().toMap
    val out2 = Multimodal.decodeFeatures(media, "payload", "features", dim = 16)
      .select("id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(out1 == out2)
    assert(out1.values.forall(_.size == 16))
    val norm = math.sqrt(out1(1L).map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("decodeFeatures accepts a custom decoder") {
    val out = Multimodal.decodeFeatures(media, "payload", "features", dim = 2,
      decoder = b => Array(b.length.toFloat, 0f))
      .select("id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(out(1L) == Seq(15f, 0f))
  }

  test("repartitionByBytes sizes partitions by payload volume") {
    val out = Multimodal.repartitionByBytes(media, "payload", targetBytesPerTask = 40)
    assert(out.rdd.getNumPartitions == 2) // ~89 bytes total / 40 -> 2
    assert(out.count() == 2)
  }
}
