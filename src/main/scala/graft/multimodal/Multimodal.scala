package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media are opaque `binary` payload columns with typed
  * metadata, processed in partition-sized batches.
  *
  * The Spark-side plumbing — schema, batching, partitioning, feature
  * shapes — is real and tested; the codec itself is a STUB (the image /
  * audio decode libraries are not available in this environment), marked
  * as such and swappable: `decodeFeatures` takes the decoder as a
  * parameter and ships a deterministic fake that derives a fixed-dim
  * float feature vector from the bytes.
  */
object Multimodal {

  /** Metadata struct for an opaque media payload: byte length, 256-bit
    * content hash (dedup key), and the leading magic bytes (format sniff).
    */
  def mediaMeta(bin: Column): Column = struct(
    octet_length(bin).cast("bigint").as("byte_len"),
    sha2(bin, 256).as("content_sha256"),
    lower(hex(substring(bin, 1, 8))).as("magic_hex"))

  /** Sample fixed-size frames every `stride` bytes — the binary analogue
    * of video frame sampling; pure columnar (substring on binary), no UDF.
    */
  def frameSample(bin: Column, frameSize: Int, stride: Int): Column =
    when(octet_length(bin) >= frameSize,
      transform(
        sequence(lit(0), floor((octet_length(bin) - frameSize) / stride).cast("int")),
        i => substring_index_free(bin, i * stride + 1, frameSize)))
      .otherwise(array(bin))

  // substring() only has (Column, Int, Int); expr keeps start dynamic.
  private def substring_index_free(bin: Column, start: Column, len: Int): Column =
    substr(bin, start, lit(len))

  /** STUB decoder: a real deployment plugs an image/audio codec in here
    * (not available in this container). The fake is deterministic: byte
    * histogram folded into `dim` float buckets, L2-normalized — shaped
    * exactly like a perceptual embedding so downstream operators
    * (similarity, dedup) are exercised for real.
    */
  def stubDecoder(dim: Int)(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      acc((payload(i) & 0xff) % dim) += 1f
      i += 1
    }
    val n = math.sqrt(acc.map(x => x.toDouble * x).sum).toFloat
    if (n > 0) acc.map(_ / n) else acc
  }

  /** Batched decode / feature-extract over partitions: the media analogue
    * of `mapInPandas` — each executor thread pulls its partition's rows,
    * runs the (expensive, possibly native) decoder per payload, and emits
    * the feature column. Partition-level batching means codec init cost is
    * paid once per partition, not per row.
    */
  def decodeFeatures(df: DataFrame, binCol: String, featureCol: String,
                     dim: Int = 64,
                     decoder: Array[Byte] => Array[Float] = null): DataFrame = {
    val dec = if (decoder != null) decoder else stubDecoder(dim) _
    val outSchema = StructType(df.schema.fields :+ StructField(featureCol, ArrayType(FloatType, containsNull = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](binIdx)
        val feats = if (payload == null) new Array[Float](dim) else dec(payload)
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(encoder)
  }

  /** Re-partition media rows so each task holds ~`targetBytesPerTask` of
    * payload — decode tasks are CPU-bound per byte, so size-balanced tasks
    * beat row-balanced ones when payload sizes are skewed.
    */
  def repartitionByBytes(df: DataFrame, binCol: String, targetBytesPerTask: Long): DataFrame = {
    val stats = df.agg(sum(octet_length(col(binCol)).cast("bigint"))).head()
    val totalBytes = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val parts = math.max(1, (totalBytes / math.max(1L, targetBytesPerTask)).toInt)
    df.repartition(parts)
  }
}
