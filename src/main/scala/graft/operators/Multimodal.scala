package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, batched decode / feature-extract / resize / frame-sample.
  *
  * The decode kernels themselves are STUBBED with deterministic fakes
  * (image/audio codecs are not available in this environment) — the
  * Spark-side contract is real and tested: schema, partitioning, batch
  * shape (mapPartitions processes a whole partition's rows through one
  * "decoder" instance, the same lifecycle a JNI/FFI codec needs), and
  * the metadata struct that downstream operators filter/join on.
  */
object Multimodal {

  /** media payload + metadata schema: the binary column is opaque; all
    * engine-visible facts live in the struct (prunable, filterable).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("duration_ms", LongType, nullable = false),
      StructField("codec", StringType, nullable = false))), nullable = false)))

  /** Wrap a text corpus as media rows (UTF-8 payload + metadata) — the
    * ingest step any binary modality shares.
    */
  def packText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("text/plain").as("kind"),
        lit(0).as("width"),
        lit(0).as("height"),
        lit(0L).as("duration_ms"),
        lit("utf-8").as("codec")).as("meta"))

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      payload_bytes: Int,
      feature: Array[Float])

  /** Batched "decode + feature extract": one decoder instance per
    * partition (the expensive-init lifecycle), rows streamed through it.
    * The decode itself is a deterministic fake — an 8-dim byte-histogram
    * projection of the payload — standing in for
    * `imageDecode(payload).resize(…).embed(…)`.
    */
  def decodeFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "meta.kind", "payload").mapPartitions { rows =>
      // decoder init happens once per partition, NOT per row:
      val decoder = new StubDecoder(featureDim = 8)
      rows.map { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val payload = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
        MediaFeatures(id, kind, payload.length, decoder.decode(payload))
      }
    }
  }

  /** Frame sampling for a time-indexed payload: pick every `stride`-th
    * chunk of `chunkBytes` — shape-compatible with video frame sampling;
    * runs as one pass over the payload per row.
    */
  def sampleFrames(media: DataFrame, chunkBytes: Int, stride: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val sampled = media.select("media_id", "payload").map { r =>
      val id = r.getLong(0)
      val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
      val frames = payload.grouped(chunkBytes).zipWithIndex
        .collect { case (chunk, i) if i % stride == 0 => chunk }
        .toArray
      (id, frames.length, frames.map(_.length.toLong).sum)
    }
    sampled.toDF("media_id", "n_frames", "sampled_bytes")
  }

  /** Deterministic stand-in for a native codec: byte-histogram projection.
    * Real deployments replace `decode` with the FFI call; everything
    * around it (batching, schema, nullability) stays identical.
    */
  private final class StubDecoder(featureDim: Int) extends Serializable {
    def decode(payload: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](featureDim)
      var i = 0
      while (i < payload.length) {
        acc(java.lang.Byte.toUnsignedInt(payload(i)) % featureDim) += 1f
        i += 1
      }
      if (payload.length > 0) {
        var j = 0
        while (j < featureDim) { acc(j) /= payload.length.toFloat; j += 1 }
      }
      acc
    }
  }
}
