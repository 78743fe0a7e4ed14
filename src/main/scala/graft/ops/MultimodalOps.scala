package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. The Spark-side machinery — schema, partitioning,
  * per-partition batch shape — is real and tested; the codec step is a
  * clearly-marked DETERMINISTIC STUB (image/audio libraries are not in this
  * container). Swapping `stubDecode` for a real decoder is the only change
  * needed in production.
  */
object MultimodalOps {

  final case class MediaMeta(media_ref: String, modality: String, width: Int, height: Int,
      duration_ms: Int, byte_len: Int, feature: Array[Float])

  /** Deterministic fake payload for a media_ref (stands in for the object
    * store fetch; length/bytes derive only from the ref).
    */
  def stubFetch(mediaRef: String): Array[Byte] = {
    val h = mediaRef.hashCode
    val len = 64 + math.abs(h % 192)
    val out = new Array[Byte](len)
    var s = h.toLong
    var i = 0
    while (i < len) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(i) = (s >>> 32).toByte
      i += 1
    }
    out
  }

  /** STUB decode: a real build replaces this with an image/audio codec. The
    * outputs are deterministic functions of the payload so tests are stable.
    */
  def stubDecode(modality: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(payload)
    val width = 64 + math.abs(h % 1024)
    val height = 64 + math.abs((h / 7) % 1024)
    val durationMs = if (modality == "audio" || modality == "video") 1000 + math.abs(h % 60000) else 0
    // "feature extraction": 8-dim byte-histogram sketch (deterministic)
    val feat = new Array[Float](8)
    payload.foreach(b => feat(math.abs(b % 8)) += 1f)
    val n = math.max(payload.length, 1).toFloat
    (0 until 8).foreach(i => feat(i) /= n)
    (width, height, durationMs, feat)
  }

  private def modalityOf(ref: String): String = {
    val h = math.abs(ref.hashCode % 3)
    if (h == 0) "image" else if (h == 1) "audio" else "video"
  }

  /** media_ref column → binary payload + typed metadata + feature vector.
    * mapPartitions keeps the codec call batched per partition (the Scala
    * analog of a mapInPandas batch), and the payload column stays opaque
    * binary so Parquet encodes it untouched.
    */
  def decodeAndFeaturize(mediaRefs: Dataset[String]): DataFrame = {
    val spark = mediaRefs.sparkSession
    import spark.implicits._
    mediaRefs.mapPartitions { it =>
      it.map { ref =>
        val payload = stubFetch(ref)
        val modality = modalityOf(ref)
        val (w, h, d, feat) = stubDecode(modality, payload)
        MediaMeta(ref, modality, w, h, d, payload.length, feat)
      }
    }.toDF()
  }

  /** Resize plumbing: target dimensions preserving aspect ratio, capped at
    * `maxDim` on the long edge, never upscaled. The pixel transform itself is
    * the stub codec's job in production; the part that matters at 100 TB —
    * the metadata math staying columnar/codegen-friendly and the payload
    * column staying opaque — is real.
    */
  def resize(media: DataFrame, maxDim: Int = 256): DataFrame = {
    val scale = least(lit(1.0), lit(maxDim.toDouble) / greatest(col("width"), col("height")).cast("double"))
    media.withColumn("scale", round(scale, 6))
      .withColumn("out_width", greatest(lit(1), round(col("width") * col("scale"), 0).cast("int")))
      .withColumn("out_height", greatest(lit(1), round(col("height") * col("scale"), 0).cast("int")))
  }

  /** Frame-sampling plumbing for video refs: emits (ref, frame_idx, ts_ms)
    * rows — positions deterministic from duration; decode of the frame is the
    * same stub.
    */
  def sampleFrames(media: DataFrame, everyMs: Int = 5000): DataFrame = {
    media.filter(col("modality") === "video")
      .withColumn("frame_ts_ms", explode(sequence(lit(0), col("duration_ms"), lit(everyMs))))
      .withColumn("frame_idx", (col("frame_ts_ms") / everyMs).cast("int"))
      .select("media_ref", "frame_idx", "frame_ts_ms", "width", "height")
  }
}
