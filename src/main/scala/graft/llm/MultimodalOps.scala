package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed per-partition in batches.
  *
  * The Spark-side shape is the real deliverable — schema (binary payload +
  * struct metadata), partition-friendly batch processing via mapPartitions
  * (the Scala analogue of mapInPandas: per-partition init amortizes codec
  * setup, rows stream through without materializing the partition), and a
  * typed feature output. The actual image/audio decode is STUBBED with a
  * deterministic fake (no codec libraries in this container) — swap
  * [[decodeStub]] for a real decoder (e.g. javax.imageio / ffmpeg bindings)
  * without touching the pipeline shape.
  */
object MultimodalOps {

  case class MediaRecord(id: Long, media: Array[Byte], mimeType: String)
  case class MediaFeatures(id: Long, byteLen: Int, width: Int, height: Int,
                           histogram: Array[Long])

  /** STUB — deterministic fake "decode": derives fake dimensions from the
    * payload bytes and a 16-bin byte histogram as the "feature vector".
    * Real implementation: decode `bytes` with an image codec, resize,
    * extract features. The signature and batch shape stay the same. */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + (math.abs(h) % 512)        // fake: would be real pixel dims
    val height = 64 + (math.abs(h / 7) % 512)
    val hist = new Array[Long](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1; i += 1 }
    (width, height, hist)
  }

  /** Batch feature extraction: one decoder context per partition, rows
    * streamed — the mapInPandas-equivalent execution shape. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init site (codec/model handles would be created here)
      it.map { r =>
        val (w, h, hist) = decodeStub(r.media)
        MediaFeatures(r.id, r.media.length, w, h, hist)
      }
    }
  }

  import org.apache.spark.sql.Column

  /** Uniform frame sampling over a binary payload: treat `media` as
    * consecutive `frameBytes`-sized frames (video/audio chunking shape) and
    * keep every stride-th full frame so at most `maxFrames` survive —
    * `stride = ceil(nFrames/maxFrames)`. Pure codegen'd Columns
    * (sequence → transform → substr), no UDF: the sampling plan stays
    * inside whole-stage codegen and the binary column is never copied
    * whole into an intermediate row. Payloads shorter than one frame
    * yield an empty array (no partial frames). */
  def sampleFrames(media: Column, frameBytes: Int, maxFrames: Int): Column = {
    val nFrames = floor(length(media) / frameBytes).cast("int")
    val stride = greatest(lit(1),
      floor((nFrames + lit(maxFrames - 1)) / maxFrames).cast("int"))
    val idx = when(nFrames > 0, sequence(lit(0), nFrames - 1, stride))
      .otherwise(lit(Array.empty[Int]))
    transform(idx, i => media.substr(i * frameBytes + 1, lit(frameBytes)))
  }

  /** Aspect-preserving resize metadata: scale (w,h) into a (maxW,maxH) box
    * without upscaling; returns struct(out_w, out_h, scale). The metadata
    * half of a resize operator — the pixel half plugs into [[extractFeatures]]'s
    * per-partition decode site. */
  def resizeDims(width: Column, height: Column, maxW: Int, maxH: Int): Column = {
    val scale = least(lit(1.0),
      lit(maxW) / width.cast("double"), lit(maxH) / height.cast("double"))
    // Non-positive dims are invalid metadata → NULL struct, not a silent
    // fallback: w=0 makes maxW/w NULL (non-ANSI division), least() skips
    // NULLs, and the survivors would yield a misleading out_w/out_h=1.
    when(width > 0 && height > 0,
      struct(
        greatest(lit(1), floor(width * scale).cast("int")).as("out_w"),
        greatest(lit(1), floor(height * scale).cast("int")).as("out_h"),
        scale.as("scale")))
  }

  /** Wrap a text table as a binary media table (UTF-8 payload) — used by
    * tests and the verified plumbing query; in production the binary column
    * comes from the source (image/audio files, web corpus WARCs). */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("id"),
      col("text").cast("binary").as("media"),
      lit("text/plain").as("mimeType"))
}
