package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed per-partition in batches.
  *
  * Schema (binary payload + struct metadata), partition-friendly batch
  * processing via mapPartitions (the Scala analogue of mapInPandas:
  * per-partition init amortizes codec setup, rows stream through without
  * materializing the partition), and a typed feature output. Image-typed
  * payloads are decoded for real with `javax.imageio` (PNG/JPEG/GIF/BMP
  * ship with the JDK) and audio with `javax.sound.sampled` (WAV/AIFF/AU);
  * other modalities fall back to deterministic byte-level features.
  * Compressed audio (mp3/ogg) and video have no JDK codec — they would
  * plug into the same per-partition decode sites via SPI.
  */
object MultimodalOps {

  case class MediaRecord(id: Long, media: Array[Byte], mimeType: String)
  /** `decoded` = a codec actually parsed the payload (real pixel dims +
    * luminance histogram); false = byte-level fallback features. */
  case class MediaFeatures(id: Long, byteLen: Int, width: Int, height: Int,
                           histogram: Array[Long], decoded: Boolean)

  /** Real image decode via the JDK's ImageIO: true pixel dimensions and a
    * 16-bin luminance histogram (Rec. 601 integer weights — deterministic
    * across JVMs). None when no installed codec recognizes the payload
    * (corrupt or unsupported format) — surfaced as decoded=false rather
    * than fake dimensions, so a curation filter can quarantine bad media. */
  private[llm] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Long])] = {
    // NonFatal, not just IOException: ImageIO readers throw unchecked
    // exceptions (ArrayIndexOutOfBounds, NegativeArraySize, ...) on many
    // malformed payloads — one corrupt blob must quarantine, not abort
    // the whole job's mapPartitions task
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      val w = im.getWidth; val h = im.getHeight
      val hist = new Array[Long](16)
      // Row-batched getRGB (one int[] per row, not per pixel): avoids the
      // per-pixel ColorModel dispatch without assuming a raster layout.
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        im.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          hist(lum >> 4) += 1
          x += 1
        }
        y += 1
      }
      (w, h, hist)
    }
  }

  /** Deterministic byte-level fallback features for non-image payloads:
    * no intrinsic dimensions (-1) and a 16-bin high-nibble byte histogram
    * (sums to byteLen — a cheap content fingerprint for text/audio blobs). */
  private[llm] def byteFeatures(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val hist = new Array[Long](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1; i += 1 }
    (-1, -1, hist)
  }

  /** Batch feature extraction: one decoder context per partition, rows
    * streamed — the mapInPandas-equivalent execution shape. Dispatches on
    * mimeType: image-typed payloads → ImageIO decode (falling back to byte features
    * when undecodable), everything else → byte features. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init site (codec/model handles would be created here)
      it.map { r =>
        val image = if (r.mimeType.startsWith("image/")) decodeImage(r.media) else None
        val (w, h, hist) = image.getOrElse(byteFeatures(r.media))
        MediaFeatures(r.id, r.media.length, w, h, hist, image.isDefined)
      }
    }
  }

  /** `decoded` = a codec parsed the payload; zeros + decoded=false for
    * non-audio or corrupt payloads (quarantinable, like images). */
  case class AudioFeatures(id: Long, byteLen: Int, sampleRate: Int,
                           channels: Int, nFrames: Long,
                           amplitudeHist: Array[Long], decoded: Boolean)

  /** Real audio decode for WAV/AIFF/AU payloads via the JDK's
    * javax.sound.sampled: true sample rate / channel count / frame count
    * and a 16-bin absolute-amplitude histogram over the 16-bit PCM
    * samples (integer arithmetic — deterministic across JVMs). Only
    * 16-bit PCM is histogrammed (the dominant uncompressed encoding);
    * other PCM widths still report true format metadata with an empty
    * histogram. Compressed codecs (mp3/ogg) have no JDK provider and
    * come back None — they'd plug in via SPI at the same decode site. */
  private[llm] def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Long, Array[Long])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        val hist = new Array[Long](16)
        if (f.getSampleSizeInBits == 16 &&
          f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
          val buf = new Array[Byte](4096)
          var carry = -1 // odd-byte boundary between read()s
          var n = in.read(buf)
          while (n > 0) {
            var i = 0
            if (carry >= 0 && n > 0) {
              val s = if (f.isBigEndian) (carry << 8) | (buf(0) & 0xff)
                else ((buf(0) & 0xff) << 8) | carry
              hist(math.min(15, math.abs(s.toShort.toInt) >> 11)) += 1
              i = 1; carry = -1
            }
            while (i + 1 < n) {
              val s = if (f.isBigEndian) ((buf(i) & 0xff) << 8) | (buf(i + 1) & 0xff)
                else ((buf(i + 1) & 0xff) << 8) | (buf(i) & 0xff)
              hist(math.min(15, math.abs(s.toShort.toInt) >> 11)) += 1
              i += 2
            }
            if (i < n) carry = buf(i) & 0xff
            n = in.read(buf)
          }
        }
        Some((f.getSampleRate.toInt, f.getChannels, in.getFrameLength, hist))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None } // incl. parser unchecked throws

  /** Batch audio feature extraction — the audio twin of
    * [[extractFeatures]], same per-partition decode shape. */
  def extractAudioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val audio = if (r.mimeType.startsWith("audio/")) decodeAudio(r.media) else None
        val (rate, ch, frames, hist) = audio.getOrElse((0, 0, 0L, new Array[Long](16)))
        AudioFeatures(r.id, r.media.length, rate, ch, frames, hist, audio.isDefined)
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
