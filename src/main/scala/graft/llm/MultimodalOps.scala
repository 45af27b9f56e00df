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
  * Video has no JDK pixel codec, but MP4/MOV container METADATA
  * (dims/duration/track count) is parsed for real via a pure-JVM ISO
  * BMFF box walk ([[decodeVideoMeta]]); compressed audio (mp3/ogg) and
  * video PIXELS would plug into the same per-partition decode sites
  * via SPI.
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

  /** `decoded` = the container METADATA parsed (true dims/duration from
    * the moov box); `metadataOnly` distinguishes this from a pixel
    * decode — the JDK has no video codec, so pixels never decode here
    * and `metadataOnly` is true whenever `decoded` is. A pixel-decoding
    * SPI plugin would flip `metadataOnly` to false at the same site. */
  case class VideoFeatures(id: Long, byteLen: Int, width: Int, height: Int,
                           durationMs: Long, nTracks: Int,
                           decoded: Boolean, metadataOnly: Boolean)

  /** MP4/MOV container-metadata parse — a pure-JVM ISO BMFF box walk, no
    * codec: width/height from each `trak/tkhd` (16.16 fixed-point; the
    * video track is the one with nonzero dims) and duration from
    * `moov/mvhd` (duration/timescale, emitted in integer milliseconds —
    * deterministic). Returns (width, height, durationMs, nTracks); None
    * when the payload has no parseable `moov` (corrupt, truncated, or a
    * non-BMFF format such as MKV) — quarantinable like image/audio.
    *
    * Box grammar: [u32 size][4cc type][payload]; size==1 → u64 largesize
    * follows; size==0 → box runs to end of enclosure. mvhd/tkhd v0 use
    * 32-bit times, v1 64-bit — both handled. All reads bounds-checked;
    * any structural surprise aborts to None rather than fake values. */
  private[llm] def decodeVideoMeta(bytes: Array[Byte]): Option[(Int, Int, Long, Int)] =
    try {
      def u32(o: Int): Long =
        ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
          ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
      def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
      def fourcc(o: Int): String =
        new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      // walk one enclosure [lo, hi); returns (type, payloadLo, payloadHi) per box
      def boxes(lo: Int, hi: Int): Iterator[(String, Int, Int)] =
        new Iterator[(String, Int, Int)] {
          private var o = lo
          def hasNext: Boolean = o + 8 <= hi
          def next(): (String, Int, Int) = {
            val sz = u32(o)
            val tpe = fourcc(o + 4)
            val (payLo, end) =
              if (sz == 1L && o + 16 <= hi) (o + 16, o + u64(o + 8))
              else if (sz == 0L) (o + 8, hi.toLong)
              else (o + 8, o + sz)
            if (end < payLo || end > hi) { o = hi; ("", 0, 0) } // malformed → stop
            else { o = end.toInt; (tpe, payLo, end.toInt) }
          }
        }
      val moov = boxes(0, bytes.length).collectFirst { case ("moov", l, h) => (l, h) }
      moov.flatMap { case (ml, mh) =>
        var durationMs = 0L
        var w = 0; var h = 0; var nTracks = 0
        boxes(ml, mh).foreach {
          case ("mvhd", l, _) =>
            val v = bytes(l) & 0xff
            val (ts, dur) =
              if (v == 1) (u32(l + 20), u64(l + 24)) else (u32(l + 12), u32(l + 16))
            if (ts > 0) durationMs = dur * 1000L / ts
          case ("trak", l, hh) =>
            nTracks += 1
            boxes(l, hh).foreach {
              case ("tkhd", tl, _) =>
                val v = bytes(tl) & 0xff
                val dimsOff = tl + (if (v == 1) 88 else 76) // through the matrix
                val tw = (u32(dimsOff) >> 16).toInt // 16.16 fixed → integer part
                val th = (u32(dimsOff + 4) >> 16).toInt
                if (tw > 0 && th > 0) { w = tw; h = th } // the video track
              case _ => ()
            }
          case _ => ()
        }
        if (nTracks == 0 && durationMs == 0L) None
        else Some((w, h, durationMs, nTracks))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Batch video container-metadata extraction — same per-partition
    * shape as [[extractFeatures]]; only video-mime-typed payloads are
    * parsed. decoded=false (zero dims) quarantines unparseable blobs. */
  def extractVideoFeatures(media: Dataset[MediaRecord]): Dataset[VideoFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val meta =
          if (r.mimeType.startsWith("video/")) decodeVideoMeta(r.media) else None
        val (w, h, durMs, nTracks) = meta.getOrElse((0, 0, 0L, 0))
        VideoFeatures(r.id, r.media.length, w, h, durMs, nTracks,
          decoded = meta.isDefined, metadataOnly = meta.isDefined)
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
