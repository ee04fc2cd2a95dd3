package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns (builder-prompt first-class component): image /
  * audio / video carried as opaque BINARY columns with typed metadata,
  * processed by batched per-partition functions.
  *
  * Decode is real and pure-JDK (see [[MediaCodecs]]): PNG/JPEG/BMP/GIF
  * through `javax.imageio.ImageIO`, WAV through
  * `javax.sound.sampled.AudioSystem`. Payloads in no decodable format
  * fall back to a deterministic byte-histogram feature, so the pipeline
  * degrades per-row instead of failing the partition — the same
  * drop-not-fail contract as `sources.Codecs`. The partition-batch
  * processing shape (the Scala analog of `mapInPandas` — one function
  * call per batch of rows), frame sampling, and the feature-vector
  * plumbing into the similarity/dedup operators (a feature is just an
  * `ARRAY<FLOAT>` — Knn/Ann/Dedup work on it as-is) are unchanged.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int,
      duration_ms: Long, sample_rate: Int)
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      features: Array[Float])
  case class Frame(media_id: Long, frame_index: Int, offset_ms: Long,
      frame_bytes: Array[Byte])

  /** Byte-histogram fallback for payloads no JDK codec decodes —
    * deterministic, L2-normalized, still a usable near-dup signal
    * (byte distribution survives container-level corruption).
    */
  private[multimodal] def byteHistogram(bytes: Array[Byte], dim: Int): Array[Float] = {
    val h = new Array[Double](dim)
    var i = 0
    while (i < bytes.length) { h((bytes(i) & 0xff) % dim) += 1.0; i += 1 }
    val n = math.sqrt(h.map(x => x * x).sum)
    h.map(x => if (n == 0) 0f else (x / n).toFloat)
  }

  /** Decode one payload to a feature vector: luminance histogram for
    * images, amplitude histogram for WAV audio, byte histogram
    * otherwise. Every path yields an L2-normalized `Array[Float]` of
    * length `dim`, so downstream cosine/kNN/dedup never branch on kind.
    */
  private[multimodal] def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] =
    MediaCodecs.detectFormat(bytes) match {
      case "png" | "jpeg" | "gif" | "bmp" =>
        MediaCodecs.decodeImage(bytes)
          .map(MediaCodecs.imageHistogram(_, dim))
          .getOrElse(byteHistogram(bytes, dim))
      case "wav" =>
        MediaCodecs.decodeWav(bytes)
          .map(a => MediaCodecs.audioHistogram(a.samples, dim))
          .getOrElse(byteHistogram(bytes, dim))
      case _ => byteHistogram(bytes, dim)
    }

  /** Decode-probed metadata: width/height for images, sample rate and
    * duration for WAV. None when the payload decodes as neither — the
    * caller keeps its declared metadata.
    */
  def probeMeta(bytes: Array[Byte]): Option[MediaMeta] =
    MediaCodecs.detectFormat(bytes) match {
      case f @ ("png" | "jpeg" | "gif" | "bmp") =>
        MediaCodecs.decodeImage(bytes).map(img =>
          MediaMeta(f, img.getWidth, img.getHeight, 0L, 0))
      case "wav" =>
        MediaCodecs.decodeWav(bytes).map(a =>
          MediaMeta("wav", 0, 0, a.durationMs, a.sampleRate))
      case _ => None
    }

  /** Decode-probe report over a media table: every payload runs through
    * the REAL decode path ([[probeMeta]] → ImageIO / AudioSystem) inside
    * a distributed plan, and `decode_differs` proves the decoded-feature
    * branch (not the byte-histogram fallback) produced the feature —
    * false whenever decode failed and the fallback ran. Undecodable
    * payloads surface as a 'none'/-1 sentinel row, so a broken codec is
    * an oracle hash mismatch, not a silent fallback. Narrow
    * per-partition map, no shuffle.
    */
  def probeDecode(media: Dataset[MediaRow], dim: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val meta = probeMeta(m.bytes).getOrElse(MediaMeta("none", -1, -1, -1L, -1))
        val differs = !java.util.Arrays.equals(
          decodeFeatures(m.bytes, dim), byteHistogram(m.bytes, dim))
        (m.media_id, meta.format, meta.width, meta.height,
          meta.sample_rate, meta.duration_ms, differs)
      }
    }.toDF("media_id", "format", "width", "height",
      "sample_rate", "duration_ms", "decode_differs")
  }

  /** Nearest-neighbor image resize — the preprocessing step every
    * vision-training pipeline runs before batching: REAL ImageIO decode
    * (PNG/BMP/GIF/JPEG), then the standard floor mapping
    * `src = tgt·srcDim / tgtDim` per axis, emitting the resized
    * grayscale (blue-channel) pixels row-major. A narrow per-partition
    * map like [[extractFeatures]] (codec setup amortizes per batch) —
    * no exchange at any corpus size; output is tw×th ints per row
    * regardless of source dimensions, which is exactly what makes the
    * downstream batch shape fixed.
    */
  def resizeNearest(media: Dataset[MediaRow], tw: Int, th: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.bytes))
        require(img != null, s"undecodable media ${m.media_id}")
        val px = new Array[Int](tw * th)
        var ty = 0
        while (ty < th) {
          val sy = ty * img.getHeight / th
          var tx = 0
          while (tx < tw) {
            val sx = tx * img.getWidth / tw
            px(ty * tw + tx) = img.getRGB(sx, sy) & 0xFF
            tx += 1
          }
          ty += 1
        }
        (m.media_id, img.getWidth, img.getHeight, px)
      }
    }.toDF("media_id", "src_w", "src_h", "gray")
  }

  /** Nearest-neighbor audio RESAMPLE to a fixed frame count — the
    * audio-preprocessing twin of [[resizeNearest]] (a training pipeline
    * batches fixed-length windows the same way vision batches fixed
    * H×W): real AudioSystem decode, then out[j] = sample[j·n div out]
    * — the same floor source mapping as the image path. Expects the
    * 8-bit mono fixture (sample byte IS the unsigned sample value);
    * narrow per-partition map, fixed `outFrames` batch shape regardless
    * of source duration.
    */
  def resampleNearest(media: Dataset[MediaRow], outFrames: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(m.bytes))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
          s"resample fixture expects 8-bit mono, got media ${m.media_id}")
        val data = ais.readAllBytes()
        val n = data.length
        val out = (0 until outFrames).map(j => data(j * n / outFrames) & 0xff)
        (m.media_id, n, out)
      }
    }.toDF("media_id", "src_frames", "samples")
  }

  /** Batched feature extraction — the mapInPandas shape: the work runs
    * once per partition over an iterator of rows, so codec setup (class
    * loading, ImageIO plugin registry) amortizes per batch, not per row.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map(m =>
        MediaFeatures(m.media_id, m.kind, m.bytes.length, decodeFeatures(m.bytes, dim)))
    }
  }

  /** Frame sampling for video-kind rows: one output row per sampled
    * frame offset (derived from meta.duration_ms). Animated GIFs decode
    * per-frame through ImageIO's ImageReader
    * ([[MediaCodecs.gifFrames]]); MJPEG-style containers
    * (byte-concatenated PNG/JPEG stills, [[MediaCodecs.splitFrames]])
    * decode the keyframe nearest each offset. Either way the row
    * carries grayscale pixel bytes stride-bounded to ≤64×64, so output
    * size is capped per frame. Non-container payloads fall back to a
    * deterministic byte slice.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 1000): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val n = math.max(1, (m.meta.duration_ms / everyMs).toInt)
      val nOut = math.min(n, 32)
      val gif = MediaCodecs.gifFrames(m.bytes)
      val segs = if (gif.nonEmpty) IndexedSeq.empty else MediaCodecs.splitFrames(m.bytes)
      (0 until nOut).map { i =>
        val off = i * everyMs
        val px =
          if (gif.nonEmpty) {
            val k = math.min(gif.length - 1, (i.toLong * gif.length / nOut).toInt)
            MediaCodecs.grayPixels(gif(k))
          } else if (segs.nonEmpty) {
            val k = math.min(segs.length - 1, (i.toLong * segs.length / nOut).toInt)
            val (s, e) = segs(k)
            MediaCodecs.decodeImage(java.util.Arrays.copyOfRange(m.bytes, s, e))
              .map(MediaCodecs.grayPixels(_))
              .getOrElse(java.util.Arrays.copyOfRange(m.bytes, s, math.min(e, s + 16)))
          } else {
            val s = (off % math.max(1, m.bytes.length)).toInt
            m.bytes.slice(s, math.min(m.bytes.length, s + 16))
          }
        Frame(m.media_id, i, off, px)
      }
    }
  }

  /** Fixture media table derived from the documents fixture: the text
    * bytes stand in for an encoded payload; kind/meta are deterministic.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        lit("raw").as("format"),
        (col("doc_id") % 640).cast("int").as("width"),
        (col("doc_id") % 480).cast("int").as("height"),
        (col("n_chars") * 10).as("duration_ms"),
        lit(16000).as("sample_rate")).as("meta"))
}
