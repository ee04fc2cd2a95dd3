package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** Real-format media payload builders, written from the specs the
  * formats are defined by (PNG = chunked zlib-compressed scanlines per
  * RFC 2083; BMP = BITMAPINFOHEADER; WAV = RIFF header + PCM frames).
  * The encoders are ~40 lines of spec each, not a codec library, so the
  * JDK decode path ([[MediaCodecs]]) is verified against ground truth,
  * not against itself — the same fixture philosophy as the document
  * codecs (reference analog: real binary payloads parsed by PyPDF2/
  * openpyxl, src/document_loader.py:86-149).
  *
  * Lives in main (not test) because [[realMedia]] feeds the
  * oracle-checked `media_decode` query: payload dimensions derive
  * arithmetically from `doc_id`, so a DuckDB oracle can compute the
  * expected decode output without seeing the blobs.
  */
object MediaFixtures {

  // same hermeticity guard as MediaCodecs: without it, the first
  // ImageIO.write on an executor that has not loaded MediaCodecs yet
  // would spill an encoder temp file per GIF row
  javax.imageio.ImageIO.setUseCache(false)

  /** Truecolor (color type 2) PNG, one RGB triple per pixel. Truecolor
    * rather than grayscale so `getRGB` round-trips component values
    * exactly (the AWT gray→sRGB conversion is gamma-corrected, not
    * identity).
    */
  def png(width: Int, height: Int, rgb: (Int, Int, Int)*): Array[Byte] =
    pngWith(Deflater.DEFAULT_COMPRESSION, width, height, rgb)

  /** PNG with a stored (level-0) IDAT: the scanline bytes appear
    * literally in the zlib stream — used to plant signature lookalikes
    * (e.g. `FF D8 FF`) inside a valid frame body.
    */
  def pngStored(width: Int, height: Int, rgb: (Int, Int, Int)*): Array[Byte] =
    pngWith(Deflater.NO_COMPRESSION, width, height, rgb)

  private def pngWith(level: Int, width: Int, height: Int,
      rgb: Seq[(Int, Int, Int)]): Array[Byte] = {
    require(rgb.length == width * height)
    val out = new ByteArrayOutputStream
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte)
      out.write(be32(data.length))
      val typed = typ.getBytes("US-ASCII") ++ data
      out.write(typed)
      val crc = new CRC32
      crc.update(typed)
      out.write(be32(crc.getValue.toInt))
    }
    chunk("IHDR", Array((width >>> 24).toByte, (width >>> 16).toByte,
      (width >>> 8).toByte, width.toByte, (height >>> 24).toByte,
      (height >>> 16).toByte, (height >>> 8).toByte, height.toByte,
      8.toByte, 2.toByte, 0.toByte, 0.toByte, 0.toByte))
    val scanlines = new ByteArrayOutputStream
    (0 until height).foreach { y =>
      scanlines.write(0) // filter: None
      (0 until width).foreach { x =>
        val (r, g, b) = rgb(y * width + x)
        scanlines.write(r); scanlines.write(g); scanlines.write(b)
      }
    }
    val d = new Deflater(level)
    d.setInput(scanlines.toByteArray); d.finish()
    val zbuf = new ByteArrayOutputStream
    val buf = new Array[Byte](8192)
    while (!d.finished()) zbuf.write(buf, 0, d.deflate(buf))
    d.end()
    chunk("IDAT", zbuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Uniform-gray PNG: every pixel (v, v, v), so luminance == v exactly
    * under the integer per-mille weights.
    */
  def grayPng(width: Int, height: Int, v: Int): Array[Byte] =
    png(width, height, Seq.fill(width * height)((v, v, v)): _*)

  /** 24-bpp uncompressed BMP (BITMAPINFOHEADER, bottom-up rows padded
    * to 4 bytes) — a second image container built from its spec.
    */
  def bmp(width: Int, height: Int, rgb: (Int, Int, Int)*): Array[Byte] = {
    require(rgb.length == width * height)
    val rowLen = (width * 3 + 3) / 4 * 4
    val dataLen = rowLen * height
    val out = new ByteArrayOutputStream
    def le32(v: Int): Unit =
      out.write(Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte))
    def le16(v: Int): Unit = out.write(Array(v.toByte, (v >>> 8).toByte))
    out.write('B'); out.write('M')
    le32(54 + dataLen); le32(0); le32(54)
    le32(40); le32(width); le32(height); le16(1); le16(24)
    le32(0); le32(dataLen); le32(2835); le32(2835); le32(0); le32(0)
    ((height - 1) to 0 by -1).foreach { y => // bottom-up
      (0 until width).foreach { x =>
        val (r, g, b) = rgb(y * width + x)
        out.write(b); out.write(g); out.write(r)
      }
      (width * 3 until rowLen).foreach(_ => out.write(0))
    }
    out.toByteArray
  }

  /** Baseline JPEG via the JDK's JPEG writer. Lossy — pixel values are
    * not round-trip-exact — but dimensions are, which is what the
    * decode-probe oracle checks.
    */
  def jpeg(width: Int, height: Int, rgb: (Int, Int, Int)*): Array[Byte] = {
    require(rgb.length == width * height)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until height).foreach(y => (0 until width).foreach { x =>
      val (r, g, b) = rgb(y * width + x)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    })
    val bos = new ByteArrayOutputStream
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Single-frame GIF via the JDK's own GIF writer (no spec-built
    * encoder needed: the oracle checks decoded dimensions against
    * doc_id arithmetic, so a writer that mis-stamped its logical screen
    * would still mismatch).
    */
  def gif(width: Int, height: Int, rgb: (Int, Int, Int)*): Array[Byte] = {
    require(rgb.length == width * height)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until height).foreach(y => (0 until width).foreach { x =>
      val (r, g, b) = rgb(y * width + x)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    })
    val bos = new ByteArrayOutputStream
    javax.imageio.ImageIO.write(img, "gif", bos)
    bos.toByteArray
  }

  /** Mono 16-bit little-endian PCM WAV. */
  def wav(sampleRate: Int, samples: Short*): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new ByteArrayOutputStream
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit =
      out.write(Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte))
    def le16(v: Int): Unit = out.write(Array(v.toByte, (v >>> 8).toByte))
    ascii("RIFF"); le32(36 + dataLen); ascii("WAVE")
    ascii("fmt "); le32(16); le16(1); le16(1); le32(sampleRate)
    le32(sampleRate * 2); le16(2); le16(16)
    ascii("data"); le32(dataLen)
    samples.foreach(s => le16(s & 0xffff))
    out.toByteArray
  }

  /** 8-bit UNSIGNED mono PCM WAV (sample values 0..255, 128 = zero). */
  def wav8(sampleRate: Int, samples: Int*): Array[Byte] = {
    val out = new ByteArrayOutputStream
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit =
      out.write(Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte))
    def le16(v: Int): Unit = out.write(Array(v.toByte, (v >>> 8).toByte))
    ascii("RIFF"); le32(36 + samples.length); ascii("WAVE")
    ascii("fmt "); le32(16); le16(1); le16(1); le32(sampleRate)
    le32(sampleRate); le16(1); le16(8)
    ascii("data"); le32(samples.length)
    samples.foreach(out.write)
    out.toByteArray
  }

  /** Stereo 16-bit little-endian PCM WAV, one (left, right) per frame. */
  def wavStereo(sampleRate: Int, frames: (Short, Short)*): Array[Byte] = {
    val dataLen = frames.length * 4
    val out = new ByteArrayOutputStream
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit =
      out.write(Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte))
    def le16(v: Int): Unit = out.write(Array(v.toByte, (v >>> 8).toByte))
    ascii("RIFF"); le32(36 + dataLen); ascii("WAVE")
    ascii("fmt "); le32(16); le16(1); le16(2); le32(sampleRate)
    le32(sampleRate * 4); le16(4); le16(16)
    ascii("data"); le32(dataLen)
    frames.foreach { case (l, r) => le16(l & 0xffff); le16(r & 0xffff) }
    out.toByteArray
  }

  /** Video table of REAL MJPEG-style containers: doc_id's payload is
    * (doc_id%4+2) byte-concatenated stored-IDAT PNGs whose first pixel
    * is the arithmetic gray (doc_id·31 + k·17) % 256 and whose second
    * pixel is (255,216,255) — planting the JPEG magic `FF D8 FF`
    * literally inside every frame's zlib body. A frame splitter that
    * scans signature-to-signature shreds every one of these payloads;
    * only the structure-aware walk recovers the frames, so the oracle
    * check on frame counts AND decoded pixel values pins that behavior
    * inside a distributed plan.
    */
  def realVideos(docs: DataFrame): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val nF = (id % 4 + 2).toInt
        val payload = (0 until nF).toArray.flatMap { k =>
          val v = ((id * 31 + k * 17) % 256).toInt
          pngStored(2, 2, (v, v, v), (255, 216, 255), (v, v, v), (v, v, v))
        }
        Multimodal.MediaRow(id, "video", payload,
          Multimodal.MediaMeta("mjpeg", 2, 2, nF * 1000L, 0))
      }
    }
  }

  /** Media table of REAL encoded payloads, derived deterministically
    * from `documents.doc_id` — one JDK decode branch per id%5 residue,
    * covering EVERY format probeMeta dispatches on: PNG (id%29+4 ×
    * id%17+3), 8 kHz mono PCM WAV of (id%7+1)·80 frames, BMP (id%21+3 ×
    * id%13+2), GIF (id%11+2 × id%7+2), JPEG (id%19+8 × id%23+8).
    * Pixels/samples follow fixed arithmetic patterns, so every
    * parameter a decoder can report is a pure function of `doc_id` —
    * which is what lets a SQL oracle verify the ImageIO/AudioSystem
    * decode output without parsing blobs.
    *
    * Payload construction is a narrow per-partition map (no shuffle);
    * payloads are bounded (≤ 32×31 px, ≤ 560 frames) so the build cost
    * per row is O(1) at any scale.
    */
  def realMedia(docs: DataFrame): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        def grays(w: Int, h: Int): Seq[(Int, Int, Int)] =
          Seq.tabulate(w * h) { i =>
            val v = ((i * 7 + id) % 256).toInt
            (v, v, v)
          }
        (id % 5).toInt match {
          case 0 =>
            val w = (id % 29 + 4).toInt
            val h = (id % 17 + 3).toInt
            Multimodal.MediaRow(id, "image", png(w, h, grays(w, h): _*),
              Multimodal.MediaMeta("png", w, h, 0L, 0))
          case 1 =>
            // rotate encodings so ALL THREE decodeWav paths (16-bit mono,
            // 8-bit unsigned, 16-bit stereo) run under the oracle; the
            // reported rate and frame-based duration formulas are
            // identical across them, so the oracle needs no branch
            val rate = 8000
            val frames = ((id % 7 + 1) * 80).toInt
            val payload = ((id / 5) % 3).toInt match {
              case 0 => wav(rate, Array.tabulate(frames)(i =>
                (((i * 131 + id * 17) % 65536) - 32768).toShort).toIndexedSeq: _*)
              case 1 => wav8(rate, Array.tabulate(frames)(i =>
                ((i * 37 + id) % 256).toInt).toIndexedSeq: _*)
              case _ => wavStereo(rate, Array.tabulate(frames)(i =>
                ((((i * 131 + id * 17) % 65536) - 32768).toShort,
                  (((i * 59 + id * 7) % 65536) - 32768).toShort)).toIndexedSeq: _*)
            }
            Multimodal.MediaRow(id, "audio", payload,
              Multimodal.MediaMeta("wav", 0, 0, frames * 1000L / rate, rate))
          case 2 =>
            val w = (id % 21 + 3).toInt
            val h = (id % 13 + 2).toInt
            Multimodal.MediaRow(id, "image", bmp(w, h, grays(w, h): _*),
              Multimodal.MediaMeta("bmp", w, h, 0L, 0))
          case 3 =>
            val w = (id % 11 + 2).toInt
            val h = (id % 7 + 2).toInt
            Multimodal.MediaRow(id, "image", gif(w, h, grays(w, h): _*),
              Multimodal.MediaMeta("gif", w, h, 0L, 0))
          case _ =>
            val w = (id % 19 + 8).toInt
            val h = (id % 23 + 8).toInt
            Multimodal.MediaRow(id, "image", jpeg(w, h, grays(w, h): _*),
              Multimodal.MediaMeta("jpeg", w, h, 0L, 0))
        }
      }
    }
  }

  /** Uniform single-channel images for the histogram-CONTENT oracle:
    * every pixel of doc_id's payload is gray (v,v,v) or pure red/green/
    * blue with v = doc_id%256, so the decoded 64-bin luminance histogram
    * is a delta — value exactly 1.0 after L2 — at bin lum/4, where lum
    * is v for gray and (299·v)/1000, (587·v)/1000, (114·v)/1000 for
    * R/G/B (the integer per-mille weights of
    * [[MediaCodecs.imageHistogram]]). Gray pins the binning; the pure
    * channels pin the luminance WEIGHTS (any weights summing to 1000
    * map gray to v, so gray alone can't catch a weight swap). Formats
    * alternate PNG / BMP — the two spec-built, pixel-exact encoders
    * (JPEG is lossy; GIF palettization is exact but adds nothing here).
    */
  /** Constant-sample WAVs for the audio histogram-CONTENT oracle: every
    * sample of doc_id's payload is the same value, so the decoded
    * 64-bin amplitude histogram is a delta (exactly 1.0) at a bin that
    * is pure doc_id arithmetic — (s+32768)/1024 for 16-bit PCM (mono
    * and stereo), u/4 for 8-bit unsigned — both exact in float (sample
    * values are dyadic rationals, so normalize → +1 → ·32 loses no
    * bits). Rotates all three decodeWav branches like realMedia does.
    */
  /** Gradient images: pixel (x, y) of document id has gray value
    * (id + 7x + 13y) mod 256 — every pixel position distinguishable,
    * so a resize oracle can recompute EXACT pixel values from doc_id
    * arithmetic alone (uniform fixtures can't pin the source-pixel
    * mapping). Alternates spec-built PNG and BMP containers.
    */
  def gradientMedia(docs: DataFrame): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (id % 5 + 3).toInt
        val h = (id % 3 + 3).toInt
        val px = for (y <- 0 until h; x <- 0 until w) yield {
          val v = ((id + 7 * x + 13 * y) % 256).toInt
          (v, v, v)
        }
        val (fmt, payload) =
          if (id % 2 == 0) ("png", png(w, h, px: _*))
          else ("bmp", bmp(w, h, px: _*))
        Multimodal.MediaRow(id, "image", payload,
          Multimodal.MediaMeta(fmt, w, h, 0L, 0))
      }
    }
  }

  def uniformWavs(docs: DataFrame): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val rate = 8000
        val frames = ((id % 5 + 1) * 50).toInt
        val s = (((id * 977) % 65536) - 32768).toShort
        val payload = (id % 3).toInt match {
          case 0 => wav(rate, Seq.fill(frames)(s): _*)
          case 1 => wav8(rate, Seq.fill(frames)(((id * 131) % 256).toInt): _*)
          case _ => wavStereo(rate, Seq.fill(frames)((s, s)): _*)
        }
        Multimodal.MediaRow(id, "audio", payload,
          Multimodal.MediaMeta("wav", 0, 0, frames * 1000L / rate, rate))
      }
    }
  }

  /** Sawtooth 8-bit mono WAVs — sample i of doc id is (id + 5·i) mod
    * 256 over n = (id%5+1)·50 frames at 8 kHz: the VARYING-content
    * audio fixture whose resample the oracle recomputes per output
    * sample from doc_id arithmetic (the [[gradientMedia]] convention
    * on the audio axis; the constant [[uniformWavs]] could not pin
    * frame SELECTION — any subset of a constant is the constant).
    */
  def sawtoothWavs(docs: DataFrame): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val rate = 8000
        val frames = ((id % 5 + 1) * 50).toInt
        val payload = wav8(rate,
          (0 until frames).map(i => ((id + 5L * i) % 256).toInt): _*)
        Multimodal.MediaRow(id, "audio", payload,
          Multimodal.MediaMeta("wav", 0, 0, frames * 1000L / rate, rate))
      }
    }
  }

  def uniformMedia(docs: DataFrame): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val v = (id % 256).toInt
        val w = (id % 5 + 2).toInt
        val h = (id % 3 + 2).toInt
        val rgb = (id % 4).toInt match {
          case 0 => (v, v, v)
          case 1 => (v, 0, 0)
          case 2 => (0, v, 0)
          case _ => (0, 0, v)
        }
        val px = Seq.fill(w * h)(rgb)
        val (fmt, payload) =
          if ((id / 4) % 2 == 0) ("png", png(w, h, px: _*))
          else ("bmp", bmp(w, h, px: _*))
        Multimodal.MediaRow(id, "image", payload,
          Multimodal.MediaMeta(fmt, w, h, 0L, 0))
      }
    }
  }
}
