package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns (builder-prompt first-class component): image /
  * audio / video carried as opaque BINARY columns with typed metadata,
  * processed by batched per-partition functions.
  *
  * The decode step is a clearly-marked STUB — this container has no
  * image/audio codecs. Everything AROUND the stub is real and tested:
  * the schema (binary payload + typed meta struct), the partition-batch
  * processing shape (the Scala analog of `mapInPandas` — one function
  * call per batch of rows, vectorizable), frame sampling, and the
  * feature-vector plumbing into the similarity/dedup operators (a
  * feature is just an `ARRAY<FLOAT>` — Knn/Ann/Dedup work on it as-is).
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

  /** STUB decode: a real implementation decodes the image/audio payload
    * here (e.g. JavaCV/TwelveMonkeys in this batch loop, or a Pandas UDF
    * in PySpark). The stub derives a deterministic byte-histogram
    * feature so the downstream plumbing is fully exercisable.
    */
  private def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val h = new Array[Double](dim)
    var i = 0
    while (i < bytes.length) { h((bytes(i) & 0xff) % dim) += 1.0; i += 1 }
    val n = math.sqrt(h.map(x => x * x).sum)
    h.map(x => if (n == 0) 0f else (x / n).toFloat)
  }

  /** Batched feature extraction — the mapInPandas shape: the work runs
    * once per partition over an iterator of rows, so a vectorized codec
    * amortizes setup per batch, not per row.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-batch setup would open the codec once here
      batch.map(m =>
        MediaFeatures(m.media_id, m.kind, m.bytes.length, decodeStub(m.bytes, dim)))
    }
  }

  /** Frame sampling for video-kind rows: one output row per sampled
    * frame offset (derived from meta.duration_ms; the frame decode is
    * the same stub boundary).
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 1000): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val n = math.max(1, (m.meta.duration_ms / everyMs).toInt)
      (0 until math.min(n, 32)).map { i =>
        val off = i * everyMs
        // STUB: a real impl seeks+decodes the frame at `off`
        val slice = m.bytes.slice((off % math.max(1, m.bytes.length)).toInt,
          math.min(m.bytes.length, (off % math.max(1, m.bytes.length)).toInt + 16))
        Frame(m.media_id, i, off, slice)
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
        lit("stub").as("format"),
        (col("doc_id") % 640).cast("int").as("width"),
        (col("doc_id") % 480).cast("int").as("height"),
        (col("n_chars") * 10).as("duration_ms"),
        lit(16000).as("sample_rate")).as("meta"))
}
