package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.{MediaFixtures, Multimodal}

/** Multimodal query surface over the documents-derived media fixture. */
object MultimodalQueries {

  private def media(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Multimodal.mediaFromDocuments(Tables.documents(spark, dir))
      .as[Multimodal.MediaRow]
  }

  /** Payload metadata — md5/byte-length are oracle-checkable because the
    * fixture payload is the document's UTF-8 bytes.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir).toDF()
      .select(col("media_id"), col("kind"),
        md5(col("bytes")).as("payload_md5"),
        length(col("bytes")).as("n_bytes"),
        col("meta.duration_ms").as("duration_ms"))
      .orderBy("media_id")

  /** Batched decode features + norm ([[Multimodal.extractFeatures]]:
    * real ImageIO/AudioSystem decode for image/audio payloads, byte
    * histogram for the rest — this fixture's payloads are document
    * text, so they take the fallback). This query's arbitrary-payload
    * histogram content is not SQL-expressible, but histogram CONTENT is
    * oracle-proven by [[mediaHistogram]] over uniform payloads (and
    * value-checked by MultimodalSpec / MediaCodecsSpec against
    * hand-built PNG/BMP/WAV); here the oracle-checked surface is:
    * ids, kinds, byte lengths, and the norm —
    * exactly 1.0 after round(·,4) for any non-empty payload (64
    * float-rounded squares can drift at most ~1e-6 from 1), 0.0 for
    * empty.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.extractFeatures(media(spark, dir)).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        round(graft.functions.Vec.l2Norm(col("features")), 4).as("feature_norm"))
      .orderBy("media_id")
  }

  /** Frame sampling over video-kind rows. The sampled frame bytes are
    * pixel data for MJPEG-style payloads and a byte slice otherwise
    * (out of SQL's reach either way); the frame COUNTS and offsets are
    * pure functions of the metadata — oracle-checked.
    */
  def mediaFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.sampleFrames(media(spark, dir)).toDF()
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"), max(col("offset_ms")).as("max_offset_ms"))
      .orderBy("media_id")
  }

  /** Real decode, oracle-proven: payloads are REAL encoded PNG/WAV/BMP/
    * GIF/JPEG blobs ([[MediaFixtures.realMedia]], one JDK decode branch
    * per id%5 residue — every format probeMeta dispatches on) whose
    * dimensions / sample rate / duration are pure functions of doc_id,
    * and the Spark side reports
    * what ImageIO/AudioSystem actually decoded
    * ([[Multimodal.probeDecode]]). The oracle recomputes the expected
    * values arithmetically — if either JDK decode path breaks (or the
    * feature pipeline silently falls back to the byte histogram, see
    * `decode_differs`), the row set hash-mismatches.
    */
  def mediaDecode(spark: SparkSession, dir: String): DataFrame =
    Multimodal.probeDecode(MediaFixtures.realMedia(Tables.documents(spark, dir)))
      .orderBy("media_id")

  /** Frame decode over real MJPEG-style payloads, oracle-proven: each
    * video is a concatenation of stored-IDAT PNGs that carry the JPEG
    * magic inside their compressed bodies ([[MediaFixtures.realVideos]]).
    * The output exposes each decoded frame's first pixel (an arithmetic
    * gray) and the trap pixel's fixed luminance (232), both recomputed
    * by the oracle — so the row set pins frame COUNT (structure-aware
    * splitting survived the planted signatures) and frame CONTENT (real
    * ImageIO decode ran per frame).
    */
  def mediaVideoFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.sampleFrames(MediaFixtures.realVideos(Tables.documents(spark, dir)))
      .map(f => (f.media_id, f.frame_index,
        f.frame_bytes(0) & 0xff, f.frame_bytes(1) & 0xff))
      .toDF("media_id", "frame_index", "first_px", "trap_px")
      .orderBy("media_id", "frame_index")
  }

  /** Decoded histogram CONTENT, oracle-proven: uniform single-channel
    * PNG/BMP payloads ([[MediaFixtures.uniformMedia]]) make the 64-bin
    * luminance histogram of the real decode path a delta — exactly 1.0
    * at an arithmetically-known bin. The oracle recomputes the bin from
    * doc_id (including the 299/587/114 per-mille weights via the pure
    * R/G/B variants), so broken luminance math, broken binning, or a
    * silent byte-histogram fallback (many nonzero bins) all
    * hash-mismatch. Closes the one content gap `media_decode` left:
    * that query proves decode RAN; this one proves what it COMPUTED.
    */
  def mediaHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.extractFeatures(
      MediaFixtures.uniformMedia(Tables.documents(spark, dir)))
      .map { f =>
        val peakBin = f.features.indexWhere(_ == f.features.max)
        val nonzero = f.features.count(_ != 0f)
        (f.media_id, peakBin, f.features(peakBin).toDouble, nonzero)
      }
      .toDF("media_id", "peak_bin", "peak_value", "nonzero_bins")
      .orderBy("media_id")
  }

  /** Audio twin of [[mediaHistogram]]: constant-sample WAVs
    * ([[MediaFixtures.uniformWavs]], all three decodeWav branches) make
    * the amplitude histogram a delta at a bin DuckDB recomputes from
    * doc_id — so the sample normalization ((s+1)/2 binning, 8-bit
    * unsigned offset, stereo interleave) is hash-pinned, not just
    * spec-tested.
    */
  def mediaAudioHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.extractFeatures(
      MediaFixtures.uniformWavs(Tables.documents(spark, dir)))
      .map { f =>
        val peakBin = f.features.indexWhere(_ == f.features.max)
        val nonzero = f.features.count(_ != 0f)
        (f.media_id, peakBin, f.features(peakBin).toDouble, nonzero)
      }
      .toDF("media_id", "peak_bin", "peak_value", "nonzero_bins")
      .orderBy("media_id")
  }

  /** Nearest-neighbor resize with a decoded-CONTENT oracle: gradient
    * images ([[MediaFixtures.gradientMedia]] — pixel (x,y) of doc id is
    * (id + 7x + 13y) mod 256) are ImageIO-decoded and resized to 2×2,
    * and DuckDB recomputes every resized pixel from doc_id arithmetic:
    * g(tx,ty) = (id + 7·(tx·w div 2) + 13·(ty·h div 2)) mod 256. That
    * hash-pins the decode, the floor source mapping, AND row-major
    * output order — the preprocessing contract a vision pipeline
    * batches on. All-integer output.
    */
  def mediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.resizeNearest(
        MediaFixtures.gradientMedia(Tables.documents(spark, dir)), 2, 2)
      .select(col("media_id"), col("src_w"), col("src_h"),
        element_at(col("gray"), 1).as("g00"),
        element_at(col("gray"), 2).as("g01"),
        element_at(col("gray"), 3).as("g10"),
        element_at(col("gray"), 4).as("g11"))
      .orderBy("media_id")
  }

  /** Nearest-neighbor audio resample with a decoded-CONTENT oracle —
    * [[mediaResize]]'s audio twin: sawtooth 8-bit WAVs
    * ([[MediaFixtures.sawtoothWavs]] — sample i of doc id is
    * (id + 5i) mod 256) are AudioSystem-decoded and resampled to 8
    * frames, and DuckDB recomputes every output sample from doc_id
    * arithmetic: s(j) = (id + 5·(j·n div 8)) mod 256 over
    * n = (id%5+1)·50. Hash-pins the real decode, the floor frame
    * selection, and output order — the fixed-window batching contract
    * an audio pipeline trains on. All-integer output.
    */
  def mediaAudioResample(spark: SparkSession, dir: String): DataFrame = {
    val base = Multimodal.resampleNearest(
      MediaFixtures.sawtoothWavs(Tables.documents(spark, dir)), 8)
    val sampleCols = (0 until 8).map(j =>
      element_at(col("samples"), j + 1).as(s"s$j"))
    base.select(Seq(col("media_id"), col("src_frames")) ++ sampleCols: _*)
      .orderBy("media_id")
  }

  /** Media-ingest contract gate — the `docs_profile`/`embed_contract`
    * shape for the multimodal batch: ONE row proving the whole batch
    * decoded through the REAL codec path (n_decoded counts successful
    * ImageIO/AudioSystem parses; n_decode_differs counts rows whose
    * feature came from the decoded branch, not the byte-histogram
    * fallback — both must equal n_media), the per-format mix a
    * training-data pipeline budgets by, dimension/duration extremes,
    * and a rate-conformance count (n_bad_rate must be 0: every WAV in
    * the batch at the expected 8 kHz). One decode pass, one
    * map-side-combined aggregate — the per-shard admission row a
    * 100 TB multimodal ingest emits, with the exact per-format counts
    * swapping for sketches at scale without changing the contract
    * shape. The oracle recomputes every field arithmetically from the
    * fixture's doc_id formulas (the `media_decode` convention), so a
    * silently-broken codec or fallback hash-mismatches the gate row.
    */
  def mediaContract(spark: SparkSession, dir: String): DataFrame =
    Multimodal.probeDecode(MediaFixtures.realMedia(Tables.documents(spark, dir)))
      .agg(
        count(lit(1)).as("n_media"),
        sum(when(col("format") =!= "none", 1L).otherwise(0L)).as("n_decoded"),
        sum(when(col("decode_differs"), 1L).otherwise(0L)).as("n_decode_differs"),
        sum(when(col("format") === "png", 1L).otherwise(0L)).as("n_png"),
        sum(when(col("format") === "wav", 1L).otherwise(0L)).as("n_wav"),
        sum(when(col("format") === "bmp", 1L).otherwise(0L)).as("n_bmp"),
        sum(when(col("format") === "gif", 1L).otherwise(0L)).as("n_gif"),
        sum(when(col("format") === "jpeg", 1L).otherwise(0L)).as("n_jpeg"),
        min(when(col("width") > 0, col("width"))).as("min_width"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"),
        max(col("duration_ms")).as("max_duration_ms"),
        sum(when(col("format") === "wav" && col("sample_rate") =!= 8000, 1L)
          .otherwise(0L)).as("n_bad_rate"))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_contract" -> (mediaContract _),
    "media_resize" -> (mediaResize _),
    "media_audio_resample" -> (mediaAudioResample _),
    "media_meta" -> (mediaMeta _),
    "media_features" -> (mediaFeatures _),
    "media_frames" -> (mediaFrames _),
    "media_decode" -> (mediaDecode _),
    "media_video_frames" -> (mediaVideoFrames _),
    "media_histogram" -> (mediaHistogram _),
    "media_audio_histogram" -> (mediaAudioHistogram _),
  )

  def oracles: Map[String, String] = Map(
    // the contract gate replays the fixture's doc_id arithmetic (the
    // media_decode formulas) and aggregates the same admission fields
    "media_contract" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 5 AS INTEGER) WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
        |      WHEN 2 THEN 'bmp' WHEN 3 THEN 'gif' ELSE 'jpeg' END AS format,
        |    CAST(CASE CAST(doc_id % 5 AS INTEGER) WHEN 0 THEN doc_id % 29 + 4
        |      WHEN 2 THEN doc_id % 21 + 3 WHEN 3 THEN doc_id % 11 + 2
        |      WHEN 4 THEN doc_id % 19 + 8 ELSE 0 END AS INTEGER) AS width,
        |    CAST(CASE CAST(doc_id % 5 AS INTEGER) WHEN 0 THEN doc_id % 17 + 3
        |      WHEN 2 THEN doc_id % 13 + 2 WHEN 3 THEN doc_id % 7 + 2
        |      WHEN 4 THEN doc_id % 23 + 8 ELSE 0 END AS INTEGER) AS height,
        |    CAST(CASE WHEN doc_id % 5 = 1 THEN 8000 ELSE 0 END AS INTEGER)
        |      AS sample_rate,
        |    CAST(CASE WHEN doc_id % 5 = 1 THEN (doc_id % 7 + 1) * 10 ELSE 0 END
        |      AS BIGINT) AS duration_ms
        |  FROM documents)
        |SELECT count(*) AS n_media,
        |  CAST(sum(CASE WHEN format <> 'none' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_decoded,
        |  CAST(count(*) AS BIGINT) AS n_decode_differs,
        |  CAST(sum(CASE WHEN format = 'png' THEN 1 ELSE 0 END) AS BIGINT) AS n_png,
        |  CAST(sum(CASE WHEN format = 'wav' THEN 1 ELSE 0 END) AS BIGINT) AS n_wav,
        |  CAST(sum(CASE WHEN format = 'bmp' THEN 1 ELSE 0 END) AS BIGINT) AS n_bmp,
        |  CAST(sum(CASE WHEN format = 'gif' THEN 1 ELSE 0 END) AS BIGINT) AS n_gif,
        |  CAST(sum(CASE WHEN format = 'jpeg' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_jpeg,
        |  min(CASE WHEN width > 0 THEN width END) AS min_width,
        |  max(width) AS max_width,
        |  max(height) AS max_height,
        |  max(duration_ms) AS max_duration_ms,
        |  CAST(sum(CASE WHEN format = 'wav' AND sample_rate <> 8000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_rate
        |FROM d""".stripMargin,
    "media_resize" -> {
      def g(tx: Int, ty: Int) =
        s"CAST((doc_id + 7 * ((${tx} * (doc_id % 5 + 3)) // 2) " +
          s"+ 13 * ((${ty} * (doc_id % 3 + 3)) // 2)) % 256 AS INTEGER)"
      s"""SELECT doc_id AS media_id,
         |  CAST(doc_id % 5 + 3 AS INTEGER) AS src_w,
         |  CAST(doc_id % 3 + 3 AS INTEGER) AS src_h,
         |  ${g(0, 0)} AS g00,
         |  ${g(1, 0)} AS g01,
         |  ${g(0, 1)} AS g10,
         |  ${g(1, 1)} AS g11
         |FROM documents ORDER BY media_id""".stripMargin
    },
    "media_audio_resample" -> {
      def s(j: Int) =
        s"CAST((doc_id + 5 * (($j * n) // 8)) % 256 AS INTEGER) AS s$j"
      s"""WITH d AS (
         |  SELECT doc_id, (doc_id % 5 + 1) * 50 AS n FROM documents)
         |SELECT doc_id AS media_id, CAST(n AS INTEGER) AS src_frames,
         |  ${(0 until 8).map(s).mkString(",\n  ")}
         |FROM d ORDER BY media_id""".stripMargin
    },
    "media_audio_histogram" ->
      """SELECT doc_id AS media_id,
        |  CAST(CASE WHEN doc_id % 3 = 1
        |    THEN ((doc_id * 131) % 256) // 4
        |    ELSE ((doc_id * 977) % 65536) // 1024 END AS INTEGER)
        |    AS peak_bin,
        |  1.0 AS peak_value,
        |  1 AS nonzero_bins
        |FROM documents ORDER BY media_id""".stripMargin,
    "media_histogram" ->
      """SELECT doc_id AS media_id,
        |  CAST((CASE CAST(doc_id % 4 AS INTEGER)
        |    WHEN 0 THEN doc_id % 256
        |    WHEN 1 THEN (299 * (doc_id % 256)) // 1000
        |    WHEN 2 THEN (587 * (doc_id % 256)) // 1000
        |    ELSE (114 * (doc_id % 256)) // 1000 END) // 4 AS INTEGER)
        |    AS peak_bin,
        |  1.0 AS peak_value,
        |  1 AS nonzero_bins
        |FROM documents ORDER BY media_id""".stripMargin,
    "media_video_frames" ->
      """SELECT d.doc_id AS media_id,
        |  CAST(u.k AS INTEGER) AS frame_index,
        |  CAST((d.doc_id * 31 + u.k * 17) % 256 AS INTEGER) AS first_px,
        |  232 AS trap_px
        |FROM documents d, UNNEST(range(d.doc_id % 4 + 2)) u(k)
        |ORDER BY media_id, frame_index""".stripMargin,
    "media_decode" ->
      """SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 5 AS INTEGER) WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
        |    WHEN 2 THEN 'bmp' WHEN 3 THEN 'gif' ELSE 'jpeg' END AS format,
        |  CAST(CASE CAST(doc_id % 5 AS INTEGER) WHEN 0 THEN doc_id % 29 + 4
        |    WHEN 2 THEN doc_id % 21 + 3 WHEN 3 THEN doc_id % 11 + 2
        |    WHEN 4 THEN doc_id % 19 + 8 ELSE 0 END AS INTEGER) AS width,
        |  CAST(CASE CAST(doc_id % 5 AS INTEGER) WHEN 0 THEN doc_id % 17 + 3
        |    WHEN 2 THEN doc_id % 13 + 2 WHEN 3 THEN doc_id % 7 + 2
        |    WHEN 4 THEN doc_id % 23 + 8 ELSE 0 END AS INTEGER) AS height,
        |  CAST(CASE WHEN doc_id % 5 = 1 THEN 8000 ELSE 0 END AS INTEGER)
        |    AS sample_rate,
        |  CAST(CASE WHEN doc_id % 5 = 1 THEN (doc_id % 7 + 1) * 10 ELSE 0 END
        |    AS BIGINT) AS duration_ms,
        |  TRUE AS decode_differs
        |FROM documents ORDER BY media_id""".stripMargin,
    "media_features" ->
      """SELECT doc_id AS media_id,
        |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        |  CASE WHEN octet_length(CAST(text AS BLOB)) > 0 THEN 1.0 ELSE 0.0 END
        |    AS feature_norm
        |FROM documents ORDER BY media_id""".stripMargin,
    "media_frames" ->
      """SELECT doc_id AS media_id,
        |  CAST(least(greatest(1, n_chars * 10 // 1000), 32) AS BIGINT) AS n_frames,
        |  CAST((least(greatest(1, n_chars * 10 // 1000), 32) - 1) * 1000 AS BIGINT)
        |    AS max_offset_ms
        |FROM documents WHERE doc_id % 3 + 1 = 3 ORDER BY media_id""".stripMargin,
    "media_meta" ->
      """SELECT doc_id AS media_id,
        |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
        |  md5(text) AS payload_md5,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        |  n_chars * 10 AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin,
  )
}
