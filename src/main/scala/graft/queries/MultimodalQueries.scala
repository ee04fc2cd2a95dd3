package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

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

  /** Batched stub-decode features + norm (rows-only: byte histograms are
    * out of SQL's reach; covered by MultimodalSpec).
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.extractFeatures(media(spark, dir)).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        round(graft.functions.Vec.l2Norm(col("features")), 4).as("feature_norm"))
      .orderBy("media_id")
  }

  /** Frame sampling over video-kind rows (rows-only). */
  def mediaFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.sampleFrames(media(spark, dir)).toDF()
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"), max(col("offset_ms")).as("max_offset_ms"))
      .orderBy("media_id")
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_meta" -> (mediaMeta _),
    "media_features" -> (mediaFeatures _),
    "media_frames" -> (mediaFrames _),
  )

  def oracles: Map[String, String] = Map(
    "media_meta" ->
      """SELECT doc_id AS media_id,
        |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
        |  md5(text) AS payload_md5,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        |  n_chars * 10 AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin,
  )
}
