package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.chunk.Chunkers
import graft.model.Document
import graft.rag.Pipeline
import graft.text.TextFns

/** Chunking + end-to-end RAG surface over the `documents` fixture.
  *
  * The chunkers are order-sensitive per-document folds (typed flatMap,
  * not SQL), so their general semantics are covered by ScalaTest specs
  * on structured markdown. On THIS fixture, however, every document is
  * a single-line, punctuation-free, < 512-token text — each chunker
  * provably emits exactly one chunk per document — so the fixture-level
  * oracle is expressible in SQL and checks content hash, token count
  * and metadata bit-exactly.
  */
object Rag {

  /** documents table → Dataset[Document] with a unique path-like source
    * (`src3/doc42.md`) so substring source-patterns behave like the
    * reference's file paths.
    */
  def toDocuments(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        concat(col("source"), lit("/doc"), col("doc_id"), lit(".md")).as("source_file"),
        col("text").as("content"))
      .as[Document]
  }

  /** Deterministic query set derived from the corpus: the first 8 tokens
    * of selected documents form the query, the first 5 are the expected
    * keywords, and the document's own path is the source pattern.
    */
  def syntheticQueries(spark: SparkSession, dir: String, n: Int = 12): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < n)
      .select(
        concat(lit("q"), col("doc_id")).as("query_id"),
        concat_ws(" ", slice(TextFns.tokens(col("text")), 1, 8)).as("query"),
        slice(TextFns.tokens(col("text")), 1, 5).as("expected_keywords"),
        array(concat(lit("/doc"), col("doc_id"), lit(".md"))).as("expected_source_patterns"))

  private def chunkQuery(strategy: String, metaCols: Seq[String])(
      spark: SparkSession, dir: String): DataFrame = {
    val chunks = Pipeline.chunkDocuments(toDocuments(spark, dir), Seq(strategy))
    val base = Seq(
      col("source_file"), col("chunk_index"), col("strategy"),
      md5(col("content")).as("content_md5"),
      col("metadata.chunk_size").as("chunk_size"))
    val extra = metaCols.map(m => col(s"metadata.$m").as(m))
    chunks.toDF()
      .select(base ++ extra: _*)
      .orderBy("source_file", "chunk_index")
  }

  /** Full experiment (reference main.py:415-461) on the fixture corpus:
    * 5 strategies × 5 hashing models × 12 synthetic queries → ranked
    * per-config IR metrics.
    */
  def ragEval(spark: SparkSession, dir: String): DataFrame =
    Pipeline.run(spark, toDocuments(spark, dir), syntheticQueries(spark, dir))
      .select(col("strategy"), col("model"),
        round(col("top_1_accuracy"), 4).as("top_1_accuracy"),
        round(col("top_3_accuracy"), 4).as("top_3_accuracy"),
        round(col("mrr"), 4).as("mrr"),
        round(col("avg_similarity"), 4).as("avg_similarity"),
        col("num_queries"),
        round(col("combined_score"), 4).as("combined_score"))
      .orderBy("strategy", "model")

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "chunk_fixed_size" -> chunkQuery("fixed_size", Seq("sentence_count")) _,
    "chunk_recursive" -> chunkQuery("recursive", Seq("level")) _,
    "chunk_structure_aware" -> chunkQuery("structure_aware", Seq("level")) _,
    "chunk_hybrid" -> chunkQuery("hybrid", Seq("level")) _,
    "chunk_table_aware" -> chunkQuery("table_aware", Seq("is_table", "chunk_type")) _,
    "rag_eval" -> (ragEval _),
  )

  // ---- fixture-degenerate DuckDB oracles (see scaladoc above) --------

  private val src = "source || '/doc' || CAST(doc_id AS VARCHAR) || '.md'"
  private def tokCount(of: String) =
    s"len(regexp_split_to_array(trim($of), '\\s+')) + CAST(length($of) // 4 AS INTEGER)"

  private def chunkOracle(strategy: String, contentOf: String, tokensOf: String,
      extras: String) =
    s"""SELECT $src AS source_file,
       |  0 AS chunk_index,
       |  '$strategy' AS strategy,
       |  md5($contentOf) AS content_md5,
       |  ${tokCount(tokensOf)} AS chunk_size,
       |  $extras
       |FROM documents ORDER BY source_file""".stripMargin

  def oracles: Map[String, String] = Map(
    "chunk_fixed_size" -> chunkOracle("fixed_size", "trim(text)", "trim(text)",
      "1 AS sentence_count"),
    "chunk_recursive" -> chunkOracle("recursive", "trim(text)", "text",
      "'paragraph' AS level"),
    "chunk_structure_aware" -> chunkOracle("structure_aware", "trim(text)", "text",
      "'1' AS level"),
    "chunk_hybrid" -> chunkOracle("hybrid", "trim(text)", "text",
      "'paragraph' AS level"),
    "chunk_table_aware" -> chunkOracle("table_aware", "text", "text",
      "false AS is_table, 'text' AS chunk_type"),
  )
}
