package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.search.Knn

/** Similarity-search query surface (SURVEY §2.4 V3, §2.3 E6).
  *
  * Flagship: exact cosine top-k over the `embeddings` fixture — the Spark
  * restatement of the reference's Qdrant search loop
  * (reference: src/vector_db.py:93-119, main.py:274-318).
  */
object Similarity {

  val K = 10
  val NumQueries = 10

  def knnTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb
      .filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    Knn.bruteForceTopK(emb, queries, K)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Pairwise cosine of a small id range — exercises E6 directly. */
  def cosinePairs(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Vec
    val emb = Tables.embeddings(spark, dir)
    val a = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_vec"))
    val b = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("b_id"), col("embedding").as("b_vec"))
    a.crossJoin(broadcast(b))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(Vec.dot(col("a_vec"), col("b_vec")), 4).as("sim"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** IVF approximate kNN: 16 fixture vectors as centroids, probe 4 —
    * deterministic, so exactly reproducible by the oracle.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    import graft.search.Ann
    val emb = Tables.embeddings(spark, dir)
    val centroids = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val queries = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    Ann.ivfTopK(emb, queries, centroids, K, nprobe = 4)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Random-hyperplane LSH kNN (rows-only check: the candidate pruning
    * is deterministic but bulky to restate in SQL; recall is covered by
    * AnnSpec on clustered data).
    */
  def knnLsh(spark: SparkSession, dir: String): DataFrame = {
    import graft.search.Ann
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    Ann.lshTopK(emb, queries, K, dim = 64)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  // DuckDB-side dot product with identical double accumulation order.
  private def duckDot(a: String, b: String): String =
    s"list_aggregate(list_transform(list_zip($a, $b), " +
      s"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_topk" -> (knnTopK _),
    "cosine_pairs" -> (cosinePairs _),
    "ann_ivf" -> (annIvf _),
    "knn_lsh" -> (knnLsh _),
  )

  def oracles: Map[String, String] = Map(
    "knn_topk" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id < $NumQueries),
         |sims AS (
         |  SELECT q.query_id, e.vec_id,
         |         ${duckDot("e.embedding", "q.qv")} AS sim
         |  FROM embeddings e CROSS JOIN q),
         |ranked AS (
         |  SELECT query_id, vec_id,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |                            ORDER BY sim DESC, vec_id ASC) AS INTEGER) AS rank
         |  FROM sims)
         |SELECT query_id, rank, vec_id FROM ranked WHERE rank <= $K
         |ORDER BY query_id, rank""".stripMargin,
    "cosine_pairs" ->
      s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |       round(${duckDot("a.embedding", "b.embedding")}, 4) AS sim
         |FROM embeddings a CROSS JOIN embeddings b
         |WHERE a.vec_id < 20 AND b.vec_id < 20 AND a.vec_id < b.vec_id
         |ORDER BY a_id, b_id""".stripMargin,
    "ann_ivf" ->
      s"""WITH cent AS (
         |  SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < 16),
         |q AS (
         |  SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id < $NumQueries),
         |assign AS (
         |  SELECT vec_id, embedding, cent_id FROM (
         |    SELECT e.vec_id, e.embedding, c.cent_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${duckDot("e.embedding", "c.cvec")} DESC, c.cent_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, qv, cent_id FROM (
         |    SELECT q.query_id, q.qv, c.cent_id,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY ${duckDot("q.qv", "c.cvec")} DESC, c.cent_id ASC) AS rn
         |    FROM q CROSS JOIN cent c) WHERE rn <= 4),
         |cands AS (
         |  SELECT p.query_id, a.vec_id,
         |         ${duckDot("a.embedding", "p.qv")} AS sim
         |  FROM assign a JOIN probes p ON a.cent_id = p.cent_id),
         |ranked AS (
         |  SELECT query_id, vec_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, vec_id ASC) AS INTEGER) AS rank
         |  FROM cands)
         |SELECT query_id, rank, vec_id FROM ranked WHERE rank <= $K
         |ORDER BY query_id, rank""".stripMargin,
  )
}
