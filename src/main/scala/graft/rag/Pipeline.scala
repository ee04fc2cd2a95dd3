package graft.rag

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.chunk.Chunkers
import graft.embed.HashingEmbedder
import graft.eval.Metrics
import graft.functions.Vec
import graft.model.{Chunk, Document}

/** The reference's 8-stage experiment (reference: main.py:415-461)
  * restated as ONE lazy Spark DAG (SURVEY §3.1):
  *
  *   documents → flatMap(chunk ×5 strategies) → embedding column
  *   (×N models) → [index] ; queries → query vectors → similarity join →
  *   window top-k → relevance → per-query metrics → per-config ranking
  *
  * The reference's triple nested loop over strategy × model × query
  * (main.py:274-318) becomes join keys, not control flow — 25 configs or
  * 25,000 evaluate in the same two shuffles (the top-k exchange and the
  * metric aggregation).
  */
object Pipeline {

  /** Stage 3: chunk every document with every strategy (main.py:175-195). */
  def chunkDocuments(docs: Dataset[Document],
      strategies: Seq[String] = Chunkers.strategyNames): Dataset[Chunk] = {
    import docs.sparkSession.implicits._
    val strats = strategies
    docs.flatMap(d => strats.flatMap(s => Chunkers.all(s)(d.content, d.source_file)))
  }

  /** Stage 4: attach embeddings for every model — chunks × models with a
    * deterministic hashing embedder (main.py:198-221). Narrow map; no
    * shuffle.
    */
  def embedChunks(chunks: DataFrame,
      models: Seq[HashingEmbedder.Model] = HashingEmbedder.models): DataFrame = {
    val ms = models // serializable capture
    val embedAllUdf = udf((text: String) => HashingEmbedder.embedAll(text, ms))
    val names = typedLit(models.map(_.name))
    chunks
      .withColumn("_embs", embedAllUdf(col("content")))
      .select(col("*"), posexplode(col("_embs")).as(Seq("_mi", "embedding")))
      .withColumn("model", element_at(names, col("_mi") + 1))
      .drop("_embs", "_mi")
  }

  /** Stage 6a: query vectors per model (main.py:292). */
  def embedQueries(queries: DataFrame,
      models: Seq[HashingEmbedder.Model] = HashingEmbedder.models): DataFrame = {
    val byName = HashingEmbedder.modelsByName
    val embedUdf = udf((text: String, model: String) =>
      HashingEmbedder.embed(text, byName(model)))
    queries
      .withColumn("model", explode(typedLit(models.map(_.name))))
      .withColumn("qvec", embedUdf(col("query"), col("model")))
  }

  /** Stage 6b: retrieval — cosine top-k per (strategy, model, query).
    * The query side is broadcast; ties rank by chunk_id asc (pinned
    * order, SURVEY §7). Scale: for huge indexes swap the window for
    * Knn.bruteForceTopK's per-partition heap or an LSH bucket join; the
    * logical contract is identical.
    */
  def retrieve(embedded: DataFrame, queryVecs: DataFrame, k: Int = 10,
      payload: Option[DataFrame] = None): DataFrame = {
    // Project away vectors and payload BEFORE the top-k exchange: the
    // shuffle carries (keys, chunk_id, sim) — a few dozen bytes per
    // candidate instead of the embedding + content (at scale the
    // difference is GBs per stage). Payload is joined back onto the
    // k·|queries| winners only.
    val sims = embedded.join(
        broadcast(queryVecs.select(col("query_id"), col("model").as("qmodel"), col("qvec"))),
        col("model") === col("qmodel"))
      .select(col("strategy"), col("model"), col("query_id"), col("chunk_id"),
        Vec.dot(col("embedding"), col("qvec")).as("sim"))
    val w = Window.partitionBy(col("strategy"), col("model"), col("query_id"))
      .orderBy(col("sim").desc, col("chunk_id").asc)
    val top = sims
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    val pay = payload.getOrElse(embedded
      .select(col("chunk_id"), col("source_file"), col("content"))
      .dropDuplicates("chunk_id"))
    top.join(pay, "chunk_id")
      .select(col("strategy"), col("model"), col("query_id"), col("rank"),
        col("sim"), col("chunk_id"), col("source_file"), col("content"))
  }

  /** Stages 7–8: evaluation + ranked per-config report. */
  def evaluate(hits: DataFrame, queries: DataFrame, chunks: DataFrame): DataFrame = {
    val chunkSources = chunks.select(col("strategy"), col("source_file")).distinct()
    val expected = Metrics.resolveExpectedSources(chunkSources, queries)
    Metrics.ranked(Metrics.perConfig(Metrics.perQuery(hits, queries, expected)))
  }

  /** Full experiment: documents + queries → ranked per-config metrics. */
  def run(spark: SparkSession, docs: Dataset[Document], queries: DataFrame,
      models: Seq[HashingEmbedder.Model] = HashingEmbedder.models,
      strategies: Seq[String] = Chunkers.strategyNames, k: Int = 10): DataFrame = {
    // chunks feed three consumers (embedding, hit payload, source
    // resolution) — materialize once, EAGERLY: a lazy cache races between
    // parallel plan branches and each recomputes the upstream
    val chunks = chunkDocuments(docs, strategies).toDF().cache()
    chunks.count()
    // Materialize the index: without a barrier Catalyst inlines the
    // embedding UDF into the post-join projection and recomputes every
    // chunk's vector once PER QUERY. This is also the reference's own
    // shape — stage 5 persists the index before retrieval (main.py:224).
    val embedded = embedChunks(chunks, models).cache()
    embedded.count()
    val hits = retrieve(embedded, embedQueries(queries, models), k,
      payload = Some(chunks.select(col("chunk_id"), col("source_file"), col("content"))))
    evaluate(hits, queries, chunks)
  }
}
