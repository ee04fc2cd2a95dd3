package graft.rag

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.chunk.Chunkers
import graft.embed.HashingEmbedder
import graft.eval.Metrics
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

  /** Stages 3+4 fused: chunk ×strategies and embed ×models in ONE
    * narrow pass over documents — one row per (chunk, model). Chunking
    * and embedding are both per-document pure functions, so fusing them
    * halves the number of full materializations (the separate
    * chunk-then-embed shape pays an extra cache write + read of every
    * chunk). Tokenization happens once per chunk across all models
    * (HashingEmbedder.embedAll).
    */
  def chunkEmbed(docs: Dataset[Document],
      strategies: Seq[String] = Chunkers.strategyNames,
      models: Seq[HashingEmbedder.Model] = HashingEmbedder.models): DataFrame = {
    import docs.sparkSession.implicits._
    val strats = strategies
    val ms = models
    docs.flatMap { d =>
      strats.flatMap(s => Chunkers.all(s)(d.content, d.source_file)).flatMap { c =>
        val embs = HashingEmbedder.embedAll(c.content, ms)
        ms.indices.map(i =>
          (c.chunk_id, c.content, c.source_file, c.chunk_index, c.strategy,
            ms(i).name, embs(i)))
      }
    }.toDF("chunk_id", "content", "source_file", "chunk_index", "strategy",
      "model", "embedding")
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
    * Ties rank by chunk_id asc (pinned order, SURVEY §7).
    *
    * Shape (the part that must survive 100 TB): the query vectors are
    * collected and broadcast (a query set is small by construction); the
    * index side streams through the executors ONCE in a fused
    * mapPartitions that computes dot products and keeps a bounded heap
    * per (strategy, model, query) — the |index|×|queries| similarity
    * rows are never materialized or shuffled. Only the ≤ P×Q×k partial
    * winners reach the final exact merge (TopKAggregator, partial-agg
    * map-side combine). The naive window formulation shuffles and sorts
    * the full cross product — measured 6× slower at sf0.1 and
    * catastrophic at scale.
    */
  def retrieve(embedded: DataFrame, queryVecs: DataFrame, k: Int = 10,
      payload: Option[DataFrame] = None): DataFrame = {
    val spark = embedded.sparkSession
    import spark.implicits._
    val qByModel: Map[String, Array[(String, Array[Float])]] = queryVecs
      .select(col("model"), col("query_id"), col("qvec"))
      .as[(String, String, Array[Float])].collect()
      .groupBy(_._1)
      .map { case (m, rs) => m -> rs.map(r => (r._2, r._3)).sortBy(_._1) }
    val bc = spark.sparkContext.broadcast(qByModel)
    val kk = k

    // Worst candidate at the heap head: lowest sim, then largest chunk_id
    // (ties keep the smaller id, matching rank order sim desc/id asc).
    val worstFirst: Ordering[(Double, String)] = new Ordering[(Double, String)] {
      override def compare(a: (Double, String), b: (Double, String)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else a._2.compareTo(b._2)
      }
    }

    val partial = embedded
      .select(col("strategy"), col("model"), col("chunk_id"), col("embedding"))
      .as[(String, String, String, Array[Float])]
      .mapPartitions { it =>
        val qs = bc.value
        val heaps = scala.collection.mutable.LinkedHashMap
          .empty[(String, String, String), scala.collection.mutable.PriorityQueue[(Double, String)]]
        it.foreach { case (strategy, model, chunkId, vec) =>
          val queries = qs.getOrElse(model, Array.empty)
          var qi = 0
          while (qi < queries.length) {
            val (qid, qvec) = queries(qi)
            // left-to-right double accumulation — bit-identical to
            // DotProduct / the DuckDB oracle
            var s = 0.0
            val n = math.min(vec.length, qvec.length)
            var i = 0
            while (i < n) { s += vec(i).toDouble * qvec(i).toDouble; i += 1 }
            val key = (strategy, model, qid)
            val h = heaps.getOrElseUpdate(key,
              scala.collection.mutable.PriorityQueue.empty(worstFirst))
            if (h.size < kk) h.enqueue((s, chunkId))
            else {
              val (ws, wid) = h.head
              if (s > ws || (s == ws && chunkId < wid)) { h.dequeue(); h.enqueue((s, chunkId)) }
            }
            qi += 1
          }
        }
        heaps.iterator.flatMap { case ((st, m, q), h) =>
          h.iterator.map { case (s, cid) => (st, m, q, cid, s) }
        }
      }

    val topkAgg = new graft.functions.TopKAggregator[String](kk).toColumn
    val top = partial
      .groupByKey { case (st, m, q, _, _) => (st, m, q) }
      .mapValues { case (_, _, _, cid, s) => (cid, s) }
      .agg(topkAgg.name("topk"))
      .flatMap { case ((st, m, q), winners) =>
        winners.zipWithIndex.map { case ((s, cid), i) => (st, m, q, i + 1, s, cid) }
      }
      .toDF("strategy", "model", "query_id", "rank", "sim", "chunk_id")

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
      strategies: Seq[String] = Chunkers.strategyNames, k: Int = 10,
      prebuilt: Option[DataFrame] = None): DataFrame = {
    // The fused chunk+embed index feeds three consumers (retrieval, hit
    // payload, source resolution) — cache it; partition-level cache
    // locking computes each partition once even when broadcast branches
    // race (verified — an eager count() barrier adds a full extra scan
    // for no benefit). This mirrors the reference persisting the index
    // before retrieval (main.py:224). `prebuilt` lets a repeated caller
    // pass a MEMOIZED index frame: chunkEmbed's plan embeds typed
    // chunker closures, so a fresh build per call is a fresh
    // non-canonical plan and this cache() would register a new entry
    // every call (the leak CacheLifecycleSpec pins — graft.queries.Rag
    // memoizes and passes the frame in).
    val embedded = prebuilt.getOrElse(chunkEmbed(docs, strategies, models)).cache()
    // chunk-grain view (payload, source resolution): one model's slice
    // of the cache — a narrow filter, not a second materialization
    val chunks = embedded.filter(col("model") === models.head.name)
      .select(col("chunk_id"), col("strategy"), col("source_file"), col("content"))
    val hits = retrieve(embedded, embedQueries(queries, models), k,
      payload = Some(chunks.select(col("chunk_id"), col("source_file"), col("content"))))
    evaluate(hits, queries, chunks)
  }
}
