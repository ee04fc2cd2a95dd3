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

  /** Memoized chunk+embed index frames per (session, dir, config) —
    * the exactIds pattern: chunkEmbed's plan embeds typed chunker
    * closures, so a fresh build per call is a fresh non-canonical plan
    * and every downstream `.cache()` would register a NEW entry per
    * call (library-caller cache growth, CacheLifecycleSpec). Reusing
    * the frame instance makes the per-call `.cache()` idempotent.
    */
  // FrameMemo, not SessionMemo[_, DataFrame]: a DataFrame value would
  // pin the session through the WeakHashMap value→key chain (ADVICE r15)
  private val embMemo = new graft.FrameMemo[(String, String)]

  private def embeddedFull(spark: SparkSession, dir: String): DataFrame =
    embMemo.computeIfAbsent(spark, (dir, "full"))(
      Pipeline.chunkEmbed(toDocuments(spark, dir),
        Chunkers.strategyNames, graft.embed.HashingEmbedder.models))

  private def embedded2(spark: SparkSession, dir: String): DataFrame =
    embMemo.computeIfAbsent(spark, (dir, "fixed2"))(
      Pipeline.chunkEmbed(toDocuments(spark, dir), Seq("fixed_size"),
        graft.embed.HashingEmbedder.models.take(2)))

  /** Full experiment (reference main.py:415-461) on the fixture corpus:
    * 5 strategies × 5 hashing models × 12 synthetic queries → ranked
    * per-config IR metrics.
    */
  def ragEval(spark: SparkSession, dir: String): DataFrame =
    Pipeline.run(spark, toDocuments(spark, dir), syntheticQueries(spark, dir),
        prebuilt = Some(embeddedFull(spark, dir)))
      .select(col("strategy"), col("model"),
        round(col("top_1_accuracy"), 4).as("top_1_accuracy"),
        round(col("top_3_accuracy"), 4).as("top_3_accuracy"),
        round(col("mrr"), 4).as("mrr"),
        round(col("avg_similarity"), 4).as("avg_similarity"),
        col("num_queries"),
        round(col("combined_score"), 4).as("combined_score"))
      .orderBy("strategy", "model")

  /** Retrieval ranks for ONE strategy × two hashing models, with a FULL
    * DuckDB oracle: the oracle recomputes tokenize → bucket-hash → TF →
    * float32 weights → dot product with the same float casts and the
    * same left-to-right (bucket-ascending) double accumulation, so the
    * ranks match bit-exactly — an end-to-end proof of the chunk→embed→
    * retrieve path, not just of relational plumbing.
    */
  def ragRetrieval(spark: SparkSession, dir: String): DataFrame = {
    import graft.embed.HashingEmbedder
    val models = HashingEmbedder.models.take(2) // hash-64, hash-128
    val embedded = embedded2(spark, dir).cache()
    val chunks = embedded.filter(col("model") === models.head.name)
    val qv = Pipeline.embedQueries(syntheticQueries(spark, dir), models)
    Pipeline.retrieve(embedded, qv, 10,
      payload = Some(chunks.select(col("chunk_id"), col("source_file"), col("content"))))
      .select(col("model"), col("query_id"), col("rank"), col("chunk_id"))
      .orderBy("model", "query_id", "rank")
  }

  /** Context-window token budget for [[ragContextPack]] — sized so a
    * typical fixture query fits 2–4 retrieved chunks. */
  val CtxBudget = 600

  /** Context assembly — the SERVING-side step after retrieval that the
    * reference's consumer runs before prompting an LLM: the top-10
    * retrieved chunks (the `rag_retrieval` slice, first hashing model)
    * are packed into the context window in rank order under a
    * [[CtxBudget]]-token budget using the reference's token heuristic
    * (words + chars/4, src/utils.py:30-35). `included` is the prefix
    * rule (cumulative tokens ≤ budget — cum is monotone, so this IS
    * take-while); every rank row is emitted with its running total so
    * the packing decision is auditable. One window over ≤ 10 rows per
    * query — the retrieval output is already per-query bounded, so the
    * packer adds no corpus-scale work at any SF. The oracle chains the
    * bit-exact retrieval replay into the token count and running sum.
    */
  def ragContextPack(spark: SparkSession, dir: String): DataFrame = {
    import graft.embed.HashingEmbedder
    import graft.text.TextFns
    import org.apache.spark.sql.expressions.Window
    val model = HashingEmbedder.models.head
    val embedded = embedded2(spark, dir)
    val chunks = embedded.filter(col("model") === model.name)
      .select(col("chunk_id"), col("content"))
    val hits = ragRetrieval(spark, dir).filter(col("model") === model.name)
    val w = Window.partitionBy("query_id").orderBy("rank")
    hits.join(chunks, "chunk_id")
      .select(col("query_id"), col("rank"), col("chunk_id"),
        TextFns.tokenCount(col("content")).as("tok"))
      .withColumn("cum_tokens", sum(col("tok")).over(w))
      .withColumn("included",
        when(col("cum_tokens") <= CtxBudget, 1).otherwise(0))
      .orderBy("query_id", "rank")
  }

  /** Per-config IR metrics over the oracle-checked retrieval slice —
    * extends the rag_retrieval proof through relevance (R1), top-k/MRR/
    * avg-similarity (R2–R5), expected-source resolution (R6) and
    * per-config aggregation (R7).
    */
  /** Shared metrics sub-pipeline for the 2-model oracle slice:
    * per-(model) R1–R7 metrics, unrounded. */
  private def perModelMetrics(spark: SparkSession, dir: String): DataFrame = {
    import graft.embed.HashingEmbedder
    import graft.eval.Metrics
    val models = HashingEmbedder.models.take(2)
    val queries = syntheticQueries(spark, dir)
    val embedded = embedded2(spark, dir).cache()
    val chunks = embedded.filter(col("model") === models.head.name)
    val hits = Pipeline.retrieve(embedded, Pipeline.embedQueries(queries, models), 10,
      payload = Some(chunks.select(col("chunk_id"), col("source_file"), col("content"))))
    val expected = Metrics.resolveExpectedSources(
      chunks.select(col("strategy"), col("source_file")).distinct(), queries)
    Metrics.perConfig(Metrics.perQuery(hits, queries, expected))
  }

  def ragMetrics(spark: SparkSession, dir: String): DataFrame =
    perModelMetrics(spark, dir)
      .select(col("model"),
        round(col("top_1_accuracy"), 4).as("top_1_accuracy"),
        round(col("top_3_accuracy"), 4).as("top_3_accuracy"),
        round(col("mrr"), 4).as("mrr"),
        round(col("avg_similarity"), 4).as("avg_similarity"),
        col("num_queries"))
      .orderBy("model")

  /** R8 argmax + R9 summary stats over the per-config metrics, as one
    * row (best config pinned by combined-score desc, model asc).
    */
  def ragSummary(spark: SparkSession, dir: String): DataFrame = {
    // both output branches (summary agg, argmax) consume pm — cache the
    // per-config table (a handful of rows) so the metrics pipeline
    // beneath it runs once. Memoized like the index frames: the plan
    // embeds Pipeline.retrieve's typed heap closures, so a fresh build
    // per call would leak one cache entry per call.
    val pm = embMemo.computeIfAbsent(spark, (dir, "pm"))(
      perModelMetrics(spark, dir)
        .withColumn("combined_score", col("top_3_accuracy") + col("mrr")))
      .cache()
    val summary = pm.agg(
      round(avg(col("top_1_accuracy")), 4).as("mean_top_1"),
      round(avg(col("top_3_accuracy")), 4).as("mean_top_3"),
      round(avg(col("mrr")), 4).as("mean_mrr"),
      round(avg(col("avg_similarity")), 4).as("mean_avg_similarity"),
      round(max(col("combined_score")), 4).as("max_combined_score"),
      count(lit(1)).as("num_configs"))
    val best = pm
      .orderBy(col("combined_score").desc, col("model").asc)
      .limit(1)
      .select(col("model").as("best_model"))
    summary.crossJoin(best)
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rag_retrieval" -> (ragRetrieval _),
    "rag_metrics" -> (ragMetrics _),
    "chunk_fixed_size" -> chunkQuery("fixed_size", Seq("sentence_count")) _,
    "chunk_recursive" -> chunkQuery("recursive", Seq("level")) _,
    "chunk_structure_aware" -> chunkQuery("structure_aware", Seq("level")) _,
    "chunk_hybrid" -> chunkQuery("hybrid", Seq("level")) _,
    "chunk_table_aware" -> chunkQuery("table_aware", Seq("is_table", "chunk_type")) _,
    "rag_eval" -> (ragEval _),
    "rag_summary" -> (ragSummary _),
    "rag_context_pack" -> (ragContextPack _),
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

  /** Shared oracle CTE prefix: fixture docs → hashed TF → float32
    * weights → bucket-ordered double dot products for every
    * (model, query, doc) triple — the SQL restatement of
    * HashingEmbedder.embed + Vec.dot, bit-exact.
    */
  private def ragSimsCtes(models: Seq[graft.embed.HashingEmbedder.Model]): String = {
    val vals = models.map(m => s"('${m.name}', ${m.dim}, ${m.seed})").mkString(", ")
    val bucket = "CAST(('0x' || substr(md5(CAST(m.seed AS VARCHAR) || '|' || t.tok), 1, 8)) AS BIGINT) % m.dim"
    s"""WITH models(model, dim, seed) AS (VALUES $vals),
       |docs AS (
       |  SELECT $src AS sf, trim(text) AS content FROM documents),
       |dtoks AS (
       |  SELECT sf, unnest(regexp_split_to_array(content, '\\s+')) AS tok FROM docs),
       |dtf AS (
       |  SELECT m.model, t.sf, $bucket AS bucket, count(*) AS cnt
       |  FROM dtoks t CROSS JOIN models m GROUP BY 1, 2, 3),
       |dnorm AS (
       |  SELECT model, sf, sqrt(sum(CAST(cnt AS DOUBLE) * cnt)) AS nrm
       |  FROM dtf GROUP BY 1, 2),
       |dvec AS (
       |  SELECT dtf.model, dtf.sf, bucket, CAST(cnt / nrm AS FLOAT) AS w
       |  FROM dtf JOIN dnorm ON dtf.model = dnorm.model AND dtf.sf = dnorm.sf),
       |q AS (
       |  SELECT 'q' || CAST(doc_id AS VARCHAR) AS query_id,
       |         list_slice(regexp_split_to_array(trim(text), '\\s+'), 1, 8) AS qt
       |  FROM documents WHERE doc_id < 12),
       |qtoks AS (SELECT query_id, unnest(qt) AS tok FROM q),
       |qtf AS (
       |  SELECT m.model, t.query_id, $bucket AS bucket, count(*) AS cnt
       |  FROM qtoks t CROSS JOIN models m GROUP BY 1, 2, 3),
       |qnorm AS (
       |  SELECT model, query_id, sqrt(sum(CAST(cnt AS DOUBLE) * cnt)) AS nrm
       |  FROM qtf GROUP BY 1, 2),
       |qvec AS (
       |  SELECT qtf.model, qtf.query_id, bucket, CAST(cnt / nrm AS FLOAT) AS w
       |  FROM qtf JOIN qnorm ON qtf.model = qnorm.model AND qtf.query_id = qnorm.query_id),
       |shared AS (
       |  SELECT d.model, q.query_id, d.sf,
       |    list_aggregate(list(CAST(q.w AS DOUBLE) * CAST(d.w AS DOUBLE) ORDER BY d.bucket), 'sum') AS sim
       |  FROM dvec d JOIN qvec q ON d.model = q.model AND d.bucket = q.bucket
       |  GROUP BY 1, 2, 3),
       |allpairs AS (
       |  SELECT m.model, q.query_id, docs.sf FROM docs
       |  CROSS JOIN models m CROSS JOIN q),
       |sims AS (
       |  SELECT a.model, a.query_id, a.sf, coalesce(s.sim, 0.0) AS sim
       |  FROM allpairs a LEFT JOIN shared s
       |    ON a.model = s.model AND a.query_id = s.query_id AND a.sf = s.sf)""".stripMargin
  }

  private def twoModels = graft.embed.HashingEmbedder.models.take(2)

  private val ragRetrievalOracle: String =
    s"""${ragSimsCtes(twoModels)},
       |ranked AS (
       |  SELECT model, query_id, sf || '_fixed_size_0' AS chunk_id,
       |    CAST(row_number() OVER (PARTITION BY model, query_id
       |                       ORDER BY sim DESC, sf || '_fixed_size_0' ASC) AS INTEGER) AS rank
       |  FROM sims)
       |SELECT model, query_id, rank, chunk_id FROM ranked WHERE rank <= 10
       |ORDER BY model, query_id, rank""".stripMargin

  // retrieval replay (first model only) → chunk token counts → running
  // sum → prefix-rule inclusion; sum() is CAST BIGINT (DuckDB sums
  // integers into HUGEINT) and rank ties are impossible (row_number)
  private val ragContextPackOracle: String =
    s"""${ragSimsCtes(graft.embed.HashingEmbedder.models.take(1))},
       |ranked AS (
       |  SELECT query_id, sf,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |                       ORDER BY sim DESC, sf || '_fixed_size_0' ASC)
       |         AS INTEGER) AS rank
       |  FROM sims),
       |ctx AS (
       |  SELECT r.query_id, r.rank, r.sf || '_fixed_size_0' AS chunk_id,
       |    ${tokCount("d.content")} AS tok
       |  FROM ranked r JOIN docs d ON r.sf = d.sf
       |  WHERE r.rank <= 10),
       |packed AS (
       |  SELECT query_id, rank, chunk_id, tok,
       |    CAST(sum(tok) OVER (PARTITION BY query_id ORDER BY rank) AS BIGINT)
       |      AS cum_tokens
       |  FROM ctx)
       |SELECT query_id, rank, chunk_id, CAST(tok AS INTEGER) AS tok,
       |  cum_tokens,
       |  CAST(CASE WHEN cum_tokens <= $CtxBudget THEN 1 ELSE 0 END AS INTEGER)
       |    AS included
       |FROM packed ORDER BY query_id, rank""".stripMargin

  /** CTE chain shared by the metrics-slice oracles: sims → ranked →
    * hits → relevance → per-query metrics. */
  private val ragPerqCtes: String =
    s"""${ragSimsCtes(twoModels)},
       |ranked AS (
       |  SELECT model, query_id, sf, sim,
       |    row_number() OVER (PARTITION BY model, query_id
       |                       ORDER BY sim DESC, sf || '_fixed_size_0' ASC) AS rank
       |  FROM sims),
       |hits AS (SELECT * FROM ranked WHERE rank <= 10),
       |qmeta AS (
       |  SELECT 'q' || CAST(doc_id AS VARCHAR) AS query_id,
       |    list_slice(regexp_split_to_array(trim(text), '\\s+'), 1, 5) AS kw,
       |    '/doc' || CAST(doc_id AS VARCHAR) || '.md' AS pat
       |  FROM documents WHERE doc_id < 12),
       |expected AS (
       |  SELECT q.query_id, min(d.sf) AS expected_source
       |  FROM qmeta q JOIN docs d ON contains(lower(d.sf), lower(q.pat))
       |  GROUP BY 1),
       |rel AS (
       |  SELECT h.model, h.query_id, h.rank, h.sim,
       |    (contains(h.sf, e.expected_source)
       |     AND len(list_filter(q.kw, k -> contains(lower(d.content), lower(k)))) > 0)
       |      AS relevant
       |  FROM hits h
       |  JOIN qmeta q ON h.query_id = q.query_id
       |  JOIN expected e ON h.query_id = e.query_id
       |  JOIN docs d ON h.sf = d.sf),
       |perq AS (
       |  SELECT model, query_id,
       |    max(CASE WHEN relevant AND rank <= 1 THEN 1.0 ELSE 0.0 END) AS top_1,
       |    max(CASE WHEN relevant AND rank <= 3 THEN 1.0 ELSE 0.0 END) AS top_3,
       |    coalesce(1.0 / min(CASE WHEN relevant THEN rank END), 0.0) AS mrr,
       |    coalesce(avg(CASE WHEN relevant AND rank <= 5 THEN sim END), 0.0) AS avg_similarity
       |  FROM rel GROUP BY 1, 2)""".stripMargin

  private val ragMetricsOracle: String =
    s"""$ragPerqCtes
       |SELECT model,
       |  round(avg(top_1), 4) AS top_1_accuracy,
       |  round(avg(top_3), 4) AS top_3_accuracy,
       |  round(avg(mrr), 4) AS mrr,
       |  round(avg(avg_similarity), 4) AS avg_similarity,
       |  count(*) AS num_queries
       |FROM perq GROUP BY model ORDER BY model""".stripMargin

  private val ragSummaryOracle: String =
    s"""$ragPerqCtes,
       |permodel AS (
       |  SELECT model,
       |    avg(top_1) AS top_1_accuracy,
       |    avg(top_3) AS top_3_accuracy,
       |    avg(mrr) AS mrr,
       |    avg(avg_similarity) AS avg_similarity,
       |    avg(top_3) + avg(mrr) AS combined_score
       |  FROM perq GROUP BY model)
       |SELECT
       |  round(avg(top_1_accuracy), 4) AS mean_top_1,
       |  round(avg(top_3_accuracy), 4) AS mean_top_3,
       |  round(avg(mrr), 4) AS mean_mrr,
       |  round(avg(avg_similarity), 4) AS mean_avg_similarity,
       |  round(max(combined_score), 4) AS max_combined_score,
       |  count(*) AS num_configs,
       |  (SELECT model FROM permodel
       |   ORDER BY combined_score DESC, model ASC LIMIT 1) AS best_model
       |FROM permodel""".stripMargin

  /** Full-experiment oracle: at fixture scale every strategy emits the
    * identical single chunk per document, so per-model metrics are
    * computed once and cross-joined with the five strategy names. The
    * rank tie-break (chunk_id asc) reduces to source-file order because
    * no source path is a prefix of another.
    */
  private val ragEvalOracle: String =
    s"""${ragSimsCtes(graft.embed.HashingEmbedder.models)},
       |strategies(strategy) AS (VALUES ('fixed_size'), ('recursive'),
       |  ('structure_aware'), ('hybrid'), ('table_aware')),
       |ranked AS (
       |  SELECT model, query_id, sf, sim,
       |    row_number() OVER (PARTITION BY model, query_id
       |                       ORDER BY sim DESC, sf ASC) AS rank
       |  FROM sims),
       |hits AS (SELECT * FROM ranked WHERE rank <= 10),
       |qmeta AS (
       |  SELECT 'q' || CAST(doc_id AS VARCHAR) AS query_id,
       |    list_slice(regexp_split_to_array(trim(text), '\\s+'), 1, 5) AS kw,
       |    '/doc' || CAST(doc_id AS VARCHAR) || '.md' AS pat
       |  FROM documents WHERE doc_id < 12),
       |expected AS (
       |  SELECT q.query_id, min(d.sf) AS expected_source
       |  FROM qmeta q JOIN docs d ON contains(lower(d.sf), lower(q.pat))
       |  GROUP BY 1),
       |rel AS (
       |  SELECT h.model, h.query_id, h.rank, h.sim,
       |    (contains(h.sf, e.expected_source)
       |     AND len(list_filter(q.kw, k -> contains(lower(d.content), lower(k)))) > 0)
       |      AS relevant
       |  FROM hits h
       |  JOIN qmeta q ON h.query_id = q.query_id
       |  JOIN expected e ON h.query_id = e.query_id
       |  JOIN docs d ON h.sf = d.sf),
       |perq AS (
       |  SELECT model, query_id,
       |    max(CASE WHEN relevant AND rank <= 1 THEN 1.0 ELSE 0.0 END) AS top_1,
       |    max(CASE WHEN relevant AND rank <= 3 THEN 1.0 ELSE 0.0 END) AS top_3,
       |    coalesce(1.0 / min(CASE WHEN relevant THEN rank END), 0.0) AS mrr,
       |    coalesce(avg(CASE WHEN relevant AND rank <= 5 THEN sim END), 0.0) AS avg_similarity
       |  FROM rel GROUP BY 1, 2),
       |permodel AS (
       |  SELECT model,
       |    round(avg(top_1), 4) AS top_1_accuracy,
       |    round(avg(top_3), 4) AS top_3_accuracy,
       |    round(avg(mrr), 4) AS mrr,
       |    round(avg(avg_similarity), 4) AS avg_similarity,
       |    count(*) AS num_queries,
       |    round(avg(top_3) + avg(mrr), 4) AS combined_score
       |  FROM perq GROUP BY model)
       |SELECT s.strategy, p.model, p.top_1_accuracy, p.top_3_accuracy,
       |       p.mrr, p.avg_similarity, p.num_queries, p.combined_score
       |FROM permodel p CROSS JOIN strategies s
       |ORDER BY s.strategy, p.model""".stripMargin

  def oracles: Map[String, String] = Map(
    "rag_eval" -> ragEvalOracle,
    "rag_retrieval" -> ragRetrievalOracle,
    "rag_metrics" -> ragMetricsOracle,
    "rag_summary" -> ragSummaryOracle,
    "rag_context_pack" -> ragContextPackOracle,
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
