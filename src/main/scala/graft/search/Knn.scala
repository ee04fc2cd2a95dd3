package graft.search

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vec

/** Exact and approximate k-nearest-neighbor search over an embedding column.
  *
  * Re-expresses the reference's Qdrant cosine `search`
  * (reference: src/vector_db.py:93-119, called with limit=10 at
  * main.py:295): query vector vs all points, top-k by cosine. The
  * reference's vectors are L2-normalized at encode time
  * (src/embeddings.py:56), so cosine ≡ dot product.
  *
  * Scale design (the part that must survive 100 TB):
  *  - The query side is broadcast (a query set is small by construction;
  *    the reference has 15). The index side streams through the executors;
  *    no shuffle of the index ever happens.
  *  - The naive plan — crossJoin + `Window.partitionBy(query_id)` —
  *    shuffles |index| × |queries| similarity rows into |queries|
  *    partitions: a catastrophic hotspot at scale. Instead we compute a
  *    *per-input-partition* bounded-heap top-k (the same trick as Spark's
  *    own `TakeOrderedAndProject`), so each of P partitions emits at most
  *    |queries| × k rows, and only those P×Q×k survivors are shuffled for
  *    the final exact top-k.
  */
object Knn {

  /** Exact cosine/dot top-k. `queries` must be small (it is broadcast).
    *
    * Output: (query_id LONG, vec_id LONG, rank INT, sim DOUBLE), rank 1..k
    * by sim desc with vec_id asc tie-break (deterministic — SURVEY §7
    * "determinism of first match").
    */
  def bruteForceTopK(index: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id", queryVecCol: String = "qvec"): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val sims = index
      .crossJoin(broadcast(queries.select(col(queryIdCol), col(queryVecCol))))
      .select(
        col(queryIdCol).cast("long").as("query_id"),
        col(idCol).cast("long").as("vec_id"),
        Vec.dot(col(vecCol), col(queryVecCol)).as("sim"))
      .as[(Long, Long, Double)]
    topKOfSims(sims, k)
  }

  /** Metadata-FILTERED exact top-k — the filtered-search contract of a
    * production vector store (Qdrant `search` with a payload filter;
    * the reference's store supports it even though its pipeline never
    * filters — reference: src/vector_db.py:93-119): each query carries
    * a filter value, and only index rows whose `filterCol` equals the
    * query's `queryFilterCol` are eligible. PRE-filter semantics: the
    * predicate prunes rows BEFORE any dot product is computed, so
    * (unlike post-filtering a top-k) the result always holds k matches
    * when k exist.
    *
    * Scale shape: the equality predicate turns the query fan-out into a
    * broadcast hash JOIN on the filter column — each index row pairs
    * with only its label's queries instead of all of them, so the
    * pre-heap row count is |index| × (queries per label), not
    * |index| × |queries|. The same bounded-heap merge as
    * [[bruteForceTopK]] follows; the index still never shuffles.
    */
  def filteredTopK(index: DataFrame, queries: DataFrame, k: Int,
      filterCol: String = "label", queryFilterCol: String = "qlabel",
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id", queryVecCol: String = "qvec"): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val sims = index
      .join(
        broadcast(queries.select(col(queryIdCol), col(queryVecCol), col(queryFilterCol))),
        col(filterCol) === col(queryFilterCol))
      .select(
        col(queryIdCol).cast("long").as("query_id"),
        col(idCol).cast("long").as("vec_id"),
        Vec.dot(col(vecCol), col(queryVecCol)).as("sim"))
      .as[(Long, Long, Double)]
    topKOfSims(sims, k)
  }

  /** Shared top-k tail: per-partition bounded heaps, then the typed
    * bounded-buffer merge. `sims` is (query_id, vec_id, sim). */
  // private[graft]: the bounded-heap tail is the house top-k for ANY
  // (query, id, sim) frame — query modules with custom scoring (the
  // MRL truncation rungs) consume it directly
  private[graft] def topKOfSims(sims: org.apache.spark.sql.Dataset[(Long, Long, Double)],
      k: Int): DataFrame = {
    val spark = sims.sparkSession
    import spark.implicits._
    // Partial top-k per input partition: bounded heap per query, no shuffle.
    val partial = sims.mapPartitions { it =>
      val heaps = mutable.Map.empty[Long, mutable.PriorityQueue[(Double, Long)]]
      // Heap ordered so the *worst* candidate is at the head: lowest sim,
      // then highest vec_id (since ties rank by vec_id asc).
      val worstFirst: Ordering[(Double, Long)] =
        Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }
      it.foreach { case (q, id, s) =>
        val h = heaps.getOrElseUpdate(q, mutable.PriorityQueue.empty(worstFirst))
        if (h.size < k) h.enqueue((s, id))
        else {
          val (ws, wid) = h.head
          if (s > ws || (s == ws && id < wid)) { h.dequeue(); h.enqueue((s, id)) }
        }
      }
      heaps.iterator.flatMap { case (q, h) => h.iterator.map { case (s, id) => (q, id, s) } }
    }.toDF("query_id", "vec_id", "sim")

    // Final exact top-k over ≤ partitions×queries×k survivors, merged by
    // the typed bounded-buffer aggregate (no sort exchange; see
    // TopKAggregator — proven equal to the window formulation incl. ties).
    val topk = new graft.functions.TopKAggregator[Long](k).toColumn
    partial.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, id, s) => (id, s) }
      .agg(topk.name("topk"))
      .flatMap { case (q, top) =>
        top.zipWithIndex.map { case ((s, id), i) => (q, id, i + 1, s) }
      }
      .toDF("query_id", "vec_id", "rank", "sim")
  }

  /** ColBERT-style LATE-INTERACTION retrieval (Khattab & Zaharia,
    * SIGIR 2020): query and document are BOTH multi-vector (one vector
    * per token) and `score(q, d) = Σ_{i∈q} max_{j∈d} dot(q_i, d_j)` —
    * each query token finds its best-matching document token, and the
    * per-token winners sum. The interaction model production rerankers
    * (ColBERT/PLAID) run where single-vector retrieval loses
    * token-level signal. `index` carries (doc_id, vec_id, embedding) —
    * token vectors grouped by doc; `queryTokens` (query_id, qt, qvec)
    * with `qt` a dense 0..tokPerQuery−1 token ordinal.
    *
    * Scale shape: query tokens broadcast (|queries|×tokens rows, the
    * bruteForceTopK discipline — the index never shuffles raw); the
    * per-(query, doc, qt) max is ONE map-side-combined hash aggregate
    * (max is order-exact, so this replays bit-stable); the
    * per-(query, doc) score sums the tokPerQuery maxes in FIXED qt
    * order (conditional max projections + a left-fold addition chain —
    * the double accumulation is engine-identical, no
    * accumulation-order exposure); the final top-k runs through the
    * bounded-heap tail ([[topKOfSims]]), never a corpus-wide sort.
    *
    * Output: (query_id LONG, rank INT, doc_id LONG), rank 1..k by
    * score desc, doc_id asc tie-break.
    */
  def maxsimTopK(index: DataFrame, queryTokens: DataFrame, k: Int,
      tokPerQuery: Int): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val perTok = index
      .crossJoin(broadcast(queryTokens))
      .select(col("query_id"), col("qt"), col("doc_id"),
        Vec.dot(col("qvec"), col("embedding")).as("sim"))
      .groupBy(col("query_id"), col("doc_id"), col("qt"))
      .agg(max(col("sim")).as("mx"))
    val parts = (0 until tokPerQuery).map(t =>
      max(when(col("qt") === t, col("mx"))).as(s"m$t"))
    val score = perTok.groupBy(col("query_id"), col("doc_id"))
      .agg(parts.head, parts.tail: _*)
      .select(col("query_id").cast("long"), col("doc_id").cast("long"),
        (0 until tokPerQuery).map(t => col(s"m$t")).reduce(_ + _).as("sim"))
    topKOfSims(score.as[(Long, Long, Double)], k)
      .select(col("query_id"), col("rank"), col("vec_id").as("doc_id"))
  }

  /** Hardest in-corpus NEGATIVES per anchor: top-k by cosine among
    * vectors with a DIFFERENT label — the hard-negative mining step of
    * embedding-finetuning data prep (in-batch random negatives are
    * easy; the informative ones are the nearest wrong-label vectors —
    * the DPR/SBERT curation recipe). `anchors` carries (query_id,
    * qvec, qlabel) and is broadcast; the label anti-filter prunes rows
    * BEFORE any dot; the tail is the bounded-heap merge — the
    * bruteForceTopK scale shape with an inequality pre-filter.
    */
  def hardNegatives(index: DataFrame, anchors: DataFrame,
      k: Int): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val sims = index
      .crossJoin(broadcast(anchors))
      .filter(col("label") =!= col("qlabel") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id").cast("long"), col("vec_id").cast("long"),
        Vec.dot(col("qvec"), col("embedding")).as("sim"))
      .as[(Long, Long, Double)]
    topKOfSims(sims, k)
  }

  /** [[maxsimTopK]] restricted to a candidate (query_id, doc_id) set —
    * the scoring half of two-stage ColBERT retrieval (gather per-token
    * candidates cheaply, exact-maxsim only those docs). `cands` is
    * small per query (the gather's union), so it broadcasts; the index
    * sheds every non-candidate row at the join before any dot.
    */
  def maxsimTopKCandidates(index: DataFrame, queryTokens: DataFrame,
      cands: DataFrame, k: Int, tokPerQuery: Int): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val perTok = index
      .join(broadcast(cands.select(col("query_id"), col("doc_id"))), "doc_id")
      .join(broadcast(queryTokens), "query_id")
      .select(col("query_id"), col("qt"), col("doc_id"),
        Vec.dot(col("qvec"), col("embedding")).as("sim"))
      .groupBy(col("query_id"), col("doc_id"), col("qt"))
      .agg(max(col("sim")).as("mx"))
    val parts = (0 until tokPerQuery).map(t =>
      max(when(col("qt") === t, col("mx"))).as(s"m$t"))
    val score = perTok.groupBy(col("query_id"), col("doc_id"))
      .agg(parts.head, parts.tail: _*)
      .select(col("query_id").cast("long"), col("doc_id").cast("long"),
        (0 until tokPerQuery).map(t => col(s"m$t")).reduce(_ + _).as("sim"))
    topKOfSims(score.as[(Long, Long, Double)], k)
      .select(col("query_id"), col("rank"), col("vec_id").as("doc_id"))
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998)
    * — the diversity step RAG retrievers run after candidate
    * generation: greedily pick `k` of `kCand` candidates maximizing
    * `lam·sim(q,d) − mu·max_{s∈selected} sim(d,s)`, so near-duplicate
    * passages don't crowd the context window. `mu` is passed explicitly
    * (not derived as 1−lam) so both engines parse the same literal.
    *
    * Scale shape: candidate generation is [[bruteForceTopK]] (swap in
    * any ANN path); the greedy loop runs per query over kCand bounded
    * rows inside `flatMapGroups` — state is candidates×dim floats per
    * group, never corpus-sized. Determinism: candidate sims come from
    * the left-to-right dot convention, pair sims use the same loop,
    * argmax scans candidates in vec_id order with strict `>` (ties to
    * the lowest id), and `max` over selected is order-exact — so the
    * selection replays in SQL step by step.
    *
    * Output: (query_id, step 1..k, vec_id).
    */
  def mmrTopK(index: DataFrame, queries: DataFrame, k: Int = 5,
      kCand: Int = 20, lam: Double = 0.7, mu: Double = 0.3): DataFrame =
    mmrRerank(index, bruteForceTopK(index, queries, kCand), k, lam, mu)

  /** [[mmrTopK]] over an EXPLICIT candidate frame (query_id, vec_id,
    * sim) — the production retriever shape: candidate generation is
    * pluggable (brute force, IVF, LSH, PQ — any path emitting the
    * common (query_id, vec_id, rank, sim) contract), and only the
    * bounded candidates×dim floats per query enter the greedy loop.
    * When the candidate frame contains the exact top-kCand with exact
    * sims, the selection is identical to the brute-force-fed one
    * (KnnSpec proves brute ≡ exhaustive-probe IVF feeding).
    */
  def mmrRerank(index: DataFrame, candidates: DataFrame, k: Int = 5,
      lam: Double = 0.7, mu: Double = 0.3): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val cands = candidates
      .join(index.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("query_id").cast("long"), col("vec_id").cast("long"),
        col("sim"), col("embedding"))
      .as[(Long, Long, Double, Array[Float])]
    val kk = k
    cands.groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Double, Array[Float])]) =>
        val cs = it.toArray.sortBy(_._2) // vec_id order pins the tie-break
        val n = cs.length
        val picked = new Array[Boolean](n)
        val sel = scala.collection.mutable.ArrayBuffer.empty[Int]
        def dot(a: Array[Float], b: Array[Float]): Double = {
          var s = 0.0; val m = math.min(a.length, b.length); var i = 0
          while (i < m) { s += a(i).toDouble * b(i).toDouble; i += 1 }
          s
        }
        (1 to math.min(kk, n)).iterator.map { step =>
          var best = -1
          var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < n) {
            if (!picked(i)) {
              var mx = 0.0
              if (sel.nonEmpty) {
                mx = Double.NegativeInfinity
                sel.foreach { j =>
                  val s = dot(cs(i)._4, cs(j)._4)
                  if (s > mx) mx = s
                }
              }
              val score = lam * cs(i)._3 - mu * mx
              if (score > bestScore) { bestScore = score; best = i }
            }
            i += 1
          }
          picked(best) = true
          sel += best
          (qid, step, cs(best)._2)
        }
      }
      .toDF("query_id", "step", "vec_id")
  }

  /** Generic windowed top-k (for small/medium candidate sets where the
    * candidates are already pruned, e.g. after an LSH bucket join).
    */
  def windowTopK(candidates: DataFrame, k: Int, partitionCols: Seq[String],
      orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderBy: _*)
    candidates.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
