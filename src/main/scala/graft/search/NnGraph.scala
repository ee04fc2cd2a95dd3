package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vec

/** Graph-based approximate nearest neighbor: k-NN-graph construction by
  * NN-descent (Dong, Moses & Li, WWW 2011 — "Efficient K-Nearest
  * Neighbor Graph Construction for Generic Similarity Measures") and
  * greedy beam search over the built graph — the index family
  * production vector stores default to (the reference's own engine is
  * Qdrant, whose index is HNSW: reference src/vector_db.py:48-54; the
  * observable search semantics there are matched exactly by the exact
  * path `knn_topk`, this adds the graph-index SCALE path beside the
  * IVF/PQ/SQ/LSH matrix).
  *
  * NN-descent's premise: a neighbor of a neighbor is likely a
  * neighbor. Start every node with a deterministic entry sample,
  * then repeatedly propose neighbors-of-neighbors (in BOTH edge
  * directions — the paper's reverse-neighbor step is what makes the
  * graph converge) and keep each node's top-k by similarity. Each
  * round is embarrassingly parallel: candidate generation is one
  * self-join of the (capped) adjacency list, scoring is two hash
  * joins onto the vector table, selection is one per-node top-k.
  *
  * Determinism (the oracle contract): the seed sample is md5-ordered
  * (`md5("nnd|" + vec_id)` — the IVF-seed convention), every
  * similarity is the house left-to-right double dot product, and every
  * top-k tie-breaks (sim DESC, id ASC), so DuckDB replays the full
  * construction and search bit-for-bit.
  *
  * Scale shape: per-node degree is capped at k out-edges plus k
  * REVERSE edges (the in-degree cap — without it a hub node makes the
  * candidate join quadratic in its in-degree, the skew hazard), so one
  * iteration generates ≤ 4k² candidates per node: Σ-bounded, never
  * corpus². The index itself never shuffles during search — the beam
  * is broadcast and the per-iteration scoring is a narrow semi-join
  * scan.
  */
object NnGraph {

  /** Deterministic md5-ranked sample of `s` index vectors — the graph
    * build's init neighbors AND the search's entry points (sharing them
    * is the HNSW upper-layer idea flattened to one level: search
    * starts from the same hubs the graph grew from).
    */
  def seedSample(index: DataFrame, s: Int): DataFrame =
    index
      .select(col("vec_id").cast("long").as("seed_id"),
        col("embedding").as("svec"),
        md5(concat(lit("nnd|"), col("vec_id"))).as("r"))
      .orderBy(col("r"), col("seed_id"))
      .limit(s)
      .select(col("seed_id"), col("svec"))

  private def dotFF(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; val n = math.min(a.length, b.length); var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** NN-descent k-NN graph: (id LONG, nbr LONG, sim DOUBLE), exactly k
    * out-edges per node (fewer only if the candidate pool is smaller).
    *
    * Init scores every node against the broadcast seed sample — a
    * narrow map, NO shuffle (the assignCells shape). Each of the
    * `iters` refinement rounds then shuffles only edge/candidate
    * frames (≤ 4k² rows per node), never the raw index beyond the two
    * vector-lookup joins.
    */
  def buildGraph(index: DataFrame, k: Int, iters: Int,
      sampleSize: Int): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._

    val seeds: Array[(Long, Array[Float])] = seedSample(index, sampleSize)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bcSeeds = spark.sparkContext.broadcast(seeds)

    val vecs = index.select(col("vec_id").cast("long"), col("embedding"))

    // Each round references the previous round's edges ~5 times (the
    // reverse-rank window, both sides of the adjacency self-join, the
    // merge union), so a LAZY chain re-evaluates round i's plan 5^i
    // times — measured 135 s for ONE sf0.001 build at 3 rounds. An
    // iterative index BUILD is a batch job with materialization
    // barriers (the GraphX-Pregel discipline; Faiss's train/search
    // split): localCheckpoint materializes each round eagerly AND
    // truncates lineage, so the returned graph is a flat LogicalRDD
    // every consumer (and every beam-search reference) reads instead
    // of recomputing. Superseded rounds are unpersisted DETERMINISTICALLY
    // below (not left to the async ContextCleaner — exact-count cache
    // specs must not see blocks vanish mid-test); only the final
    // graph's blocks stay, session-lived like the memoized frame
    // itself. Local-mode trade accepted: a lost block cannot be
    // recomputed (a cluster deployment would write the built graph to
    // reliable storage — the serve path reads an artifact either way).
    def rddOf(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
    def barrier(next: DataFrame, prev: Option[DataFrame]): DataFrame = {
      val chk = next.localCheckpoint() // eager
      prev.flatMap(rddOf).foreach(_.unpersist(blocking = false))
      chk
    }

    // init: per-node top-k of the seed set, computed inside the scan
    var edges: DataFrame = barrier(vecs.as[(Long, Array[Float])]
      .mapPartitions { it =>
        val ss = bcSeeds.value
        it.flatMap { case (id, v) =>
          ss.iterator
            .filter { case (sid, _) => sid != id }
            .map { case (sid, sv) => (sid, dotFF(v, sv)) }
            .toArray
            .sortBy { case (sid, s) => (-s, sid) }
            .take(k)
            .map { case (sid, s) => (id, sid, s) }
        }
      }.toDF("id", "nbr", "sim"), None)

    val w = Window.partitionBy("id").orderBy(col("sim").desc, col("nbr").asc)
    for (_ <- 1 to iters) {
      // reverse edges, in-degree capped at k per (new) source node
      val rev = edges
        .select(col("nbr").as("id"), col("id").as("nbr"), col("sim"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("id", "nbr", "sim")
      val und = edges.select("id", "nbr")
        .union(rev.select("id", "nbr")).distinct()
      // neighbor-of-neighbor proposals over the capped adjacency
      val cand = und.as("u1")
        .join(und.as("u2"), col("u1.nbr") === col("u2.id"))
        .select(col("u1.id").as("id"), col("u2.nbr").as("nbr"))
        .filter(col("id") =!= col("nbr"))
        .distinct()
      val scored = cand
        .join(vecs.select(col("vec_id").as("id"), col("embedding").as("va")),
          "id")
        .join(vecs.select(col("vec_id").as("nbr"), col("embedding").as("vb")),
          "nbr")
        .select(col("id"), col("nbr"), Vec.dot(col("va"), col("vb")).as("sim"))
      // merge + per-node top-k; the max() collapse makes the union
      // robust even to a sub-ulp disagreement between the typed init
      // dot and the Vec.dot expression (both are left-to-right double,
      // so in practice the two branches agree exactly)
      edges = barrier(edges.unionByName(scored)
        .groupBy(col("id"), col("nbr")).agg(max(col("sim")).as("sim"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("id", "nbr", "sim"), Some(edges))
    }
    // The built graph is WRITTEN and served from the file artifact —
    // the Faiss write-index step made literal. Serving from a columnar
    // scan (not a cached/checkpointed plan) means: the serve plan is
    // flat; it survives caller-side `clearCache()` (Bench/Verify clear
    // between queries — the serve phase must not re-run the build);
    // and NO persisted RDD outlives the build, so exact-count cache
    // invariants (CacheLifecycleSpec) hold for every suite ordering.
    // A cluster deployment writes the same artifact to shared storage.
    val out = java.nio.file.Files
      .createTempDirectory("graft_nngraph_").toFile
    out.deleteOnExit()
    edges.write.mode("overwrite").parquet(out.getPath)
    rddOf(edges).foreach(_.unpersist(blocking = false))
    spark.read.parquet(out.getPath)
  }

  /** Greedy beam search over a built graph: per query, the beam starts
    * at the seed sample and for `iters` rounds expands every beam
    * member's out-neighbors, re-scores the union against the query,
    * and keeps the top `k`. Output: (query_id, rank, vec_id), rank
    * 1-based by (sim DESC, vec_id ASC).
    *
    * Plan shape per iteration: the beam (|queries| × k rows) is
    * broadcast against the graph for expansion and against the index
    * for scoring — the INDEX NEVER SHUFFLES; each round costs one
    * narrow graph semi-join + one narrow index scan. Scored work per
    * query is ≤ sample + iters × k × (graph-k + 1) candidates —
    * independent of corpus size, the property that makes graph search
    * the production default.
    */
  def graphTopK(index: DataFrame, graph: DataFrame, queries: DataFrame,
      k: Int, beamWidth: Int, iters: Int, sampleSize: Int): DataFrame = {
    val qw = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    val vecs = index.select(col("vec_id").cast("long"), col("embedding"))
    val q = queries.select(col("query_id").cast("long"), col("qvec"))
    val seeds = seedSample(index, sampleSize)

    // entry beam: seed sample scored per query
    var beam: DataFrame = q.crossJoin(broadcast(seeds))
      .select(col("query_id"), col("seed_id").as("vec_id"),
        Vec.dot(col("qvec"), col("svec")).as("sim"))
      .withColumn("rn", row_number().over(qw)).filter(col("rn") <= beamWidth)
      .select("query_id", "vec_id", "sim")

    for (_ <- 1 to iters) {
      val nb = graph
        .join(broadcast(beam.select(col("query_id"), col("vec_id").as("id"))),
          "id")
        .select(col("query_id"), col("nbr").as("vec_id"))
      val cand = beam.select("query_id", "vec_id").union(nb).distinct()
      val scored = vecs
        .join(broadcast(cand), "vec_id")
        .join(broadcast(q), "query_id")
        .select(col("query_id"), col("vec_id"),
          Vec.dot(col("qvec"), col("embedding")).as("sim"))
      beam = scored
        .withColumn("rn", row_number().over(qw)).filter(col("rn") <= beamWidth)
        .select("query_id", "vec_id", "sim")
    }
    beam.select(col("query_id"),
        row_number().over(qw).as("rank"), col("vec_id"))
      .filter(col("rank") <= k)
  }

  /** FILTERED graph search — the production filtered-HNSW contract
    * (Qdrant search with a payload filter over its graph index):
    * navigation traverses the FULL graph (restricting the beam to
    * matching nodes would strand the walk when the filter is
    * selective — the connectivity problem every filtered-HNSW design
    * documents), while every SCORED candidate that matches the
    * query's label is accumulated; the answer is the top-k of the
    * matched accumulation. Pre-filter semantics on the OUTPUT (every
    * hit matches its query's label) with post-filter traversal —
    * under-fill is possible only when fewer than k matching nodes are
    * visited at all (~selectivity × candidate budget).
    *
    * `index` must carry (vec_id, embedding, label); `queries`
    * (query_id, qvec, qlabel). Output (query_id, rank, vec_id), rank
    * by (sim DESC, vec_id ASC) among matched candidates. Plan shape:
    * identical to [[graphTopK]] plus one narrow label filter per
    * round and a (tiny) matched union — the index still never
    * shuffles.
    */
  def graphTopKFiltered(index: DataFrame, graph: DataFrame,
      queries: DataFrame, k: Int, beamWidth: Int, iters: Int,
      sampleSize: Int): DataFrame = {
    val qw = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    val vecs = index.select(col("vec_id").cast("long"), col("embedding"),
      col("label"))
    val q = queries.select(col("query_id").cast("long"), col("qvec"),
      col("qlabel"))
    val seeds = seedSample(index, sampleSize)

    // round 0's candidate set is the full seed sample per query; each
    // later round's is beam ∪ out-neighbors — navigation scores each
    // round label-blind (exactly [[graphTopK]]'s walk), while the
    // candidate IDS accumulate; the matched set is scored ONCE at the
    // end (one index semi-scan + label filter) rather than per round —
    // per-round matched scoring doubled the lazy-plan replication and
    // measured 3.9 s vs 2.0 s for the unfiltered walk at sf0.1
    var cand: DataFrame = q.select(col("query_id"))
      .crossJoin(broadcast(seeds.select(col("seed_id").as("vec_id"))))
    var candAll: DataFrame = cand
    var beam: DataFrame = null
    for (i <- 0 to iters) {
      if (i > 0) {
        val nb = graph
          .join(broadcast(beam.select(col("query_id"), col("vec_id").as("id"))),
            "id")
          .select(col("query_id"), col("nbr").as("vec_id"))
        cand = beam.select("query_id", "vec_id").union(nb).distinct()
        candAll = candAll.unionByName(cand)
      }
      val scored = vecs
        .join(broadcast(cand), "vec_id")
        .join(broadcast(q), "query_id")
        .select(col("query_id"), col("vec_id"),
          Vec.dot(col("qvec"), col("embedding")).as("sim"))
      beam = scored
        .withColumn("rn", row_number().over(qw)).filter(col("rn") <= beamWidth)
        .select("query_id", "vec_id", "sim")
    }
    vecs
      .join(broadcast(candAll.distinct()), "vec_id")
      .join(broadcast(q), "query_id")
      .filter(col("label") === col("qlabel"))
      .select(col("query_id"), col("vec_id"),
        Vec.dot(col("qvec"), col("embedding")).as("sim"))
      .select(col("query_id"),
        row_number().over(qw).as("rank"), col("vec_id"))
      .filter(col("rank") <= k)
  }
}
