package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._


/** Approximate nearest-neighbor paths — the 100 TB story for V3.
  * Brute-force cosine top-k (Knn.bruteForceTopK) is exact and
  * shuffle-light but still scans every vector per query batch; these
  * two standard index structures cut the scanned fraction:
  *
  *  - IVF: partition vectors by nearest centroid; probe only the
  *    `nprobe` closest cells per query. Deterministic given fixed
  *    centroids → DuckDB-oracle-checkable.
  *  - Random-hyperplane LSH: sign-bit signatures per table; candidates
  *    share a bucket in ≥1 table. Hyperplanes are seeded md5 (±1
  *    components) → deterministic.
  *
  * Both return the exact-kNN schema (query_id, vec_id, rank, sim) and
  * trade recall for scan fraction — the same observable contract as the
  * reference's Qdrant HNSW (approximate but effectively exact on small
  * corpora — SURVEY §2.4 V3).
  */
object Ann {

  /** IVF: `centroids` = (cent_id LONG, cvec ARRAY) — typically a sample
    * or k-means result; small by construction (it is the codebook), so
    * it is collected and broadcast. Assignment ties break toward the
    * lowest cent_id.
    *
    * Scale shape: cell assignment is a per-row argmax over the
    * broadcast codebook — a narrow map, NO shuffle of the index (the
    * window formulation shuffles the entire index into |index|
    * single-row partitions — catastrophic at 100 TB). The only
    * exchange in the whole plan is the final top-k merge over
    * per-partition heap survivors.
    */
  def ivfTopK(index: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._

    val assigned = assignCells(index, centroids)

    // codebook: cent_id ascending so the argmax tie-break (lowest id
    // wins on equal sims) falls out of strict > comparison in order
    val cents: Array[(Long, Array[Float])] = centroids
      .select(col("cent_id").cast("long"), col("cvec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bcCents = spark.sparkContext.broadcast(cents)

    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; val n = math.min(a.length, b.length); var i = 0
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }

    // nprobe nearest cells per query: narrow map over the broadcast
    // codebook, emitting nprobe rows
    val probes = queries.select(col("query_id").cast("long"), col("qvec"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bcCents.value
        it.flatMap { case (qid, qv) =>
          cs.map { case (cid, cv) => (cid, dot(qv, cv)) }
            .sortBy { case (cid, s) => (-s, cid) }
            .take(nprobe)
            .map { case (cid, _) => (qid, qv, cid) }
        }
      }.toDF("query_id", "qvec", "cent_id")

    // probe join (queries×nprobe rows — broadcast) + fused heap top-k
    val cands = assigned.join(broadcast(probes), "cent_id")
    heapTopK(cands, k)
  }

  /** Nearest-cell assignment of every index vector against a broadcast
    * codebook — the shared first step of [[ivfTopK]] and of
    * cluster-bounded operations like semantic dedup: a narrow map (no
    * shuffle of the index), argmax by dot with ties to the LOWEST
    * cent_id (strict `>` scan in cent_id-ascending order).
    *
    * Output: (vec_id LONG, embedding, cent_id LONG).
    */
  def assignCells(index: DataFrame, centroids: DataFrame): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val cents: Array[(Long, Array[Float])] = centroids
      .select(col("cent_id").cast("long"), col("cvec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bcCents = spark.sparkContext.broadcast(cents)
    index.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bcCents.value
        it.map { case (id, v) =>
          var best = 0; var bestSim = Double.NegativeInfinity
          var ci = 0
          while (ci < cs.length) {
            val s = dotFF(v, cs(ci)._2)
            if (s > bestSim) { bestSim = s; best = ci }
            ci += 1
          }
          (id, v, cs(best)._1)
        }
      }.toDF("vec_id", "embedding", "cent_id")
  }

  /** [[assignCells]] with an integer payload column (the filter value)
    * carried through the same narrow assignment map, so the filtered
    * path never re-joins the index with itself to recover it — at scale
    * that re-join is an index-sized shuffle for a value the scan
    * already holds. Output: (vec_id LONG, embedding, tagCol INT,
    * cent_id LONG); assignment semantics identical to [[assignCells]]
    * (argmax by dot, ties to the lowest cent_id).
    */
  def assignCellsTagged(index: DataFrame, centroids: DataFrame,
      tagCol: String): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val cents: Array[(Long, Array[Float])] = centroids
      .select(col("cent_id").cast("long"), col("cvec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bcCents = spark.sparkContext.broadcast(cents)
    index.select(col("vec_id").cast("long"), col("embedding"),
        col(tagCol).cast("int"))
      .as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        val cs = bcCents.value
        it.map { case (id, v, tag) =>
          var best = 0; var bestSim = Double.NegativeInfinity
          var ci = 0
          while (ci < cs.length) {
            val s = dotFF(v, cs(ci)._2)
            if (s > bestSim) { bestSim = s; best = ci }
            ci += 1
          }
          (id, v, tag, cs(best)._1)
        }
      }.toDF("vec_id", "embedding", tagCol, "cent_id")
  }

  /** FILTERED IVF search — the composition a production vector store
    * runs when a payload filter meets an ANN index (Qdrant's filtered
    * search): the coarse quantizer still bounds which cells a query
    * scans, and within the probed cells only rows whose `filterCol`
    * equals the query's `queryFilterCol` are scored. Pre-filter
    * semantics AFTER cell restriction: the filter prunes candidate
    * rows before any query-vector dot product, so the heap fills with
    * eligible rows only (a post-filtered top-k would under-fill).
    * Note the recall caveat every filtered-ANN system carries: probing
    * is label-blind, so a highly selective filter concentrated in
    * unprobed cells lowers recall — raise nprobe with selectivity.
    *
    * Scale shape: identical to [[ivfTopK]] (narrow assignment, probe
    * join bounded by queries×nprobe, bounded-heap merge) plus one
    * narrow filter on the candidate stream — the filter column rides
    * the assignment output, never a separate shuffle.
    */
  def ivfTopKFiltered(index: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int,
      filterCol: String = "label", queryFilterCol: String = "qlabel"): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    // assignment with the filter column carried through the narrow map —
    // never a re-join of the index with itself on vec_id (that would be
    // an index-sized shuffle at scale, for a value the scan already has)
    val assigned = assignCellsTagged(index, centroids, filterCol)
    val cents: Array[(Long, Array[Float])] = centroids
      .select(col("cent_id").cast("long"), col("cvec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bcCents = spark.sparkContext.broadcast(cents)
    val probes = queries
      .select(col("query_id").cast("long"), col("qvec"), col(queryFilterCol))
      .as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        val cs = bcCents.value
        it.flatMap { case (qid, qv, ql) =>
          cs.map { case (cid, cv) => (cid, dotFF(qv, cv)) }
            .sortBy { case (cid, s) => (-s, cid) }
            .take(nprobe)
            .map { case (cid, _) => (qid, qv, ql, cid) }
        }
      }.toDF("query_id", "qvec", queryFilterCol, "cent_id")
    val cands = assigned.join(broadcast(probes), "cent_id")
      .filter(col(filterCol) === col(queryFilterCol))
    heapTopK(cands, k)
  }

  /** IVF + scalar quantization — the Faiss `IndexIVFScalarQuantizer`
    * (SQ8) layout, completing the production index matrix beside
    * IVF-flat, PQ, and IVF-PQ: coarse assignment and probing run on the
    * ORIGINAL float vectors (the coarse quantizer never sees codes,
    * Faiss's non-residual config), per-list storage is the int8 code
    * (4× smaller candidate bytes than IVF-flat), and candidate scoring
    * is the int8·int8 dot. Every score term is an integer ≤ 127², a
    * 64-dim sum stays ≤ 2^20 — accumulation is order-independent, so
    * scores hash exactly with no rank-only fallback.
    *
    * Scale shape: identical to [[ivfTopK]] — assignment plus the SQ8
    * re-projection is one narrow map over the broadcast codebook, the
    * probe join is bounded by queries×nprobe, and the only exchange is
    * the heap-survivor merge.
    */
  def ivfSqTopK(index: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    // floor(x·127 + 0.5) clamped to [−127, 127], stored as float (ints
    // ≤ 127 are exact in float32) — identical to the knn_quantized
    // convention so the two oracles share one quantization CTE.
    def sq8(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      transform(v, x => greatest(lit(-127.0), least(lit(127.0),
        floor(x.cast("double") * 127.0 + 0.5))).cast("float"))
    val assigned = assignCells(index, centroids)
      .select(col("vec_id"), sq8(col("embedding")).as("embedding"),
        col("cent_id"))
    val cents: Array[(Long, Array[Float])] = centroids
      .select(col("cent_id").cast("long"), col("cvec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bcCents = spark.sparkContext.broadcast(cents)
    val probes = queries
      .select(col("query_id").cast("long"), col("qvec"),
        sq8(col("qvec")).as("q8"))
      .as[(Long, Array[Float], Array[Float])]
      .mapPartitions { it =>
        val cs = bcCents.value
        it.flatMap { case (qid, qv, q8) =>
          cs.map { case (cid, cv) => (cid, dotFF(qv, cv)) }
            .sortBy { case (cid, s) => (-s, cid) }
            .take(nprobe)
            .map { case (cid, _) => (qid, q8, cid) }
        }
      }.toDF("query_id", "qvec", "cent_id")
    val cands = assigned.join(broadcast(probes), "cent_id")
    heapTopK(cands, k)
  }

  private def dotFF(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; val n = math.min(a.length, b.length); var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Shared fixed-precision rounding for every trained mean (coarse
    * centroids AND PQ codewords): snap the double mean to a 10⁻⁶ grid —
    * floor(x·10⁶ + 0.5)/10⁶, half-up like the quantize127 convention,
    * no engine-specific round() ties — BEFORE the float32 cast. The
    * DuckDB oracle replay (Similarity.lloydIter / pqTrainIter) applies
    * the identical expression, so a cross-engine mean drift of a few
    * ulps (different double summation order in avg()) is erased unless
    * it straddles a grid boundary — ~200× wider spacing than the float
    * rounding boundaries the bare `.toFloat` cast exposed, which is
    * what made a drift-flipped argmin/argmax assignment the one
    * residual risk every `*_trained` oracle carried through round 10.
    * Grid step 10⁻⁶ keeps ~20 significant bits for unit-norm
    * components — far above the corpus's assignment margins
    * (DegenerateInputsSpec pins stability under ±1ulp input drift).
    */
  private[graft] def roundMean(x: Double): Float =
    (math.floor(x * 1e6 + 0.5) / 1e6).toFloat

  /** Element-wise mean of float vectors — the k-means update step as a
    * typed Aggregator, so the per-cell reduction partial-combines
    * map-side (one shuffle of k partial sums per partition, never the
    * raw vectors of a cell into one task).
    */
  private class VecMeanAggregator
      extends org.apache.spark.sql.expressions.Aggregator[
        Array[Float], (Array[Double], Long), Array[Float]] {
    override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)
    override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
      val acc = if (b._1.isEmpty) new Array[Double](v.length) else b._1
      var i = 0
      while (i < v.length && i < acc.length) { acc(i) += v(i); i += 1 }
      (acc, b._2 + 1)
    }
    override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) =
      if (a._1.isEmpty) b
      else if (b._1.isEmpty) a
      else {
        var i = 0
        while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
        (a._1, a._2 + b._2)
      }
    override def finish(b: (Array[Double], Long)): Array[Float] =
      if (b._2 == 0) Array.emptyFloatArray
      else b._1.map(x => roundMean(x / b._2))
    override def bufferEncoder: org.apache.spark.sql.Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
  }

  /** IVF codebook training: seeded hash-sample init (smallest
    * md5(seed|vec_id) — unbiased, reproducible), then `iters` Lloyd
    * iterations. Each iteration is one narrow pass (argmax over the
    * broadcast codebook, exactly the ivfTopK assignment map) plus one
    * map-side-combined mean aggregate — the index never shuffles, and
    * only k partial sums per partition move. Empty cells keep their
    * previous centroid.
    *
    * Returns (cent_id, cvec) ready for [[ivfTopK]]. Deterministic for a
    * fixed data layout; float mean accumulation order varies with
    * partitioning, so the oracle-facing `ann_ivf` query keeps the
    * sampled (iteration-free) codebook, whose arithmetic IS bit-pinned.
    */
  def trainCentroids(index: DataFrame, k: Int, iters: Int,
      seed: String = "ivf"): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    var cents: Array[Array[Float]] = index
      .select(col("vec_id").cast("long"), col("embedding"))
      .withColumn("r", md5(concat(lit(s"$seed|"), col("vec_id"))))
      .orderBy(col("r"), col("vec_id"))
      .limit(k)
      .select(col("embedding")).as[Array[Float]].collect()
    val typed = index.select(col("embedding")).as[Array[Float]]
    val meanAgg = new VecMeanAggregator().toColumn
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val updated = typed
        .map { v =>
          val cs = bc.value
          var best = 0; var bestSim = Double.NegativeInfinity; var ci = 0
          while (ci < cs.length) {
            val s = dotFF(v, cs(ci))
            if (s > bestSim) { bestSim = s; best = ci }
            ci += 1
          }
          (best.toLong, v)
        }
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(meanAgg.name("mean"))
        .collect()
      val next = cents.clone()
      updated.foreach { case (cell, mean) =>
        if (mean.nonEmpty) next(cell.toInt) = mean
      }
      cents = next
      bc.unpersist()
    }
    cents.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq.toDF("cent_id", "cvec")
  }

  /** Product-quantization ADC top-k — the memory-bounded layout a
    * billion-vector corpus actually ships (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011; the Faiss
    * `IndexPQ` contract with inner-product metric). The index is stored
    * as `m` code bytes per vector (16× smaller than float32 at
    * m=8/dim=64); queries never touch the original vectors at scan
    * time — each scores a vector as Σ_j LUT[j][code_j], an O(m) table
    * lookup instead of an O(dim) dot product.
    *
    * Codebook: `numCodes` md5-sampled vectors (seed|vec_id order — the
    * same unbiased reproducible draw as [[ivfTopK]]'s sampled
    * centroids); codeword (j, c) is sample c's j-th subvector. Encoding
    * assigns each subvector to its L2-argmin codeword (strict `<` scan,
    * ties to the lowest code — reconstruction-optimal and
    * deterministic). Scoring approximates dot(q, x) by the ADC sum in
    * FIXED ascending-j order with left-to-right double accumulation, so
    * scores are bit-deterministic regardless of partitioning.
    *
    * Scale shape: encode is a narrow map over the broadcast codebook
    * (the float index is read once and never shuffled); the scan is a
    * narrow map over the code rows with per-partition bounded heaps;
    * the only exchange is the ≤ P×Q×k heap-survivor merge — identical
    * to [[Knn.bruteForceTopK]]'s plan but over 1/16th the bytes.
    *
    * Output: (query_id, vec_id, rank, sim), rank 1..k by sim desc,
    * vec_id asc ties. `dim % m` must be 0.
    */
  def pqTopK(index: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, numCodes: Int = 16, seed: String = "pq"): DataFrame =
    pqTopKWith(index, queries, k, m, sampleCodebooks(index, m, numCodes, seed))

  /** Sampled PQ codebooks: codeword (j, c) is the j-th subvector of the
    * c-th md5-ordered sample — the reproducible zero-training baseline
    * (and the Lloyd init for [[trainPqCodebooks]]). Shape cw(j)(c). */
  def sampleCodebooks(index: DataFrame, m: Int, numCodes: Int,
      seed: String = "pq"): Array[Array[Array[Float]]] = {
    val spark = index.sparkSession
    import spark.implicits._
    val samples: Array[Array[Float]] = index
      .select(col("vec_id").cast("long"), col("embedding"))
      .withColumn("r", md5(concat(lit(s"$seed|"), col("vec_id"))))
      .orderBy(col("r"), col("vec_id"))
      .limit(numCodes)
      .select(col("embedding")).as[Array[Float]].collect()
    if (samples.isEmpty) return Array.empty
    val dim = samples(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    Array.tabulate(m, samples.length)((j, c) =>
      java.util.Arrays.copyOfRange(samples(c), j * sub, (j + 1) * sub))
  }

  /** Per-subspace Lloyd training of PQ codebooks (the k-means step of
    * Jégou et al. §III-A; what Faiss `ProductQuantizer::train` runs).
    * Init = [[sampleCodebooks]]; each iteration is ONE narrow pass over
    * the index that assigns every subvector to its L2-argmin codeword
    * and partial-sums per (subspace, code) locally — only
    * m×numCodes×subDim doubles per partition move to the driver merge,
    * the index never shuffles. Empty cells keep their previous
    * codeword; means snap to the shared 10⁻⁶ grid via [[roundMean]]
    * (the same convention as [[trainCentroids]] / the Lloyd-in-SQL
    * oracle).
    */
  def trainPqCodebooks(index: DataFrame, m: Int, numCodes: Int, iters: Int,
      seed: String = "pq"): Array[Array[Array[Float]]] = {
    val spark = index.sparkSession
    import spark.implicits._
    var cw = sampleCodebooks(index, m, numCodes, seed)
    if (cw.isEmpty) return cw
    val sub = cw(0)(0).length
    val nc = cw(0).length
    val mm = m
    val typed = index.select(col("embedding")).as[Array[Float]]
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cw)
      // one flattened (sums, counts) partial per partition; merged on
      // the driver (m×nc×sub ≈ 1k doubles — bytes, not data)
      val (sums, counts) = typed.mapPartitions { it =>
        val cs = bc.value
        val s = new Array[Double](mm * nc * sub)
        val n = new Array[Long](mm * nc)
        it.foreach { v =>
          var j = 0
          while (j < mm) {
            var best = 0; var bestD = Double.PositiveInfinity
            var c = 0
            while (c < nc) {
              var dd = 0.0; var d = 0
              while (d < sub) {
                val diff = v(j * sub + d).toDouble - cs(j)(c)(d).toDouble
                dd += diff * diff
                d += 1
              }
              if (dd < bestD) { bestD = dd; best = c }
              c += 1
            }
            var d = 0
            while (d < sub) {
              s((j * nc + best) * sub + d) += v(j * sub + d).toDouble
              d += 1
            }
            n(j * nc + best) += 1
            j += 1
          }
        }
        Iterator.single((s, n))
      }.reduce { (a, b) =>
        var i = 0
        while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
        i = 0
        while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
        a
      }
      bc.unpersist()
      cw = Array.tabulate(mm, nc) { (j, c) =>
        val cnt = counts(j * nc + c)
        if (cnt == 0) cw(j)(c)
        else Array.tabulate(sub)(d => roundMean(sums((j * nc + c) * sub + d) / cnt))
      }
    }
    cw
  }

  /** DECODED (reconstructed) index from PQ codes — decode(encode(x)):
    * every vector is replaced by the concatenation of its per-subspace
    * L2-argmin codewords (strict `<` scan, ties to the lowest code —
    * the [[pqTopKWith]] encode loop verbatim), i.e. the float
    * materialization of the m-byte compressed row. dot(q, decoded)
    * equals the ADC sum Σ_j LUT[j][code_j] by construction (identical
    * per-subspace codeword dots), so scoring decoded vectors IS
    * asymmetric-distance scoring — expressed this way so the shared
    * graph-walk machinery consumes the compressed index unchanged
    * (the PLAID/ColBERTv2 token-index trade: Santhanam et al. 2022,
    * §3 — centroid+residual codes in place of float tokens). A
    * production layout persists the code bytes and decodes at scan
    * time in exactly this narrow map; the float originals are read
    * only by a rescore stage.
    */
  def pqDecoded(index: DataFrame, m: Int,
      cw: Array[Array[Array[Float]]]): DataFrame =
    pqDecodeFrame(pqEncodeFrame(index, m, cw), cw)

  /** The PQ CODE ROWS (vec_id, codes int[m]) — the persistable
    * 8–16×-smaller index a production layout actually stores: each
    * code is the per-subspace L2-argmin over `cw` (strict `<` scan,
    * ties to the lowest code — the [[pqTopKWith]] encode loop
    * verbatim). Write these once as an artifact and decode at scan
    * time ([[pqDecodeFrame]]) — the encode argmin (m × codes × subDim
    * work per row) then runs ONCE per index, not once per scan.
    */
  def pqEncodeFrame(index: DataFrame, m: Int,
      cw: Array[Array[Array[Float]]]): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    if (cw.isEmpty)
      return Seq.empty[(Long, Array[Int])].toDF("vec_id", "codes")
    val sub = cw(0)(0).length
    val nc = cw(0).length
    val mm = m
    val bcCw = spark.sparkContext.broadcast(cw)
    index.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bcCw.value
        it.map { case (id, v) =>
          val out = new Array[Int](mm)
          var j = 0
          while (j < mm) {
            var best = 0; var bestD = Double.PositiveInfinity
            var c = 0
            while (c < nc) {
              var dd = 0.0; var d = 0
              while (d < sub) {
                val diff = v(j * sub + d).toDouble - cs(j)(c)(d).toDouble
                dd += diff * diff
                d += 1
              }
              if (dd < bestD) { bestD = dd; best = c }
              c += 1
            }
            out(j) = best
            j += 1
          }
          (id, out)
        }
      }.toDF("vec_id", "codes")
  }

  /** Decode code rows back to float vectors at scan time — a cheap
    * codeword GATHER (no argmin): (vec_id, embedding float[m·subDim])
    * where embedding = the concatenation of each code's codeword.
    */
  def pqDecodeFrame(codes: DataFrame,
      cw: Array[Array[Array[Float]]]): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    if (cw.isEmpty)
      return Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val sub = cw(0)(0).length
    val mm = cw.length
    val bcCw = spark.sparkContext.broadcast(cw)
    codes.select(col("vec_id").cast("long"), col("codes"))
      .as[(Long, Array[Int])]
      .mapPartitions { it =>
        val cs = bcCw.value
        it.map { case (id, cArr) =>
          val out = new Array[Float](mm * sub)
          var j = 0
          while (j < mm) {
            System.arraycopy(cs(j)(cArr(j)), 0, out, j * sub, sub)
            j += 1
          }
          (id, out)
        }
      }.toDF("vec_id", "embedding")
  }

  /** [[pqTopK]] with explicit codebooks `cw(j)(c)` (all subspaces the
    * same width; from [[sampleCodebooks]] or [[trainPqCodebooks]]). */
  def pqTopKWith(index: DataFrame, queries: DataFrame, k: Int,
      m: Int, cw: Array[Array[Array[Float]]]): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val qArr: Array[(Long, Array[Float])] = queries
      .select(col("query_id").cast("long"), col("qvec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    if (cw.isEmpty || qArr.isEmpty) {
      return Seq.empty[(Long, Long, Int, Double)]
        .toDF("query_id", "vec_id", "rank", "sim")
    }
    val sub = cw(0)(0).length
    val nc = cw(0).length
    val bcCw = spark.sparkContext.broadcast(cw)

    // per-query ADC lookup table: LUT(q)(j*nc + c) = dot(q_j, cw(j)(c))
    val lut: Array[Array[Double]] = qArr.map { case (_, qv) =>
      val t = new Array[Double](m * nc)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < nc) {
          var s = 0.0; var d = 0
          while (d < sub) {
            s += qv(j * sub + d).toDouble * cw(j)(c)(d).toDouble
            d += 1
          }
          t(j * nc + c) = s
          c += 1
        }
        j += 1
      }
      t
    }
    val bcLut = spark.sparkContext.broadcast(lut)
    val bcQids = spark.sparkContext.broadcast(qArr.map(_._1))

    // encode: L2-argmin per subspace over the broadcast codebook — a
    // narrow map; at scale the code rows would be persisted and the
    // float index never re-read
    val codes = index.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs0 = bcCw.value
        it.map { case (id, v) =>
          val cs = new Array[Int](m)
          var j = 0
          while (j < m) {
            var best = 0; var bestD = Double.PositiveInfinity
            var c = 0
            while (c < nc) {
              var s = 0.0; var d = 0
              while (d < sub) {
                val diff = v(j * sub + d).toDouble - cs0(j)(c)(d).toDouble
                s += diff * diff
                d += 1
              }
              if (s < bestD) { bestD = s; best = c }
              c += 1
            }
            cs(j) = best
            j += 1
          }
          (id, cs)
        }
      }

    // ADC scan: O(m) lookups per (vector, query), bounded heap per query
    val mm = m; val kCap = k
    val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    val partial = codes.mapPartitions { it =>
      val luts = bcLut.value
      val qids = bcQids.value
      val heaps = Array.fill(qids.length)(
        scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst))
      it.foreach { case (id, cs) =>
        var q = 0
        while (q < qids.length) {
          val t = luts(q)
          var s = 0.0; var j = 0
          while (j < mm) { s += t(j * nc + cs(j)); j += 1 }
          val h = heaps(q)
          if (h.size < kCap) h.enqueue((s, id))
          else {
            val (ws, wid) = h.head
            if (s > ws || (s == ws && id < wid)) { h.dequeue(); h.enqueue((s, id)) }
          }
          q += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, q) =>
        h.iterator.map { case (s, id) => (qids(q), id, s) }
      }
    }
    val topk = new graft.functions.TopKAggregator[Long](k).toColumn
    partial
      .groupByKey(_._1)
      .mapValues { case (_, id, s) => (id, s) }
      .agg(topk.name("topk"))
      .flatMap { case (q, winners) =>
        winners.zipWithIndex.map { case ((s, id), i) => (q, id, i + 1, s) }
      }
      .toDF("query_id", "vec_id", "rank", "sim")
  }

  /** IVF-PQ: the composed billion-vector layout (Faiss `IndexIVFPQ`) —
    * a coarse quantizer (IVF cells) bounds WHICH rows are scanned, the
    * product quantizer bounds the BYTES per scanned row. Each index
    * vector stores its cell id + m code bytes; a query probes its
    * `nprobe` best cells and ADC-scans only those cells' codes with the
    * O(m) LUT sum.
    *
    * Scale shape: cell assignment and PQ encoding happen in ONE narrow
    * pass over the broadcast centroids + codebooks (the float index is
    * read once); probes are a driver-side queries×centroids product
    * (both tiny, both already collected); the scan is a narrow map over
    * the code rows that touches only probed cells, and the only
    * exchange is the heap-survivor merge. Output as [[pqTopK]].
    */
  def ivfPqTopK(index: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int, m: Int = 8, numCodes: Int = 16,
      seed: String = "pq"): DataFrame =
    ivfPqTopKWith(index, queries, centroids, k, nprobe, m,
      sampleCodebooks(index, m, numCodes, seed))

  /** [[ivfPqTopK]] with explicit PQ codebooks `cw(j)(c)` — feeding
    * [[trainCentroids]] + [[trainPqCodebooks]] here is the fully
    * TRAINED composition (both quantizers k-means-trained), i.e. the
    * production Faiss `IndexIVFPQ` configuration; the sampled-codebook
    * [[ivfPqTopK]] is its zero-training baseline. */
  def ivfPqTopKWith(index: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int, m: Int, cw: Array[Array[Array[Float]]]): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val qArr: Array[(Long, Array[Float])] = queries
      .select(col("query_id").cast("long"), col("qvec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val cents: Array[(Long, Array[Float])] = centroids
      .select(col("cent_id").cast("long"), col("cvec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    if (cw.isEmpty || qArr.isEmpty || cents.isEmpty) {
      return Seq.empty[(Long, Long, Int, Double)]
        .toDF("query_id", "vec_id", "rank", "sim")
    }
    val sub = cw(0)(0).length
    val nc = cw(0).length
    val mm = m
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; val n = math.min(a.length, b.length); var i = 0
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    // probes driver-side: queries and centroids are both collected
    // already; cell -> probing query indexes, broadcast
    val cellQueries: Map[Long, Array[Int]] = qArr.zipWithIndex
      .flatMap { case ((_, qv), qi) =>
        cents.map { case (cid, cv) => (cid, dot(qv, cv)) }
          .sortBy { case (cid, s) => (-s, cid) }
          .take(nprobe)
          .map { case (cid, _) => (cid, qi) }
      }
      .groupBy(_._1).map { case (cid, xs) => cid -> xs.map(_._2).sorted }
    val lut: Array[Array[Double]] = qArr.map { case (_, qv) =>
      val t = new Array[Double](mm * nc)
      var j = 0
      while (j < mm) {
        var c = 0
        while (c < nc) {
          var s = 0.0; var d = 0
          while (d < sub) {
            s += qv(j * sub + d).toDouble * cw(j)(c)(d).toDouble
            d += 1
          }
          t(j * nc + c) = s
          c += 1
        }
        j += 1
      }
      t
    }
    val bcCw = spark.sparkContext.broadcast(cw)
    val bcCents = spark.sparkContext.broadcast(cents)
    val bcLut = spark.sparkContext.broadcast(lut)
    val bcQids = spark.sparkContext.broadcast(qArr.map(_._1))
    val bcCellQ = spark.sparkContext.broadcast(cellQueries)
    val kCap = k
    val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    // one narrow pass: assign cell (argmax dot, ties lowest cent_id),
    // PQ-encode, and ADC-score for exactly the queries probing the cell
    val partial = index.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs0 = bcCw.value
        val cts = bcCents.value
        val luts = bcLut.value
        val qids = bcQids.value
        val cellQ = bcCellQ.value
        val heaps = Array.fill(qids.length)(
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst))
        val codes = new Array[Int](mm)
        it.foreach { case (id, v) =>
          var best = 0; var bestSim = Double.NegativeInfinity
          var ci = 0
          while (ci < cts.length) {
            var s = 0.0; val n = math.min(v.length, cts(ci)._2.length); var i = 0
            while (i < n) { s += v(i).toDouble * cts(ci)._2(i).toDouble; i += 1 }
            if (s > bestSim) { bestSim = s; best = ci }
            ci += 1
          }
          cellQ.get(cts(best)._1) match {
            case None => () // cell probed by no query: row never scanned
            case Some(qis) =>
              var j = 0
              while (j < mm) {
                var bc = 0; var bestD = Double.PositiveInfinity
                var c = 0
                while (c < nc) {
                  var s = 0.0; var d = 0
                  while (d < sub) {
                    val diff = v(j * sub + d).toDouble - cs0(j)(c)(d).toDouble
                    s += diff * diff
                    d += 1
                  }
                  if (s < bestD) { bestD = s; bc = c }
                  c += 1
                }
                codes(j) = bc
                j += 1
              }
              qis.foreach { qi =>
                val t = luts(qi)
                var s = 0.0; var j2 = 0
                while (j2 < mm) { s += t(j2 * nc + codes(j2)); j2 += 1 }
                val h = heaps(qi)
                if (h.size < kCap) h.enqueue((s, id))
                else {
                  val (ws, wid) = h.head
                  if (s > ws || (s == ws && id < wid)) { h.dequeue(); h.enqueue((s, id)) }
                }
              }
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (s, id) => (qids(qi), id, s) }
        }
      }
    val topk = new graft.functions.TopKAggregator[Long](k).toColumn
    partial
      .groupByKey(_._1)
      .mapValues { case (_, id, s) => (id, s) }
      .agg(topk.name("topk"))
      .flatMap { case (q, winners) =>
        winners.zipWithIndex.map { case ((s, id), i) => (q, id, i + 1, s) }
      }
      .toDF("query_id", "vec_id", "rank", "sim")
  }

  /** Residuals of every index vector against its assigned coarse cell:
    * `(vec_id, embedding = v − c_argmax)` with float32 subtraction
    * (bit-reproducible in any IEEE engine). This is the frame Faiss
    * trains a RESIDUAL product quantizer on — residuals concentrate
    * around the origin, so a codebook over them spends its codewords on
    * the within-cell detail the coarse quantizer discarded, instead of
    * re-describing cell positions. One narrow map over the broadcast
    * centroids; the index never shuffles.
    */
  def residuals(index: DataFrame, centroids: DataFrame): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val cents: Array[(Long, Array[Float])] = centroids
      .select(col("cent_id").cast("long"), col("cvec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    if (cents.isEmpty) {
      return Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    }
    val bcCents = spark.sparkContext.broadcast(cents)
    index.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bcCents.value
        it.map { case (id, v) =>
          var best = 0; var bestSim = Double.NegativeInfinity
          var ci = 0
          while (ci < cs.length) {
            val s = dotFF(v, cs(ci)._2)
            if (s > bestSim) { bestSim = s; best = ci }
            ci += 1
          }
          val cv = cs(best)._2
          val r = new Array[Float](v.length)
          var i = 0
          while (i < v.length) {
            r(i) = v(i) - (if (i < cv.length) cv(i) else 0f)
            i += 1
          }
          (id, r)
        }
      }.toDF("vec_id", "embedding")
  }

  /** RESIDUAL-encoded IVF-PQ — the default Faiss `IndexIVFPQ`
    * configuration (`by_residual = true`, Jégou et al. §IV-A): each
    * vector stores its cell id + PQ codes of the RESIDUAL
    * `r = v − c_cell`, and a query scores a row as
    * `adc(q, codes) + dot(q, c_cell)` — the coarse term is exact, the
    * PQ error applies only to the small within-cell remainder, which is
    * why residual encoding recovers recall over [[ivfPqTopK]]'s
    * raw-vector (`by_residual = false`) layout at identical bytes.
    * Codebooks here are md5-sampled from the residual frame
    * ([[residuals]]) — the same zero-training baseline as
    * [[ivfPqTopK]]; feed trained residual codebooks through
    * [[ivfPqResidualTopKWith]] for the fully trained composition.
    *
    * Scale shape: one extra narrow pass over the index to build the
    * residual sample (TakeOrdered 16 — no shuffle of data), then the
    * identical single-pass assign+encode+ADC scan of [[ivfPqTopKWith]]
    * with a per-(query, cell) constant added at score time (the
    * queries×cells dot table rides the same broadcast as the probes).
    */
  def ivfPqResidualTopK(index: DataFrame, queries: DataFrame,
      centroids: DataFrame, k: Int, nprobe: Int, m: Int = 8,
      numCodes: Int = 16, seed: String = "pq"): DataFrame =
    ivfPqResidualTopKWith(index, queries, centroids, k, nprobe, m,
      sampleCodebooks(residuals(index, centroids), m, numCodes, seed))

  /** [[ivfPqResidualTopK]] with explicit residual codebooks. Kept as a
    * sibling of [[ivfPqTopKWith]] (not a flag on it) so the raw-vector
    * path's arithmetic stays byte-identical to its pinned oracles; the
    * two differ only in the encode target (residual vs raw) and the
    * `+ dot(q, c_cell)` score term, both noted inline.
    */
  def ivfPqResidualTopKWith(index: DataFrame, queries: DataFrame,
      centroids: DataFrame, k: Int, nprobe: Int, m: Int,
      cw: Array[Array[Array[Float]]]): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val qArr: Array[(Long, Array[Float])] = queries
      .select(col("query_id").cast("long"), col("qvec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val cents: Array[(Long, Array[Float])] = centroids
      .select(col("cent_id").cast("long"), col("cvec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    if (cw.isEmpty || qArr.isEmpty || cents.isEmpty) {
      return Seq.empty[(Long, Long, Int, Double)]
        .toDF("query_id", "vec_id", "rank", "sim")
    }
    val sub = cw(0)(0).length
    val nc = cw(0).length
    val mm = m
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; val n = math.min(a.length, b.length); var i = 0
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    // queries×cells exact-dot table: row qi = this query's dot with
    // every centroid — feeds BOTH the probe choice and the residual
    // score's coarse term, so the two can never disagree
    val qcAll: Array[Array[Double]] = qArr.map { case (_, qv) =>
      cents.map { case (_, cv) => dot(qv, cv) }
    }
    val cellQueries: Map[Long, Array[Int]] = qArr.indices
      .flatMap { qi =>
        cents.indices.map(ci => (cents(ci)._1, qcAll(qi)(ci)))
          .sortBy { case (cid, s) => (-s, cid) }
          .take(nprobe)
          .map { case (cid, _) => (cid, qi) }
      }
      .groupBy(_._1).map { case (cid, xs) => cid -> xs.map(_._2).sorted.toArray }
    val lut: Array[Array[Double]] = qArr.map { case (_, qv) =>
      val t = new Array[Double](mm * nc)
      var j = 0
      while (j < mm) {
        var c = 0
        while (c < nc) {
          var s = 0.0; var d = 0
          while (d < sub) {
            s += qv(j * sub + d).toDouble * cw(j)(c)(d).toDouble
            d += 1
          }
          t(j * nc + c) = s
          c += 1
        }
        j += 1
      }
      t
    }
    val bcCw = spark.sparkContext.broadcast(cw)
    val bcCents = spark.sparkContext.broadcast(cents)
    val bcLut = spark.sparkContext.broadcast(lut)
    val bcQids = spark.sparkContext.broadcast(qArr.map(_._1))
    val bcCellQ = spark.sparkContext.broadcast(cellQueries)
    val bcQc = spark.sparkContext.broadcast(qcAll)
    val kCap = k
    val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    // one narrow pass: assign cell (argmax dot, ties lowest cent_id),
    // PQ-encode the RESIDUAL, ADC-score + coarse term for exactly the
    // queries probing the cell
    val partial = index.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs0 = bcCw.value
        val cts = bcCents.value
        val luts = bcLut.value
        val qids = bcQids.value
        val cellQ = bcCellQ.value
        val qcs = bcQc.value
        val heaps = Array.fill(qids.length)(
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst))
        val codes = new Array[Int](mm)
        var rbuf = Array.emptyFloatArray
        it.foreach { case (id, v) =>
          var best = 0; var bestSim = Double.NegativeInfinity
          var ci = 0
          while (ci < cts.length) {
            var s = 0.0; val n = math.min(v.length, cts(ci)._2.length); var i = 0
            while (i < n) { s += v(i).toDouble * cts(ci)._2(i).toDouble; i += 1 }
            if (s > bestSim) { bestSim = s; best = ci }
            ci += 1
          }
          cellQ.get(cts(best)._1) match {
            case None => () // cell probed by no query: row never scanned
            case Some(qis) =>
              // residual in float32 — the only encode-side difference
              // from ivfPqTopKWith
              val cv = cts(best)._2
              if (rbuf.length != v.length) rbuf = new Array[Float](v.length)
              var ri = 0
              while (ri < v.length) {
                rbuf(ri) = v(ri) - (if (ri < cv.length) cv(ri) else 0f)
                ri += 1
              }
              var j = 0
              while (j < mm) {
                var bc = 0; var bestD = Double.PositiveInfinity
                var c = 0
                while (c < nc) {
                  var s = 0.0; var d = 0
                  while (d < sub) {
                    val diff = rbuf(j * sub + d).toDouble - cs0(j)(c)(d).toDouble
                    s += diff * diff
                    d += 1
                  }
                  if (s < bestD) { bestD = s; bc = c }
                  c += 1
                }
                codes(j) = bc
                j += 1
              }
              qis.foreach { qi =>
                val t = luts(qi)
                var s = 0.0; var j2 = 0
                while (j2 < mm) { s += t(j2 * nc + codes(j2)); j2 += 1 }
                // coarse term: ADC sum first, then one add — matches
                // the oracle's (Σ list) + qc grouping exactly
                val sc = s + qcs(qi)(best)
                val h = heaps(qi)
                if (h.size < kCap) h.enqueue((sc, id))
                else {
                  val (ws, wid) = h.head
                  if (sc > ws || (sc == ws && id < wid)) { h.dequeue(); h.enqueue((sc, id)) }
                }
              }
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (s, id) => (qids(qi), id, s) }
        }
      }
    val topk = new graft.functions.TopKAggregator[Long](k).toColumn
    partial
      .groupByKey(_._1)
      .mapValues { case (_, id, s) => (id, s) }
      .agg(topk.name("topk"))
      .flatMap { case (q, winners) =>
        winners.zipWithIndex.map { case ((s, id), i) => (q, id, i + 1, s) }
      }
      .toDF("query_id", "vec_id", "rank", "sim")
  }

  /** PQ search with exact re-ranking (the Faiss `IndexRefineFlat`
    * shape): ADC produces `r` candidates per query, then the true
    * float vectors of ONLY those queries×r rows are joined back and
    * re-scored with the exact dot product. This is the production PQ
    * pipeline — the compressed scan bounds memory traffic, the
    * re-rank restores ordering that code-tie collapse destroys (all
    * members of a tight cluster encode identically, so pure ADC
    * ranks them by id, not true distance).
    *
    * Scale shape: candidate ids are queries×r rows — broadcast; the
    * index-side join to fetch their vectors is the only index touch
    * after the code scan, and the final heap merge is bounded as in
    * [[Knn.bruteForceTopK]].
    */
  def pqTopKRefined(index: DataFrame, queries: DataFrame, k: Int, r: Int,
      m: Int, cw: Array[Array[Array[Float]]]): DataFrame = {
    val candIds = pqTopKWith(index, queries, r, m, cw)
      .select(col("query_id"), col("vec_id"))
    val cands = index.select(col("vec_id"), col("embedding"))
      .join(broadcast(candIds), "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("qvec"))), "query_id")
    heapTopK(cands, k)
  }

  /** Refined residual IVF-PQ — the full production retrieval shape
    * (Faiss `IndexRefineFlat` wrapping `IndexIVFPQ`): the trained
    * residual-ADC scan proposes `r` candidates per query from codes,
    * then ONLY those r vectors are fetched and re-ranked by the exact
    * float dot. The refine stage pays queries×r exact dots — 50 rows
    * per query against a billion-row index — and repairs both the ADC
    * approximation error and its tie-collapse, exactly as
    * [[pqTopKRefined]] does for flat PQ.
    *
    * Scale shape: candidate ids are queries×r rows — broadcast; the
    * index-side join to fetch their vectors is the only index touch
    * after the code scan, and the final heap merge is bounded as in
    * [[Knn.bruteForceTopK]].
    */
  def ivfPqResidualTopKRefined(index: DataFrame, queries: DataFrame,
      centroids: DataFrame, k: Int, r: Int, nprobe: Int, m: Int,
      cw: Array[Array[Array[Float]]]): DataFrame = {
    val candIds = ivfPqResidualTopKWith(index, queries, centroids, r, nprobe, m, cw)
      .select(col("query_id"), col("vec_id"))
    val cands = index.select(col("vec_id"), col("embedding"))
      .join(broadcast(candIds), "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("qvec"))), "query_id")
    heapTopK(cands, k)
  }

  /** Seeded ±1 hyperplane for (table, bit) — deterministic across runs. */
  private def hyperplane(table: Int, bit: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      val d = md.digest(s"$table|$bit|$i".getBytes("UTF-8"))
      if ((d(0) & 1) == 0) 1.0 else -1.0
    }
  }

  /** (id, table, sig) signature rows: sig's bit j is sign(v·h_{table,j}).
    * One fused typed pass computes all numTables×bits dot products per
    * row with primitive loops — the expression formulation (64 separate
    * dot expressions + posexplode) pays per-expression evaluation
    * overhead on every row. Accumulation is left-to-right double,
    * bit-identical to DotProduct / the oracle.
    */
  private[graft] def signatures(df: DataFrame, vCol: String, idCol: String,
      numTables: Int, bits: Int, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val planes: Array[Array[Array[Double]]] =
      Array.tabulate(numTables, bits)((t, j) => hyperplane(t, j, dim))
    df.select(col(idCol).cast("long"), col(vCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.flatMap { case (id, vec) =>
          Iterator.tabulate(planes.length) { t =>
            var sig = 0
            var j = 0
            while (j < planes(t).length) {
              val h = planes(t)(j)
              var s = 0.0
              val n = math.min(vec.length, h.length)
              var k = 0
              while (k < n) { s += vec(k).toDouble * h(k); k += 1 }
              if (s > 0) sig |= 1 << j
              j += 1
            }
            (id, t, sig)
          }
        }
      }
      .toDF(idCol, "table", "sig")
  }

  /** LSH top-k: candidates share a signature in ≥1 of `numTables`
    * tables; exact re-rank within candidates. Scan fraction ≈ bucket
    * collision rate; recall depends on neighbor similarity (high-sim
    * neighbors agree on sign bits with prob 1 − θ/π per bit).
    *
    * The dedup (a pair may collide in several tables) runs over bare
    * (query_id, vec_id) ids — the vectors are joined back onto the
    * small surviving candidate set, so the distinct exchange never
    * carries embedding payload.
    */
  def lshTopK(index: DataFrame, queries: DataFrame, k: Int, dim: Int,
      numTables: Int = 8, bits: Int = 8): DataFrame = {
    val iSigs = signatures(index, "embedding", "vec_id", numTables, bits, dim)
    val qSigs = signatures(queries, "qvec", "query_id", numTables, bits, dim)
    val candIds = iSigs.join(broadcast(qSigs), Seq("table", "sig"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val cands = candIds
      .join(index.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("qvec"))), "query_id")
    heapTopK(cands, k)
  }

  /** Sign-bit binary codes: bit i of word i/64 is set iff v(i) > 0 —
    * one bit per dimension, a 32× compression of float32 (the layout
    * behind Faiss `IndexBinaryFlat` and the "binary quantization"
    * option production vector stores ship). Packing is a narrow typed
    * map; the index never shuffles.
    */
  private[graft] def binaryCodes(df: DataFrame, vCol: String, idCol: String,
      dim: Int): org.apache.spark.sql.Dataset[(Long, Array[Long])] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val w = new Array[Long]((dim + 63) >> 6)
        var i = 0
        val n = math.min(v.length, dim)
        while (i < n) { if (v(i) > 0f) w(i >> 6) |= 1L << (i & 63); i += 1 }
        (id, w)
      }
  }

  /** Binary-quantized search with exact re-ranking — the "BQ"
    * production configuration (Qdrant binary quantization; Faiss
    * `IndexBinaryFlat` + `IndexRefineFlat`): the Hamming scan over
    * 1-bit codes proposes `r` candidates per query (XOR + popcount on
    * packed 64-bit words — for L2-normalized vectors sign agreement is
    * a monotone proxy for angular similarity, the same guarantee LSH
    * sign-bit buckets lean on, here used as a full-scan scorer instead
    * of a bucketer), then ONLY the queries×r winners are fetched for
    * the exact float top-k.
    *
    * Scale shape: codes are dim/8 bytes per row (32× less memory
    * traffic than the float scan); the query codes ride the closure
    * (≤ queries rows); the Hamming pass is narrow with per-partition
    * bounded heaps, so only P×Q×r survivors shuffle — the index
    * itself never does. Hamming ties break to the lower vec_id on both
    * engines, so the candidate SET is deterministic even though the
    * within-set Hamming order is not emitted.
    */
  def binaryTopKRefined(index: DataFrame, queries: DataFrame, k: Int,
      r: Int, dim: Int = 64): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val qcodes: Array[(Long, Array[Long])] =
      binaryCodes(queries, "qvec", "query_id", dim).collect().sortBy(_._1)
    val sims = binaryCodes(index, "embedding", "vec_id", dim)
      .mapPartitions { it =>
        it.flatMap { case (id, w) =>
          qcodes.iterator.map { case (qid, qw) =>
            var h = 0
            var j = 0
            while (j < w.length) {
              h += java.lang.Long.bitCount(w(j) ^ qw(j)); j += 1
            }
            (qid, id, -h.toDouble)
          }
        }
      }
    val candIds = Knn.topKOfSims(sims, r)
      .select(col("query_id"), col("vec_id"))
    val cands = index.select(col("vec_id"), col("embedding"))
      .join(broadcast(candIds), "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("qvec"))), "query_id")
    heapTopK(cands, k)
  }

  /** Seeded ±(1/√dOut) random-projection planes (the Achlioptas sign
    * matrix, Achlioptas 2003 "Database-friendly random projections";
    * the Faiss `RandomRotationMatrix` pre-transform analog) — md5-parity
    * signs, [[hyperplane]]'s convention under its own seed prefix.
    * dOut = 16 keeps the 1/√dOut scale exactly representable (0.25), so
    * both engines' projected components are bit-identical doubles.
    */
  private[graft] def rpPlanes(dOut: Int, dIn: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val scale = 1.0 / math.sqrt(dOut.toDouble)
    Array.tabulate(dOut, dIn) { (j, i) =>
      val d = md.digest(s"rp|$j|$i".getBytes("UTF-8"))
      if ((d(0) & 1) == 0) scale else -scale
    }
  }

  /** Project rows into the reduced space: out(j) = Σ_i v(i)·p_j(i),
    * left-to-right double accumulation per output dim (the oracle's
    * duckDot order). One narrow typed map — the index never shuffles.
    */
  private[graft] def projectRows(df: DataFrame, vCol: String, idCol: String,
      planes: Array[Array[Double]]): org.apache.spark.sql.Dataset[(Long, Array[Double])] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val out = new Array[Double](planes.length)
        var j = 0
        while (j < planes.length) {
          val p = planes(j)
          var s = 0.0
          val n = math.min(v.length, p.length)
          var i = 0
          while (i < n) { s += v(i).toDouble * p(i); i += 1 }
          out(j) = s
          j += 1
        }
        (id, out)
      }
  }

  /** Random-projection pre-transform search with exact re-ranking —
    * the Faiss `IndexPreTransform(RandomRotationMatrix, IndexFlat)`
    * shape: project index and queries 64 → dOut dims with the seeded
    * sign matrix (JL lemma: inner products of unit vectors are
    * preserved in expectation with O(1/√dOut) distortion), propose `r`
    * candidates per query from a full scan of the SHORT vectors, fetch
    * only those rows for the exact float re-rank. The dimensionality
    * cut is the complement of PQ's code compression: 4× fewer
    * multiply-adds per scanned row with zero codebook training.
    *
    * Scale shape: projection is one narrow map each side (the index
    * never shuffles); the projected query block rides the closure
    * (≤ queries × dOut doubles); the proposal scan uses per-partition
    * bounded heaps so only P×Q×r survivors exchange before the
    * bounded refine — [[binaryTopKRefined]]'s topology with dots in
    * place of Hamming.
    */
  def rpTopKRefined(index: DataFrame, queries: DataFrame, k: Int, r: Int,
      dOut: Int = 16, dim: Int = 64): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val planes = rpPlanes(dOut, dim)
    val pq: Array[(Long, Array[Double])] =
      projectRows(queries, "qvec", "query_id", planes).collect().sortBy(_._1)
    val sims = projectRows(index, "embedding", "vec_id", planes)
      .mapPartitions { it =>
        it.flatMap { case (id, pv) =>
          pq.iterator.map { case (qid, qv) =>
            var s = 0.0
            var j = 0
            while (j < pv.length) { s += pv(j) * qv(j); j += 1 }
            (qid, id, s)
          }
        }
      }
    val candIds = Knn.topKOfSims(sims, r)
      .select(col("query_id"), col("vec_id"))
    val cands = index.select(col("vec_id"), col("embedding"))
      .join(broadcast(candIds), "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("qvec"))), "query_id")
    heapTopK(cands, k)
  }

  /** Random-projection pre-transform composed with IVF — the Faiss
    * `IndexPreTransform(RandomRotationMatrix, IVF)` shape, completing
    * the IVF × quantizer matrix (flat / SQ8 / PQ / residual-PQ /
    * binary / RP): EVERYTHING downstream of the transform operates in
    * the reduced space, exactly as Faiss applies the pre-transform —
    * coarse assignment, probing, and the in-cell proposal scan all use
    * the 16-dim projections (4× less arithmetic per row at every
    * stage), and only the `r` proposal survivors are fetched for the
    * exact full-space re-rank.
    *
    * Scale shape: projection and reduced-space assignment fuse into
    * one narrow map (the index never shuffles); projected centroids
    * and queries ride the closure; the probe join is queries×nprobe
    * broadcast rows; only P×Q×r survivors exchange before the bounded
    * refine.
    */
  def rpIvfTopK(index: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, r: Int, nprobe: Int, dOut: Int = 16, dim: Int = 64): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val planes = rpPlanes(dOut, dim)
    def dotDD(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; val n = math.min(a.length, b.length); var i = 0
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    val pCents: Array[(Long, Array[Double])] =
      projectRows(centroids, "cvec", "cent_id", planes).collect().sortBy(_._1)
    val pQs: Array[(Long, Array[Double])] =
      projectRows(queries, "qvec", "query_id", planes).collect().sortBy(_._1)
    // reduced-space assignment: strict > scan from the lowest cent_id —
    // the assignCells tie rule, in the transformed space
    val assigned = projectRows(index, "embedding", "vec_id", planes)
      .mapPartitions { it =>
        it.map { case (id, pv) =>
          var best = 0; var bs = Double.NegativeInfinity
          var ci = 0
          while (ci < pCents.length) {
            val s = dotDD(pv, pCents(ci)._2)
            if (s > bs) { bs = s; best = ci }
            ci += 1
          }
          (id, pv, pCents(best)._1)
        }
      }.toDF("vec_id", "pv", "cent_id")
    val probes = pQs.toSeq.flatMap { case (qid, qpv) =>
      pCents.map { case (cid, cv) => (cid, dotDD(qpv, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(nprobe)
        .map { case (cid, _) => (qid, cid) }
    }.toDF("query_id", "cent_id")
    val qMap: Map[Long, Array[Double]] = pQs.toMap
    val sims = assigned.join(broadcast(probes), "cent_id")
      .select(col("query_id").cast("long"), col("vec_id").cast("long"),
        col("pv"))
      .as[(Long, Long, Array[Double])]
      .mapPartitions { it =>
        it.map { case (qid, id, pv) => (qid, id, dotDD(pv, qMap(qid))) }
      }
    val candIds = Knn.topKOfSims(sims, r)
      .select(col("query_id"), col("vec_id"))
    val cands = index.select(col("vec_id"), col("embedding"))
      .join(broadcast(candIds), "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("qvec"))), "query_id")
    heapTopK(cands, k)
  }

  /** IVF over binary codes — the Faiss `IndexBinaryIVF` composition,
    * completing the IVF × quantizer matrix (flat / SQ8 / PQ /
    * residual-PQ / binary): the float-space coarse quantizer bounds
    * WHICH rows are scanned (nprobe cells), sign-bit codes bound the
    * BYTES per row (dim/8 — 32× under float32), the XOR+popcount
    * Hamming scan proposes `r` candidates per query within probed
    * cells, and only those rows are fetched for the exact float
    * re-rank.
    *
    * Scale shape: assignment and packing are one narrow pass each (the
    * index never shuffles), the probe join is queries×nprobe broadcast
    * rows, query codes ride the closure, and only P×Q×r proposal
    * survivors exchange before the bounded refine.
    */
  def ivfBinaryTopK(index: DataFrame, queries: DataFrame,
      centroids: DataFrame, k: Int, r: Int, nprobe: Int,
      dim: Int = 64): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val codes = assignCells(index, centroids)
      .select(col("vec_id").cast("long"), col("embedding"),
        col("cent_id").cast("long"))
      .as[(Long, Array[Float], Long)]
      .map { case (id, v, cid) =>
        val w = new Array[Long]((dim + 63) >> 6)
        var i = 0
        val n = math.min(v.length, dim)
        while (i < n) { if (v(i) > 0f) w(i >> 6) |= 1L << (i & 63); i += 1 }
        (id, cid, w)
      }.toDF("vec_id", "cent_id", "w")
    val cents: Array[(Long, Array[Float])] = centroids
      .select(col("cent_id").cast("long"), col("cvec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val probes = queries.select(col("query_id").cast("long"), col("qvec"))
      .as[(Long, Array[Float])]
      .flatMap { case (qid, qv) =>
        cents.map { case (cid, cv) => (cid, dotFF(qv, cv)) }
          .sortBy { case (cid, s) => (-s, cid) }
          .take(nprobe)
          .map { case (cid, _) => (qid, cid) }
      }.toDF("query_id", "cent_id")
    val qcodes: Map[Long, Array[Long]] =
      binaryCodes(queries, "qvec", "query_id", dim).collect().toMap
    val sims = codes.join(broadcast(probes), "cent_id")
      .select(col("query_id").cast("long"), col("vec_id").cast("long"),
        col("w"))
      .as[(Long, Long, Array[Long])]
      .mapPartitions { it =>
        it.map { case (qid, id, w) =>
          val qw = qcodes(qid)
          var h = 0
          var j = 0
          while (j < w.length) {
            h += java.lang.Long.bitCount(w(j) ^ qw(j)); j += 1
          }
          (qid, id, -h.toDouble)
        }
      }
    val candIds = Knn.topKOfSims(sims, r)
      .select(col("query_id"), col("vec_id"))
    val cands = index.select(col("vec_id"), col("embedding"))
      .join(broadcast(candIds), "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("qvec"))), "query_id")
    heapTopK(cands, k)
  }

  /** Fused dot-product + per-partition heap top-k per query over
    * candidate rows (query_id, vec_id, embedding, qvec) — no exchange
    * of the candidate set, only of the ≤ P×Q×k partial winners.
    * Ordering: sim desc, vec_id asc (pinned ties, SURVEY §7).
    */
  private[search] def heapTopK(cands: DataFrame, k: Int): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    val kk = k
    val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    val partial = cands
      .select(col("query_id").cast("long"), col("vec_id").cast("long"),
        col("embedding"), col("qvec"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions { it =>
        val heaps = scala.collection.mutable.LinkedHashMap
          .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
        it.foreach { case (qid, id, v, qv) =>
          var s = 0.0; val n = math.min(v.length, qv.length); var i = 0
          while (i < n) { s += v(i).toDouble * qv(i).toDouble; i += 1 }
          val h = heaps.getOrElseUpdate(qid,
            scala.collection.mutable.PriorityQueue.empty(worstFirst))
          if (h.size < kk) h.enqueue((s, id))
          else {
            val (ws, wid) = h.head
            if (s > ws || (s == ws && id < wid)) { h.dequeue(); h.enqueue((s, id)) }
          }
        }
        heaps.iterator.flatMap { case (q, h) => h.iterator.map { case (s, id) => (q, id, s) } }
      }
    val topk = new graft.functions.TopKAggregator[Long](kk).toColumn
    partial
      .groupByKey(_._1)
      .mapValues { case (_, id, s) => (id, s) }
      .agg(topk.name("topk"))
      .flatMap { case (q, winners) =>
        winners.zipWithIndex.map { case ((s, id), i) => (q, id, i + 1, s) }
      }
      .toDF("query_id", "vec_id", "rank", "sim")
  }
}
