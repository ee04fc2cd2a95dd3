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

    // nearest cell per index vector: narrow map over the broadcast codebook
    val assigned = index.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bcCents.value
        it.map { case (id, v) =>
          var best = 0; var bestSim = Double.NegativeInfinity
          var ci = 0
          while (ci < cs.length) {
            val s = dot(v, cs(ci)._2)
            if (s > bestSim) { bestSim = s; best = ci }
            ci += 1
          }
          (id, v, cs(best)._1)
        }
      }.toDF("vec_id", "embedding", "cent_id")

    // nprobe nearest cells per query: same narrow map, emitting nprobe rows
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

  private def dotFF(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; val n = math.min(a.length, b.length); var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

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
      if (b._2 == 0) Array.emptyFloatArray else b._1.map(x => (x / b._2).toFloat)
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
