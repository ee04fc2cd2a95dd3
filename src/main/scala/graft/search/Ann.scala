package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vec

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
    * or k-means result; here any deterministic pick works. Assignment
    * ties break toward the lowest cent_id.
    */
  def ivfTopK(index: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val assignW = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id").asc)
    val assigned = index.crossJoin(broadcast(centroids))
      .withColumn("csim", Vec.dot(col("embedding"), col("cvec")))
      .withColumn("crank", row_number().over(assignW))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))

    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cent_id").asc)
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("csim", Vec.dot(col("qvec"), col("cvec")))
      .withColumn("crank", row_number().over(probeW))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("qvec"), col("cent_id"))

    val cands = assigned.join(broadcast(probes), "cent_id")
      .withColumn("sim", Vec.dot(col("embedding"), col("qvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("rank"), col("sim"))
  }

  /** Seeded ±1 hyperplane for (table, bit) — deterministic across runs. */
  private def hyperplane(table: Int, bit: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      val d = md.digest(s"$table|$bit|$i".getBytes("UTF-8"))
      if ((d(0) & 1) == 0) 1.0 else -1.0
    }
  }

  /** Signature column: an int whose bit j is sign(v · h_{table,j}). */
  private def signature(v: Column, table: Int, bits: Int, dim: Int): Column =
    (0 until bits).map { j =>
      val h = typedLit(hyperplane(table, j, dim))
      when(Vec.dot(v, h) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** LSH top-k: candidates share a signature in ≥1 of `numTables`
    * tables; exact re-rank within candidates. Scan fraction ≈ bucket
    * collision rate; recall depends on neighbor similarity (high-sim
    * neighbors agree on sign bits with prob 1 − θ/π per bit).
    */
  def lshTopK(index: DataFrame, queries: DataFrame, k: Int, dim: Int,
      numTables: Int = 8, bits: Int = 8): DataFrame = {
    def sigs(df: DataFrame, v: String, id: String) =
      df.select(col(id), col(v),
          posexplode(array((0 until numTables).map(t =>
            signature(col(v), t, bits, dim)): _*)).as(Seq("table", "sig")))

    val iSigs = sigs(index, "embedding", "vec_id")
    val qSigs = sigs(queries, "qvec", "query_id")
    val cands = iSigs.join(broadcast(qSigs), Seq("table", "sig"))
      .select(col("query_id"), col("qvec"), col("vec_id"), col("embedding"))
      .distinct()
      .withColumn("sim", Vec.dot(col("embedding"), col("qvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("rank"), col("sim"))
  }
}
