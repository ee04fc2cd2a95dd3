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

  /** Generic windowed top-k (for small/medium candidate sets where the
    * candidates are already pruned, e.g. after an LSH bucket join).
    */
  def windowTopK(candidates: DataFrame, k: Int, partitionCols: Seq[String],
      orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderBy: _*)
    candidates.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
