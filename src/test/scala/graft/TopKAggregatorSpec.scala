package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator
import graft.search.Knn

/** The typed top-k UDAF must agree exactly with the window formulation
  * (including sim-desc/id-asc tie-breaks).
  */
class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator top-k equals window top-k, ties included") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 5000).map { i =>
      // coarse sims force plenty of exact ties
      (i.toLong % 7, i.toLong, math.floor(rnd.nextDouble() * 20) / 20.0)
    }
    val df = rows.toDF("query_id", "vec_id", "sim")

    val viaWindow = Knn.windowTopK(df, 10, Seq("query_id"),
        Seq(col("sim").desc, col("vec_id").asc))
      .select("query_id", "rank", "vec_id", "sim")
      .as[(Long, Int, Long, Double)].collect().toSet

    val agg = new TopKAggregator[Long](10).toColumn
    val viaAgg = df.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, id, sim) => (id, sim) }
      .agg(agg.name("topk"))
      .flatMap { case (q, top) =>
        top.zipWithIndex.map { case ((sim, id), i) => (q, i + 1, id, sim) }
      }.collect().toSet

    assert(viaAgg == viaWindow)
  }

  test("merge is associative and bounded") {
    val a = new TopKAggregator[Long](3)
    val left = Seq((0.9, 1L), (0.5, 2L))
    val right = Seq((0.9, 0L), (0.7, 3L), (0.1, 9L))
    val m = a.merge(left, right)
    assert(m == Seq((0.9, 0L), (0.9, 1L), (0.7, 3L))) // ties: id asc
    assert(a.merge(m, a.zero) == m)
  }
}
