package graft

import org.apache.spark.sql.functions._

import graft.functions.Skew
import graft.queries.{Relational, Similarity}

/** Physical-plan assertions: the optimizations the engine relies on must
  * actually appear in the plans (pushdown, pruning, broadcast, top-k
  * without global sort).
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q3: filters pushed to parquet, dims broadcast, top-k via TakeOrdered") {
    val plan = planOf(Relational.q3ShippingPriority(spark, dir))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate")
      || plan.contains("GreaterThan(l_shipdate"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q1: aggregation is partial+final with a pruned scan") {
    val plan = planOf(Relational.q1PricingSummary(spark, dir))
    assert(plan.contains("partial_sum"))
    assert(!plan.contains("l_orderkey"), "scan should prune unused columns")
  }

  test("knn sims stay in whole-stage codegen with the native dot product") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.limit(3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val sims = emb.crossJoin(broadcast(q))
      .select(graft.functions.Vec.dot(col("embedding"), col("qvec")).as("sim"))
    sims.collect() // finalize the adaptive plan
    val plan = planOf(sims)
    // `*(N)` is the WholeStageCodegen stage marker in plan toString —
    // the projection computing graft_dot must carry it
    assert(plan.linesIterator.exists(l => l.contains("graft_dot") && l.contains("*(")),
      s"graft_dot not inside a codegen stage:\n$plan")
  }

  test("salted aggregate matches the direct aggregate") {
    val li = Tables.lineitem(spark, dir)
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedSumCount(li, Seq("l_returnflag"),
        Map("l_quantity" -> "qty"), factor = 16,
        saltFrom = Seq("l_orderkey", "l_linenumber"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }
}
