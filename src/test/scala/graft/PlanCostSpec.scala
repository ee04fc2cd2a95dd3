package graft

/** Plan-COST guard (round-13 verdict #4): [[PlanSpec]] pins plan SHAPES
  * (no cartesian, exchange reuse, pushdown, no forced SF-scaled
  * broadcast) but was blind to plan COST — round 13 shipped two queries
  * whose executed plans were shape-correct yet cost ~7 MINUTES of
  * single-threaded driver optimizer/codegen time EACH (`winnowFps`'s
  * nested-higher-order-function alias chain multiplied ~5× per level
  * under optimizer inlining; data-independent, so no cluster ever
  * absorbs it), taking the bench from 77 s to 979 s — the first gate
  * failure. Shape and cost are independent axes; this suite locks the
  * second one: every query on the public surface must analyze +
  * optimize + physical-plan (`executedPlan.toString` — the exact probe
  * that reproduced the blowup, covering the optimizer run and plan
  * stringification, the two driver-side costs that exploded) within a
  * generous ceiling. The round-13 formulation exceeds it ~40×; every
  * sane plan on the surface clears it with an order of magnitude to
  * spare (construction-time memo jobs included — they run on the
  * sf0.001 fixture).
  */
class PlanCostSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every SparkEntry query plans within the 10 s driver ceiling") {
    val ceilingSec = 10.0
    // untimed session warmup: the first plan of the suite pays executor
    // init + optimizer classloading + JIT (~10 s measured on the first
    // alphabetical query with a cold JVM) — generic cost, not the
    // per-query compile cost this guard locks
    spark.range(2).groupBy((org.apache.spark.sql.functions.col("id") % 2)
      .as("k")).count().queryExecution.executedPlan.toString
    def planSec(fn: (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      // forces analysis, the full optimizer run, physical planning and
      // plan stringification WITHOUT executing — so the measurement reads
      // as driver compile cost, not data cost (construction-time memo
      // jobs run on the tiny fixture and amortize on the retry below)
      df.queryExecution.executedPlan.toString
      (System.nanoTime() - t0) / 1e9
    }
    // First pass PARALLEL (round-14 verdict #5: the serial loop was
    // ~95 s — a third of the whole suite — replanning 183 queries one
    // at a time while plan construction is driver-side and thread-safe
    // per SparkSession). 8 threads cut it to ~¼; construction-time memo
    // jobs (collects on the sf0.001 fixture) interleave safely — the
    // memos are ConcurrentHashMap-backed and idempotent.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val firsts = try {
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      Await.result(
        Future.sequence(SparkEntry.queries.toSeq.sortBy(_._1).map {
          case (name, fn) => Future((name, fn, planSec(fn)))
        }), 15.minutes)
    } finally pool.shutdown()
    spark.sharedState.cacheManager.clearCache()
    // Retry SERIALLY, min-of-2, only past the ceiling: a first pass can
    // be inflated by a session+dir-keyed memo build, a JIT tier-up, or
    // — new under parallelism — pool contention; all one-offs that
    // vanish on quiet re-construction. A genuine compile blowup (the
    // round-13 winnowFps class) re-pays its full optimizer cost every
    // time and fails both attempts.
    val slow = firsts.flatMap { case (name, fn, first) =>
      val dt = if (first <= ceilingSec) first
        else math.min(first, planSec(fn))
      // memo-building queries cache plan-keyed frames at construction;
      // clear so accumulation can't distort later retries
      spark.sharedState.cacheManager.clearCache()
      if (dt > ceilingSec) Some(f"$name planned in $dt%.1f s") else None
    }
    assert(slow.isEmpty,
      s"plan-cost ceiling ($ceilingSec s) exceeded — a data-independent " +
        s"driver-side compile blowup no cluster can absorb: ${slow.mkString("; ")}")
  }
}
