package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.queries.Events

/** Skew hardening for the events surface (round-10 verdict #5): the
  * retention/funnel/sessionize family hashes on `user_id`, and at 100×
  * a power-law user becomes one hot task unless each operator reduces
  * the hot key BEFORE its exchange. This spec builds a 100:1 skewed
  * fixture (one user owns half the events) and proves, via per-task
  * shuffle-read metrics, that no task ever receives the hot user's raw
  * event volume — the skew is absorbed map-side (partial aggregation /
  * per-(user,day) cells), not by luck of the hash.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val HotEvents = 20000
  private val ColdUsers = 100
  private val ColdEvents = 200 // 100:1 vs the hot user

  /** events.parquet fixture: user 0 is the 100:1 heavy hitter, spread
    * over ~8 weeks so the day-bucketed sessionize has many cells; event
    * types cycle so the funnel's three steps all survive.
    */
  private lazy val skewDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("skew-events").toString
    val types = Seq("signup", "click", "purchase", "view")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val hot = (0 until HotEvents).map { i =>
      (i.toLong, new java.sql.Timestamp(base + i * 240000L), 0L,
        types(i % 4), 1.0, "{}")
    }
    val cold = for {
      u <- 1 to ColdUsers; i <- 0 until ColdEvents
    } yield ((u * 100000 + i).toLong,
      new java.sql.Timestamp(base + (i * 97 + u) * 60000L), u.toLong,
      types((i + u) % 4), 1.0, "{}")
    (hot ++ cold).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Max records any single task pulled over a shuffle while `f` ran. */
  private def maxShuffleReadPerTask(f: => Unit): Long = {
    val mx = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null)
          mx.getAndUpdate(x => math.max(x, m.shuffleReadMetrics.recordsRead))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      f
      // the listener bus is async; give it a moment to drain
      var waited = 0
      var last = -1L
      while (waited < 5000 && mx.get() != last) {
        last = mx.get(); Thread.sleep(250); waited += 250
      }
      mx.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("sessionize: bucketed formulation equals the window formulation (skewed + real)") {
    for (d <- Seq(skewDir, "/root/testdata/sf0.001")) {
      val a = Events.eventsSessionize(spark, d)
        .as[(Long, Long, Long)].collect().toSet
      val b = Events.eventsSessionizeWindow(spark, d)
        .as[(Long, Long, Long)].collect().toSet
      assert(a == b, s"bucketed != window on $d")
    }
  }

  test("retention/funnel/sessionize: no task receives the hot key's raw volume") {
    // The hot user owns 20k raw events; each operator must reduce them
    // map-side so no post-shuffle task receives that volume. What a
    // task DOES legitimately receive is partial-row fan-out — up to
    // (mappers × touched cells) partial aggregation rows spread over
    // the shuffle partitions (~5.7k observed for the day-bucketed
    // sessionize at 8 mappers × ~1.5k cells ÷ 4 reducers) — so the cap
    // sits at half the hot key: far above the fan-out noise, far below
    // the 20k a raw-key traversal would show.
    val cap = HotEvents / 2
    for ((name, q) <- Seq[(String, () => Unit)](
      ("events_retention", () => Events.eventsRetention(spark, skewDir).collect()),
      ("events_funnel", () => Events.eventsFunnel(spark, skewDir).collect()),
      ("events_sessionize", () => Events.eventsSessionize(spark, skewDir).collect()))) {
      val mx = maxShuffleReadPerTask(q())
      assert(mx > 0, s"$name: listener saw no shuffle at all")
      assert(mx < cap, s"$name: a task read $mx shuffle records (hot key not reduced)")
    }
  }

  test("retention and funnel aggregate partially before the user_id exchange") {
    for ((name, df) <- Seq(
      ("events_retention", Events.eventsRetention(spark, skewDir)),
      ("events_funnel", Events.eventsFunnel(spark, skewDir)))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("partial_min") || plan.contains("partial_count")
        || plan.contains("partial_first"),
        s"$name plan lacks map-side partial aggregation:\n$plan")
    }
  }

  test("textrank: hub-token raw bigram volume is combined before any exchange") {
    // One stop-word-like hub co-occurs with every other token, carrying
    // ~100x any cold token's edges — the Zipf hub the round-11 verdict
    // flagged for textrank's token-keyed joins. The defense is the same
    // as the events family's: the raw multiplicity is reduced BEFORE
    // the exchange (groupBy(src, dst) partial-combines duplicate
    // bigrams map-side; per-iteration contributions combine on dst the
    // same way), so no task ever receives the hub's raw bigram volume —
    // only partial rows bounded by distinct degree x mappers. The
    // residual distinct-degree concentration (a hub with 10^6 distinct
    // neighbors) is the class AQE skew-join splits at the scale
    // SCALING.md models; the invariant THIS spec pins is that raw
    // volume never rides a shuffle.
    import spark.implicits._
    val nDocs = 400
    val docs = (0 until nDocs).map { d =>
      val w1 = s"tok${d % 50}a"
      val w2 = s"tok${d % 50}b"
      (d.toLong, Seq.fill(25)(s"hub $w1 hub $w2").mkString(" "))
    }.toDF("doc_id", "text")
    val rawHubBigrams = nDocs.toLong * 25 * 4 // every bigram touches the hub
    val mx = maxShuffleReadPerTask(
      graft.queries.TextAnalysis.textrankKeywordsOf(docs).collect())
    assert(mx > 0, "listener saw no shuffle at all")
    assert(mx < rawHubBigrams / 2,
      s"textrank: a task read $mx shuffle records (hub bigrams not combined; raw = $rawHubBigrams)")
  }

  test("skewed sessionize result is itself sane") {
    val rows = Events.eventsSessionize(spark, skewDir)
      .as[(Long, Long, Long)].collect()
      .map { case (u, s, _) => u -> s }.toMap
    // hot user: events every 4 min → one uninterrupted session
    assert(rows.contains(0L))
    // cold users: events ~97 min apart → every event its own session
    assert(rows(1L) == ColdEvents)
  }
}
