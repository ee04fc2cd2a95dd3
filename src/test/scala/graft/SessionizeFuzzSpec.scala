package graft

import org.apache.spark.sql.functions._

import graft.queries.Events

/** Property fuzz for the skew-hardened sessionize: the per-(user, day)
  * formulation's one nontrivial step is stitching sessions ACROSS cell
  * boundaries (a session spanning midnight must not double-count; a gap
  * exactly at the threshold must split on both formulations the same
  * way). Random corpora are generated to cluster timestamps around day
  * boundaries and around exact gap multiples — the two edges where an
  * off-by-one in the stitch or the strict-`>` gap test would hide —
  * and every corpus must produce identical (user, n_sessions,
  * n_events) under the bucketed and window formulations.
  */
class SessionizeFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val GapUs = 1800L * 1000000L
  private val DayUs = 86400L * 1000000L

  test("bucketed == window on 30 adversarial random corpora") {
    val rng = new scala.util.Random(2024)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    for (trial <- 1 to 30) {
      val nUsers = 1 + rng.nextInt(6)
      val rows = (0 until 120).map { i =>
        val u = rng.nextInt(nUsers).toLong
        // cluster around day boundaries and exact gap multiples:
        // offsets of 0, ±1s, ±gap, ±(gap+1s) from a random day edge
        val day = rng.nextInt(5).toLong
        val edge = day * DayUs / 1000 // ms
        val jitter = rng.nextInt(7) match {
          case 0 => 0L
          case 1 => -1000L
          case 2 => 1000L
          case 3 => -GapUs / 1000
          case 4 => GapUs / 1000
          case 5 => GapUs / 1000 + 1000
          case 6 => rng.nextInt(12 * 3600) * 1000L
        }
        (i.toLong, new java.sql.Timestamp(base + edge + jitter.max(-edge)),
          u, "click", 1.0, "{}")
      }
      val dir = java.nio.file.Files.createTempDirectory(s"sesfuzz$trial").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val bucketed = Events.eventsSessionize(spark, dir)
        .as[(Long, Long, Long)].collect().toSet
      val window = Events.eventsSessionizeWindow(spark, dir)
        .as[(Long, Long, Long)].collect().toSet
      assert(bucketed == window,
        s"trial $trial: bucketed=${bucketed.toSeq.sorted} window=${window.toSeq.sorted}")
    }
  }
}
