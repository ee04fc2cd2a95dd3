package graft

import org.apache.spark.sql.functions._

import graft.queries.Events

/** Property fuzz for the funnel family: random corpora with timestamps
  * deliberately clustered at the conversion-window EDGE (exactly
  * t1 + 7 days, ±1 second) and at equal-timestamp ties — where an
  * inclusive/exclusive slip in either engine formulation would hide —
  * each compared against a plain Scala fold of the min-chain contract.
  * The DuckDB oracle re-proves Spark↔SQL equality every round; this
  * spec pins Spark against the CONTRACT itself, so a fixture
  * regeneration cannot shift semantics silently.
  */
class EventsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val WinMs = 7L * 86400 * 1000

  test("funnel + windowed funnel match the Scala min-chain on 10 edge-heavy corpora") {
    val rng = new scala.util.Random(31)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    for (trial <- 1 to 10) {
      val nUsers = 3 + rng.nextInt(8)
      val rows = (0 until 150).map { i =>
        val u = rng.nextInt(nUsers).toLong
        val typ = Seq("signup", "click", "purchase", "view")(rng.nextInt(4))
        // cluster at multiples of the window and ±1s around them
        val t = base + rng.nextInt(4) * WinMs +
          (rng.nextInt(5) match {
            case 0 => 0L
            case 1 => -1000L
            case 2 => 1000L
            case _ => rng.nextInt(86400) * 1000L
          })
        (i.toLong, new java.sql.Timestamp(t), u, typ, 1.0, "{}")
      }
      val dir = java.nio.file.Files.createTempDirectory(s"funfuzz$trial").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      // ground truth: the contract, folded per user over ts-sorted events
      def chain(windowed: Boolean): Map[Int, Long] = {
        val perUser = rows.groupBy(_._3).values.map { evs =>
          var t1 = Option.empty[Long]; var t2 = Option.empty[Long]
          var t3 = Option.empty[Long]
          for ((_, ts, _, typ, _, _) <- evs.sortBy(_._2.getTime)) {
            val t = ts.getTime
            def in(prev: Long) = t > prev && (!windowed || t <= prev + WinMs)
            typ match {
              case "signup" if t1.isEmpty => t1 = Some(t)
              case "click" if t2.isEmpty && t1.exists(in) => t2 = Some(t)
              case "purchase" if t3.isEmpty && t2.exists(in) => t3 = Some(t)
              case _ => ()
            }
          }
          (t1, t2, t3)
        }.toSeq
        Map(1 -> perUser.count(_._1.isDefined).toLong,
          2 -> perUser.count(_._2.isDefined).toLong,
          3 -> perUser.count(_._3.isDefined).toLong)
      }
      // NOTE the fold's subtlety vs the batch query: the fold takes the
      // FIRST qualifying click in ts order, which IS min(click > t1)
      // (and windowed: min of clicks in (t1, t1+7d]) — same contract.
      val gotPlain = Events.eventsFunnel(spark, dir)
        .select(col("step"), col("n_users")).as[(Int, Long)].collect().toMap
      val gotWin = Events.eventsFunnelWindowed(spark, dir)
        .select(col("step"), col("n_users")).as[(Int, Long)].collect().toMap
      assert(gotPlain === chain(windowed = false), s"trial $trial plain")
      assert(gotWin === chain(windowed = true), s"trial $trial windowed")
    }
  }
}
