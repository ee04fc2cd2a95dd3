package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries with the Bench methodology (default
  * SPARK_GRAFT_CPUS master, clearCache between queries, warmup pass on
  * sf0.001, min of two timed passes) — for before/after isolation of a
  * single optimization without paying the full 229-query run.
  */
object TimeSome {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = {
      val d = new java.io.File(new java.io.File(dir).getParentFile, "sf0.001")
      if (d.isDirectory) d.getPath else dir
    }
    val names = args.toSeq
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, warmDir).count()
      catch { case _: Throwable => () }
      spark.sharedState.cacheManager.clearCache()
    }
    def pass(order: Seq[String]): Map[String, Double] = order.map { n =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      n -> dt
    }.toMap
    val p1 = pass(names)
    val p2 = pass(names.reverse)
    names.foreach { n =>
      println(f"$n%-28s min=${math.min(p1(n), p2(n))}%6.2f  p1=${p1(n)}%6.2f p2=${p2(n)}%6.2f")
    }
    spark.stop()
  }
}
