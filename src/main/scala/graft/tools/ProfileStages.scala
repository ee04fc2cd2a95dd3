package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level timing of any SparkEntry query (dev tool).
  * Usage: runMain graft.tools.ProfileStages <query>
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "rag_eval"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = ArrayBuffer[(Int, Long, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.numTasks, si.name.takeWhile(_ != '\n').take(70)))
      }
    })

    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm
    spark.sharedState.cacheManager.clearCache()
    Thread.sleep(300); stages.clear()

    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    println(f"warm $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(500)
    stages.sortBy(-_._2).take(15).foreach { case (id, dur, nt, nm) =>
      println(f"  stage $id%4d ${dur / 1e3}%7.2f s  tasks=$nt%3d  $nm")
    }
    println(f"  sum ${stages.map(_._2).sum / 1e3}%.2f s over ${stages.size} stages")
    spark.stop()
  }
}
