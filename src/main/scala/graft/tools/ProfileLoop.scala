package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeated-run timing of one query to separate noise from plan cost
  * (dev tool). Usage: runMain graft.tools.ProfileLoop <query> [n]
  */
object ProfileLoop {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "rag_eval"
    val n = if (args.length > 1) args(1).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    val fn = graft.SparkEntry.queries(name)
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    (1 to n).foreach { i =>
      import scala.jdk.CollectionConverters._
      val gc0 = gcBeans.asScala.map(_.getCollectionTime).sum
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val gcMs = gcBeans.asScala.map(_.getCollectionTime).sum - gc0
      spark.sharedState.cacheManager.clearCache()
      println(f"  run $i: $dt%6.2f s  (gc ${gcMs}ms)")
    }
    spark.stop()
  }
}
