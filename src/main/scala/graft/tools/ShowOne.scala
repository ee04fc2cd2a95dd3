package graft.tools
import org.apache.spark.sql.SparkSession
object ShowOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (n <- args) {
      println(s"== $n @ $dir ==")
      graft.SparkEntry.queries(n)(spark, dir).show(50, false)
    }
    spark.stop()
  }
}
