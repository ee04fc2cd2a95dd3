package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.Tables
object TimeDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s ($n)")
    }
    val sh = Dedup.shingleSet(Tables.documents(spark, dir), "doc_id", "text").cache()
    time("shingles")(sh.count())
    val mh = Dedup.minhash(sh, 16)
    time("minhash")(mh.count())
    val bands = Dedup.lshBands(mh, 4)
    time("bands")(bands.count())
    val cands = Dedup.lshCandidates(bands)
    time("cands")(cands.count())
    time("jaccard")(Dedup.candidateJaccard(sh, cands).count())
    spark.stop()
  }
}
