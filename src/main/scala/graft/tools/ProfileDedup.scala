package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** Stage-by-stage timing of dedup_minhash_lsh (dev tool). */
object ProfileDedup {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    val sh = time("shingleSet (+cache.count)") {
      val s = Dedup.shingleSet(Tables.documents(spark, sfDir), "doc_id", "text").cache()
      s.count(); s
    }
    val mh = time("minhash16 (count)") {
      val m = Dedup.minhash(sh, 16); m.count(); m
    }
    val bands = time("lshBands (+cache.count)") {
      val b = Dedup.lshBands(mh, 4).cache(); b.count(); b
    }
    val cands = time("lshCandidates (count)") {
      val c = Dedup.lshCandidates(bands).cache(); c.count(); c
    }
    time("candidateJaccard (count)") {
      Dedup.candidateJaccard(sh, cands).filter(col("jac") >= 0.7).count()
    }
    time("FULL dedupMinhashLsh") {
      graft.queries.DedupQueries.dedupMinhashLsh(spark, sfDir).count()
    }
    spark.stop()
  }
}
