package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Rag
import graft.rag.Pipeline
import graft.functions.Vec
import graft.eval.Metrics

/** Stage-by-stage timing of the rag_eval hotspot (dev tool). */
object ProfileRag {
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

    val docs = Rag.toDocuments(spark, sfDir)
    val queries = Rag.syntheticQueries(spark, sfDir)
    val chunks = time("chunk x5") {
      val c = Pipeline.chunkDocuments(docs).toDF().cache(); c.count(); c
    }
    val embedded = time("embed x5") {
      val e = Pipeline.embedChunks(chunks).cache(); e.count(); e
    }
    val qv = time("embedQueries") {
      val q = Pipeline.embedQueries(queries).cache(); q.count(); q
    }
    val sims = time("sims join+dot (count)") {
      val s = embedded.join(
          broadcast(qv.select(col("query_id"), col("model").as("qmodel"), col("qvec"))),
          col("model") === col("qmodel"))
        .select(col("strategy"), col("model"), col("query_id"), col("chunk_id"),
          Vec.dot(col("embedding"), col("qvec")).as("sim"))
      s.count(); s
    }
    val top = time("window topk (count)") {
      val w = Window.partitionBy(col("strategy"), col("model"), col("query_id"))
        .orderBy(col("sim").desc, col("chunk_id").asc)
      val t = sims.withColumn("rank", row_number().over(w)).filter(col("rank") <= 10).cache()
      t.count(); t
    }
    val hits = time("payload join (count)") {
      val h = top.join(chunks.select(col("chunk_id"), col("source_file"), col("content")), "chunk_id")
      h.count(); h
    }
    time("resolveExpected (count)") {
      Metrics.resolveExpectedSources(
        chunks.select(col("strategy"), col("source_file")).distinct(), queries).count()
    }
    time("evaluate (count)") {
      Pipeline.evaluate(hits, queries, chunks).count()
    }
    time("FULL ragEval (count)") {
      Rag.ragEval(spark, sfDir).count()
    }
    spark.stop()
  }
}
