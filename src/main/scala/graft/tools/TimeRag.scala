package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.rag.Pipeline
import graft.queries.Rag
object TimeRag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s ($n)")
    }
    val docs = Rag.toDocuments(spark, dir)
    val chunks = Pipeline.chunkDocuments(docs).toDF()
    time("chunk")(chunks.count())
    val embedded = Pipeline.embedChunks(chunks).cache()
    time("embed")(embedded.count())
    val qv = Pipeline.embedQueries(Rag.syntheticQueries(spark, dir))
    val hits = Pipeline.retrieve(embedded, qv, 10)
    val sims0 = embedded.join(broadcast(qv.select(col("query_id"), col("model").as("qmodel"), col("qvec"))), col("model") === col("qmodel")).select(col("strategy"), col("model"), col("query_id"), col("chunk_id"), graft.functions.Vec.dot(col("embedding"), col("qvec")).as("sim"))
    time("sims-only")(sims0.select(sum(col("sim"))).count())
    time("retrieve")(hits.count())
    time("eval")(Pipeline.evaluate(hits, Rag.syntheticQueries(spark, dir), chunks).count())
    time("full")(Rag.ragEval(spark, dir).count())
    spark.stop()
  }
}
