package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.eval.Metrics

/** Report sinks (SURVEY §2.1 K1–K3): the reference's results.csv /
  * results.json / console best-of report (main.py:337-412).
  */
object Sinks {

  /** K1: single-file CSV report, sorted by combined score desc
    * (main.py:352-355). `coalesce(1)` is deliberate: a report is
    * driver-consumable by contract; the heavy lifting happened upstream.
    */
  def writeCsvReport(ranked: DataFrame, path: String): Unit =
    ranked.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)

  /** K2: JSON report — configurations + nested summary stats
    * (utils.py:38-43, main.py:357-363). The nested summary is a second
    * aggregate query packed with `struct`/`collect_list`.
    */
  def writeJsonReport(ranked: DataFrame, path: String): Unit = {
    val configs = ranked.agg(
      collect_list(struct(ranked.columns.toIndexedSeq.map(col): _*)).as("configurations"))
    val summary = Metrics.summaryStats(ranked)
      .select(struct(col("*")).as("summary_stats"))
    configs.crossJoin(summary)
      .coalesce(1).write.mode("overwrite").json(path)
  }

  /** K3: console report — formatted table + best-by-metric sections
    * (main.py:366-412).
    */
  def consoleReport(ranked: DataFrame): String = {
    val sb = new StringBuilder
    sb.append("=== Configurations (by combined score) ===\n")
    val rows = ranked.collect()
    rows.foreach { r =>
      sb.append("%-18s %-10s top1=%.3f top3=%.3f mrr=%.3f sim=%.3f combined=%.3f\n"
        .format(r.getAs[String]("strategy"), r.getAs[String]("model"),
          r.getAs[Double]("top_1_accuracy"), r.getAs[Double]("top_3_accuracy"),
          r.getAs[Double]("mrr"), r.getAs[Double]("avg_similarity"),
          r.getAs[Double]("combined_score")))
    }
    for (metric <- Seq("top_1_accuracy", "top_3_accuracy", "mrr", "combined_score")) {
      val best = Metrics.bestBy(ranked, metric).collect().head
      sb.append(s"best $metric: ${best.getAs[String]("strategy")} + " +
        s"${best.getAs[String]("model")} (${best.getAs[Double](metric)})\n")
    }
    sb.toString
  }
}
