package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter group keys (builder-prompt scale
  * checklist: "skewed keys → salting or AQE skew-join").
  *
  * AQE handles skewed JOINS automatically; skewed AGGREGATIONS over
  * algebraic functions are handled here by two-phase salting: aggregate
  * on (key, salt) first — spreading one hot key over `factor` reducers —
  * then combine the partials. Only valid for decomposable aggregates
  * (sum/count/min/max); avg must be expressed as sum/count.
  */
object Skew {

  /** Deterministic salt 0..factor-1 derived from stable row columns. */
  def salt(factor: Int, from: Column*): Column =
    pmod(hash(from: _*), lit(factor))

  /** Two-phase salted sum/count aggregate.
    *
    * @param df input
    * @param keys group keys
    * @param sums (inputColumn → outputName) summed columns
    * @param factor salt fan-out
    * @param saltFrom stable columns to derive the salt from
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String],
      sums: Map[String, String], factor: Int, saltFrom: Seq[String]): DataFrame = {
    val phase1 = df
      .withColumn("_salt", salt(factor, saltFrom.map(col): _*))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(
        count(lit(1)).as("_n"),
        sums.map { case (c, out) => sum(col(c)).as(s"_sum_$out") }.toSeq: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("_n")).as("n"),
        sums.values.map(out => sum(col(s"_sum_$out")).as(out)).toSeq: _*)
  }
}
