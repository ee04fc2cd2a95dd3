package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each domain module under `graft.queries` contributes a map of named
  * queries `(SparkSession, sfDir) => DataFrame` plus matching DuckDB
  * oracle SQL (bare table names — the driver registers each fixture
  * parquet as a view). Column names are aliased identically on both
  * sides; outputs are explicitly ordered and avoid raw
  * accumulation-order-sensitive floats (SURVEY §7 hard parts).
  */
object SparkEntry {

  private def modules = Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])](
    (Similarity.defs, Similarity.oracles),
    (Relational.defs, Relational.oracles),
    (Events.defs, Events.oracles),
    (TextAnalysis.defs, TextAnalysis.oracles),
    (DedupQueries.defs, DedupQueries.oracles),
    (Bm25.defs, Bm25.oracles),
    (Rag.defs, Rag.oracles),
    (Quality.defs, Quality.oracles),
    (MultimodalQueries.defs, MultimodalQueries.oracles),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference experiment: chunk ×5 strategies, embed ×5 models,
    * retrieve, evaluate — one DAG (SURVEY §3.1).
    */
  def entry(spark: SparkSession): DataFrame =
    Rag.ragEval(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
