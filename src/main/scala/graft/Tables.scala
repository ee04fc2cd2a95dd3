package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet fixture tables (TESTDATA.md).
  *
  * All tables are plain parquet files under an `sfDir` like
  * `/root/testdata/sf0.01`. Reads are lazy; Catalyst pushes filters and
  * column pruning into the vectorized parquet scan, so callers should
  * `select`/`filter` as early as possible and let the scan do the work.
  */
object Tables {
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which the
    * Spark vectorized reader rejects. Read nanos as LONG
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to a
    * microsecond TIMESTAMP — the same truncation the DuckDB oracle
    * applies via `CAST(ts AS TIMESTAMP)`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
