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
  def documents(spark: SparkSession, dir: String): DataFrame =
    spread(spark, load(spark, dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spread(spark, load(spark, dir, "embeddings"))

  /** Fan a coarse scan out to full cluster parallelism.
    *
    * The fixture files are single-row-group parquet — unsplittable, so
    * the scan yields ONE partition and every downstream narrow stage
    * (chunking, embedding, shingling, dot products) runs on one core of
    * 32. A round-robin repartition costs one tiny shuffle (<1 MB here)
    * and unlocks the full executor. Conditional: a real multi-file /
    * multi-row-group dataset already scans with >= defaultParallelism
    * splits, and then this is a no-op — we never shuffle data that is
    * already spread.
    */
  def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** `events.parquet` has shipped `ts` as either parquet
    * TIMESTAMP(NANOS) — which the Spark vectorized reader rejects, so
    * it is read as LONG via `spark.sql.legacy.parquet.nanosAsLong` and
    * truncated to a microsecond TIMESTAMP — or (current fixtures) as a
    * plain TIMESTAMP(MICROS) that needs no conversion. Branch on the
    * type actually read so both generator vintages load; either way
    * the values equal the DuckDB oracle's `CAST(ts AS TIMESTAMP)`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // sessions pin spark.sql.session.timeZone=UTC, so this cast is
        // value-preserving; downstream `unix_micros`/`window` require
        // TIMESTAMP and this keeps the type identical to the
        // nanos-vintage path (timestamp_micros also yields TIMESTAMP)
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => df
      case other =>
        // A third generator vintage must fail LOUDLY, not load wrong
        // values: e.g. millis stored as plain LONG would hit the
        // LongType branch above and be misread as nanos ÷1000. Every
        // known vintage is matched explicitly; anything else is a
        // schema drift that needs a new branch here.
        throw new IllegalStateException(
          s"events.ts has unrecognized type $other — new fixture " +
            "vintage? Add an explicit branch in Tables.events")
    }
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
