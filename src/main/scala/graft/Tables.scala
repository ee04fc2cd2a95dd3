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
    spreadMemo.computeIfAbsent(spark, (dir, "documents#spread"))(
      spread(spark, load(spark, dir, "documents")))
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spreadMemo.computeIfAbsent(spark, (dir, "embeddings#spread"))(
      spread(spark, load(spark, dir, "embeddings")))

  /** Memoized spread-scan plans per (session, dir, table) — r21: every
    * query construction previously re-ran `spark.read.parquet` (footer/
    * schema read + file listing on the driver) and [[spread]]'s
    * `df.rdd.getNumPartitions` (forces full physical planning of the
    * scan) — ~3 such calls per query × 229 queries × 3 bench passes of
    * pure fixed driver overhead. The memo stores only the analyzed PLAN
    * (a session temp view via [[FrameMemo]]); every action still scans
    * the parquet files — nothing about query RESULTS is cached.
    * Contract: fixture dirs are immutable for a session's lifetime (the
    * driver's testdata contract); a caller that rewrites a fixture
    * in-place must use a new SparkSession (or dir).
    */
  private val spreadMemo = new FrameMemo[(String, String)]

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
  def events(spark: SparkSession, dir: String): DataFrame =
    spreadMemo.computeIfAbsent(spark, (dir, "events#typed"))(
      eventsUncached(spark, dir))

  private def eventsUncached(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
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

  /** Memoized plain scan (same memo + immutability contract as the
    * spread tables above). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spreadMemo.computeIfAbsent(spark, (dir, name))(
      spark.read.parquet(s"$dir/$name.parquet"))
}
