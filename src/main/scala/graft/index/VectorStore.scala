package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.search.Knn

/** Partitioned-parquet vector store — the Spark restatement of the
  * reference's embedded Qdrant manager (reference: src/vector_db.py).
  * One `collection=<name>` partition replaces one Qdrant collection
  * (SURVEY §1.4): partition pruning gives the same per-collection
  * isolation, and an overwrite of a single partition is the reference's
  * recreate-on-exists semantics (vector_db.py:42-46).
  *
  * Scale: the store is write-once/read-many columnar data; reads prune
  * to one partition and only the columns a query needs. At 100 TB the
  * same layout holds — collections are directories, vectors are a
  * float-array column, and search is a scan + top-k (exact) or an
  * LSH-bucketed join (approximate, see Knn).
  */
class VectorStore(spark: SparkSession, basePath: String) {

  private def table: DataFrame = spark.read
    .option("basePath", basePath).parquet(s"$basePath/collection=*")

  /** V1+V2: (re)create a collection from rows carrying an `embedding`
    * column plus payload columns; ids 0..n-1 follow `orderCol` order
    * (reference assigns enumerate() ids, vector_db.py:75-81).
    *
    * Scale: a `Window.orderBy` with no partitionBy would funnel the whole
    * collection through ONE task to number rows. Instead: range-partitioned
    * sort, then RDD `zipWithIndex` — one small count job over partition
    * sizes, then contiguous ids assigned per-partition in parallel. Same
    * enumerate() semantics, no single-partition exchange.
    */
  def createCollection(name: String, rows: DataFrame, orderCol: String): Unit = {
    val sorted = rows.orderBy(col(orderCol))
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false))
    val withId = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(withId, schema)
      .write.mode("overwrite")
      .parquet(s"$basePath/collection=$name")
  }

  /** V3: exact cosine top-k within one collection (vector_db.py:93-119). */
  def search(collection: String, queries: DataFrame, k: Int): DataFrame =
    Knn.bruteForceTopK(read(collection), queries, k, idCol = "id")
      .withColumnRenamed("vec_id", "id")

  /** Read one collection (partition-pruned). */
  def read(collection: String): DataFrame =
    spark.read.parquet(s"$basePath/collection=$collection")

  /** V4: drop a collection. */
  def deleteCollection(name: String): Unit = {
    val dir = new java.io.File(s"$basePath/collection=$name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(): Unit
    }
    if (dir.exists) rm(dir)
  }

  /** Point-level DELETE within a collection — the other half of the
    * reference store's maintenance contract (Qdrant deletes points
    * without dropping the collection; the repo's V4 above is the
    * collection-level drop): rewrite the partition without the
    * tombstoned ids via write-to-temp + atomic swap (the [[compact]]
    * discipline — a concurrent reader sees the old layout or the new
    * one, never a mix). Returns the number of points actually removed
    * (absent ids are not an error — the idempotent-delete convention).
    * `ids` rides the filter closure — point deletes are small batches
    * by contract (a retention pass with corpus-scale tombstones should
    * anti-join a frame instead). A graph-ANN index over the collection
    * repairs incrementally via
    * [[graft.search.NnGraph.deleteFromGraph]] rather than rebuilding.
    */
  def deletePoints(name: String, ids: Seq[Long]): Long = {
    val src = s"$basePath/collection=$name"
    val tmp = s"$basePath/.delete-$name"
    val df = spark.read.parquet(src)
    val before = df.count()
    val kept = df.filter(!col("id").isin(ids: _*))
    kept.write.mode("overwrite").parquet(tmp)
    val after = spark.read.parquet(tmp).count()
    deleteCollection(name)
    if (!new java.io.File(tmp).renameTo(new java.io.File(src)))
      throw new java.io.IOException(s"deletePoints: rename failed for $name")
    before - after
  }

  /** Point-level UPSERT within a collection (Qdrant upsert semantics,
    * vector_db.py:60-91: same-id points are REPLACED, new ids are
    * added). `rows` must carry the collection's columns including `id`;
    * the anti-join keeps every existing point whose id is not being
    * replaced. Same write-to-temp + atomic-swap discipline as
    * [[deletePoints]].
    */
  def upsertPoints(name: String, rows: DataFrame): Unit = {
    val src = s"$basePath/collection=$name"
    val tmp = s"$basePath/.upsert-$name"
    val existing = spark.read.parquet(src)
    existing.join(rows.select(col("id")), Seq("id"), "left_anti")
      .unionByName(rows.select(existing.columns.map(col).toIndexedSeq: _*))
      .write.mode("overwrite").parquet(tmp)
    deleteCollection(name)
    if (!new java.io.File(tmp).renameTo(new java.io.File(src)))
      throw new java.io.IOException(s"upsertPoints: rename failed for $name")
  }

  /** V5: list collections (catalog listing / SHOW PARTITIONS analog). */
  def collectionNames(): Seq[String] = {
    val base = new java.io.File(basePath)
    if (!base.exists) Seq.empty
    else base.listFiles.filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("collection=")).map(_.stripPrefix("collection="))
      .sorted.toSeq
  }

  /** Compact a collection's file layout — the operational maintenance
    * every long-lived parquet index needs at scale: incremental
    * ingestion (streaming micro-batches, per-executor writers) leaves
    * many small files, and scan throughput collapses when file count
    * dwarfs the data (footer reads + task-per-file scheduling dominate).
    * Rewrites the partition at `targetRows` rows per file via an
    * explicit repartition; write-to-temp then atomic directory swap, so
    * a concurrent reader sees the old layout or the new one, never a
    * half-written mix. Contents are preserved row-for-row (spec-checked
    * by full-frame comparison); only the file layout changes.
    */
  def compact(name: String, targetRows: Long): Unit = {
    val src = s"$basePath/collection=$name"
    val tmp = s"$basePath/.compact-$name"
    val df = spark.read.parquet(src)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRows).toInt)
    df.repartition(files).write.mode("overwrite").parquet(tmp)
    deleteCollection(name)
    if (!new java.io.File(tmp).renameTo(new java.io.File(src)))
      throw new java.io.IOException(s"compact: rename failed for $name")
  }

  /** V6: per-collection info: point count + dim + distance metric
    * (vector_db.py:138-150; the store is cosine-only, as is the
    * reference's collection config).
    */
  def collectionInfo(): DataFrame =
    table.groupBy(col("collection"))
      .agg(count(lit(1)).as("points"), max(size(col("embedding"))).as("dim"))
      .withColumn("distance", lit("cosine"))
      .orderBy("collection")
}
