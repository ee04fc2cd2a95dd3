package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.search.{Knn, NnGraph}

/** Per-collection graph-index state shared by every [[VectorStore]]
  * instance over the same path: the serving contract is PER COLLECTION
  * (the reference holds one Qdrant collection — one HNSW — per
  * strategy×model pair, src/vector_db.py:22-26), so artifacts key on
  * (store path, collection) and maintenance on one collection can
  * never touch another's graph.
  */
object VectorStore {
  // artifact memo: weakly session-keyed (FrameMemo — the DataFrame
  // value must not pin the session), inner key = (basePath, collection)
  private val graphMemo = new graft.FrameMemo[(String, String)]

  // trained-PQ codebook memo: plain driver arrays (no session pin),
  // weakly session-keyed, inner key = (basePath, collection)
  private val cwMemo =
    new graft.SessionMemo[(String, String), Array[Array[Array[Float]]]]

  // STALENESS GUARDS for cross-session mutation (the store path is
  // shared state; a session's memo can outlive a mutation performed
  // by ANOTHER session's store over the same path): the content stamp
  // the memoized graph frame was resolved at, and the identity token
  // the memoized codebooks were loaded/trained at — validated on every
  // lookup against the path's CURRENT state (a driver listing / one
  // small file read), dropping the stale entry instead of serving it
  // (graph: a pruned artifact dir would otherwise throw forever;
  // codebooks: a recreated dataset would otherwise be scored with the
  // old quantizer, silently).
  private val graphStampMemo = new graft.SessionMemo[(String, String), String]
  private val cwTokenMemo = new graft.SessionMemo[(String, String), String]

  // TRAIN census per (store, collection) — the spec hook proving
  // codebooks train once per collection lifetime (memo hits and
  // cold-start loads must never bump it)
  private val cwTrains = new java.util.concurrent.ConcurrentHashMap[
    (String, String), java.util.concurrent.atomic.AtomicLong]
  private def bumpTrain(key: (String, String)): Unit = {
    cwTrains.computeIfAbsent(key,
      _ => new java.util.concurrent.atomic.AtomicLong)
      .incrementAndGet(): Unit
  }
  private[graft] def cwTrainsOf(base: String, name: String): Long = {
    val c = cwTrains.get((base, name))
    if (c == null) 0L else c.get()
  }

  // PQ parameters — the quantizer family's production rung (m=8
  // subspaces, 16 codes, 2 Lloyd iterations — the ann_pq_trained
  // configuration)
  val PqM = 8
  val PqCodes = 16
  val PqIters = 2

  // IVF parameters — the coarse quantizer's production rung (8 Lloyd
  // cells, 2 iterations, probe 4 — the ann_ivf_trained configuration)
  val IvfCells = 8
  val IvfIters = 2
  val IvfNprobe = 4

  // trained-IVF centroid memo + identity token + train census — the
  // codebooksOf discipline applied to the coarse quantizer (VERDICT
  // r19 #5: the .pq persistence covered PQ only; IVF centroids
  // retrained per session)
  private val ivfMemo =
    new graft.SessionMemo[(String, String), Array[Array[Float]]]
  private val ivfTokenMemo = new graft.SessionMemo[(String, String), String]
  private val ivfTrains = new java.util.concurrent.ConcurrentHashMap[
    (String, String), java.util.concurrent.atomic.AtomicLong]
  private def bumpIvfTrain(key: (String, String)): Unit = {
    ivfTrains.computeIfAbsent(key,
      _ => new java.util.concurrent.atomic.AtomicLong)
      .incrementAndGet(): Unit
  }
  private[graft] def ivfTrainsOf(base: String, name: String): Long = {
    val c = ivfTrains.get((base, name))
    if (c == null) 0L else c.get()
  }

  // per-collection PQ CODE-ROW artifact memo + encode census (the
  // ColBERT/PLAID compressed token index as store state — VERDICT r19
  // #6): codes derive from BOTH the collection contents and the
  // trained codebooks, so their artifact dir is stamped with both
  // identities and any mutation re-encodes
  private val codesMemo = new graft.FrameMemo[(String, String)]
  private val codesStampMemo = new graft.SessionMemo[(String, String), String]
  private val codesEncodes = new java.util.concurrent.ConcurrentHashMap[
    (String, String), java.util.concurrent.atomic.AtomicLong]
  private def bumpEncode(key: (String, String)): Unit = {
    codesEncodes.computeIfAbsent(key,
      _ => new java.util.concurrent.atomic.AtomicLong)
      .incrementAndGet(): Unit
  }
  private[graft] def codesEncodesOf(base: String, name: String): Long = {
    val c = codesEncodes.get((base, name))
    if (c == null) 0L else c.get()
  }

  // FULL-build census per (store, collection) — the spec hook proving
  // upsert/delete maintain incrementally: maintenance must never bump
  // a collection's count, and collection A's maintenance must never
  // bump B's
  private val graphBuilds = new java.util.concurrent.ConcurrentHashMap[
    (String, String), java.util.concurrent.atomic.AtomicLong]
  private def bump(key: (String, String)): Unit = {
    graphBuilds.computeIfAbsent(key,
      _ => new java.util.concurrent.atomic.AtomicLong)
      .incrementAndGet(): Unit
  }
  private[graft] def graphBuildsOf(base: String, name: String): Long = {
    val c = graphBuilds.get((base, name))
    if (c == null) 0L else c.get()
  }

  // graph parameters — the graph family's production rung (NN-descent
  // k=10 over 3 rounds, beam 16 over 4 rounds, 16 md5-ranked seeds)
  val GraphK = 10
  val NndIters = 3
  val BeamWidth = 16
  val BeamIters = 4
  val NndSample = 16

  // maxsim serve: per-token candidate cut, 2×-oversampled for the
  // compressed gather (the Qdrant oversampling / Faiss k_factor
  // convention — the retrieve_maxsim_pq rung)
  val MaxsimCandTok = 16
}

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
    // recreate-on-exists semantics: a replaced dataset invalidates any
    // memoized graph artifact AND any persisted one (the stamp would
    // already refuse to serve it; deleting reclaims the space) — the
    // next graphSearch rebuilds fresh. Trained codebooks are dataset
    // artifacts too: a recreate retrains (unlike upsert/delete, which
    // keep them — the Faiss train-once contract).
    dropAllArtifacts(name)
  }

  /** Drop EVERY per-collection artifact + session memo — graph, PQ
    * codebooks, IVF centroids, code rows. The ONE invalidation path a
    * recreate and a collection drop share: a new artifact class added
    * here is invalidated everywhere, instead of being remembered at
    * each call site (a missed site would leave a recreate serving a
    * stale artifact class silently).
    */
  private def dropAllArtifacts(name: String): Unit = {
    VectorStore.graphMemo.drop(spark, gkey(name))
    VectorStore.graphStampMemo.entries(spark).remove(gkey(name))
    val gRoot = graphRoot(name)
    if (gRoot.exists) rmTree(gRoot)
    VectorStore.cwMemo.entries(spark).remove(gkey(name))
    VectorStore.cwTokenMemo.entries(spark).remove(gkey(name))
    val pqDir = new java.io.File(s"$basePath/.pq/$name")
    if (pqDir.exists) rmTree(pqDir)
    VectorStore.ivfMemo.entries(spark).remove(gkey(name))
    VectorStore.ivfTokenMemo.entries(spark).remove(gkey(name))
    val ivfDir = new java.io.File(s"$basePath/.ivf/$name")
    if (ivfDir.exists) rmTree(ivfDir)
    VectorStore.codesMemo.drop(spark, gkey(name))
    VectorStore.codesStampMemo.entries(spark).remove(gkey(name))
    if (codesRoot(name).exists) rmTree(codesRoot(name))
  }

  /** V3: exact cosine top-k within one collection (vector_db.py:93-119). */
  def search(collection: String, queries: DataFrame, k: Int): DataFrame =
    Knn.bruteForceTopK(read(collection), queries, k, idCol = "id")
      .withColumnRenamed("vec_id", "id")

  private def gkey(name: String): (String, String) = (basePath, name)

  private def asIndex(df: DataFrame): DataFrame =
    df.select(col("id").as("vec_id"), col("embedding"))

  // ---- persisted graph artifacts (cold-start serving) ----------------
  //
  // The graph artifact is DURABLE STORE STATE, not session scratch: it
  // lives under `basePath/.graph/<collection>/` beside the data it
  // indexes — the Qdrant contract (the reference's QdrantClient(path=…)
  // persists its HNSW inside the collection directory and serves it on
  // reopen, src/vector_db.py:35; Faiss write_index/read_index is the
  // same shape) — so a NEW session over the same path serves
  // graphSearch with ZERO rebuilds (VERDICT r18 #1). The dot-prefixed
  // dir is invisible to both the `collection=*` data glob and
  // collectionNames().
  //
  // Staleness guard: the artifact dir name embeds a CONTENT STAMP —
  // md5 over the collection's sorted (file name, length) listing, the
  // same evidence Spark's own file index keys on. Every data mutation
  // here goes through write-to-temp + atomic dir swap, which mints
  // fresh part-file names, so ANY dataset change (recreate, upsert,
  // delete, even an out-of-band rewrite) changes the stamp and a stale
  // artifact can never resolve for the new data — load falls back to a
  // fresh build. Listing is driver-side metadata only (no scan): at
  // 100 TB it costs exactly what planning a query over the collection
  // already costs.

  /** Artifact format version — bumped if the edge schema or build
    * parameters ever change shape, so an old artifact can't serve a
    * new reader.
    */
  private val GraphArtifactVersion = 1

  private def graphRoot(name: String): java.io.File =
    new java.io.File(s"$basePath/.graph/$name")

  /** Content stamp of the collection's current file layout. */
  private def collStamp(name: String): String = {
    val dir = new java.io.File(s"$basePath/collection=$name")
    val listing = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_"))
      .map(f => f.getName + ":" + f.length).sorted.mkString("|")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(listing.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(16)
  }

  // artifact-dir prefixes: the monolithic graph and each shard-count
  // variant coexist under graphRoot — pruning is PREFIX-scoped so
  // maintaining one never reclaims the other
  private def monoPrefix: String = s"v$GraphArtifactVersion-"
  private def shardPrefix(numShards: Int): String =
    s"v${GraphArtifactVersion}s$numShards-"

  private def stampDir(name: String): String =
    new java.io.File(graphRoot(name),
      monoPrefix + collStamp(name)).toString

  private def shardedStampDir(name: String, numShards: Int): String =
    new java.io.File(graphRoot(name),
      shardPrefix(numShards) + collStamp(name)).toString

  /** The persisted artifact for the collection's CURRENT contents —
    * None when absent, half-written (no _SUCCESS), or stamped for a
    * different dataset version.
    */
  private def loadPersistedGraph(name: String): Option[DataFrame] = {
    val dir = new java.io.File(stampDir(name))
    if (new java.io.File(dir, "_SUCCESS").isFile)
      Some(spark.read.parquet(dir.toString))
    else None
  }

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(rmTree)
    f.delete(): Unit
  }

  /** Drop every persisted artifact with dir-name prefix `prefix`
    * EXCEPT `keep` (superseded stamps are garbage once the current one
    * is written) — prefix-scoped so the monolithic path's maintenance
    * never reclaims a sharded variant's artifact or vice versa. A
    * `keep = None` with the bare version prefix ("v") drops them all
    * (the recreate path; [[dropAllArtifacts]] removes the root anyway).
    */
  private def pruneGraphDirs(name: String, keep: Option[String],
      prefix: String): Unit = {
    val kids = Option(graphRoot(name).listFiles()).getOrElse(Array.empty)
    kids.filter(d => d.getName.startsWith(prefix) &&
        !keep.contains(d.toString))
      .foreach(rmTree)
  }

  /** The collection's NN-descent graph artifact: loaded from the
    * store's persisted copy when one matches the collection's current
    * content stamp (cold-start serving — a fresh session over the same
    * path pays ZERO builds), full-built on first-ever use (ONE build
    * per collection lifetime — [[VectorStore.graphBuildsOf]] counts
    * them, and the build lands directly under the store path), then
    * kept current INCREMENTALLY by [[upsertPoints]]/[[deletePoints]]
    * (HNSW insert/delete, never a rebuild — each maintenance pass
    * writes the updated artifact back under the post-mutation stamp).
    * Keyed (store path, collection): maintenance on one collection
    * cannot touch another's artifact.
    */
  def graphOf(name: String): DataFrame = {
    val key = gkey(name)
    val cur = collStamp(name)
    // cross-session staleness guard: another store over this path may
    // have mutated the collection (pruning the artifact dir this
    // session's memoized frame scans) — a memo resolved at a different
    // stamp is dropped, never served
    val recorded = VectorStore.graphStampMemo.entries(spark).get(key)
    if (recorded != null && recorded != cur)
      VectorStore.graphMemo.drop(spark, key)
    val g = VectorStore.graphMemo.computeIfAbsent(spark, key) {
      loadPersistedGraph(name).getOrElse {
        VectorStore.bump(key)
        val dir = stampDir(name)
        val built = NnGraph.buildGraph(asIndex(read(name)),
          VectorStore.GraphK, VectorStore.NndIters, VectorStore.NndSample,
          artifactDir = Some(dir))
        pruneGraphDirs(name, keep = Some(dir), prefix = monoPrefix)
        built
      }
    }
    VectorStore.graphStampMemo.entries(spark).put(key, cur): Unit
    g
  }

  /** V3's graph-index path: beam search over THIS collection's
    * artifact — the per-collection serving contract of the reference's
    * store (one HNSW per Qdrant collection, src/vector_db.py:22-54).
    * `queries` carries (query_id, qvec); output (query_id, rank, id).
    */
  def graphSearch(name: String, queries: DataFrame, k: Int): DataFrame =
    NnGraph.graphTopK(asIndex(read(name)), graphOf(name), queries, k,
        VectorStore.BeamWidth, VectorStore.BeamIters, VectorStore.NndSample)
      .withColumnRenamed("vec_id", "id")

  // ---- SHARDED graph artifacts: the 100 TB collection --------------
  //
  // The monolithic graphOf path builds ONE graph per collection — one
  // job chain whose cost grows with the collection, the design
  // question a 100 TB collection forces. shardedGraphOf brings the
  // NnGraph sharded family to the store with the FULL artifact
  // contract: per-shard-count stamped dirs beside the monolithic ones
  // (prefix-scoped pruning keeps them independent), load-before-build,
  // cross-session stamp guards, and INCREMENTAL maintenance —
  // upsert/delete repair each shard's graph in place (delete via the
  // shard-preserving tombstone/bridge, insert via the shard-restricted
  // walk — NnGraph.insertIntoShardedGraph), never a rebuild.

  private def skey(name: String, numShards: Int): (String, String) =
    (basePath, s"$name#s$numShards")

  private def loadPersistedSharded(name: String,
      numShards: Int): Option[DataFrame] = {
    val dir = new java.io.File(shardedStampDir(name, numShards))
    if (new java.io.File(dir, "_SUCCESS").isFile)
      Some(spark.read.parquet(dir.toString))
    else None
  }

  /** The shard counts with a persisted artifact stamped for the
    * CURRENT contents — what a mutation must maintain (the disk
    * listing is authoritative: every sharded build/maintenance pass
    * persists, so there is no memo-only sharded graph).
    */
  private def persistedShardCounts(name: String): Seq[Int] = {
    val stamp = collStamp(name)
    val re = (s"^v${GraphArtifactVersion}s(\\d+)-" +
      java.util.regex.Pattern.quote(stamp) + "$").r
    Option(graphRoot(name).listFiles()).getOrElse(Array.empty)
      .flatMap(d => re.findFirstMatchIn(d.getName).map(_.group(1).toInt))
      .toSeq.sorted
  }

  /** The collection's SHARDED edge artifact for `numShards` — the
    * graphOf lifecycle (load/build-once/maintain/stamp-guard) applied
    * to the sharded family. Keyed (store path, collection, shard
    * count): different shard counts are independent artifacts.
    */
  def shardedGraphOf(name: String, numShards: Int): DataFrame = {
    val key = skey(name, numShards)
    val cur = collStamp(name)
    val recorded = VectorStore.graphStampMemo.entries(spark).get(key)
    if (recorded != null && recorded != cur)
      VectorStore.graphMemo.drop(spark, key)
    val g = VectorStore.graphMemo.computeIfAbsent(spark, key) {
      loadPersistedSharded(name, numShards).getOrElse {
        VectorStore.bump(key)
        val dir = shardedStampDir(name, numShards)
        val built = NnGraph.buildShardedGraph(asIndex(read(name)),
          numShards, VectorStore.GraphK, VectorStore.NndIters,
          VectorStore.NndSample, artifactDir = Some(dir))
        pruneGraphDirs(name, keep = Some(dir),
          prefix = shardPrefix(numShards))
        built
      }
    }
    VectorStore.graphStampMemo.entries(spark).put(key, cur): Unit
    g
  }

  /** V3's sharded fan-out path: every query walks every shard of THIS
    * collection's sharded artifact and merges per-query top-k — the
    * Faiss IndexShards serve as a store API, with build cost and
    * artifact size split across independent shards at 100 TB.
    */
  def graphSearchSharded(name: String, queries: DataFrame, k: Int,
      numShards: Int = 2): DataFrame =
    NnGraph.shardedGraphTopK(asIndex(read(name)),
        shardedGraphOf(name, numShards), queries, k, numShards,
        VectorStore.BeamWidth, VectorStore.BeamIters, VectorStore.NndSample)
      .withColumnRenamed("vec_id", "id")

  /** Sharded artifacts to MAINTAIN across a data mutation — the
    * [[graphToMaintain]] contract per persisted shard count, looked up
    * BEFORE the swap (pre-mutation stamp).
    */
  private def shardedToMaintain(name: String): Seq[(Int, DataFrame)] =
    persistedShardCounts(name).flatMap { s =>
      val key = skey(name, s)
      val recorded = VectorStore.graphStampMemo.entries(spark).get(key)
      if (recorded != null && recorded != collStamp(name))
        VectorStore.graphMemo.drop(spark, key)
      VectorStore.graphMemo.peek(spark, key)
        .orElse(loadPersistedSharded(name, s))
        .map(g => (s, g))
    }

  // ---- persisted per-collection PQ codebooks (VERDICT r18 #7) -------
  //
  // The quantizer is the store's OTHER trained artifact: codebooks key
  // on (store path, collection) exactly like the graph, persist under
  // `basePath/.pq/<collection>/v1/` for cold-start serving, and train
  // at most once per collection lifetime. Unlike the graph they do NOT
  // stamp-couple to the file layout: a trained product quantizer stays
  // valid across upserts/deletes (Faiss trains once and add()s forever;
  // retraining per ingest batch would thrash the codes) — only a
  // collection RECREATE (new dataset semantics) invalidates them.

  private def pqRoot(name: String): java.io.File =
    new java.io.File(s"$basePath/.pq/$name/v1")

  // _token identity plumbing shared by every trained artifact (PQ
  // codebooks, IVF centroids): written AFTER the parquet commit, read
  // by the cross-session staleness guards; a missing token means the
  // crash window between the two writes — loaders treat it as invalid
  private def writeToken(dir: java.io.File): Unit =
    java.nio.file.Files.write(new java.io.File(dir, "_token").toPath,
      java.util.UUID.randomUUID().toString.getBytes("UTF-8")): Unit

  private def readToken(dir: java.io.File): Option[String] = {
    val f = new java.io.File(dir, "_token")
    if (!f.isFile) None
    else Some(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
  }

  private def persistCodebooks(name: String,
      cw: Array[Array[Array[Float]]]): Unit = {
    import spark.implicits._
    val rows = for {
      j <- cw.indices
      c <- cw(j).indices
    } yield (j, c, cw(j)(c).toSeq)
    rows.toDF("j", "code", "cw")
      .coalesce(1).write.mode("overwrite").parquet(pqRoot(name).toString)
    // identity token beside the parquet (underscore-prefixed — the data
    // source ignores it): the cross-session staleness check compares a
    // memoized entry's token against this file, so a recreate (which
    // deletes the dir) invalidates every session's memo on next lookup
    writeToken(pqRoot(name))
  }

  /** The persisted codebooks' identity token — None when absent. */
  private def cwToken(name: String): Option[String] = readToken(pqRoot(name))

  private def loadPersistedCodebooks(
      name: String): Option[Array[Array[Array[Float]]]] = {
    val dir = pqRoot(name)
    if (!new java.io.File(dir, "_SUCCESS").isFile) return None
    // _token is written AFTER the parquet commit (persistCodebooks), so
    // a crash in between leaves valid-looking codebooks with no
    // identity — a session that loaded them would record no token and
    // the cross-session staleness guard in codebooksOf would go inert
    // (a later recreate by another session would silently serve the
    // old quantizer). Treat the tokenless artifact as invalid: retrain
    // and re-persist, which mints a fresh token (ADVICE r19).
    if (cwToken(name).isEmpty) return None
    import spark.implicits._
    val rows = spark.read.parquet(dir.toString)
      .select(col("j"), col("code"), col("cw"))
      .as[(Int, Int, Array[Float])].collect()
    if (rows.isEmpty) return None
    val m = rows.map(_._1).max + 1
    Some(Array.tabulate(m) { j =>
      rows.filter(_._1 == j).sortBy(_._2).map(_._3)
    })
  }

  /** The collection's Lloyd-trained PQ codebooks: loaded from the
    * store's persisted copy when present (cold start — zero training),
    * trained on first-ever use (ONE training per collection lifetime —
    * [[VectorStore.cwTrainsOf]] counts them) and persisted. Keyed
    * (store path, collection): one collection's codebooks never serve
    * another's codes.
    */
  def codebooksOf(name: String): Array[Array[Array[Float]]] = {
    val key = gkey(name)
    // cross-session staleness guard: a recreate by ANOTHER session
    // deletes the persisted dir (and its token) — a memo recorded at a
    // token the disk no longer carries would silently score the new
    // dataset with the old quantizer, so it is dropped instead
    val recorded = VectorStore.cwTokenMemo.entries(spark).get(key)
    if (recorded != null && !cwToken(name).contains(recorded)) {
      VectorStore.cwMemo.entries(spark).remove(key)
      VectorStore.cwTokenMemo.entries(spark).remove(key)
    }
    val cw = VectorStore.cwMemo.computeIfAbsent(spark, key) {
      loadPersistedCodebooks(name).getOrElse {
        VectorStore.bumpTrain(key)
        val trained = graft.search.Ann.trainPqCodebooks(asIndex(read(name)),
          VectorStore.PqM, VectorStore.PqCodes, VectorStore.PqIters)
        persistCodebooks(name, trained)
        trained
      }
    }
    cwToken(name).foreach(t =>
      VectorStore.cwTokenMemo.entries(spark).put(key, t): Unit)
    cw
  }

  /** V3's memory-bounded path: ADC top-k over THIS collection's
    * trained codebooks — the Faiss IndexPQ serve beside [[search]]'s
    * exact scan and [[graphSearch]]'s graph walk, composing the same
    * per-collection artifact discipline (train once, persist with the
    * store, serve cold).
    */
  def searchCompressed(name: String, queries: DataFrame, k: Int): DataFrame =
    graft.search.Ann.pqTopKWith(asIndex(read(name)), queries, k,
        VectorStore.PqM, codebooksOf(name))
      .select(col("query_id"), col("rank"), col("vec_id").as("id"))

  // ---- persisted per-collection IVF centroids (VERDICT r19 #5) ------
  //
  // The coarse quantizer is the store's third trained artifact: same
  // lifecycle as the PQ codebooks (train once per collection lifetime,
  // persist under `.ivf/<name>/v1/` with a `_token` identity, cold
  // load bit-exact, upsert/delete keep — the Faiss train-once
  // contract — recreate retrains).

  private def ivfRoot(name: String): java.io.File =
    new java.io.File(s"$basePath/.ivf/$name/v1")

  private def persistCentroids(name: String,
      cents: Array[Array[Float]]): Unit = {
    import spark.implicits._
    cents.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("cent_id", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(ivfRoot(name).toString)
    writeToken(ivfRoot(name))
  }

  private def ivfToken(name: String): Option[String] = readToken(ivfRoot(name))

  private def loadPersistedCentroids(
      name: String): Option[Array[Array[Float]]] = {
    val dir = ivfRoot(name)
    if (!new java.io.File(dir, "_SUCCESS").isFile) return None
    // the loadPersistedCodebooks crash-window rule: a tokenless
    // artifact must retrain, or the staleness guard goes inert
    if (ivfToken(name).isEmpty) return None
    import spark.implicits._
    val rows = spark.read.parquet(dir.toString)
      .select(col("cent_id"), col("cvec"))
      .as[(Long, Array[Float])].collect()
    if (rows.isEmpty) None
    else Some(rows.sortBy(_._1).map(_._2))
  }

  /** The collection's Lloyd-trained IVF centroids: persisted-or-train-
    * once per collection lifetime ([[VectorStore.ivfTrainsOf]] counts),
    * cross-session staleness guarded by the `_token` identity exactly
    * like [[codebooksOf]].
    */
  def centroidsOf(name: String): Array[Array[Float]] = {
    val key = gkey(name)
    val recorded = VectorStore.ivfTokenMemo.entries(spark).get(key)
    if (recorded != null && !ivfToken(name).contains(recorded)) {
      VectorStore.ivfMemo.entries(spark).remove(key)
      VectorStore.ivfTokenMemo.entries(spark).remove(key)
    }
    val cents = VectorStore.ivfMemo.computeIfAbsent(spark, key) {
      loadPersistedCentroids(name).getOrElse {
        VectorStore.bumpIvfTrain(key)
        import spark.implicits._
        val trained = graft.search.Ann.trainCentroids(asIndex(read(name)),
            VectorStore.IvfCells, VectorStore.IvfIters)
          .orderBy(col("cent_id"))
          .select(col("cvec")).as[Array[Float]].collect()
        persistCentroids(name, trained)
        trained
      }
    }
    ivfToken(name).foreach(t =>
      VectorStore.ivfTokenMemo.entries(spark).put(key, t): Unit)
    cents
  }

  /** V3's cell-probed path: IVF top-k over THIS collection's trained,
    * persisted centroids — the Faiss IndexIVFFlat serve beside
    * [[search]]/[[graphSearch]]/[[searchCompressed]], same train-once/
    * cold-load artifact discipline.
    */
  def ivfSearch(name: String, queries: DataFrame, k: Int,
      nprobe: Int = VectorStore.IvfNprobe): DataFrame = {
    import spark.implicits._
    val cents = centroidsOf(name).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toSeq.toDF("cent_id", "cvec")
    graft.search.Ann.ivfTopK(asIndex(read(name)), queries, cents, k, nprobe)
      .select(col("query_id"), col("rank"), col("vec_id").as("id"))
  }

  // ---- persisted per-collection PQ code rows + maxsim serve ---------
  //
  // The compressed token index (VERDICT r19 #6): code rows derive from
  // the collection CONTENTS and the trained CODEBOOKS, so the artifact
  // dir stamps both identities — any data mutation or quantizer
  // retrain re-encodes on next use (one narrow pass), and a fresh
  // session cold-loads with zero encodes.

  private def codesRoot(name: String): java.io.File =
    new java.io.File(s"$basePath/.codes/$name")

  private def codesStamp(name: String): String =
    collStamp(name) + "-" + cwToken(name).map(_.take(8)).getOrElse("none")

  private def codesDir(name: String): String =
    new java.io.File(codesRoot(name), s"v1-${codesStamp(name)}").toString

  private def pruneCodesDirs(name: String, keep: Option[String]): Unit = {
    val kids = Option(codesRoot(name).listFiles()).getOrElse(Array.empty)
    kids.filter(d => !keep.contains(d.toString)).foreach(rmTree)
  }

  /** The collection's PQ code rows (id, codes int[m]) — encoded once
    * per (contents, codebooks) version via [[graft.search.Ann
    * .pqEncodeFrame]], persisted beside the data, served from the
    * artifact scan ([[VectorStore.codesEncodesOf]] counts encodes).
    */
  def codesOf(name: String): DataFrame = {
    val key = gkey(name)
    val cw = codebooksOf(name) // resolves/loads the quantizer first
    val cur = codesStamp(name)
    val recorded = VectorStore.codesStampMemo.entries(spark).get(key)
    if (recorded != null && recorded != cur)
      VectorStore.codesMemo.drop(spark, key)
    val codes = VectorStore.codesMemo.computeIfAbsent(spark, key) {
      val dir = new java.io.File(codesDir(name))
      if (new java.io.File(dir, "_SUCCESS").isFile)
        spark.read.parquet(dir.toString)
      else {
        VectorStore.bumpEncode(key)
        graft.search.Ann.pqEncodeFrame(asIndex(read(name)),
          VectorStore.PqM, cw)
          .write.mode("overwrite").parquet(dir.toString)
        pruneCodesDirs(name, keep = Some(dir.toString))
        spark.read.parquet(dir.toString)
      }
    }
    VectorStore.codesStampMemo.entries(spark).put(key, cur): Unit
    codes
  }

  /** Late-interaction (ColBERT-style) serve as a STORE API — the
    * [[graft.queries.Similarity.retrieveMaxsimPq]] shape composed from
    * the collection's persisted artifacts: stage 1 walks the
    * collection's graph ([[graphOf]]) over its persisted CODE ROWS
    * ([[codesOf]]) with true ADC scoring (per-token LUT over
    * [[codebooksOf]]), stage 2 rescores the gathered docs exact and
    * full-width. Collection rows are token vectors; doc = id div
    * `tokPerDoc` (consecutive-token layout); `queryTokens` carries
    * (query_id, qt, qvec) with qt in [0, tokPerDoc). A second session
    * over the same path serves this with ZERO builds, trains, or
    * encodes — everything loads cold.
    */
  def maxsimSearch(name: String, queryTokens: DataFrame, k: Int,
      tokPerDoc: Int): DataFrame = {
    val t = tokPerDoc
    val tokQ = queryTokens.select(
      (col("query_id").cast("long") * t + col("qt")).as("query_id"),
      col("qvec"))
    val cands = graft.search.NnGraph.graphTopKAdc(codesOf(name),
        graphOf(name), tokQ, VectorStore.MaxsimCandTok,
        VectorStore.BeamWidth, VectorStore.BeamIters, VectorStore.NndSample,
        codebooksOf(name))
      .select(expr(s"query_id div $t").as("query_id"),
        expr(s"vec_id div $t").as("doc_id"))
      .distinct()
    val docs = read(name).select(expr(s"id div $t").as("doc_id"),
      col("id").as("vec_id"), col("embedding"))
    val qtok = queryTokens.select(col("query_id").cast("long"),
      col("qt"), col("qvec"))
    graft.search.Knn.maxsimTopKCandidates(docs, qtok, cands, k, t)
      .select(col("query_id"), col("rank"), col("doc_id"))
  }

  /** Read one collection (partition-pruned). */
  def read(collection: String): DataFrame =
    spark.read.parquet(s"$basePath/collection=$collection")

  /** V4: drop a collection. Also forgets any graph artifact (a stale
    * graph must never serve a recreated collection); the internal
    * write-to-temp swaps pass `dropGraph = false` — their callers
    * maintain the artifact incrementally instead.
    */
  def deleteCollection(name: String, dropGraph: Boolean = true): Unit = {
    val dir = new java.io.File(s"$basePath/collection=$name")
    if (dir.exists) rmTree(dir)
    if (dropGraph) dropAllArtifacts(name)
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
  /** The graph artifact to MAINTAIN across a data mutation, looked up
    * BEFORE the swap: the session memo if it holds one, else the
    * persisted artifact stamped for the pre-mutation contents — so a
    * fresh session's upsert/delete still maintains incrementally
    * instead of orphaning the persisted graph (whose stamp the swap is
    * about to invalidate). Carries the SAME cross-session staleness
    * guard as [[graphOf]] (ADVICE r19): a memo resolved at a different
    * stamp means another session mutated the collection (and pruned
    * the artifact dir the memoized frame scans) — serving it here
    * would run maintenance jobs over deleted files and throw AFTER the
    * data rename already committed; drop it and fall back to the
    * persisted artifact stamped for the current pre-mutation contents.
    */
  private def graphToMaintain(name: String): Option[DataFrame] = {
    val key = gkey(name)
    val recorded = VectorStore.graphStampMemo.entries(spark).get(key)
    if (recorded != null && recorded != collStamp(name))
      VectorStore.graphMemo.drop(spark, key)
    VectorStore.graphMemo.peek(spark, key)
      .orElse(loadPersistedGraph(name))
  }

  def deletePoints(name: String, ids: Seq[Long]): Long = {
    val src = s"$basePath/collection=$name"
    val tmp = s"$basePath/.delete-$name"
    val df = spark.read.parquet(src)
    val before = df.count()
    val kept = df.filter(!col("id").isin(ids: _*))
    val preGraph = graphToMaintain(name)
    val preSharded = shardedToMaintain(name)
    kept.write.mode("overwrite").parquet(tmp)
    val after = spark.read.parquet(tmp).count()
    deleteCollection(name, dropGraph = false)
    if (!new java.io.File(tmp).renameTo(new java.io.File(src)))
      throw new java.io.IOException(s"deletePoints: rename failed for $name")
    // graph maintenance: if this collection serves a graph artifact
    // (memoized or persisted), tombstone + bridge-repair it
    // (NnGraph.deleteFromGraph) — never rebuild. The post-swap read IS
    // the survivor table the repair scores against, and the repaired
    // artifact lands under the post-swap stamp for cold-start serving.
    preGraph.foreach { g =>
      import spark.implicits._
      val del = ids.toDF("vec_id")
      val dir = stampDir(name)
      val updated = NnGraph.deleteFromGraph(asIndex(read(name)), g, del,
        VectorStore.GraphK, artifactDir = Some(dir))
      pruneGraphDirs(name, keep = Some(dir), prefix = monoPrefix)
      VectorStore.graphMemo.put(spark, gkey(name))(updated)
      VectorStore.graphStampMemo.entries(spark)
        .put(gkey(name), collStamp(name)): Unit
    }
    // sharded artifacts repair the same way — deleteFromGraph is
    // shard-preserving by construction (tombstone drops in-shard
    // edges, the bridge joins in-shard pairs, the repair round
    // proposes neighbors-of-neighbors — NnGraphSpec pins it)
    preSharded.foreach { case (s, g) =>
      import spark.implicits._
      val del = ids.toDF("vec_id")
      val dir = shardedStampDir(name, s)
      val updated = NnGraph.deleteFromGraph(asIndex(read(name)), g, del,
        VectorStore.GraphK, artifactDir = Some(dir))
      pruneGraphDirs(name, keep = Some(dir), prefix = shardPrefix(s))
      VectorStore.graphMemo.put(spark, skey(name, s))(updated)
      VectorStore.graphStampMemo.entries(spark)
        .put(skey(name, s), collStamp(name)): Unit
    }
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
    val preGraph = graphToMaintain(name)
    val preSharded = shardedToMaintain(name)
    existing.join(rows.select(col("id")), Seq("id"), "left_anti")
      .unionByName(rows.select(existing.columns.map(col).toIndexedSeq: _*))
      .write.mode("overwrite").parquet(tmp)
    deleteCollection(name, dropGraph = false)
    if (!new java.io.File(tmp).renameTo(new java.io.File(src)))
      throw new java.io.IOException(s"upsertPoints: rename failed for $name")
    // graph maintenance (HNSW update = delete + insert): tombstone
    // every upserted id (replaced points forget their stale edges;
    // tombstoning an absent id is a no-op), then insert all upserted
    // rows as new nodes via search-then-connect — never a rebuild, and
    // never another collection's artifact. The intermediate tombstoned
    // graph is session scratch; only the FINAL inserted artifact
    // persists, under the post-swap stamp (cold-start serving).
    preGraph.foreach { g =>
      val upIds = rows.select(col("id").as("vec_id"))
      val g1 = NnGraph.deleteFromGraph(asIndex(read(name)), g, upIds,
        VectorStore.GraphK)
      val base = read(name)
        .join(rows.select(col("id")), Seq("id"), "left_anti")
      val dir = stampDir(name)
      val updated = NnGraph.insertIntoGraph(asIndex(base), g1,
        rows.select(col("id").as("vec_id"), col("embedding")),
        VectorStore.GraphK, VectorStore.BeamWidth,
        VectorStore.BeamIters, VectorStore.NndSample,
        artifactDir = Some(dir))
      pruneGraphDirs(name, keep = Some(dir), prefix = monoPrefix)
      VectorStore.graphMemo.put(spark, gkey(name))(updated)
      VectorStore.graphStampMemo.entries(spark)
        .put(gkey(name), collStamp(name)): Unit
    }
    // sharded artifacts: tombstone (shard-preserving), then the
    // SHARD-RESTRICTED insert — each upserted row search-then-connects
    // within its own shard only, keeping every edge in-shard
    preSharded.foreach { case (s, g) =>
      val upIds = rows.select(col("id").as("vec_id"))
      val g1 = NnGraph.deleteFromGraph(asIndex(read(name)), g, upIds,
        VectorStore.GraphK)
      val base = read(name)
        .join(rows.select(col("id")), Seq("id"), "left_anti")
      val dir = shardedStampDir(name, s)
      val updated = NnGraph.insertIntoShardedGraph(asIndex(base), g1,
        rows.select(col("id").as("vec_id"), col("embedding")), s,
        VectorStore.GraphK, VectorStore.BeamWidth,
        VectorStore.BeamIters, VectorStore.NndSample,
        artifactDir = Some(dir))
      pruneGraphDirs(name, keep = Some(dir), prefix = shardPrefix(s))
      VectorStore.graphMemo.put(spark, skey(name, s))(updated)
      VectorStore.graphStampMemo.entries(spark)
        .put(skey(name, s), collStamp(name)): Unit
    }
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
    val preGraph = graphToMaintain(name)
    val preSharded = shardedToMaintain(name)
    df.repartition(files).write.mode("overwrite").parquet(tmp)
    // layout-only rewrite: contents are row-identical, so any graph
    // artifact stays valid — keep it
    deleteCollection(name, dropGraph = false)
    if (!new java.io.File(tmp).renameTo(new java.io.File(src)))
      throw new java.io.IOException(s"compact: rename failed for $name")
    // ... but the content stamp keys on the FILE LAYOUT (names +
    // lengths — the cheap evidence that catches every data mutation),
    // which compaction changes by design: re-persist the still-valid
    // edges under the post-compaction stamp so cold-start serving
    // survives a compaction pass (a small edge-table copy, never a
    // rebuild).
    preGraph.foreach { g =>
      val dir = stampDir(name)
      g.write.mode("overwrite").parquet(dir)
      pruneGraphDirs(name, keep = Some(dir), prefix = monoPrefix)
      VectorStore.graphMemo.put(spark, gkey(name))(spark.read.parquet(dir))
      VectorStore.graphStampMemo.entries(spark)
        .put(gkey(name), collStamp(name)): Unit
    }
    preSharded.foreach { case (s, g) =>
      val dir = shardedStampDir(name, s)
      g.write.mode("overwrite").parquet(dir)
      pruneGraphDirs(name, keep = Some(dir), prefix = shardPrefix(s))
      VectorStore.graphMemo.put(spark, skey(name, s))(
        spark.read.parquet(dir))
      VectorStore.graphStampMemo.entries(spark)
        .put(skey(name, s), collStamp(name)): Unit
    }
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
