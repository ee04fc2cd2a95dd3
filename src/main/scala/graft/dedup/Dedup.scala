package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFns

/** Deduplication operators for large-scale text corpora (builder-prompt
  * first-class components): exact, n-gram Jaccard, MinHash+LSH, SimHash,
  * embedding-cosine.
  *
  * All hashing goes through md5 so every stage is reproducible in the
  * DuckDB oracle. Scale design per operator:
  *  - exact: one hash-aggregate on the fingerprint — the cheapest
  *    possible full-corpus dedup; shuffle is the fingerprint groupBy.
  *  - n-gram Jaccard: the pair generator joins on shingle, so cost is
  *    Σ df(shingle)² — fine for realistic shingle vocabularies; for
  *    skewed corpora cap document frequency (drop shingles with df > N,
  *    the standard trick) before the join.
  *  - MinHash+LSH: candidate generation by band-bucket join touches only
  *    b × |docs| signature rows (b=4 bands × r=4 rows here); true Jaccard
  *    is then verified on candidates only. This is the 100 TB path.
  *  - SimHash: linear signature computation; hamming-0 clustering via
  *    groupBy(simhash).
  *  - embedding-cosine: brute-force for small corpora; LSH/IVF variants
  *    in graft.search for scale.
  */
object Dedup {

  /** Distinct word-3-gram shingles per document, hashed: (id, s) with
    * `s` the portable 32-bit shingle hash (TextFns.md5Int) — the
    * standard at-scale representation: every downstream exchange
    * (distinct, Jaccard self-join, minhash) moves and compares 8-byte
    * longs instead of multi-word strings. Hash collisions (~2^-32) are
    * shared deterministically with the DuckDB oracle, so results remain
    * bit-identical.
    *
    * Tokens are bound to a column BEFORE the shingle lambda: splicing the
    * `split()` expression tree into the higher-order function would make
    * every `element_at` re-run the regex split (O(len²) per document —
    * measured 5× slower at sf0.1).
    */
  def shingleSet(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), TextFns.tokens(col(textCol)).as("t"))
      .select(col("id"), explode(TextFns.shingles3(col("t"))).as("sgl"))
      .select(col("id"), TextFns.md5Int(col("sgl")).as("s"))
      .distinct()

  /** [[shingleSet]] WITH positions: distinct (id, s, pos) where pos is
    * the FIRST shingle index (0-based) at which the shingle occurs in
    * the document — the winnowFpsPos position convention, so span
    * reports built on either posting space agree on what an index
    * means. posexplode keeps the arithmetic in Catalyst; the min-pos
    * aggregate replaces the plain distinct (same grain, one extra int).
    */
  def shingleSetPos(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), TextFns.tokens(col(textCol)).as("t"))
      .select(col("id"), posexplode(TextFns.shingles3(col("t"))).as(Seq("pos", "sgl")))
      .select(col("id"), TextFns.md5Int(col("sgl")).as("s"), col("pos"))
      .groupBy(col("id"), col("s")).agg(min(col("pos")).as("pos"))

  /** Document-frequency cap for the Jaccard pair join: a shingle in more
    * than this many documents is boilerplate (page headers, license
    * blurbs) and is dropped from the representation. Σ df² over surviving
    * shingles bounds the pair-join output, so one hot shingle can no
    * longer make the self-join quadratic in corpus size. Never triggers
    * on the fixtures (≤500 docs) — oracle results are unchanged at the
    * default; the oracle SQL mirrors the same cap so results stay
    * bit-exact even when it does trigger.
    */
  val DefaultMaxDf: Int = 1000

  /** Degenerate-bucket cap for LSH candidate generation: a band bucket
    * larger than this (a cluster of near-identical documents) would
    * generate O(bucket²) pairs in one task. Oversized buckets are
    * dropped — their members still pair up through their other bands
    * unless the whole corpus chunk is one blob, the case a dedup pass
    * should surface by other means anyway. Mirrored in the oracle SQL.
    */
  val DefaultMaxBucket: Int = 1000

  /** True Jaccard for every pair sharing ≥1 kept shingle: (a, b, jac).
    * Shingles with df > maxDf are removed from the representation
    * entirely (sizes AND the pair join see the same filtered set), so
    * `jac` remains a true set similarity over kept shingles. The HOT
    * set is what gets materialized, not the df of every shingle: one
    * map-side-combined count filtered to df > maxDf (≤ |shingles|/maxDf
    * rows by pigeonhole — broadcastable by construction), then a
    * broadcast anti-join, so the shingle table itself is never
    * reshuffled or window-sorted just to learn its frequencies.
    */
  def pairJaccard(sh: DataFrame, maxDf: Int = DefaultMaxDf): DataFrame = {
    val hot = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select(col("s"))
    // kept feeds three consumers (sizes + both sides of the self-join);
    // cache it so the shingle build + anti-join run once, not per branch
    // (partition-level cache locking makes an eager barrier unnecessary).
    val kept = sh.join(broadcast(hot), Seq("s"), "left_anti")
      .select(col("id"), col("s")).cache()
    val sizes = kept.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val shared = kept.as("x").join(kept.as("y"), col("x.s") === col("y.s"))
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
        (col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
          .as("jac"))
  }

  /** Modulus / multipliers of the affine minhash permutations
    * mh_j = (a_j·h + b_j) mod P over the 32-bit shingle hash h.
    * P is the smallest prime > 2^32; a_j < 2^31 keeps a_j·h < 2^63
    * (no BIGINT overflow, in Spark or DuckDB). Shared with the oracle
    * via [[permValuesSql]] — single source of truth.
    */
  val MinhashP: Long = 4294967311L
  def permA(j: Int): Long = ((2L * j + 1L) * 2654435761L) % 2147483647L
  def permB(j: Int): Long = (j.toLong * 1013904223L) % MinhashP

  /** DuckDB `(VALUES ...)` rows `(j, a, b)` for the first n permutations. */
  def permValuesSql(n: Int): String =
    (0 until n).map(j => s"(${j}, ${permA(j)}, ${permB(j)})").mkString(", ")

  /** MinHash signatures, wide form: ONE hash-aggregate with `numHashes`
    * min() expressions — (id, mh_0..mh_{n-1}). The naive shape
    * (crossJoin with a seed table, then groupBy (id, seed)) shuffles
    * |shingles| × numHashes rows; this shuffles |docs| rows once.
    * The per-permutation values are affine transforms of the 32-bit
    * shingle hash `s` (universal hashing) — no per-permutation
    * rehashing; numHashes md5 calls per shingle would dominate the
    * whole operator.
    */
  def minhash(sh: DataFrame, numHashes: Int): DataFrame = {
    val mins = (0 until numHashes).map(j =>
      min((lit(permA(j)) * col("s") + lit(permB(j))) % lit(MinhashP)).as(s"mh_$j"))
    sh.groupBy(col("id")).agg(mins.head, mins.tail: _*)
  }

  /** LSH band keys from wide minhash signatures: (id, band, bkey). */
  def lshBands(mh: DataFrame, rowsPerBand: Int): DataFrame = {
    val numHashes = mh.columns.count(_.startsWith("mh_"))
    val bandKeys = (0 until numHashes / rowsPerBand).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(s"mh_$j"))
      md5(concat_ws("|", cols: _*))
    }
    mh.select(col("id"),
        posexplode(array(bandKeys: _*)).as(Seq("band", "bkey")))
  }

  /** Candidate pairs sharing ≥1 LSH band bucket: (a, b) distinct,
    * a < b. One groupBy over the band table and in-bucket pair
    * generation — the self-join formulation shuffles the band table
    * twice and needs it materialized; this reads it once. A degenerate
    * bucket (near-identical document cluster) is dropped at `maxBucket`
    * members: the id list itself is linear and survives the agg, but
    * its O(bucket²) pair fan-out in one task would not.
    *
    * Dropped buckets are NOT silent: each drop increments the
    * `droppedBuckets` accumulator (pass your own to read the count
    * after an action; a named one is registered otherwise so the drop
    * shows up in the Spark UI / event log) and logs the bucket size at
    * WARN executor-side. At 100 TB, silent truncation would read as
    * "covered everything" — the counter is the audit trail. Accumulator
    * caveat: task retries/speculation can over-count; it is telemetry,
    * not an exact-once metric (the RESULT is exact either way).
    */
  def lshCandidates(bands: DataFrame, maxBucket: Int = DefaultMaxBucket,
      droppedBuckets: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = bands.sparkSession
    import spark.implicits._
    val dropAcc = droppedBuckets.getOrElse(
      spark.sparkContext.longAccumulator("graft.lsh.dropped_buckets"))
    bands.groupBy(col("band"), col("bkey"))
      .agg(collect_list(col("id").cast("long")).as("ids"))
      .select(col("ids")).as[Seq[Long]]
      .mapPartitions { it =>
        // drops are WARNed once per task with a count, not once per
        // bucket — a degenerate corpus can drop thousands of buckets
        // per task and per-bucket lines would swamp the executor logs
        var dropped = 0L
        var largest = 0
        val pairs = it.flatMap { ids =>
          if (ids.length > maxBucket) {
            dropAcc.add(1L)
            dropped += 1
            if (ids.length > largest) largest = ids.length
            Iterator.empty
          } else {
            val s = ids.sorted
            for {
              i <- s.indices.iterator
              j <- Iterator.range(i + 1, s.length)
            } yield (s(i), s(j))
          }
        }
        def logTail: Iterator[(Long, Long)] = {
          if (dropped > 0)
            org.slf4j.LoggerFactory.getLogger("graft.dedup.Dedup").warn(
              s"$dropped LSH buckets (largest: $largest members) dropped at " +
                s"maxBucket=$maxBucket in this task (members still pair via " +
                "their other bands)")
          Iterator.empty
        }
        pairs ++ logTail
      }
      .toDF("a", "b")
      .distinct()
  }

  /** True Jaccard restricted to given candidate pairs — the verify stage
    * of LSH dedup. Cost is |candidates| × shingles-per-doc, independent
    * of corpus size; the candidate set is broadcast.
    */
  def candidateJaccard(sh: DataFrame, cands: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val shared = broadcast(cands)
      .join(sh.as("x"), col("x.id") === col("a"))
      .join(sh.as("y"), col("y.id") === col("b") && col("y.s") === col("x.s"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
        (col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
          .as("jac"))
  }

  /** 32-bit SimHash over term frequencies, as a bit string: (id, simhash).
    *
    * All 32 signed bit-sums are computed in ONE groupBy(id) aggregate
    * (32 conditional sums over the token's md5 hex digits) — the bit
    * crossJoin formulation shuffles 32× the TF table; this shuffles it
    * once, map-side combined to 32 longs per id. Bit b of a token is the
    * MSB of hex digit b of its md5 (hex chars are lowercase; '8' <= c
    * compares identically in both engines).
    */
  /** Hamming-≤k SimHash pair generation over a [[simhash]] signature
    * frame — [[lshCandidates]]' bucket shape with the two refinements
    * of Manku, Jain & Das Sarma 2007 (the production web near-dup
    * detector): the numeric signature RIDES the bucket, so candidates
    * verify map-side with one popcount before anything shuffles (no
    * verify join back onto the signature table), and a pair is emitted
    * only from its FIRST matching block — every earlier block's byte
    * must differ — so each qualifying pair leaves the generator exactly
    * once and the corpus-scale DISTINCT disappears. Pigeonhole
    * guarantee: Hamming ≤ k over (k+1) blocks forces ≥1 exact block
    * match, so the blocked set equals brute force (spec-proved).
    * Degenerate buckets drop at `maxBucket` with the same audit
    * accumulator contract as lshCandidates. Output (a, b, ham), a < b.
    */
  def simhashKPairs(sig: DataFrame, k: Int,
      maxBucket: Int = DefaultMaxBucket,
      droppedBuckets: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val spark = sig.sparkSession
    import spark.implicits._
    require(k <= 3, "4 byte-blocks guarantee losslessness only for k <= 3")
    val dropAcc = droppedBuckets.getOrElse(
      spark.sparkContext.longAccumulator("graft.lsh.dropped_buckets"))
    // the signature frame feeds TWO jobs — the dropped-bucket census
    // (an eager collect: first-match emission needs the global over-cap
    // key set before any pair leaves) and the pair generation — so the
    // tokenize + two-aggregate signature build beneath it would run
    // twice per call without the cache (measured 1.66 → 1.2 s at
    // sf0.1). (id, sigl) is two longs per document — the smallest frame
    // that still spares both consumers the rebuild. Lifecycle: the plan
    // embeds no closures below this point, so repeated calls share one
    // plan-keyed entry; the caller evicts via clearCache.
    val sigl = sig
      .select(col("id").cast("long").as("id"),
        conv(col("simhash"), 2, 10).cast("long").as("sigl"))
      .cache()
    val blocks = sigl
      .select(col("id"), col("sigl"), expr(
        "explode(transform(sequence(0, 3), j -> struct(CAST(j AS INT) AS band, " +
          "CAST(shiftright(sigl, CAST(24 - 8 * j AS INT)) & 255 AS INT) AS bkey)))")
        .as("blk"))
      .select(col("blk.band").as("band"), col("blk.bkey").as("bkey"),
        col("id"), col("sigl"))
    // The bucket key space is ≤ 4 blocks × 256 byte values, so the
    // over-cap bucket SET (not the buckets themselves) always fits the
    // driver: collect it first and ride it into the closure, because
    // first-match emission must treat a DROPPED earlier block as
    // non-matching — a pair whose earliest shared block was dropped
    // still has to leave a later block's bucket (the "members still
    // pair via their other bands" contract lshCandidates' DISTINCT got
    // for free). The audit counter keeps one count per dropped bucket.
    val droppedKeys: Set[(Int, Int)] = blocks
      .groupBy(col("band"), col("bkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket)
      .select(col("band"), col("bkey")).as[(Int, Int)]
      .collect().toSet
    if (droppedKeys.nonEmpty) {
      dropAcc.add(droppedKeys.size.toLong)
      org.slf4j.LoggerFactory.getLogger("graft.dedup.Dedup").warn(
        s"${droppedKeys.size} simhash byte-blocks dropped at " +
          s"maxBucket=$maxBucket (members still pair via their other blocks)")
    }
    val bcDropped = spark.sparkContext.broadcast(droppedKeys)
    blocks.groupBy(col("band"), col("bkey"))
      .agg(collect_list(struct(col("id"), col("sigl"))).as("members"))
      .select(col("band"), col("bkey"), col("members"))
      .as[(Int, Int, Seq[(Long, Long)])]
      .mapPartitions { it =>
        val droppedSet = bcDropped.value
        it.flatMap { case (band, bkey, members) =>
          if (droppedSet((band, bkey))) Iterator.empty
          else {
            val s = members.sortBy(_._1).toArray
            for {
              i <- s.indices.iterator
              j <- Iterator.range(i + 1, s.length)
              x = s(i)._2 ^ s(j)._2
              if java.lang.Long.bitCount(x) <= k &&
                // first-match: emit only if no EARLIER block both
                // matches (byte equal) and survived the cap
                (0 until band).forall { b =>
                  ((x >>> (24 - 8 * b)) & 0xFF) != 0 ||
                    droppedSet((b, ((s(i)._2 >>> (24 - 8 * b)) & 0xFF).toInt))
                }
            } yield (s(i)._1, s(j)._1, java.lang.Long.bitCount(x))
          }
        }
      }
      .toDF("a", "b", "ham")
  }

  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"),
        explode(TextFns.tokens(col(textCol))).as("tok"))
      .groupBy(col("id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      // bind the digest to a column so the 32 substrings share ONE md5
      // evaluation per token (subexpression reuse across aggregate
      // expressions is not guaranteed)
      .withColumn("h", md5(col("tok")))
    val bitSums = (0 until 32).map(b =>
      sum(when(substring(col("h"), b + 1, 1) >= "8", col("cnt"))
        .otherwise(-col("cnt"))).as(s"s_$b"))
    tf.groupBy(col("id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        concat((0 until 32).map(b =>
          when(col(s"s_$b") > 0, "1").otherwise("0")): _*).as("simhash"))
  }

  /** Connected components of an undirected pair graph (a, b): every
    * node that occurs in a pair is labelled with the minimum id
    * reachable through pairs — duplicate-cluster resolution for any of
    * the near-dup pair generators. Returns (node, lab); nodes absent
    * from `pairs` (singletons) are absent from the result.
    *
    * Runs as an RDD loop over ONE fixed HashPartitioner (the GraphX
    * pattern): edges and labels are co-partitioned once, each round's
    * join/reduceByKey is shuffle-local, and there is no per-round query
    * re-planning — measured 10× over a DataFrame-loop formulation.
    * Rounds relax labels over edges then pointer-double (lab :=
    * lab(lab), valid because lab(x) ≤ x is invariant), so rounds =
    * O(log diameter). Labels only decrease, making the sum-of-labels a
    * monotone convergence witness; the fixpoint (min reachable id) is
    * unique, hence deterministic under any partitioning.
    */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val pairRdd = pairs
      .select(col(pairs.columns(0)).cast("long"), col(pairs.columns(1)).cast("long"))
      .as[(Long, Long)].rdd
    val part = new org.apache.spark.HashPartitioner(
      spark.sparkContext.defaultParallelism)
    // keyed by peer: (peer, node) — relax pulls the peer's label to node
    val edges = pairRdd.flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .partitionBy(part)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.keys.distinct(part.numPartitions)
      .map(n => (n, n)).partitionBy(part).persist()
    var prevSum = labels.map(_._2).fold(0L)(_ + _)
    var converged = labels.isEmpty()
    var iter = 0
    while (!converged && iter < 50) {
      val relaxed = edges.join(labels) // (peer, (node, plab))
        .map { case (_, (node, plab)) => (node, plab) }
        .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
        .rightOuterJoin(labels)
        .mapValues { case (nmin, lab) => math.min(nmin.getOrElse(lab), lab) }
      // pointer doubling: lab(lab) ≤ lab, so one hop IS the new label
      val updated = relaxed.map { case (n, lb) => (lb, n) }
        .join(relaxed)
        .map { case (_, (n, lb2)) => (n, lb2) }
        .partitionBy(part)
        .persist()
      val s = updated.map(_._2).fold(0L)(_ + _)
      labels.unpersist(blocking = false)
      labels = updated
      converged = s == prevSum
      prevSum = s
      iter += 1
    }
    val out = labels.toDF("node", "lab")
    edges.unpersist(blocking = false)
    out
  }

  /** Attach `dup_of` = min id within each group-key value. */
  def dupOf(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.withColumn("dup_of", min(col(idCol)).over(Window.partitionBy(col(keyCol))))
      .withColumn("is_dup", (col(idCol) =!= col("dup_of")).cast("int"))

  /** Semantic deduplication (SemDeDup — Abbas et al., "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication",
    * 2023): k-means clusters bound the quadratic comparison, then
    * within each cluster any vector with a LOWER-id cluster-mate above
    * the cosine threshold is marked removed (the paper keeps one
    * exemplar per semantic-duplicate group; lowest id is our
    * deterministic exemplar rule, matching the other dedup operators).
    *
    * `emb` is (vec_id, embedding); `centroids` is (cent_id, cvec) —
    * typically [[graft.search.Ann.trainCentroids]] output, so the whole
    * pipeline (training included) replays in the oracle's Lloyd CTEs.
    *
    * Scale shape: assignment is [[graft.search.Ann.assignCells]] (a
    * narrow map over the broadcast codebook — the index never
    * shuffles); the pair stage shuffles once on cent_id and is
    * quadratic ONLY within a cluster — the SemDeDup contract is that k
    * grows with the corpus (the paper uses fixed-occupancy clusters,
    * ~n/k members each), so per-cluster cost stays bounded while total
    * work is n²/k. Dots accumulate left-to-right in double (the
    * engine-wide convention), so the strict `> tau` comparison is
    * bit-identical in the oracle replay.
    *
    * Output: one row per vector — (vec_id, cent_id, is_removed 0/1).
    */
  def semanticDedup(emb: DataFrame, centroids: DataFrame, tau: Double): DataFrame = {
    import graft.functions.Vec
    val assigned = graft.search.Ann.assignCells(emb, centroids)
    val a = assigned.select(col("vec_id").as("a"), col("embedding").as("va"),
      col("cent_id"))
    val b = assigned.select(col("vec_id").as("b"), col("embedding").as("vb"),
      col("cent_id"))
    val removed = a.join(b, "cent_id")
      .filter(col("a") < col("b"))
      .filter(Vec.dot(col("va"), col("vb")) > tau)
      .select(col("b").as("vec_id"))
      .distinct()
      .withColumn("is_removed", lit(1))
    assigned.select(col("vec_id"), col("cent_id"))
      .join(removed, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cent_id"),
        coalesce(col("is_removed"), lit(0)).as("is_removed"))
  }
}
