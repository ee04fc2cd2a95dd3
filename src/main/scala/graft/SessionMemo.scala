package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped memo map: WEAKLY keyed by SparkSession — a dropped
  * session's memoized artifacts (trained centroids/codebooks, memoized
  * frames, collected meter ids) must become collectable in a
  * long-running multi-session library caller, the same reason the
  * accumulator maps use WeakHashMap — with one ConcurrentHashMap per
  * live session so call sites keep their own discipline
  * (computeIfAbsent for plain builds, putIfAbsent-after-build where
  * builds nest and a recursive computeIfAbsent would fault).
  *
  * Weak keys only release when NOTHING strongly references the
  * session, which is why EVERY session-keyed memo in the code base
  * routes through this class: one strongly-keyed `Map[(SparkSession,
  * …), _]` anywhere would pin the session and silently defeat all the
  * weak ones (the round-13 review caught exactly that — the weak
  * truth/replay memos were moot while trainMemo/vndMemo/bpeEncMemo/
  * embMemo/trainedW still keyed sessions strongly).
  */
final class SessionMemo[K, V] {
  private val outer = new java.util.WeakHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[K, V]]

  /** The per-session entry map (created on first use). Hold the result
    * only transiently — storing it in a field would re-pin the session.
    */
  def entries(spark: SparkSession): java.util.concurrent.ConcurrentHashMap[K, V] =
    outer.synchronized {
      var m = outer.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[K, V]
        outer.put(spark, m)
      }
      m
    }

  def computeIfAbsent(spark: SparkSession, key: K)(build: => V): V =
    entries(spark).computeIfAbsent(key, _ => build)

  /** Live (not-yet-collected) session count — spec hook proving the
    * weak-release contract (WeakHashMap expunges stale entries on
    * access, so this reads the post-GC truth).
    */
  private[graft] def liveSessions: Int = outer.synchronized { outer.size }
}

/** DataFrame-valued session memo that does NOT pin the session
  * (ADVICE r15, medium): a `Dataset` strongly references its
  * `SparkSession`, so storing one as a [[SessionMemo]] VALUE builds the
  * WeakHashMap-documented value→key chain (map → CHM → DataFrame →
  * session) and the weak key never clears — the session is pinned
  * forever and the weak-release contract is silently void.
  *
  * The fix: the memo stores only a TEMP-VIEW NAME (a String — no
  * session reference), and the frame's analyzed plan lives in the
  * session's OWN catalog (`createTempView` registers session-scoped
  * state). The retention chain from plan back to session is then a
  * self-cycle (session → sessionState → catalog → plan → session),
  * which the collector reclaims whole once nothing external references
  * the session — exactly the weak-release contract, now testable with
  * a DataFrame-valued memo (CacheLifecycleSpec).
  *
  * Lookup returns `spark.table(name)`: a fresh Dataset each call, but
  * over the SAME stored analyzed plan, and `SubqueryAlias`/`View`
  * canonicalize to their child — so plan-keyed cache entries dedupe
  * across calls just as the old same-object convention did (the soak
  * loop in CacheLifecycleSpec pins this). Views are internal
  * (`graft_memo_<uuid>` — visible in `listTables`, documented library
  * state); an externally dropped view is rebuilt, not an error.
  */
final class FrameMemo[K] {
  private val names = new SessionMemo[K, String]

  /** Resolve-or-rebuild until a registered view survives its own
    * lookup. Two deliberate properties (ADVICE r16):
    *
    *  - EVERY `spark.table(name)` — including the one after winning or
    *    losing the publication race — runs inside the retry loop, so a
    *    concurrent catalog sweep dropping the view between publication
    *    and lookup triggers a rebuild instead of throwing
    *    `AnalysisException` (the old final lookup sat outside the loop).
    *  - `build` (which can run full Spark jobs — the NN-descent graph
    *    build checkpoints and writes an artifact) executes OUTSIDE any
    *    `ConcurrentHashMap.computeIfAbsent` mapping function, so a slow
    *    build never holds a CHM bin lock against unrelated keys that
    *    hash to the same bin. Publication is `putIfAbsent`; the losing
    *    racer drops its own view and adopts the winner's.
    */
  def computeIfAbsent(spark: SparkSession, key: K)(
      build: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val m = names.entries(spark)
    def resolve(n: String): Option[org.apache.spark.sql.DataFrame] =
      try Some(spark.table(n))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    while (true) {
      val n0 = m.get(key)
      if (n0 != null) resolve(n0) match {
        case Some(df) => return df
        case None => m.remove(key, n0) // view dropped externally — rebuild
      } else {
        val df = build
        val n = "graft_memo_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        df.createOrReplaceTempView(n)
        val prev = m.putIfAbsent(key, n)
        if (prev != null) {
          // lost the race: the winner's view is the shared one — drop
          // ours (fresh UUID name, so this cannot touch theirs) and
          // loop to resolve theirs (re-entering the rebuild path if a
          // sweep got it first)
          spark.catalog.dropTempView(n): Unit
        }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The memoized frame if one is registered AND its view still
    * resolves — None otherwise (never builds). The index-maintenance
    * hook: an updater only touches artifacts that exist.
    */
  def peek(spark: SparkSession, key: K): Option[org.apache.spark.sql.DataFrame] = {
    val m = names.entries(spark)
    val n = m.get(key)
    if (n == null) None
    else
      try Some(spark.table(n))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
  }

  /** REPLACE the memoized frame for `key` (registering a fresh view) —
    * the incremental-maintenance write path: an upsert/delete updates
    * one collection's artifact in place of the old one. The superseded
    * view is dropped; concurrent readers holding the old DataFrame
    * keep working (the plan outlives the catalog entry).
    */
  def put(spark: SparkSession, key: K)(
      df: org.apache.spark.sql.DataFrame): Unit = {
    val m = names.entries(spark)
    val n = "graft_memo_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    df.createOrReplaceTempView(n)
    val prev = m.put(key, n)
    if (prev != null)
      try spark.catalog.dropTempView(prev): Unit
      catch { case _: org.apache.spark.sql.AnalysisException => () }
  }

  /** Forget the memoized frame for `key` (dropping its view) — the
    * invalidation hook for destructive rewrites (collection drop /
    * recreate): a stale artifact must not serve a replaced dataset.
    */
  def drop(spark: SparkSession, key: K): Unit = {
    val n = names.entries(spark).remove(key)
    if (n != null)
      try spark.catalog.dropTempView(n): Unit
      catch { case _: org.apache.spark.sql.AnalysisException => () }
  }

  private[graft] def liveSessions: Int = names.liveSessions
}
