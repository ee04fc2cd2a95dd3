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
