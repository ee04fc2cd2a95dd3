package graft

/** Library-caller cache contract: the operators that internally cache a
  * shared subplan ([[graft.queries.Bm25]] documents,
  * [[graft.queries.DedupQueries]] shingle sets) key the entry by
  * LOGICAL PLAN — so a caller looping over queries reuses one entry per
  * distinct input instead of leaking a new cached table per call. The
  * entry itself outlives the call by design (that is what makes the
  * second call cheap); eviction belongs to the caller
  * (`spark.catalog.clearCache()`), exactly as Bench/Verify do between
  * queries.
  */
class CacheLifecycleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def cachedRddCount: Int = spark.sparkContext.getPersistentRDDs.size

  test("repeated library calls do not grow the cache (soak loop)") {
    spark.catalog.clearCache()
    assert(cachedRddCount == 0)

    graft.queries.Bm25.bm25TopK(spark, dir).count()
    // the fusion pair consumes the memoized retrieval legs (VERDICT
    // r17 #3) — repeated fusions must not re-park anything
    graft.queries.Bm25.hybridRrf(spark, dir).count()
    graft.queries.Bm25.hybridMinmax(spark, dir).count()
    graft.queries.DedupQueries.dedupMinhashLsh(spark, dir).count()
    graft.queries.DedupQueries.dedupNgramJaccard(spark, dir).count()
    graft.queries.Similarity.annRecall(spark, dir).count()
    // the round-11 cached subplans: ensemble pair sets, the uncapped
    // true-pair side, and TextRank's graph tables — same plan-keyed
    // contract
    graft.queries.DedupQueries.dedupEnsemble(spark, dir).count()
    graft.queries.DedupQueries.dedupMinhashRecall(spark, dir).count()
    graft.queries.TextAnalysis.textrankKeywords(spark, dir).count()
    // the closure-plan class (typed chunker/heap/BPE lambdas): these
    // leak one entry per call unless the frame instance is memoized
    graft.queries.Rag.ragEval(spark, dir).count()
    graft.queries.Rag.ragRetrieval(spark, dir).count()
    graft.queries.Rag.ragSummary(spark, dir).count()
    graft.queries.TextAnalysis.bpeEncode(spark, dir).count()
    // the winnow pair/span reports cache a `kept` posting frame whose
    // plan embeds the winnowFpsPos typed flatMap — the closure-plan
    // class again (round 15: winnow_spans joined the surface)
    graft.queries.DedupQueries.dedupWinnow(spark, dir).count()
    graft.queries.DedupQueries.winnowSpans(spark, dir).count()
    assert(cachedRddCount > 0, "the shared subplans should be cached at all")

    // Steady-state baseline is taken AFTER one more full iteration, not
    // after the first batch: the first dedupEnsemble call runs the
    // once-per-(session, dir) ground-truth build, whose cascading
    // cache release also evicts the plan-keyed shingle entry that
    // earlier queries had parked — iteration 1 re-parks it, and from
    // there the count must hold exactly.
    // 3 iterations = baseline + TWO exact-hold assertions — enough to
    // distinguish per-call growth from one-off re-parking, at ~60% of
    // the 5-iteration suite cost (this is the suite's slowest test)
    var afterFirst = 0
    for (it <- 1 to 3) {
      graft.queries.Bm25.bm25TopK(spark, dir).count()
      graft.queries.Bm25.hybridRrf(spark, dir).count()
      graft.queries.Bm25.hybridMinmax(spark, dir).count()
      graft.queries.DedupQueries.dedupMinhashLsh(spark, dir).count()
      graft.queries.DedupQueries.dedupNgramJaccard(spark, dir).count()
      graft.queries.Similarity.annRecall(spark, dir).count()
      graft.queries.DedupQueries.dedupEnsemble(spark, dir).count()
      graft.queries.DedupQueries.dedupMinhashRecall(spark, dir).count()
      graft.queries.TextAnalysis.textrankKeywords(spark, dir).count()
      graft.queries.Rag.ragEval(spark, dir).count()
      graft.queries.Rag.ragRetrieval(spark, dir).count()
      graft.queries.Rag.ragSummary(spark, dir).count()
      graft.queries.TextAnalysis.bpeEncode(spark, dir).count()
      graft.queries.DedupQueries.dedupWinnow(spark, dir).count()
      graft.queries.DedupQueries.winnowSpans(spark, dir).count()
      if (it == 1) afterFirst = cachedRddCount
      else assert(cachedRddCount == afterFirst,
        s"cache grew across repeated calls (iteration $it): " +
          s"$afterFirst -> $cachedRddCount")
    }

    // caller-side eviction releases everything
    spark.catalog.clearCache()
    assert(cachedRddCount == 0)
  }

  test("ground-truth memo build retains no cache entries (shingle frame unpersisted)") {
    spark.catalog.clearCache()
    // a path alias the memo has never seen (same files) forces a fresh
    // build; the build caches its shingle frame, consumes it in one
    // collect, and must unpersist before returning — a library caller
    // building ground truth outside Bench has no clearCache backstop
    graft.queries.DedupQueries.truePairs07(spark, dir + "/.").count()
    assert(cachedRddCount == 0,
      "truePairs07 must unpersist its fully-consumed shingle frame")
  }

  test("SessionMemo: a dropped session's entries are collectable") {
    // The weak-release claim (SCALING known-limits #7) measured, not
    // asserted: memoize against a child session, drop the only strong
    // reference, and the WeakHashMap entry must go away under GC. This
    // proves OUR maps never pin a session — external retention by
    // Spark itself is a separate concern this memo cannot cause.
    val memo = new graft.SessionMemo[String, String]
    var s2 = spark.newSession()
    memo.computeIfAbsent(s2, "k")("v")
    assert(memo.liveSessions == 1)
    s2 = null
    var tries = 0
    while (memo.liveSessions > 0 && tries < 100) {
      System.gc(); Thread.sleep(50); tries += 1
    }
    assert(memo.liveSessions == 0,
      "SessionMemo retained a session that has no other strong references")
  }

  test("FrameMemo: a DataFrame-valued memo does not pin its session") {
    // ADVICE r15 (medium): a DataFrame stored as a SessionMemo VALUE
    // strongly references its SparkSession, so the WeakHashMap
    // value→key chain pinned the session forever — and the String-only
    // test above could never catch it. FrameMemo stores just the
    // temp-view name; the plan lives in the session's own catalog
    // (a self-cycle the GC reclaims with the session).
    val memo = new graft.FrameMemo[String]
    // the frames live only inside this helper's stack frame — an
    // interpreted test body would otherwise keep them (and the session
    // they reference) alive through the GC loop below
    def exercise(s2: org.apache.spark.sql.SparkSession): Unit = {
      val built = memo.computeIfAbsent(s2, "k") {
        s2.read.parquet(dir + "/documents.parquet").select("doc_id")
      }
      assert(built.columns.toSeq == Seq("doc_id"))
      // second lookup resolves the SAME stored plan through the view
      val again = memo.computeIfAbsent(s2, "k") {
        fail("memoized build must not re-run")
      }
      assert(again.queryExecution.analyzed.canonicalized ==
        built.queryExecution.analyzed.canonicalized,
        "view-resolved frame must canonicalize to the built plan " +
          "(plan-keyed cache entries would otherwise grow per call)")
    }
    var s2 = spark.newSession()
    exercise(s2)
    s2 = null
    var tries = 0
    while (memo.liveSessions > 0 && tries < 100) {
      System.gc(); Thread.sleep(50); tries += 1
    }
    assert(memo.liveSessions == 0,
      "FrameMemo retained a session through a DataFrame value — the " +
        "value→key chain the temp-view indirection exists to break")
  }

  test("FrameMemo: an externally dropped view is rebuilt, not an error") {
    val memo = new graft.FrameMemo[String]
    var builds = 0
    def get() = memo.computeIfAbsent(spark, "k2") {
      builds += 1
      spark.range(3).toDF("doc_id")
    }
    assert(get().count() == 3 && builds == 1)
    // drop every graft_memo_ view (simulating a caller's catalog sweep)
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_memo_"))
      .foreach(t => spark.catalog.dropTempView(t.name))
    assert(get().count() == 3, "dropped view must resolve via rebuild")
    assert(builds == 2)
  }
}
