package graft

import org.apache.spark.sql.functions._

import graft.queries.Quality

/** Behavior specs for the trained quality classifier (teacher-student
  * logistic regression over hashed bag-of-words).
  */
class QualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("distributed GD recovers the planted teacher boundary above base rate") {
    val r = Quality.qualityLrRecovery(spark, dir).head()
    val n = r.getLong(0)
    val correct = r.getLong(1)
    val pos = r.getLong(2)
    assert(n > 0)
    // base rate = always predicting the majority class; the student
    // must beat it with real margin, or training learned nothing
    val base = math.max(pos, n - pos).toDouble / n
    val acc = correct.toDouble / n
    assert(acc > base + 0.05,
      s"student acc $acc does not beat base rate $base (n=$n, pos=$pos)")
    assert(acc >= 0.75, s"student acc $acc below the recovery floor")
  }

  test("trained weights sit on the 1e-6 grid and are memoized per (session, dir)") {
    val w1 = Quality.trainWeights(spark, dir)
    val w2 = Quality.trainWeights(spark, dir)
    assert(w1 eq w2, "second call must hit the memo, not retrain")
    w1.foreach { w =>
      val snapped = math.floor(w * 1e6 + 0.5) / 1e6
      assert(w == snapped, s"weight $w off the 1e-6 grid")
    }
    assert(w1.length == 17)
    assert(w1.exists(_ != 0.0), "all-zero weights: training did not move")
  }

  test("textrank: 10 ranked keywords, scores positive and non-increasing") {
    val rows = graft.queries.TextAnalysis.textrankKeywords(spark, dir)
      .collect().sortBy(_.getInt(0))
    assert(rows.length == 10)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    val scores = rows.map(_.getDouble(2)).toSeq
    assert(scores.forall(_ > 0.0))
    assert(scores.sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
    assert(rows.map(_.getString(1)).distinct.length == 10)
  }

  test("histogram quantile estimates land within one bin width above exact") {
    // TRUE invariant of the upper-edge estimator: the exact q-quantile
    // value lies inside the reported bin, so est ∈ [exact, exact + w)
    val rows = graft.queries.Relational.quantilesHist(spark, dir)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val o = Tables.orders(spark, dir)
    val mm = o.agg(min(col("o_totalprice")), max(col("o_totalprice"))).head()
    val w = (mm.getDouble(1) - mm.getDouble(0)) / 1000.0
    val exact = o.agg(
      expr("percentile(o_totalprice, 0.5)"),
      expr("percentile(o_totalprice, 0.9)"),
      expr("percentile(o_totalprice, 0.99)")).head()
    Seq(0.5 -> exact.getDouble(0), 0.9 -> exact.getDouble(1),
      0.99 -> exact.getDouble(2)).foreach { case (q, ex) =>
      val est = rows(q)
      assert(est >= ex - w - 1e-6 && est <= ex + w + 1e-6,
        s"q=$q est=$est exact=$ex binw=$w")
    }
  }

  test("lang_js divergences sit in [0, ln 2] and pmi pairs clear min support") {
    val js = graft.queries.TextAnalysis.langJs(spark, dir).collect()
    assert(js.nonEmpty)
    js.foreach { r =>
      val v = r.getDouble(2)
      assert(v >= 0.0 && v <= math.log(2.0) + 1e-6, s"js out of range: $r")
    }
    val pmi = graft.queries.TextAnalysis.pmiBigrams(spark, dir).collect()
    assert(pmi.length <= 15)
    assert(pmi.forall(_.getLong(2) >= 5))
  }

  test("k-center picks have non-decreasing max-similarity (true invariant)") {
    // more centers ⇒ every point's max-sim grows pointwise, and the
    // candidate set shrinks, so the picked minimum cannot decrease
    val rows = graft.queries.Similarity.coresetKcenter(spark, dir)
      .collect().sortBy(_.getInt(0))
    assert(rows.length == 8)
    assert(rows.head.isNullAt(2), "seed row carries no maxsim")
    assert(rows.map(_.getLong(1)).distinct.length == 8, "centers must be distinct")
    val sims = rows.tail.map(_.getDouble(2)).toSeq
    assert(sims.sliding(2).forall { case Seq(a, b) => b >= a; case _ => true },
      s"picked max-sims must be non-decreasing: $sims")
  }

  test("ewma is a convex combination: bounded by the daily min and max") {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(min(col("n")).as("lo"), max(col("n")).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = graft.queries.Events.eventsEwma(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = daily(r.getString(0))
      val e = r.getDouble(3)
      assert(e >= lo - 1e-6 && e <= hi + 1e-6, s"ewma $e outside [$lo, $hi]: $r")
    }
  }

  test("fuzzy vocab join: q-gram blocking loses NO pair vs brute force (true invariant)") {
    // padded 2-grams: d ≤ 2 edits destroy at most 4 grams, and a token
    // of length ≥ 4 has ≥ 5 padded grams — every true pair shares one,
    // so the blocked candidate set must contain the full n² answer
    val rows = graft.queries.TextAnalysis.vocabFuzzyPairs(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val vocab = Tables.documents(spark, dir)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) >= 4).distinct()
      .collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      a <- vocab; b <- vocab if a < b
      dd = lev(a, b) if dd <= 2
    } yield (a, b, dd)).toSet
    assert(rows == brute, s"blocked ${rows.size} vs brute ${brute.size}")
    assert(brute.nonEmpty, "fixture vocabulary produced no fuzzy pairs at all")
  }

  test("fuzzy vocab join: Gravano count filter is lossless; df cap audits drops") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // engineered vocabulary: heavy shared-gram collisions ("er"-class
    // junk candidates the count filter must prune) plus true pairs at
    // d = 1 and d = 2, repeats inside tokens (distinct-gram sets
    // smaller than length+1 — the set-semantics case the lemma must
    // survive), and isolated tokens
    val toks = Seq("walker", "talker", "walken", "banner", "runner",
      "winner", "winter", "sinner", "different", "difference",
      "differing", "aaaaaa", "aaaaab", "aabbaa", "zzzzqqqq", "qqqqzzzz")
    val vocab = toks.toDF("tok")
    val out = graft.queries.TextAnalysis
      .vocabFuzzyPairsOf(vocab, graft.queries.TextAnalysis.VocabGramMaxDf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val brute = (for {
      a <- toks; b <- toks if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b, d)).toSet
    assert(brute.nonEmpty, "constructed vocab must contain true pairs")
    assert(out == brute, s"count filter changed the answer: ${out.size} vs ${brute.size}")

    // cap = 1 drops every block shared by two or more tokens, so no
    // candidate survives blocking AND the audit accumulator counts the
    // dropped blocks — the dedup_embedding_lsh telemetry contract
    val acc = graft.queries.TextAnalysis.vocabFuzzyDroppedBlocksAcc(spark)
    val before = acc.value
    val capped = graft.queries.TextAnalysis.vocabFuzzyPairsOf(vocab, 1).count()
    assert(capped == 0, s"cap=1 should leave no blocked pairs, got $capped")
    assert(acc.value > before, "dropped-block accumulator did not fire")
  }

  test("scores and selection flags are consistent and complete") {
    val df = Quality.qualityLr(spark, dir).cache()
    val nDocs = Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) >= 0).count()
    assert(df.count() == nDocs, "every document must be scored")
    // selected must equal (score > 0.5) — the flag derives from the
    // rounded score, never a second margin computation
    assert(df.filter(col("selected") =!= (col("score") > 0.5)).count() == 0)
    assert(df.filter(col("score") < 0.0 || col("score") > 1.0).count() == 0)
    df.unpersist()
  }
}
