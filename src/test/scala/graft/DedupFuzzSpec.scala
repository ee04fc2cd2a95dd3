package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Brute-force cross-checks of the dedup operators on randomized
  * corpora — the oracle fixture exercises one data shape; this drives
  * near-dup clusters, disjoint docs, and shared-prefix families.
  */
class DedupFuzzSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic corpus: clusters of near-identical docs +
  // unrelated noise docs
  private val docs: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 200).map(i => s"w$i")
    def sentence(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val clusters = (0 until 6).flatMap { c =>
      val base = sentence(30)
      (0 until 4).map { v =>
        val mutated =
          if (v == 0) base
          else base.split(" ").updated(rnd.nextInt(25), s"mut${c}_$v").mkString(" ")
        ((c * 4 + v).toLong, mutated)
      }
    }
    val noise = (24 until 40).map(i => (i.toLong, sentence(25)))
    clusters ++ noise
  }

  private def shingleSets: Map[Long, Set[Long]] = {
    def md5Int(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    docs.map { case (id, text) =>
      val t = text.trim.split("\\s+")
      id -> t.sliding(3).filter(_.length == 3).map(w => md5Int(w.mkString(" "))).toSet
    }.toMap
  }

  test("dup-span fractions are partitioning-invariant (the 100 TB property)") {
    // the same corpus under 1-partition and 13-partition layouts must
    // produce byte-identical results — no operator may depend on row
    // order or partition boundaries
    def run(parts: Int): Seq[org.apache.spark.sql.Row] = {
      val df = docs.toDF("doc_id", "text").repartition(parts)
      (graft.queries.TextAnalysis.boilerplateFracOf(df).collect().toSeq,
        graft.queries.TextAnalysis.substringDedupOf(df).collect().toSeq) match {
        case (b, s) => b ++ s
      }
    }
    assert(run(1) == run(13))
  }

  test("pairJaccard matches brute-force Jaccard on every co-shingled pair") {
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.pairJaccard(Dedup.shingleSet(df, "doc_id", "text"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap

    val sets = shingleSets
    val expected = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size if inter > 0
    } yield (a, b) -> inter.toDouble / (sets(a) ++ sets(b)).size).toMap

    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-12, k) }
  }

  test("dedupContainment matches brute-force containment on every qualifying ordered pair") {
    val df = docs.toDF("doc_id", "text")
    val got = graft.queries.DedupQueries.dedupContainmentOf(df)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap

    val sets = shingleSets
    val expected = (for {
      a <- sets.keys; b <- sets.keys if a != b
      inter = (sets(a) & sets(b)).size
      cont = inter.toDouble / sets(a).size if inter > 0 && cont >= 0.5
    } yield (a, b) -> math.floor(cont * 1e4 + 0.5) / 1e4).toMap

    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(got(k) == v, k) }
    // asymmetry is real on this corpus: the mutated cluster members
    // contain their base at high fraction both ways (sets differ by a
    // few shingles), so at minimum the operator must emit SOME ordered
    // pair whose mirror is also present
    assert(got.keys.exists { case (a, b) => got.contains((b, a)) })
  }

  test("LSH candidates are a subset of co-shingled pairs and catch all exact dups") {
    val df = docs.toDF("doc_id", "text")
    val sh = Dedup.shingleSet(df, "doc_id", "text").cache()
    sh.count()
    val cands = Dedup.lshCandidates(Dedup.lshBands(Dedup.minhash(sh, 16), 4))
      .as[(Long, Long)].collect().toSet

    val sets = shingleSets
    // soundness: a candidate pair must share at least one shingle
    cands.foreach { case (a, b) => assert((sets(a) & sets(b)).nonEmpty, (a, b)) }
    // completeness on identical shingle sets: same signatures → same buckets
    for (a <- sets.keys; b <- sets.keys if a < b && sets(a) == sets(b))
      assert(cands.contains((a, b)), s"identical pair ($a,$b) missed")
    sh.unpersist()
  }

  test("maxDf drops boilerplate shingles: hot-shingle corpus yields no quadratic pair join") {
    // adversarial shape: every doc shares a 10-token boilerplate header
    // (df = corpus size) followed by a unique tail — uncapped, the pair
    // join is all-pairs; capped, the hot shingles leave the
    // representation and only genuine overlap pairs remain (here: none)
    val boiler = "annual compliance header issued by the records office today"
    val hot = (0 until 30).map(i =>
      (i.toLong, s"$boiler uniq${i}a uniq${i}b uniq${i}c uniq${i}d"))
    val sh = Dedup.shingleSet(hot.toDF("doc_id", "text"), "doc_id", "text").cache()
    sh.count()
    assert(Dedup.pairJaccard(sh, maxDf = Int.MaxValue).count() == 30L * 29 / 2)
    assert(Dedup.pairJaccard(sh, maxDf = 29).count() == 0)
    // the default cap (1000) never triggers at fixture scale
    assert(Dedup.pairJaccard(sh).count() == 30L * 29 / 2)
    sh.unpersist()
  }

  test("maxBucket drops degenerate LSH buckets but keeps normal ones") {
    val bands = ((0 until 100).map(i => (i.toLong, 0, "hot")) ++
      Seq((200L, 0, "cold"), (201L, 0, "cold"))).toDF("id", "band", "bkey")
    // the drop is observable: the accumulator counts the dropped bucket
    val dropped = spark.sparkContext.longAccumulator("test.lsh.dropped")
    assert(Dedup.lshCandidates(bands, maxBucket = 10, Some(dropped))
      .as[(Long, Long)].collect().toSet == Set((200L, 201L)))
    assert(dropped.value == 1L, "dropped-bucket count must surface")
    val noDrops = spark.sparkContext.longAccumulator("test.lsh.nodrops")
    assert(Dedup.lshCandidates(bands, droppedBuckets = Some(noDrops)).count()
      == 100L * 99 / 2 + 1)
    assert(noDrops.value == 0L)
  }

  test("shingleSetPos: same shingle set as shingleSet, pos = first occurrence") {
    val df = docs.toDF("doc_id", "text")
    val plain = Dedup.shingleSet(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val withPos = Dedup.shingleSetPos(df, "doc_id", "text").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(withPos.keySet == plain, "position variant must not change the set")
    // recompute first occurrences brute-force from the raw token arrays
    // — via TextFns.tokensJvm, NOT String.trim.split: the Java pair
    // trims all whitespace and drops boundary empties, so the oracle
    // side of this pin would silently diverge from the Catalyst
    // convention on docs with leading/trailing tabs/newlines (ADVICE r15)
    for (((id, s), pos) <- withPos) {
      val toks = graft.text.TextFns.tokensJvm(docs.toMap.apply(id))
      val hashes = toks.sliding(3).filter(_.length == 3)
        .map(w => graft.text.TextFns.md5IntJvm(w.mkString(" "))).toArray
      assert(hashes.indexOf(s) == pos, s"doc $id shingle $s")
    }
  }

  test("span reports are partitioning-invariant (winnow + decontaminate spans)") {
    // the 100 TB property for the round-15 span operators: byte-identical
    // output under 1-partition and 13-partition layouts — min/max span
    // bounds and shared counts may not depend on row order
    def run(parts: Int): Seq[org.apache.spark.sql.Row] = {
      val df = docs.toDF("doc_id", "text").repartition(parts)
      val ev = Seq(("q0", docs.head._2.split(" ").take(8).mkString(" ")))
        .toDF("query_id", "qtext")
      graft.queries.DedupQueries.winnowSpansOf(df, 1000).collect().toSeq ++
        graft.queries.DedupQueries.winnowRunsOf(df, 1000).collect().toSeq ++
        graft.queries.DedupQueries.decontaminateSpansOf(df, ev).collect().toSeq
    }
    val a = run(1)
    val b = run(13)
    assert(a.nonEmpty, "fixture must produce at least one span row")
    assert(a == b)
  }

  test("recall-bands meter completes on a pathological clique corpus under the cap") {
    // 40 identical docs: every LSH bucket in every banding config is
    // the full clique. With a cap of 10 every bucket is dropped — the
    // meter must COMPLETE with bounded tasks (round-14 verdict #3: the
    // uncapped formulation would have built one O(clique²) task per
    // bucket), report the censored recall honestly (hits = 0), and
    // count the drops in the audit accumulator — never silence them.
    val clique = (0 until 40).map(i => (i.toLong, "a b c d e f g h i j k l"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingleSet(clique, "doc_id", "text").cache()
    val truth = Dedup.pairJaccard(sh, maxDf = Int.MaxValue)
      .filter(col("jac") >= 0.7).select(col("a"), col("b"))
    val acc = graft.queries.DedupQueries.droppedBucketsAcc(spark)
    val before = acc.value
    val rows = graft.queries.DedupQueries
      .recallBandsOf(spark, sh, truth, maxBucket = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 3)
    assert(rows.forall(_._3 == 40L * 39 / 2), rows.mkString("; "))
    assert(rows.forall(_._2 == 0L),
      "every bucket degenerate under the cap -> censored recall must read 0")
    assert(acc.value > before, "dropped buckets must be counted, never silent")
  }

  test("candidateJaccard equals pairJaccard on the candidate subset") {
    val df = docs.toDF("doc_id", "text")
    val sh = Dedup.shingleSet(df, "doc_id", "text").cache()
    sh.count()
    val cands = Dedup.lshCandidates(Dedup.lshBands(Dedup.minhash(sh, 16), 4)).cache()
    val viaCand = Dedup.candidateJaccard(sh, cands)
      .as[(Long, Long, Double)].collect().map { case (a, b, j) => (a, b) -> j }.toMap
    val full = Dedup.pairJaccard(sh)
      .as[(Long, Long, Double)].collect().map { case (a, b, j) => (a, b) -> j }.toMap
    viaCand.foreach { case (k, v) => assert(full(k) == v, k) }
    sh.unpersist(); cands.unpersist()
  }
}
