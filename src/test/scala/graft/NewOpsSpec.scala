package graft

import org.apache.spark.sql.functions._

import graft.queries.{Events, Similarity, TextAnalysis}

/** Behavior specs for the round-2 operators: banded range join
  * (bin-boundary semantics the fixture cannot hit), int8 quantization
  * (clamping and rounding), and the curation-filter/tfidf surfaces.
  */
class NewOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("banded range join equals naive interval join, boundaries included") {
    val bin = 1000L // 1ms bins for easy boundary construction
    val rnd = new scala.util.Random(7)
    // random mass + exact boundary cases: v at c-bin (excluded), c-bin+1
    // (included), c (included), c+1 (excluded), and bin-edge-aligned c
    val clicks = (0 until 60).map(i =>
      (i.toLong, (i % 5).toLong,
        if (i < 10) i * bin else rnd.nextInt(60000).toLong))
    val views = (0 until 400).map { i =>
      val u = (i % 5).toLong
      val base = clicks(i % 60)._3
      val v = (i % 8) match {
        case 0 => base - bin     // just outside (exclusive lower)
        case 1 => base - bin + 1 // inside edge
        case 2 => base           // inside edge (inclusive upper)
        case 3 => base + 1       // outside
        case _ => rnd.nextInt(60000).toLong
      }
      (u, v)
    }
    val cdf = clicks.toDF("event_id", "user_id", "c_us")
    val vdf = views.toDF("user_id", "v_us")

    val banded = Events.rangeJoinBanded(cdf, vdf, bin)
      .as[(Long, Long, Long)].collect().toSet

    val naive = clicks.map { case (id, u, c) =>
      (id, u, views.count { case (vu, v) => vu == u && v > c - bin && v <= c }.toLong)
    }.toSet
    assert(banded == naive)
  }

  test("BPE-ish pre-tokenizer counts contractions and punctuation runs") {
    // "I'll go, won't you? x2" →
    //   [I]['ll][ go][,][ won]['t][ you][?][ x][2] = 10 pre-tokens
    // (the word-salad fixture never exercises these branches)
    val n = Seq("I'll go, won't you? x2").toDF("text")
      .select(size(regexp_extract_all(col("text"),
        lit(TextAnalysis.BpeTokenRe), lit(0))).as("n"))
      .head().getInt(0)
    assert(n == 10)
  }

  test("count-min estimates never undercount and match exact sans collisions") {
    val rows = TextAnalysis.cmsTopTerms(spark, dir)
      .select("term", "n_exact", "n_cms").as[(String, Long, Long)].collect()
    assert(rows.length == 25)
    assert(rows.forall { case (_, exact, cms) => cms >= exact },
      "CMS must never underestimate")
    // the fixture vocabulary (~30 terms) cannot collide in 1024 buckets
    // across all 4 rows, so the min-of-rows estimate is exact here
    assert(rows.forall { case (_, exact, cms) => cms == exact })
  }

  test("hll estimate tracks exact distincts in both regimes") {
    val out = Events.hllDistinct(spark, dir)
      .select("event_type", "exact_distinct", "hll_estimate")
      .as[(String, Long, Double)].collect()
    assert(out.length == 5)
    out.foreach { case (t, exact, est) =>
      // m=256 → theoretical std error 1.04/√256 ≈ 6.5%; linear counting
      // (the regime at sf0.001's ~200 distincts/type) is tighter
      val err = math.abs(est - exact) / exact
      assert(err <= 0.20, s"$t: estimate $est vs exact $exact (err $err)")
    }
    // partitioning-independence: register maxes and integer state make
    // the sketch identical under any layout
    val repart = Events.hllOf(Tables.events(spark, dir).repartition(17))
      .as[(String, Long, Double)].collect()
    assert(repart.toSet == out.toSet)
  }

  test("bloom semi-join never false-negatives and keeps fp rate near theory") {
    import graft.queries.Relational
    val cust = (0L until 300L).map(k =>
      (k, if (k % 5 == 0) "BUILDING" else "OTHER")).toDF("c_custkey", "c_mktsegment")
    val seg = cust.filter($"c_mktsegment" === "BUILDING").select("c_custkey")
    val orders = (0L until 900L).map(o => (o, o % 300L))
      .toDF("o_orderkey", "o_custkey")
    val (cands, matches) = Relational.bloomParts(seg, orders)
    val cSet = cands.as[(Long, Long)].collect().toSet
    val mSet = matches.as[(Long, Long)].collect().toSet
    assert(mSet.subsetOf(cSet), "bloom dropped a true match (false negative)")
    // m=4096 bits, k=3, 60 keys → fill ≈ 4.3%, fp ≈ 0.008%; allow a
    // generous margin over theory, but a broken hash (all rows pass)
    // must fail loudly
    val fp = (cSet -- mSet).size.toDouble / cSet.size
    assert(fp <= 0.10, s"false-positive rate $fp far above theory")
    // summary row is consistent with the parts on the real fixture
    val row = Relational.bloomSemiJoin(spark, dir)
      .as[(Long, Long, Long, Double)].collect().head
    assert(row._1 == row._2 + row._3 && row._2 > 0)
  }

  test("int8 quantization clamps and rounds half-up") {
    val in = Seq((1L, Array(1.0f, -1.0f, 0.0f, 0.004f, -0.004f, 0.5f, 2.0f, -2.0f)))
    val out = in.toDF("vec_id", "v")
      .select(Similarity.quantize127(col("v")).as("q"))
      .as[Array[Double]].head()
    // floor(x*127 + 0.5) clamped — computed on the float-widened double
    val expect = in.head._2.map(x =>
      math.max(-127.0, math.min(127.0, math.floor(x.toDouble * 127.0 + 0.5))))
    assert(out.toSeq == expect.toSeq)
    assert(out(6) == 127.0 && out(7) == -127.0) // clamp
    assert(out(0) == 127.0 && out(1) == -127.0)
  }

  test("ivfSqTopK with all cells probed equals exact search over the quantized index") {
    // with nprobe = |cells| the IVF layer only partitions the scan —
    // every vector is scored for every query on the same int8 codes, so
    // the ranking must be IDENTICAL to brute force over the quantized
    // index (same integer scores, same vec_id tie-breaks)
    import graft.search.{Ann, Knn}
    val emb = Tables.embeddings(spark, dir)
    val centroids = emb
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"),
        md5(concat(lit("ivf|"), col("vec_id"))).as("r"))
      .orderBy(col("r"), col("cent_id")).limit(16)
      .select(col("cent_id"), col("cvec"))
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val sq = Ann.ivfSqTopK(emb, queries, centroids, k = 10, nprobe = 16)
      .select(col("query_id"), col("rank"), col("vec_id"),
        col("sim").cast("long").as("iscore"))
      .as[(Long, Int, Long, Long)].collect().toSet
    val qemb = emb.select(col("vec_id"),
      transform(Similarity.quantize127(col("embedding")),
        x => x.cast("float")).as("embedding"))
    val qqueries = qemb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = Knn.bruteForceTopK(qemb, qqueries, 10)
      .select(col("query_id"), col("rank"), col("vec_id"),
        col("sim").cast("long").as("iscore"))
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(sq === exact)
    assert(sq.size === 200) // 20 queries × k=10
  }

  test("corpus filter: kept is exactly the conjunction of its flags") {
    val rows = TextAnalysis.corpusFilter(spark, dir)
      .as[(Long, Int, Int, Int, Int, Int, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, len, stop, digit, lang, uniq, kept) =>
      assert(kept == (if (len + stop + digit + lang + uniq == 5) 1 else 0))
    }
  }

  test("tfidf top terms: ranks 1..3, scores non-increasing within a doc") {
    val rows = TextAnalysis.tfidfTop(spark, dir)
      .as[(Long, Int, String, Double)].collect().groupBy(_._1)
    assert(rows.nonEmpty)
    rows.values.foreach { terms =>
      val sorted = terms.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4
        case _ => true
      })
    }
  }

  test("residual IVF-PQ over a single zero centroid degenerates to plain PQ") {
    import graft.search.Ann
    val emb = Tables.embeddings(spark, dir)
    val dim = emb.select(size($"embedding")).head().getInt(0)
    val zero = Seq((0L, Array.fill(dim)(0f))).toDF("cent_id", "cvec")
    // v − 0 = v bit-for-bit, so the residual frame IS the index
    val res = Ann.residuals(emb, zero).select($"vec_id", $"embedding")
    val orig = emb.select($"vec_id", $"embedding")
    assert(res.except(orig).count() == 0 && orig.except(res).count() == 0)
    // …and with dot(q, 0) = 0 the scan reduces to the plain ADC scan:
    // same codebooks → identical ranking (nprobe=1 covers the one cell)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val cw = Ann.sampleCodebooks(emb, m = 8, numCodes = 8, seed = "t")
    val a = Ann.ivfPqResidualTopKWith(emb, queries, zero, 10, 1, 8, cw)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    val b = Ann.pqTopKWith(emb, queries, 10, 8, cw)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    assert(a == b && a.size == 50)
  }

  test("nprobe recall curve is monotone and full probe is exact") {
    val rows = Similarity.annRecallNprobe(spark, dir)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq ==
      Seq("nprobe_1", "nprobe_2", "nprobe_4", "nprobe_8"))
    // probe sets nest → candidate sets nest → an exact-top-k member
    // among the candidates always makes the top-k, so hits are monotone
    assert(rows.sliding(2).forall {
      case Array(a, b) => a._2 <= b._2
      case _ => true
    }, rows.mkString(", "))
    // nprobe=8 probes every cell: float scoring over all rows IS exact
    assert(rows.last._2 == rows.last._3, rows.last.toString)
  }

  test("refined residual IVF-PQ never loses recall vs its unrefined ADC ranking") {
    // TRUE invariant (unlike the heuristic residual>=raw): the refine
    // stage re-ranks the ADC top-50 by exact dot, and the unrefined
    // top-10 is a subset of those candidates — every exact-top-10
    // member among the 50 has a higher true sim than any non-member,
    // so all of them survive the exact re-rank, while ADC could have
    // dropped them. Hence refined hits >= unrefined hits, always.
    val exact = Similarity.knnTopK(spark, dir)
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    def hits(df: org.apache.spark.sql.DataFrame): Int =
      df.select(col("query_id"), col("vec_id"))
        .as[(Long, Long)].collect().toSet.intersect(exact).size
    val refined = hits(Similarity.annIvfPqRefined(spark, dir))
    val unrefined = hits(Similarity.annIvfPqResidualTrained(spark, dir))
    assert(refined >= unrefined, s"refined $refined < unrefined $unrefined")
  }

  test("residual-trained nprobe curve: near-monotone, bounded by the float curve") {
    // The production-shaped index's tuning curve. Unlike the float
    // sweep, monotonicity is expected-not-guaranteed here: widening the
    // probe set adds ADC-scored candidates, and a false positive with
    // an inflated ADC score can displace a true top-k member — so each
    // step may dip by a little, never collapse. Slack = n/20.
    val rows = Similarity.annRecallNprobeResidual(spark, dir)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq ==
      Seq("nprobe_1", "nprobe_2", "nprobe_4", "nprobe_8"))
    val n = rows.head._3
    assert(rows.sliding(2).forall {
      case Array(a, b) => b._2 >= a._2 - n / 20
      case _ => true
    }, rows.mkString(", "))
    // full probe is NOT exact (ADC error remains), but must beat the
    // single-cell scan meaningfully on any non-degenerate corpus
    assert(rows.last._2 > rows.head._2 || rows.head._2 == n,
      rows.mkString(", "))
  }

  test("residual encoding holds recall vs raw-vector IVF-PQ (with slack)") {
    // same coarse cells, same probes, same bytes per row — the residual
    // layout's PQ error applies only to the within-cell remainder, so
    // residual recall ≥ raw is the EXPECTED direction. It is a
    // heuristic, though, not an invariant: with md5-sampled (untrained)
    // codebooks on an arbitrary corpus, residual ADC can rank worse for
    // specific geometries, and the fixtures regenerate every round — so
    // the assertion carries a small slack (5% of n) instead of
    // hard-failing on a corpus where the heuristic narrowly inverts.
    // The oracle-hashed ann_recall rows pin the exact per-corpus values
    // either way; this spec only guards against a gross regression
    // (e.g. residuals computed against the wrong centroid).
    val rows = Similarity.annRecall(spark, dir)
      .as[(String, Long, Long)].collect()
    val hits = rows.map { case (algo, h, _) => algo -> h }.toMap
    val n = rows.head._3
    assert(hits.contains("ann_ivf_pq_residual") && hits.contains("ann_ivf_pq"))
    assert(hits("ann_ivf_pq_residual") >= hits("ann_ivf_pq") - n / 20,
      s"residual ${hits("ann_ivf_pq_residual")} far below raw ${hits("ann_ivf_pq")} (n=$n)")
  }

  test("BPE training reproduces the textbook merge sequence") {
    // Sennrich et al.'s worked example (low×5, lower×2, newest×6,
    // widest×3, no end-of-word marker): hand-derived merges are
    // (e,s,9) [ties (s,t) 9, lexicographic pins e<s], (es,t,9),
    // (l,o,7) [ties (o,w), l<o], (lo,w,7), (e,w,6) [ties (n,e),(w,est)
    // at 6, e<n<w].
    val docs = Seq(
      (0L, ("low " * 5).trim),
      (1L, ("lower " * 2).trim),
      (2L, ("newest " * 6).trim),
      (3L, ("widest " * 3).trim),
    ).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, iters = 5)
      .select(col("rank"), col("left"), col("right"), col("pair_count"))
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L), (5, "e", "w", 6L)),
      s"unexpected merges: $merges")
  }

  test("LSH banding: aligned band candidates nest as rows-per-band grows") {
    // TRUE invariant behind the dedup_recall_bands monotone curve:
    // with aligned band boundaries, all 8 rows of an r=8 band agreeing
    // implies both r=4 half-bands agree implies all r=2 quarter-bands
    // agree — so cands(8) ⊆ cands(4) ⊆ cands(2) (uncapped).
    import graft.dedup.Dedup
    val sh = Dedup.shingleSet(
      graft.Tables.documents(spark, dir), "doc_id", "text").cache()
    val mh = Dedup.minhash(sh, 16).cache()
    def cands(r: Int): Set[(Long, Long)] =
      Dedup.lshCandidates(Dedup.lshBands(mh, r), maxBucket = Int.MaxValue)
        .select(col("a").cast("long"), col("b").cast("long"))
        .as[(Long, Long)].collect().toSet
    val (c2, c4, c8) = (cands(2), cands(4), cands(8))
    assert(c8.subsetOf(c4), s"r=8 candidates escape r=4: ${c8 -- c4}")
    assert(c4.subsetOf(c2), s"r=4 candidates escape r=2: ${c4 -- c2}")
  }

  test("BPE encode reproduces hand-derived segment counts on the textbook corpus") {
    // Applying the five textbook merges: low → [low] (1 symbol),
    // lower → [low, e, r] (3), newest → [n, ew, est] (3),
    // widest → [w, i, d, est] (4).
    val docs = Seq(
      (0L, ("low " * 5).trim),
      (1L, ("lower " * 2).trim),
      (2L, ("newest " * 6).trim),
      (3L, ("widest " * 3).trim),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncodeDocs(docs, iters = 5)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 5L, 5L), (1L, 6L, 2L), (2L, 18L, 6L), (3L, 12L, 3L)),
      s"unexpected encode: $out")
  }

  test("decontaminate_semantic: struct-max agg equals the window argmax") {
    // The scale formulation (map-side-combined max over a
    // (sim, -eval_id) struct) must pick exactly the window formulation's
    // winner — including the lowest-eval_id tie rule the negated id
    // encodes.
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Vec
    val e = graft.Tables.embeddings(spark, dir)
    val ev = e.filter(col("vec_id") < 25)
      .select(col("vec_id").as("eval_id"), col("embedding").as("evec"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("eval_id").asc)
    val windowed = e.filter(col("vec_id") >= 25).crossJoin(ev)
      .select(col("vec_id"), col("eval_id"),
        Vec.dot(col("embedding"), col("evec")).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("eval_id"), round(col("sim"), 4).as("max_sim"))
      .as[(Long, Long, Double)].collect().toSet
    val agg = graft.queries.DedupQueries.decontaminateSemantic(spark, dir)
      .select(col("vec_id"), col("eval_id"), col("max_sim"))
      .as[(Long, Long, Double)].collect().toSet
    assert(agg == windowed)
  }

  test("DSIR: target == raw gives zero scores and empty selection") {
    // TRUE invariant of the importance estimator: when every document
    // is in the target domain, p_target and p_raw are the SAME
    // distribution, every bucket's log ratio is exactly
    // ln((Nr+B)/(Nt+B)) = ln(1) = 0, and nothing clears the positive
    // threshold.
    val docs = Seq(
      (0L, "en", "alpha beta gamma"),
      (1L, "en", "delta alpha epsilon"),
      (2L, "en", "beta beta zeta"),
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.dsirScore(docs)
      .select(col("doc_id"), col("dsir_logratio"), col("selected"))
      .as[(Long, Double, Boolean)].collect()
    assert(out.length == 3)
    assert(out.forall { case (_, s, sel) => s == 0.0 && !sel })
  }

  test("DSIR: disjoint-vocabulary target ranks target docs above the rest") {
    // Construct en/zh corpora with disjoint vocabularies and every
    // token appearing at least twice: en buckets keep ct = cr so
    // λ = ln((Nr+B)/(Nt+B)) > 0, while each zh bucket has ct = 0 and
    // cr+1 > (Nr+B)/(Nt+B), so λ < 0 — selection must be exactly the
    // English docs.
    val docs = Seq(
      (0L, "en", "alpha beta gamma alpha beta gamma"),
      (1L, "en", "delta epsilon delta epsilon alpha beta"),
      (2L, "zh", "uno dos tres uno dos tres"),
      (3L, "zh", "quatro cinco quatro cinco uno dos"),
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.dsirScore(docs)
      .select(col("doc_id"), col("selected"))
      .as[(Long, Boolean)].collect().toMap
    assert(out(0L) && out(1L), s"en docs not selected: $out")
    assert(!out(2L) && !out(3L), s"zh docs selected: $out")
  }

  test("binary quantization with full-index proposal degenerates to exact top-k") {
    // TRUE invariant: when r covers the whole index the Hamming
    // proposal keeps every row, so the exact re-rank IS brute force —
    // the refine stage's contract checked analytically, independent of
    // what the sign bits discard at serving r.
    import graft.search.Ann
    val emb = graft.Tables.embeddings(spark, dir)
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val full = Ann.binaryTopKRefined(emb, queries, Similarity.K, r = n)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .as[(Long, Int, Long)].collect().toSet
    val exact = Similarity.knnTopK(spark, dir)
      .as[(Long, Int, Long)].collect().toSet
    assert(full == exact)
  }

  test("binary oversampling curve is monotone and full-index r is exact") {
    // TRUE invariants: the top-r Hamming cuts nest, and an exact-top-k
    // member among the candidates always survives the exact re-rank,
    // so hits(r) = |exact_topk ∩ C_r| is non-decreasing in r; at r = n
    // the candidate set is everything, so hits = n_queries × k.
    val rows = Similarity.annRecallBinaryR(spark, dir)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    val hits = rows.map(_._2)
    assert(hits.sorted.sameElements(hits), s"curve not monotone: ${rows.toSeq}")
    import graft.search.Ann
    val emb = graft.Tables.embeddings(spark, dir)
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val fullHits = Ann.binaryTopKRefined(emb, queries, Similarity.K, r = n)
      .select(col("query_id"), col("vec_id"))
      .join(Similarity.knnTopK(spark, dir).select(col("query_id"), col("vec_id")),
        Seq("query_id", "vec_id"), "left_semi")
      .count()
    assert(fullHits == Similarity.NumQueries * Similarity.K)
  }

  test("IVF-binary with all cells probed and full proposal equals exact top-k") {
    // TRUE invariant: probing every cell removes the coarse cut and
    // r = n keeps every Hamming candidate, so the exact re-rank IS
    // brute force — the same degeneration contract the float IVF and
    // flat-binary paths carry, here for the composed IndexBinaryIVF.
    import graft.search.Ann
    val emb = graft.Tables.embeddings(spark, dir)
    val n = emb.count().toInt
    val centroids = emb
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"),
        md5(concat(lit("ivf|"), col("vec_id"))).as("r"))
      .orderBy(col("r"), col("cent_id")).limit(16)
      .select(col("cent_id"), col("cvec"))
    val queries = emb.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val full = Ann.ivfBinaryTopK(emb, queries, centroids,
        Similarity.K, r = n, nprobe = 16)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .as[(Long, Int, Long)].collect().toSet
    val exact = Similarity.knnTopK(spark, dir)
      .as[(Long, Int, Long)].collect().toSet
    assert(full == exact)
  }

  test("random-projection search with full-index proposal degenerates to exact top-k") {
    // TRUE invariant (the binary-path degeneration, for the
    // pre-transform): when r covers the whole index the reduced-space
    // proposal keeps every row, so the exact re-rank IS brute force —
    // whatever the projection distorted, nothing was dropped.
    import graft.search.Ann
    val emb = graft.Tables.embeddings(spark, dir)
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val full = Ann.rpTopKRefined(emb, queries, Similarity.K, r = n)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .as[(Long, Int, Long)].collect().toSet
    val exact = Similarity.knnTopK(spark, dir)
      .as[(Long, Int, Long)].collect().toSet
    assert(full == exact)
  }

  test("RP-IVF with full probe + full proposal degenerates to exact top-k") {
    // TRUE invariant: probing every cell makes the reduced-space cut
    // vacuous, r = n keeps every proposal, so the exact full-space
    // re-rank IS brute force — whatever the projection scrambled in
    // assignment or proposal order, nothing was dropped.
    import graft.search.Ann
    val emb = graft.Tables.embeddings(spark, dir)
    val n = emb.count().toInt
    val centroids = emb
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"),
        md5(concat(lit("ivf|"), col("vec_id"))).as("r"))
      .orderBy(col("r"), col("cent_id")).limit(16)
      .select(col("cent_id"), col("cvec"))
    val queries = emb.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val full = Ann.rpIvfTopK(emb, queries, centroids, Similarity.K,
        r = n, nprobe = 16)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .as[(Long, Int, Long)].collect().toSet
    val exact = Similarity.knnTopK(spark, dir)
      .as[(Long, Int, Long)].collect().toSet
    assert(full == exact)
  }

  test("RP recall rises with retained dimensionality (corpus-pinned slack)") {
    // EXPECTED direction, not an invariant: the three sign matrices are
    // independent draws, so their recalls do not nest the way the
    // binary r-cuts do — a pathological corpus could invert a step.
    // Slack n/10 catches the failure that matters (d_64 NOT clearly
    // beating d_04 means the projection machinery is broken, e.g.
    // every dOut collapsing to the same planes).
    val rows = Similarity.annRecallRp(spark, dir)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rows.map(_._1) == Seq("d_04", "d_16", "d_64"))
    val n = rows.head._3
    val h = rows.map(r => r._1 -> r._2).toMap
    assert(h("d_64") > h("d_04") + n / 10,
      s"d_64 ${h("d_64")} not clearly above d_04 ${h("d_04")} (n=$n)")
  }

  test("binary codes: sign bits round-trip and Hamming is layout-independent") {
    // The oracle packs 2×32-bit words, Spark packs 1×64 — equality of
    // the DISTANCES is what the replay rests on. Check the Scala side's
    // popcount sum against a direct per-dimension disagreement count.
    import graft.search.Ann
    val emb = graft.Tables.embeddings(spark, dir)
    val codes = Ann.binaryCodes(emb, "embedding", "vec_id", 64)
      .collect().toMap
    val vecs = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    val ids = vecs.keys.toSeq.sorted.take(20)
    for (a <- ids; b <- ids) {
      val direct = (0 until 64).count(i => (vecs(a)(i) > 0f) != (vecs(b)(i) > 0f))
      val packed = codes(a).zip(codes(b))
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      assert(direct == packed, s"ham($a,$b): direct $direct packed $packed")
    }
  }

  test("embed_clusters is a total partition; sample_cluster quotas are exact") {
    val clusters = Similarity.embedClusters(spark, dir).collect()
    val n = graft.Tables.embeddings(spark, dir).count()
    assert(clusters.length == n, "every vector assigned exactly once")
    val byCluster = clusters.groupBy(_.getLong(1))
    // the window population column must equal the actual group size
    byCluster.foreach { case (cid, rows) =>
      assert(rows.forall(_.getLong(2) == rows.length),
        s"cluster $cid population column disagrees with its row count")
    }
    // sample: per-cluster count = min(50, population), ranks dense from 1,
    // and every sampled vector carries its true cluster
    val sample = Similarity.sampleCluster(spark, dir).collect()
    val assignment = clusters.map(r => r.getLong(0) -> r.getLong(1)).toMap
    sample.foreach(r => assert(assignment(r.getLong(0)) == r.getLong(1),
      s"sampled vec ${r.getLong(0)} carries a foreign cluster id"))
    sample.groupBy(_.getLong(1)).foreach { case (cid, rows) =>
      assert(rows.length == math.min(50, byCluster(cid).length),
        s"cluster $cid quota: ${rows.length} of ${byCluster(cid).length}")
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to rows.length),
        s"cluster $cid ranks not dense")
    }
  }

  test("simhash k=3 blocking loses NO pair vs brute-force Hamming (pigeonhole invariant)") {
    // Hamming <= 3 over 4 byte-blocks forces an exact match on >= 1
    // block, so the blocked candidate set must contain every true pair
    // (no bucket hits the cap on this fixture) — the Manku pigeonhole
    // argument checked against the full n² bit-distance matrix.
    val sigs = graft.dedup.Dedup
      .simhash(graft.Tables.documents(spark, dir), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ids = sigs.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices.iterator
      j <- Iterator.range(i + 1, ids.length)
      h = sigs(ids(i)).zip(sigs(ids(j))).count { case (x, y) => x != y }
      if h <= 3
    } yield (ids(i), ids(j), h)).toSet
    val got = graft.queries.DedupQueries.dedupSimhashK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(brute.nonEmpty, "fixture produced no Hamming<=3 pairs at all")
    assert(got == brute,
      s"blocked ${got.size} pairs vs brute ${brute.size}")
  }

  test("simhash k-pairs: dropped earlier blocks don't suppress later-block emission") {
    // first-match emission must treat a DROPPED earlier block as
    // non-matching, or pairs whose earliest shared bucket was capped
    // would silently vanish even though a surviving later bucket holds
    // them (the lshCandidates "members still pair via other bands"
    // contract). Constructed corpus at cap=2:
    //   id0 = 0…0, id1 = bit in block3, id2 = bit in block1.
    //   blocks 0 and 2 bucket all three ids → dropped (2 audit counts);
    //   (0,1) must emit from block1's surviving bucket, (0,2) from
    //   block3's; (1,2) shares ONLY dropped blocks → the documented
    //   loss.
    val z = "0" * 8
    val sigs = Seq(
      (0L, z + z + z + z),
      (1L, z + z + z + "00000001"),
      (2L, z + "00000001" + z + z))
    val sig = sigs.toDF("id", "simhash")
    val acc = spark.sparkContext.longAccumulator("test.simhash.drops")
    val got = graft.dedup.Dedup
      .simhashKPairs(sig, k = 3, maxBucket = 2, droppedBuckets = Some(acc))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((0L, 1L, 1), (0L, 2L, 1)), s"got $got")
    assert(acc.value == 2L, s"expected 2 dropped blocks, got ${acc.value}")
  }

  test("span_dedup_rewrite: non-first duplicated spans removed, first kept, exact rebuild") {
    // hand-computable fixture: doc 0 holds the first occurrence of
    // "a b c"; doc 1 repeats it (cross-doc dup) plus unique tokens;
    // doc 2 repeats a span WITHIN itself; doc 3 shares nothing; doc 4
    // is shorter than one span and must pass through untouched
    val docs = Seq(
      (0L, "a b c x y"),        // first occurrence of "a b c" — kept whole
      (1L, "u a b c v"),        // "a b c" at p=1 is a non-first occurrence
      (2L, "p q r z p q r"),    // "p q r" repeats within the doc (p=0 first, p=4 dup)
      (3L, "k l m n"),          // unique spans only
      (4L, "s t")               // no spans
    ).toDF("doc_id", "text")
    val out = graft.queries.TextAnalysis.spanDedupRewriteOf(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) == ((5L, 0L, "a b c x y")))
    assert(out(1L) == ((5L, 3L, "u v")))
    // doc 2: dup occurrence at q=4 covers p=4..6 — "z" (p=3) survives
    assert(out(2L) == ((7L, 3L, "p q r z")))
    assert(out(3L) == ((4L, 0L, "k l m n")))
    assert(out(4L) == ((2L, 0L, "s t")))
  }

  test("span_dedup_rewrite: overlapping dup spans union their coverage, no double count") {
    // doc 1 repeats a 4-token window of doc 0: its two overlapping
    // 3-token spans ("a b c" at p=0, "b c d" at p=1) are BOTH
    // non-first occurrences — coverage is the union {0,1,2,3}, so
    // n_removed is 4, not 6
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "a b c d z")
    ).toDF("doc_id", "text")
    val out = graft.queries.TextAnalysis.spanDedupRewriteOf(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) == ((5L, 0L, "a b c d e")))
    assert(out(1L) == ((5L, 4L, "z")))
  }

  test("dedup_canonical: exactly one survivor per cluster, and it is the longest") {
    val rows = graft.queries.DedupQueries.dedupCanonical(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._3).distinct.size == 1 &&
        members.head._3 == members.size, s"cluster $cid size mismatch")
      val kept = members.filter(_._5 == 1)
      assert(kept.size == 1, s"cluster $cid kept ${kept.size} survivors")
      val maxChars = members.map(_._4).max
      assert(kept.head._4 == maxChars, s"cluster $cid survivor not longest")
      // tie discipline: among max-length members, lowest doc_id wins
      assert(kept.head._1 == members.filter(_._4 == maxChars).map(_._1).min)
    }
    assert(byCluster.exists(_._2.size > 1), "fixture should contain a real cluster")
  }

  test("gopher_rules: each rule fires on its designed violation") {
    val fifty = (1 to 50).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      // passes everything: 50 varied words incl. 2 stopwords
      (0L, "the of " + (1 to 48).map(i => s"word$i").mkString(" ")),
      (1L, "the of short doc"),                       // r_words=0 (4 words)
      (2L, "the of " + ("go " * 48).trim),            // r_mwl=0 (mean len < 3)
      (3L, fifty + " the of"),                        // r_stop ok, numeric-ish names still alpha
      (4L, "the of " + ("dup pair " * 24).trim)       // r_rep=0 (top 2-gram dominates)
    ).toDF("doc_id", "text")
    val out = graft.queries.TextAnalysis.gopherRulesOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Int]("gopher_pass") == 1)
    assert(out(1L).getAs[Int]("r_words") == 0 && out(1L).getAs[Int]("gopher_pass") == 0)
    assert(out(2L).getAs[Int]("r_mwl") == 0)
    assert(out(3L).getAs[Int]("r_stop") == 1)
    assert(out(4L).getAs[Int]("r_rep") == 0 && out(4L).getAs[Int]("r_words") == 1)
  }

  test("ngram_novelty: shared shingle halves novelty; unique doc scores 1; short doc absent") {
    // doc 0/1 share shingle "a b c" (df=2); each also holds one unique
    // shingle → novelty 1/2 for both. doc 2 is all-original → 1.0.
    // doc 3 has 2 tokens → no shingles → absent from the output.
    val docs = Seq(
      (0L, "a b c d"),   // shingles: "a b c"(df2), "b c d"(df1)
      (1L, "a b c x"),   // shingles: "a b c"(df2), "b c x"(df1)
      (2L, "p q r s"),   // both shingles unique
      (3L, "s t")        // below shingle length
    ).toDF("doc_id", "text")
    val out = graft.queries.TextAnalysis.ngramNoveltyOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(0L, 1L, 2L))
    assert(out(0L) == ((2L, 1L, 0.5)))
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 2L, 1.0)))
  }

  test("winnowing: shared >= w+k-1 token run shares a fingerprint; density bounded") {
    // winnowing guarantee (Schleimer et al. 2003): with k=3-token
    // shingles and window w=4, any shared token run of length
    // >= w + k - 1 = 6 spans at least one full shared hash window, so
    // the two documents must share that window's min hash. doc 0 and
    // doc 1 share the 6-token run "m1 ... m6" embedded at DIFFERENT
    // offsets amid unrelated context; doc 2 shares nothing.
    val run = (1 to 6).map(i => s"m$i").mkString(" ")
    val docs = Seq(
      (0L, s"u1 u2 u3 $run u4 u5"),
      (1L, s"v1 $run v2 v3 v4 v5"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8")
    ).toDF("doc_id", "text")
    val fps = graft.queries.TextAnalysis.winnowFingerprintOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(0L) & byDoc(1L)).nonEmpty, "guaranteed shared fingerprint missing")
    assert((byDoc(0L) & byDoc(2L)).isEmpty && (byDoc(1L) & byDoc(2L)).isEmpty)
    // density: never more fingerprints than full windows (nh - w + 1),
    // and every >=3-token doc keeps at least one
    for ((d, n) <- Seq(0L -> 11, 1L -> 11, 2L -> 8)) {
      val nh = n - 2 // 3-gram count
      assert(byDoc(d).nonEmpty && byDoc(d).size <= math.max(1, nh - 3))
    }
  }

  test("ppl_bucket: buckets are score-monotone terciles consistent with bigram_lm") {
    val scores = graft.queries.TextAnalysis.bigramLm(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val out = graft.queries.TextAnalysis.pplBucket(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(out.map(_._1).toSet == scores.keySet) // total partition of scored docs
    out.foreach { case (id, lp, _) => assert(lp == scores(id)) }
    val byB = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byB.keySet == Set("head", "middle", "tail"))
    // score-monotone: every head score >= every middle score >= every tail
    assert(byB("head").min >= byB("middle").max)
    assert(byB("middle").min >= byB("tail").max)
    // tercile boundaries respected up to the straddling-value rule: the
    // head never exceeds floor(n/3), head+middle never floor(2n/3)
    val n = out.length
    assert(byB("head").size <= n / 3)
    assert(byB("head").size + byB("middle").size <= 2 * n / 3)
  }

  test("dedup_winnow: long shared run pairs up; unrelated doc never does; cap audited") {
    // doc 0/1 share a 10-token run → 5 full shared hash windows → well
    // past the shared >= 2 bar regardless of which mins win. doc 2
    // shares no token with either → no common shingle hash, so no
    // common fingerprint is even possible.
    val long = (1 to 10).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (0L, s"x1 x2 $long x3 x4"),
      (1L, s"y1 $long y2 y3"),
      (2L, "z1 z2 z3 z4 z5 z6 z7 z8")
    ).toDF("doc_id", "text")
    val pairs = graft.queries.DedupQueries.dedupWinnowOf(docs, 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) >= 2)
    assert(pairs.keySet == Set((0L, 1L)))
    // cap 1 drops every shared fingerprint (df = 2 > 1) → no pairs at all
    assert(graft.queries.DedupQueries.dedupWinnowOf(docs, 1).count() == 0)
  }

  test("dedup_containment: whole-quote inclusion found in the right direction only") {
    // doc 0's entire shingle set lives inside doc 1 (a quote/excerpt):
    // containment(0 in 1) = 3/3 = 1.0, but the reverse is 3/9 and the
    // symmetric Jaccard is 3/(3+9-3) = 1/3 — the subset case the
    // symmetric detectors structurally miss. doc 2 shares nothing.
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "p q r a b c d e s t u"),
      (2L, "z1 z2 z3 z4 z5")
    ).toDF("doc_id", "text")
    val out = graft.queries.DedupQueries.dedupContainmentOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.keySet == Set((0L, 1L)), "only the a-contained-in-b direction passes 0.5")
    assert(out((0L, 1L)) == 1.0)
    // the contrast that motivates the operator: true Jaccard on the same
    // pair sits at 1/3, far below the symmetric member's 0.8 bar
    val jac = graft.dedup.Dedup.pairJaccard(
        graft.dedup.Dedup.shingleSet(docs, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(jac((0L, 1L)) - 1.0 / 3.0) < 1e-12)
  }

  test("dedup_containment: identical docs contain each other both ways; degenerate corpora are empty") {
    val same = Seq((0L, "a b c d"), (1L, "a b c d")).toDF("doc_id", "text")
    val m = graft.queries.DedupQueries.dedupContainmentOf(same).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m == Map((0L, 1L) -> 1.0, (1L, 0L) -> 1.0),
      "identical docs must emit BOTH ordered directions at 1.0")
    // a singleton corpus and an all-short corpus (< 3 tokens → no
    // shingles) both produce zero pairs, not an error
    val single = Seq((5L, "a b c d e f")).toDF("doc_id", "text")
    assert(graft.queries.DedupQueries.dedupContainmentOf(single).count() == 0)
    val short = Seq((0L, "a b"), (1L, "a b")).toDF("doc_id", "text")
    assert(graft.queries.DedupQueries.dedupContainmentOf(short).count() == 0)
  }

  test("dedup_minhash_estimate: per-pair estimator rows are internally consistent") {
    val rows = graft.queries.DedupQueries.dedupMinhashEstimate(spark, dir).collect()
    assert(rows.nonEmpty)
    // one row per verified pair, same pair set as dedup_minhash_lsh
    val lsh = graft.queries.DedupQueries.dedupMinhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == lsh)
    rows.foreach { r =>
      val (jac, m, est, err) =
        (r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5))
      assert(m >= 0 && m <= 16)
      assert(est == math.floor(m / 16.0 * 1e4 + 0.5) / 1e4)
      // |est − jac| must match the reported error to rounding width
      assert(math.abs(math.abs(est - jac) - err) <= 2e-4, r.toString)
      // verified pairs sit at jac ≥ 0.7: a 16-perm estimator more than
      // 6σ off (σ ≈ 0.115) would mean a broken permutation family
      assert(err <= 0.7, r.toString)
    }
  }

  test("dup_cross_source: per-detector cells partition each pair set; pairs ordered") {
    val rows = graft.queries.DedupQueries.dupCrossSource(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.map(_._1).toSet.subsetOf(Set("minhash", "containment", "winnow")))
    // unordered-pair emission: source_a <= source_b on every row, once
    // per detector
    rows.foreach { case (_, a, b, _) => assert(a <= b) }
    assert(rows.map(t => (t._1, t._2, t._3)).distinct.length == rows.length)
    // the minhash cells partition the verified pair set exactly
    val mhTotal = graft.queries.DedupQueries.dedupMinhashLsh(spark, dir).count()
    assert(rows.filter(_._1 == "minhash").map(_._4).sum == mhTotal)
    // the containment cells partition the UNORDERED containment pair set
    val cnt = graft.queries.DedupQueries.dedupContainment(spark, dir).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).distinct.length
    assert(rows.filter(_._1 == "containment").map(_._4).sum == cnt)
    // the winnow cells partition the run-detector pair set
    val wn = graft.queries.DedupQueries.dedupWinnow(spark, dir).count()
    assert(rows.filter(_._1 == "winnow").map(_._4).sum == wn)
  }

  test("crossSourceMatrix: a containment-only quote pair appears under its own detector") {
    // the quote-inside-long-doc shape the detector exists for: doc 1 is
    // a short excerpt of doc 0 (containment ≈ 1, Jaccard tiny) and NO
    // minhash pair exists — the governance matrix must still show the
    // cross-feed republication
    val long0 = (0 until 40).map(i => s"w$i").mkString(" ")
    val quote = (10 until 18).map(i => s"w$i").mkString(" ")
    val docs = Seq((0L, long0), (1L, quote)).toDF("doc_id", "text")
    val src = Seq((0L, "feedX"), (1L, "feedY")).toDF("doc_id", "source")
    val cnt = graft.queries.DedupQueries.dedupContainmentOf(docs)
      .select(col("a"), col("b"))
    val mh = Seq.empty[(Long, Long)].toDF("a", "b")
    val wn = Seq.empty[(Long, Long)].toDF("a", "b")
    val rows = graft.queries.DedupQueries.crossSourceMatrix(src, mh, cnt, wn)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(rows.toSeq == Seq(("containment", "feedX", "feedY", 1L)),
      rows.mkString("; "))
  }

  test("crossSourceMatrix: a shared-run pair only the winnow detector catches") {
    // round-15 verdict #5: republication-with-edits — a 12-token run
    // shared between two otherwise-unrelated 60-token documents. The
    // run is ~17% of either shingle set, so symmetric Jaccard (>= 0.7)
    // and Broder containment (>= 0.5) both structurally miss it; the
    // winnowing guarantee (>= w+2 shared tokens => shared fingerprint)
    // still fires. The governance matrix must show the cross-feed cell.
    val run = (0 until 12).map(i => s"r$i")
    val docA = (0 until 30).map(i => s"a$i") ++ run ++ (0 until 20).map(i => s"b$i")
    val docB = (0 until 25).map(i => s"c$i") ++ run ++ (0 until 25).map(i => s"d$i")
    val docs = Seq((0L, docA.mkString(" ")), (1L, docB.mkString(" ")))
      .toDF("doc_id", "text")
    val src = Seq((0L, "feedX"), (1L, "feedY")).toDF("doc_id", "source")
    // both set detectors miss, run the REAL paths to prove it
    assert(graft.queries.DedupQueries.dedupContainmentOf(docs).count() == 0)
    assert(graft.dedup.Dedup.pairJaccard(
      graft.dedup.Dedup.shingleSet(docs, "doc_id", "text"))
      .filter(col("jac") >= 0.7).count() == 0)
    val wn = graft.queries.DedupQueries.dedupWinnowOf(docs, 1000)
      .select(col("a"), col("b"))
    assert(wn.count() == 1, "the run detector must fire")
    val mh = Seq.empty[(Long, Long)].toDF("a", "b")
    val cnt = Seq.empty[(Long, Long)].toDF("a", "b")
    val rows = graft.queries.DedupQueries.crossSourceMatrix(src, mh, cnt, wn)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(rows.toSeq == Seq(("winnow", "feedX", "feedY", 1L)),
      rows.mkString("; "))
  }

  test("tokensJvm replicates Catalyst trim+split exactly (tabs, newlines, boundary empties)") {
    // ADVICE r14: the winnow flatMap tokenized with Java String.trim
    // (strips all chars <= U+0020, drops trailing empty tokens) while
    // Catalyst/DuckDB trim spaces only and keep boundary empties — so
    // "a b c\n" shingled differently across the engines. tokensJvm is
    // the JVM-side replica; this pins it to the Catalyst expression on
    // exactly the strings where the two semantics diverge.
    val tricky = Seq(
      "a b c", "  a b c  ", "\ta b c\n", "a\tb\nc", "a b c\n", "\n a b ",
      "", " ", "\t", "a", "a\u00a0b", "x  y\t\tz ", "\r\na b\r\n")
    val fromCatalyst = tricky.toDF("text")
      .select(graft.text.TextFns.tokens(col("text")).as("t"))
      .as[Seq[String]].collect()
    tricky.zip(fromCatalyst).foreach { case (s, cat) =>
      val shown = s.replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r")
      assert(graft.text.TextFns.tokensJvm(s).toSeq == cat, s"for '$shown'")
    }
  }

  test("tokensJvm == Catalyst tokens on random whitespace-heavy strings (property)") {
    // short random strings over a whitespace-heavy alphabet hit the
    // boundary-empty-token and mixed-whitespace cases near-exhaustively;
    // one batched Catalyst evaluation keeps it a single Spark job
    val rnd = new scala.util.Random(1234)
    val chars = "ab \t\n\r  "
    val strs = (0 until 300).map { _ =>
      val n = rnd.nextInt(12)
      (0 until n).map(_ => chars(rnd.nextInt(chars.length))).mkString
    }.distinct
    val cat = strs.toDF("text")
      .select(graft.text.TextFns.tokens(col("text")).as("t"))
      .as[Seq[String]].collect()
    strs.zip(cat).foreach { case (s, c) =>
      assert(graft.text.TextFns.tokensJvm(s).toSeq == c,
        s"for ${s.map(ch => f"\\u${ch.toInt}%04x").mkString}")
    }
  }

  test("winnow_spans: span brackets the plagiarized run on a constructed fixture") {
    // the MOSS case: a 30-token run R plagiarized between two otherwise
    // unrelated documents (all context tokens unique per doc). Shared
    // fingerprints can only hash trigrams fully inside R, so the span
    // bounds must land inside R's shingle-index range in each doc.
    val run = (0 until 30).map(i => s"r$i")
    val docA = (0 until 20).map(i => s"a$i") ++ run ++ (0 until 20).map(i => s"b$i")
    val docB = (0 until 15).map(i => s"c$i") ++ run ++ (0 until 25).map(i => s"d$i")
    val docs = Seq((0L, docA.mkString(" ")), (1L, docB.mkString(" ")))
      .toDF("doc_id", "text")
    val rows = graft.queries.DedupQueries.winnowSpansOf(docs, 1000).collect()
    assert(rows.length == 1, rows.mkString("; "))
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) == (0L, 1L))
    assert(r.getLong(2) >= 2, s"expected >=2 shared fingerprints, got ${r.getLong(2)}")
    // run-interior shingle indices: [20, 47] in A, [15, 42] in B
    assert(r.getInt(3) >= 20 && r.getInt(4) <= 47, r.toString)
    assert(r.getInt(5) >= 15 && r.getInt(6) <= 42, r.toString)
    assert(r.getInt(3) <= r.getInt(4) && r.getInt(5) <= r.getInt(6))
    // pair list + shared counts agree with dedup_winnow (same postings,
    // same cap, same >=2 bar)
    val dw = graft.queries.DedupQueries.dedupWinnowOf(docs, 1000).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(dw == Seq((r.getLong(0), r.getLong(1), r.getLong(2))))
  }

  test("winnow_runs: two separated plagiarized runs yield two rows, not one span") {
    // the round-15 verdict case winnowSpans cannot express: two 20-token
    // runs shared at OPPOSITE ends of a long document — the single
    // min/max bracket covers ~the whole document (mostly unmatched
    // text), while the segmented report must emit one row per run with
    // tight per-run bounds in BOTH documents.
    val r1 = (0 until 20).map(i => s"x$i")
    val r2 = (0 until 20).map(i => s"y$i")
    val docA = r1 ++ (0 until 100).map(i => s"a$i") ++ r2
    val docB = (0 until 10).map(i => s"c$i") ++ r1 ++
      (0 until 30).map(i => s"d$i") ++ r2 ++ (0 until 10).map(i => s"e$i")
    val docs = Seq((0L, docA.mkString(" ")), (1L, docB.mkString(" ")))
      .toDF("doc_id", "text")
    val runs = graft.queries.DedupQueries.winnowRunsOf(docs, 1000).collect()
    assert(runs.length == 2, runs.mkString("; "))
    val Array(run0, run1) = runs
    assert((run0.getLong(0), run0.getLong(1), run0.getLong(2)) == (0L, 1L, 0L))
    assert((run1.getLong(0), run1.getLong(1), run1.getLong(2)) == (0L, 1L, 1L))
    // each run is contiguous in b too — a single b-cluster per run
    assert(run0.getLong(3) == 0L && run1.getLong(3) == 0L)
    // r1's fully-interior shingles: A [0, 17], B [10, 27]; r2's:
    // A [120, 137], B [60, 77] — each run's bounds must stay inside
    assert(run0.getInt(5) >= 0 && run0.getInt(6) <= 17, run0.toString)
    assert(run0.getInt(7) >= 10 && run0.getInt(8) <= 27, run0.toString)
    assert(run1.getInt(5) >= 120 && run1.getInt(6) <= 137, run1.toString)
    assert(run1.getInt(7) >= 60 && run1.getInt(8) <= 77, run1.toString)
    // the un-segmented span report on the same fixture: ONE row whose
    // bracket spans both runs — the overstatement winnow_runs retires
    val span = graft.queries.DedupQueries.winnowSpansOf(docs, 1000).collect()
    assert(span.length == 1)
    assert(span.head.getInt(3) <= 17 && span.head.getInt(4) >= 120,
      span.head.toString)
    // segmentation is a partition of the pair's shared fingerprints
    assert(runs.map(_.getLong(4)).sum == span.head.getLong(2))
  }

  test("winnow_runs: a run scattered in document b is reported per b-side cluster") {
    // the round-16 verdict #6 case a-side segmentation cannot express:
    // document a carries ONE contiguous passage that document b stores
    // as two distant fragments — the old single b-bracket spanned b's
    // 80 tokens of unrelated filler; the b-side gap rule must emit one
    // row per b-cluster with tight per-cluster bounds.
    val half1 = (0 until 30).map(i => s"p$i")
    val half2 = (0 until 30).map(i => s"q$i")
    val docA = (0 until 10).map(i => s"a$i") ++ half1 ++ half2 ++
      (0 until 10).map(i => s"z$i")
    val docB = half1 ++ (0 until 80).map(i => s"f$i") ++ half2
    val docs = Seq((0L, docA.mkString(" ")), (1L, docB.mkString(" ")))
      .toDF("doc_id", "text")
    val rows = graft.queries.DedupQueries.winnowRunsOf(docs, 1000).collect()
    assert(rows.length >= 2, rows.mkString("; "))
    // no row may bracket across b's filler: fragment 1 ends by shingle
    // ~27, fragment 2 starts at ~110 — every cluster's b-span is tight
    assert(rows.forall(r => r.getInt(8) - r.getInt(7) <= 40),
      rows.mkString("; "))
    assert(rows.exists(_.getInt(8) <= 35) && rows.exists(_.getInt(7) >= 100),
      rows.mkString("; "))
    // the clusters still partition the pair's shared fingerprints
    val span = graft.queries.DedupQueries.winnowSpansOf(docs, 1000).collect()
    assert(span.length == 1)
    assert(rows.map(_.getLong(4)).sum == span.head.getLong(2))
    // and the pair-level bracket is the overstatement being retired
    assert(span.head.getInt(5) <= 35 && span.head.getInt(6) >= 100,
      span.head.toString)
  }

  test("winnow_rewrite: excised republication no longer pairs with its source; clean docs byte-identical") {
    // report→act for the winnow detector family (round-16 verdict #5):
    // doc 1 republishes doc 0 verbatim; doc 2 is unrelated. After the
    // rewrite the canonical and clean docs are byte-identical, the
    // duplicate lost its matched windows, and re-running the DETECTOR
    // over the rewritten corpus finds nothing — the governance loop
    // closes.
    val src = (0 until 60).map(i => s"s$i").mkString(" ")
    val clean = (0 until 40).map(i => s"u$i").mkString(" ")
    val docs = Seq((0L, src), (1L, src), (2L, clean)).toDF("doc_id", "text")
    val out = graft.queries.DedupQueries.winnowRewriteOf(docs, 1000).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(0L) == ((src, 0L)), out(0L).toString)
    assert(out(2L) == ((clean, 0L)), out(2L).toString)
    assert(out(1L)._2 > 0, out(1L).toString)
    val rewritten = out.toSeq.map { case (id, (t, _)) => (id, t) }
      .toDF("doc_id", "text")
    val pairs = graft.queries.DedupQueries.dedupWinnowOf(rewritten, 1000)
      .collect()
    assert(pairs.isEmpty, pairs.mkString("; "))
  }

  test("winnow_runs: one contiguous run stays one row (no spurious splits)") {
    // within a single shared region winnowing selects >=1 fingerprint
    // per w windows, so consecutive shared positions sit <= WinnowRunGap
    // apart and the segmenter must not split — the spec guards the gap
    // constant against the selection density it encodes
    val run = (0 until 40).map(i => s"r$i")
    val docA = (0 until 20).map(i => s"a$i") ++ run ++ (0 until 20).map(i => s"b$i")
    val docB = (0 until 15).map(i => s"c$i") ++ run ++ (0 until 25).map(i => s"d$i")
    val docs = Seq((0L, docA.mkString(" ")), (1L, docB.mkString(" ")))
      .toDF("doc_id", "text")
    val runs = graft.queries.DedupQueries.winnowRunsOf(docs, 1000).collect()
    assert(runs.length == 1, runs.mkString("; "))
    assert(runs.head.getLong(2) == 0L && runs.head.getLong(3) == 0L)
  }

  test("bpe_fertility: per-source sums reconcile with the per-doc encode frame") {
    val enc = graft.queries.TextAnalysis.bpeEncode(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = graft.queries.TextAnalysis.bpeFertility(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (s, nDocs, nBpe, nW, fert) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      // toSeq before mapping: keys is a Set, and mapping ids to counts
      // over a Set would deduplicate equal counts before the sum
      val docs = enc.keys.toSeq.filter(id => src(id) == s)
      assert(docs.size == nDocs, s"$s n_docs")
      assert(docs.map(enc(_)._1).sum == nBpe, s"$s n_bpe_tokens")
      assert(docs.map(enc(_)._2).sum == nW, s"$s n_words")
      // merges can only compress: fertility in (0, 1]... strictly, a
      // word with no applicable merge stays at its character count, so
      // fertility can exceed 1 per WORD count? No — n_bpe counts symbols
      // AFTER merges over words, and a word of k chars starts at k
      // symbols, so fertility = symbols/word >= 1 unless every word is
      // a single char. Assert the sane range instead:
      assert(fert >= 1.0 || nW == 0, s"$s fertility $fert")
      assert(math.abs(fert - math.floor(nBpe.toDouble / nW * 1e4 + 0.5) / 1e4) <= 1e-9
        || math.abs(fert - nBpe.toDouble / nW) <= 5e-5, s"$s rounding")
    }
  }

  test("pack_stats: internally consistent with the packing frame") {
    val cap = 2048
    val packed = graft.queries.TextAnalysis.packSequences(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))) // bucket, n_tokens, start
    val stats = graft.queries.TextAnalysis.packStats(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    assert(stats.values.map(_._1).sum == packed.length) // n_docs partitions corpus
    for ((bucket, (nDocs, nTok, nSplit, nSeqs, fill)) <- stats) {
      val rows = packed.filter(_._1 == bucket)
      assert(rows.length == nDocs)
      assert(rows.map(_._2).sum == nTok)
      // straddle count recomputed independently
      val split = rows.count { case (_, t, s) =>
        t > 0 && s / cap != (s + t - 1) / cap }
      assert(split == nSplit, s"bucket $bucket split")
      assert(nSeqs == (nTok + cap - 1) / cap)
      assert(fill > 0.0 && fill <= 1.0)
      // allocated capacity always covers the tokens
      assert(nSeqs * cap >= nTok)
    }
  }

  test("decontaminate_spans: the span brackets a benchmark question quoted mid-document") {
    // production decontamination excises the contaminated WINDOW: a
    // 10-token eval question quoted at token offset 25 of an otherwise
    // clean 60-token document must yield a span inside the quote's
    // shingle range, and the fully-clean document must not appear
    val q = (0 until 10).map(i => s"q$i")
    val doc0 = (0 until 25).map(i => s"u$i") ++ q ++ (0 until 25).map(i => s"v$i")
    val doc1 = (0 until 40).map(i => s"w$i")
    val docs = Seq((0L, doc0.mkString(" ")), (1L, doc1.mkString(" ")))
      .toDF("doc_id", "text")
    val ev = Seq(("qA", q.mkString(" "))).toDF("query_id", "qtext")
    val rows = graft.queries.DedupQueries.decontaminateSpansOf(docs, ev).collect()
    assert(rows.length == 1, rows.mkString("; "))
    val r = rows.head
    assert(r.getLong(0) == 0L && r.getString(1) == "qA")
    // the quote's fully-interior shingles sit at doc indices [25, 32];
    // all 8 of the question's shingles appear there
    assert(r.getLong(2) == 8L, r.toString)
    assert(r.getInt(3) == 25 && r.getInt(4) == 32, r.toString)
  }

  test("decontaminate_rewrite: excises the quoted window, keeps every other token") {
    // the round-15 verdict #4 contract: after the rewrite, the text
    // contains ZERO eval-set shingles while retaining all non-span
    // tokens; clean documents pass through byte-identical
    val q = (0 until 10).map(i => s"q$i")
    val u = (0 until 25).map(i => s"u$i")
    val v = (0 until 25).map(i => s"v$i")
    val docs = Seq((0L, (u ++ q ++ v).mkString(" ")),
      (1L, (0 until 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val ev = Seq(("qA", q.mkString(" "))).toDF("query_id", "qtext")
    val rows = graft.queries.DedupQueries.decontaminateRewriteOf(docs, ev)
      .collect()
    assert(rows.length == 2)
    val Array(r0, r1) = rows
    // doc 0: span [25, 32] covers tokens [25, 34] — exactly the quote
    assert(r0.getString(1) == (u ++ v).mkString(" "), r0.getString(1))
    assert(r0.getLong(2) == 10L)
    // no rewritten 3-gram may be an eval shingle (incl. the cut junction)
    val evalShingles = q.sliding(3).map(_.mkString(" ")).toSet
    val rewritten = graft.text.TextFns.tokensJvm(r0.getString(1))
      .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    assert(rewritten.intersect(evalShingles).isEmpty)
    // clean doc passes through untouched
    assert(r1.getString(1) == (0 until 40).map(i => s"w$i").mkString(" "))
    assert(r1.getLong(2) == 0L)
  }

  test("decontaminate_rewrite: overlapping spans from two queries mask their union") {
    // two eval questions quoting OVERLAPPING regions: tokens [10, 21]
    // and [16, 27] — the union [10, 29] (span end +2 token cover) must
    // come out, each surviving token exactly once
    val base = (0 until 40).map(i => s"t$i")
    val docs = Seq((0L, base.mkString(" "))).toDF("doc_id", "text")
    val ev = Seq(("qA", base.slice(10, 20).mkString(" ")),
      ("qB", base.slice(16, 26).mkString(" "))).toDF("query_id", "qtext")
    val rows = graft.queries.DedupQueries.decontaminateRewriteOf(docs, ev)
      .collect()
    assert(rows.length == 1)
    // qA shingle span [10, 17] -> tokens [10, 19]; qB [16, 23] -> [16, 25]
    val expect = (base.take(10) ++ base.drop(26)).mkString(" ")
    assert(rows.head.getString(1) == expect, rows.head.getString(1))
    assert(rows.head.getLong(2) == 16L)
  }

  test("winnow_spans agrees with dedup_winnow across the fixture corpus") {
    val sp = graft.queries.DedupQueries.winnowSpans(spark, dir).collect()
    val dw = graft.queries.DedupQueries.dedupWinnow(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(sp.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq == dw)
    sp.foreach { x =>
      assert(x.getInt(3) <= x.getInt(4) && x.getInt(5) <= x.getInt(6), x.toString)
      assert(x.getInt(3) >= 0 && x.getInt(5) >= 0, x.toString)
    }
  }

  test("quality_lr_calibration: a reliability table that partitions the corpus") {
    val rows = graft.queries.Quality.qualityLrCalibration(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.map(_._1).forall(b => b >= 0 && b <= 9))
    assert(rows.map(_._1).distinct.length == rows.length)
    // bins partition the scored corpus exactly
    val n = graft.queries.Quality.qualityLr(spark, dir).count()
    assert(rows.map(_._2).sum == n)
    rows.foreach { case (bin, nd, np, mean, frac, gap) =>
      assert(np >= 0 && np <= nd)
      // the mean predicted score lies inside its own decile
      assert(mean >= bin / 10.0 - 1e-9 && mean <= (bin + 1) / 10.0 + 1e-9)
      assert(frac >= 0.0 && frac <= 1.0)
      assert(math.abs(gap - math.abs(mean - frac)) <= 2e-4)
    }
  }

  test("vocab_growth: monotone nested curves ending at the corpus totals") {
    val rows = graft.queries.TextAnalysis.vocabGrowth(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._2 >= a._2 && b._3 >= a._3)
      case _ => ()
    }
    // the last row IS the whole corpus: total instances + total vocab
    val toks = Tables.documents(spark, dir)
      .select(explode(graft.text.TextFns.tokens(col("text"))).as("tok"))
    assert(rows.last._2 == toks.count())
    assert(rows.last._3 == toks.distinct().count())
    // a prefix can never hold more distinct tokens than instances
    rows.foreach { case (_, n, v) => assert(v <= n) }
  }

  test("AUC rank statistic: separation=1, inversion=0, all-tied=0.5, interleave exact") {
    def auc(rows: Seq[(Int, Double)]): Double =
      graft.queries.Quality.aucOf(rows.toDF("label", "score"))
        .head().getAs[Double]("auc")
    val pos = Seq.tabulate(5)(i => (1, 0.6 + i * 0.01))
    val neg = Seq.tabulate(5)(i => (0, 0.1 + i * 0.01))
    assert(auc(pos ++ neg) == 1.0)
    assert(auc(pos.map { case (_, s) => (0, s) } ++
      neg.map { case (_, s) => (1, s) }) == 0.0)
    assert(auc(Seq((1, 0.5), (1, 0.5), (0, 0.5), (0, 0.5))) == 0.5)
    // one inverted pair among perfectly separated 2+2: AUC = 3/4
    assert(auc(Seq((1, 0.9), (0, 0.8), (1, 0.7), (0, 0.1))) == 0.75)
  }

  test("pii_by_source: planted PII counts per category; clean feeds report zero") {
    val docs = Seq(
      ("feedA", "contact bob@example.com or alice@test.org today"),
      ("feedA", "server at 10.0.0.1 answered"),
      ("feedA", "nothing sensitive here"),
      ("feedB", "call 555-123-4567 or 555 987 6543 now"),
      ("feedC", "perfectly clean text")
    ).toDF("source", "text")
    val rows = TextAnalysis.piiBySourceOf(docs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    assert(rows("feedA") == ((3L, 2L, 2L, 1L, 0L, 0.6667)))
    assert(rows("feedB") == ((1L, 1L, 0L, 0L, 2L, 1.0)))
    assert(rows("feedC") == ((1L, 0L, 0L, 0L, 0L, 0.0)))
  }

  test("mine_hard_negatives: every mined negative has a different label than its anchor") {
    val emb = Tables.embeddings(spark, dir)
    val anchorLabel = emb.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Similarity.mineHardNegatives(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to g.length), s"$q ranks")
      g.foreach { case (_, _, v, l) =>
        assert(l != anchorLabel(q), s"negative $v shares anchor $q's label")
      }
    }
  }

  test("embed_pca: a one-axis corpus recovers e0 with eigenvalue 1; loadings unit-norm on the fixture") {
    // vectors +/-e0 in equal measure: mean 0, C = diag(1, 0, ...) after
    // snapping - one power step lands exactly on e0, lambda = 1
    val pm = (0 until 8).map { i =>
      val v = Array.fill(4)(0f); v(0) = if (i % 2 == 0) 1f else -1f
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val rows = Similarity.embedPcaOf(pm, 4)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == (0 until 4))
    assert(math.abs(rows.head._2) == 1.0, s"e0 loading ${rows.head._2}")
    rows.tail.foreach(r => assert(r._2 == 0.0, s"dim ${r._1} loading ${r._2}"))
    assert(rows.head._3 == 1.0, s"lambda ${rows.head._3}")
    // fixture: the returned component is (snapped-then-rounded) unit
    val fx = Similarity.embedPca(spark, dir)
      .collect().map(_.getDouble(1))
    val norm2 = fx.map(v => v * v).sum
    assert(math.abs(norm2 - 1.0) < 1e-3, s"loading norm^2 $norm2")
  }

  test("embed_abtt: removed eigenvalue equals embed_pca's; anisotropy drops to the centered-identity value") {
    val row = Similarity.embedAbtt(spark, dir).collect().head
    val n = row.getLong(0)
    val lambda = row.getDouble(1)
    val before = row.getDouble(2)
    val after = row.getDouble(3)
    val pcaLambda = Similarity.embedPca(spark, dir)
      .select(col("lambda")).distinct().collect().head.getDouble(0)
    assert(lambda == pcaLambda, s"abtt $lambda vs pca $pcaLambda")
    // centering forces the sum vector to ~0, so the expected pairwise
    // cosine of the re-normalized vectors sits at ~ -1/(n-1) — the
    // analytic identity, measured (and strictly below the raw value)
    assert(after < before, s"after $after not below before $before")
    assert(math.abs(after - (-1.0 / (n - 1))) < 5e-4,
      s"after $after vs centered identity ${-1.0 / (n - 1)}")
  }

  test("embed_abtt_d: deflated ladder non-increasing; rung 1 reproduces embed_abtt") {
    val rows = Similarity.embedAbttD(spark, dir).collect()
      .map(r => (r.getInt(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getDouble(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0 to Similarity.AbttD),
      s"rungs ${rows.map(_._1).toSeq}")
    assert(rows.head._2.isEmpty, "comp 0 must carry no eigenvalue")
    // deflation extracts the top of the residual spectrum, so the λ
    // ladder is non-increasing — λ₂ ≤ λ₁ (and both positive here)
    val l1 = rows(1)._2.get
    val l2 = rows(2)._2.get
    assert(l2 <= l1 && l1 > 0, s"lambda ladder not non-increasing: $l1, $l2")
    // rung 1 IS embed_abtt's configuration: same λ, same before/after
    val ab = Similarity.embedAbtt(spark, dir).collect().head
    assert(l1 == ab.getDouble(1), s"rung-1 lambda $l1 vs embed_abtt")
    assert(rows(0)._3 == ab.getDouble(2), "rung-0 aniso != abtt before")
    assert(rows(1)._3 == ab.getDouble(3), "rung-1 aniso != abtt after")
  }

  test("embed_anisotropy: identical vectors measure 1.0, an orthonormal set measures 0.0") {
    def frame(vs: Seq[Array[Float]]) =
      vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
    val u = Array.fill(4)(0.5f) // unit vector
    val same = Similarity.embedAnisotropyOf(frame(Seq.fill(6)(u)))
      .collect().head
    assert(same.getLong(0) == 6 && same.getDouble(1) == 1.0)
    assert(same.getDouble(2) == 1.0, s"identical-vector anisotropy $same")
    val basis = (0 until 4).map { i =>
      val a = Array.fill(4)(0f); a(i) = 1f; a
    }
    val ortho = Similarity.embedAnisotropyOf(frame(basis)).collect().head
    assert(ortho.getDouble(2) == 0.0, s"orthonormal anisotropy $ortho")
  }

  test("tok_entropy: uniform doc hits ln(n)/evenness 1, constant doc hits 0, bounds hold") {
    val docs = Seq(
      (1L, "a b c d"),          // all distinct: H = ln 4, evenness = 1
      (2L, "x x x x x"),        // constant: H = 0, evenness = 0 (guard)
      (3L, "a a b b b b")       // mixed: 0 < H < ln 2... < ln n
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.tokEntropyOf(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows(1L)._3 == math.floor(math.log(4.0) * 1e4 + 0.5) / 1e4)
    assert(rows(1L)._4 == 1.0)
    assert(rows(2L)._3 == 0.0 && rows(2L)._4 == 0.0)
    val (n3, d3, h3, e3) = rows(3L)
    assert(n3 == 6 && d3 == 2)
    assert(h3 > 0.0 && h3 <= math.log(2.0) + 1e-9, s"h3 $h3")
    assert(e3 > 0.0 && e3 <= 1.0)
  }

  test("pack_nosplit: fold replays exactly; no bin over capacity except a lone oversized doc") {
    val cap = 2048L
    val rows = TextAnalysis.packNosplit(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.length == 500)
    rows.groupBy(_._2).foreach { case (bucket, g) =>
      val ordered = g.sortBy(_._1)
      // replay the next-fit fold from (bin 0, fill 0)
      var bin = 0L; var fill = 0L
      ordered.foreach { case (doc, _, tok, b, f) =>
        if (fill + tok <= cap) fill += tok else { bin += 1; fill = tok }
        assert(b == bin && f == fill, s"doc $doc: ($b,$f) vs ($bin,$fill)")
      }
      // bin totals never exceed cap unless the bin holds one oversized doc
      ordered.groupBy(_._4).foreach { case (bi, docs) =>
        val tot = docs.map(_._3).sum
        assert(tot <= cap || docs.length == 1,
          s"bucket $bucket bin $bi total $tot over cap with ${docs.length} docs")
      }
    }
  }

  test("hybrid_minmax: fused scores in [0,1]; each query's winner carries a full leg") {
    val rows = graft.queries.Bm25.hybridMinmax(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, _, _, s) =>
      assert(s >= 0.0 && s <= 1.0, s"$q fused score $s outside [0,1]")
    }
    rows.groupBy(_._1).foreach { case (q, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to g.length), s"$q ranks")
      // min-max puts each leg's best doc at 1.0, so the fused winner
      // scores at least 1.0/2 (that doc is in the outer union)
      assert(g.minBy(_._2)._4 >= 0.5,
        s"$q winner ${g.minBy(_._2)._4} < 0.5 — a leg's max is missing")
    }
  }

  test("rag_context_pack: inclusion is a rank-prefix; running totals reconcile") {
    val rows = graft.queries.Rag.ragContextPack(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getInt(3), r.getLong(4), r.getInt(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, g) =>
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1 to byRank.length), s"$q ranks")
      // cum is the exact running sum of toks in rank order
      var cum = 0L
      byRank.foreach { case (_, _, _, tok, c, inc) =>
        cum += tok
        assert(c == cum, s"$q cum $c vs $cum")
        assert(inc == (if (c <= graft.queries.Rag.CtxBudget) 1 else 0))
      }
      // prefix property: once a row is excluded, every later row is too
      val incs = byRank.map(_._6).toSeq
      assert(!incs.sliding(2).exists(w => w.head == 0 && w.last == 1),
        s"$q inclusion not a prefix: ${incs.mkString(",")}")
    }
  }

  test("dedup_bloom_ingest: no false negatives; shared-band counts equal brute force") {
    import graft.dedup.Dedup
    import graft.queries.DedupQueries
    val rows = DedupQueries.dedupBloomIngest(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    assert(rows.length == 250)
    // a Bloom filter never false-negatives: every truly-shared band key
    // is bloom-positive, so n_bloom_pos >= n_shared_bands row by row
    rows.foreach { case (d, pos, shared, flag) =>
      assert(pos >= shared, s"doc $d: bloom_pos $pos < shared $shared")
      assert(flag == (if (shared > 0) 1 else 0), s"doc $d flag")
    }
    // brute-force shared-band recomputation from the same band frame
    val bands = Dedup.lshBands(Dedup.minhash(
        Dedup.shingleSet(Tables.documents(spark, dir), "doc_id", "text"), 16), 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val exKeys = bands.filter(_._1 % 2 == 0).map(t => (t._2, t._3)).toSet
    val expect = bands.filter(_._1 % 2 == 1)
      .groupBy(_._1).view
      .mapValues(_.count(t => exKeys((t._2, t._3)))).toMap
    rows.foreach { case (d, _, shared, _) =>
      assert(shared == expect.getOrElse(d, 0),
        s"doc $d shared $shared vs brute ${expect.getOrElse(d, 0)}")
    }
    // the screen has signal on this corpus: some candidates found
    assert(rows.map(_._4).sum > 0, "no near-dup candidates at all")
  }

  test("maxsimTopK: one token per doc degenerates to exact single-vector top-k") {
    // with tokPerQuery = 1 and doc_id = vec_id the late-interaction
    // score collapses to score(q, d) = dot(q, d) — the TRUE invariant
    // tying the ColBERT scorer back to bruteForceTopK
    import graft.search.Knn
    val emb = Tables.embeddings(spark, dir)
    val docs = emb.select(col("vec_id").as("doc_id"), col("vec_id"),
      col("embedding"))
    val qtok = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), lit(0).as("qt"),
        col("embedding").as("qvec"))
    val got = Knn.maxsimTopK(docs, qtok, 7, tokPerQuery = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = graft.search.Knn.bruteForceTopK(emb, queries, 7)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == exact, "single-token maxsim must equal exact knn")
  }

  test("retrieve_maxsim_ann: candidates contain each query's own doc; recall meter consistent") {
    // stage-1 gather always finds the query's own tokens (a token's
    // top-hit is itself), so the self-document is a candidate and —
    // scoring the maximum possible maxsim — survives to rank 1..k
    val rows = Similarity.retrieveMaxsimAnn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == (0L until Similarity.MaxsimQueries).toSet)
    byQ.foreach { case (q, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to g.map(_._2).max),
        s"query $q ranks not dense")
      assert(g.exists(_._3 == q), s"query $q lost its own document")
    }
    // the meter equals a direct intersection of the two query outputs
    val exact = Similarity.retrieveMaxsim(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = rows.count(t => exact((t._1, t._3)))
    val meter = Similarity.maxsimRecall(spark, dir).collect().head
    assert(meter.getLong(1) == hits.toLong,
      s"meter ${meter.getLong(1)} vs direct $hits")
    assert(meter.getLong(1) >= (Similarity.MaxsimQueries *
      Similarity.K * 6) / 10, s"two-stage recall collapsed: $meter")
  }

  test("retrieve_maxsim_plaid: ranks dense; meter row consistent; recall holds") {
    // the graph gather finds each token's own vector (a unit-norm
    // token's nearest neighbor is itself, and the walk's entry+expand
    // rounds reach it on this fixture), so the self-document survives
    // as a candidate, exactly as in the exact-scan gather
    val rows = Similarity.retrieveMaxsimPlaid(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == (0L until Similarity.MaxsimQueries).toSet)
    byQ.foreach { case (q, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to g.map(_._2).max),
        s"query $q ranks not dense")
    }
    // the meter's plaid row equals a direct intersection with the full
    // interaction's output
    val exact = Similarity.retrieveMaxsim(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = rows.count(t => exact((t._1, t._3)))
    val meter = Similarity.maxsimRecall(spark, dir).collect()
      .find(_.getString(0) == "retrieve_maxsim_plaid").get
    assert(meter.getLong(1) == hits.toLong,
      s"meter ${meter.getLong(1)} vs direct $hits")
    assert(meter.getLong(1) >= (Similarity.MaxsimQueries *
      Similarity.K * 6) / 10, s"plaid recall collapsed: $meter")
  }

  test("retrieve_maxsim_pq: ranks dense; meter row consistent; compressed gather still retrieves") {
    val rows = Similarity.retrieveMaxsimPq(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == (0L until Similarity.MaxsimQueries).toSet)
    byQ.foreach { case (q, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to g.map(_._2).max),
        s"query $q ranks not dense")
    }
    // the meter's pq row equals a direct intersection with the full
    // interaction's output (the plaid-row discipline)
    val exact = Similarity.retrieveMaxsim(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = rows.count(t => exact((t._1, t._3)))
    val meter = Similarity.maxsimRecall(spark, dir).collect()
      .find(_.getString(0) == "retrieve_maxsim_pq").get
    assert(meter.getLong(1) == hits.toLong,
      s"meter ${meter.getLong(1)} vs direct $hits")
    assert(meter.getLong(1) > 0, s"compressed gather found nothing: $meter")
  }

  test("maxsim_tune_gather: monotone rungs; production rung equals the plaid meter row") {
    val rows = Similarity.maxsimTuneGather(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Similarity.MaxsimGatherRungs)
    // a larger gather can only add candidates: budgets strictly grow,
    // hits never drop (top-4 ⊂ top-8 ⊂ top-16 by construction)
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 <= b._2 && a._3 < b._3 }, rows.toSeq.toString)
    // the middle rung IS retrieve_maxsim_plaid's configuration
    val plaid = Similarity.maxsimRecall(spark, dir).collect()
      .find(_.getString(0) == "retrieve_maxsim_plaid").get.getLong(1)
    val mid = rows.find(_._1 == Similarity.MaxsimCandTok).get._2
    assert(mid == plaid, s"rung-$mid vs plaid-meter $plaid")
  }

  test("embed_mrl: full-dimension rung is exact by construction; recall grows with dim") {
    val rows = Similarity.embedMrl(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Similarity.MrlDims)
    // d' = 64 is no truncation at all: the ranking is the exact search
    // (same dots, same tie-breaks), so recall must be 100%
    val full = rows.last
    assert(full._2 == full._3, s"full-dim rung not exact: $full")
    assert(rows.sliding(2).forall { case Array(a, b) => a._2 <= b._2 },
      s"recall not monotone in dim: ${rows.toSeq}")
  }

  test("ann_mrl_funnel: exact rescore dominates prefix-only retrieval; ranks dense") {
    val rows = Similarity.annMrlFunnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byQ = rows.groupBy(_._1)
    byQ.foreach { case (q, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to g.map(_._2).max),
        s"query $q ranks not dense")
    }
    // the TRUE invariant: the prefix top-10 is a subset of the 50
    // proposals, and exact-top-10 members always win an exact rescore
    // within any subset — so funnel hits >= prefix hits, always
    val meter = Similarity.annRecallMrlFunnel(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(meter("ann_mrl_funnel") >= meter("ann_mrl_prefix"),
      s"rescore lost recall: $meter")
    assert(meter("ann_mrl_funnel") > 0, s"funnel found nothing: $meter")
  }

  test("ann_mrl_graph_funnel: self-query retrieved at rank 1; ranks dense; both recall rows present") {
    val rows = Similarity.annMrlGraphFunnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byQ = rows.groupBy(_._1)
    byQ.foreach { case (q, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to g.map(_._2).max),
        s"query $q ranks not dense")
      // the query IS an index vector and its normalized prefix is its
      // own nearest prefix neighbor (cosine 1, the walk's entry set
      // reaches it through the graph) — the exact full-width rescore
      // then puts the self-vector at rank 1 (unit-norm corpus: the
      // self dot is the global max)
      assert(g.find(_._2 == 1).exists(_._3 == q),
        s"query $q self-vector not at rank 1: ${g.toSeq.sortBy(_._2)}")
    }
    val meter = Similarity.annRecallMrlGraph(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(meter.keySet == Set("ann_mrl_funnel", "ann_mrl_graph_funnel"),
      s"meter rows: $meter")
    assert(meter("ann_mrl_graph_funnel") > 0, s"graph funnel found nothing: $meter")
  }

  test("retrieve_maxsim: self-document retrieved; ranks dense 1..k per query") {
    // for unit-norm token vectors score(q, q) = tokPerQuery (every
    // token's best match is itself at dot = 1), the maximum possible —
    // the query's own document cannot miss its top-k
    val rows = Similarity.retrieveMaxsim(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == (0L until Similarity.MaxsimQueries).toSet)
    byQ.foreach { case (q, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to Similarity.K),
        s"query $q ranks not dense")
      assert(g.exists(_._3 == q),
        s"query $q did not retrieve its own document")
    }
  }

  test("q8 market share: shares bounded, years in the window") {
    // value-exactness is the DuckDB oracle's job; this pins the output
    // contract — a share is a fraction of its own denominator and the
    // order-date pushdown actually bounds the group keys
    val rows = graft.queries.Relational.q8MarketShare(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(0) >= 1995 && r.getInt(0) <= 1996,
        s"year ${r.getInt(0)} escaped the date filter")
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0,
        s"share ${r.getDouble(1)} outside [0,1]")
    }
  }
}
