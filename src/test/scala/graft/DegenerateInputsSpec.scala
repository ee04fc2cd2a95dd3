package graft

import org.apache.spark.sql.functions._

import graft.chunk.Chunkers
import graft.embed.HashingEmbedder
import graft.rag.Pipeline

/** Degenerate-input hardening: empty documents, texts below the shingle
  * window, zero vectors, and top-k with fewer candidates than k. These
  * inputs exist in any real 100 TB corpus; none may throw or produce
  * out-of-contract rows.
  */
class DegenerateInputsSpec extends SparkSpec {
  import spark.implicits._

  test("chunkers emit nothing (or one tiny chunk) for empty/whitespace text") {
    for (s <- Chunkers.strategyNames; text <- Seq("", "   ", "\n\n\t")) {
      val chunks = Chunkers.all(s)(text, "empty.md")
      assert(chunks.forall(_.content.nonEmpty), s"$s emitted empty content")
    }
  }

  test("embedder: zero-token text gives a zero vector, never NaN") {
    for (m <- HashingEmbedder.models) {
      val v = HashingEmbedder.embed("", m)
      assert(v.length == m.dim)
      assert(v.forall(x => x == 0f && !x.isNaN))
    }
  }

  test("shingles below the 3-gram window are empty, not partial") {
    val out = Seq((1L, "one two"), (2L, "single"), (3L, ""))
      .toDF("doc_id", "text")
    val sh = graft.dedup.Dedup.shingleSet(out, "doc_id", "text")
    assert(sh.count() == 0)
  }

  test("retrieve with fewer chunks than k yields ranks 1..n, no padding") {
    val docs = Seq(
      graft.model.Document("a.md", "alpha beta gamma delta"),
      graft.model.Document("b.md", "epsilon zeta eta theta")).toDS()
    val models = HashingEmbedder.models.take(1)
    val embedded = Pipeline.chunkEmbed(docs, Seq("fixed_size"), models)
    val queries = Seq(("q0", "alpha beta")).toDF("query_id", "query")
    val hits = Pipeline.retrieve(embedded, Pipeline.embedQueries(queries, models), k = 10)
      .select("query_id", "rank", "chunk_id").as[(String, Int, String)].collect()
    assert(hits.map(_._2).sorted.toSeq == Seq(1, 2)) // 2 chunks only
  }

  test("ivf/lsh on an empty query set return no rows rather than failing") {
    val emb = Seq((0L, Array.fill(8)(0.5f)), (1L, Array.fill(8)(0.25f)))
      .toDF("vec_id", "embedding")
    val noQ = Seq.empty[(Long, Array[Float])].toDF("query_id", "qvec")
    assert(graft.search.Ann.lshTopK(emb, noQ, 5, dim = 8).count() == 0)
    val cent = emb.select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    assert(graft.search.Ann.ivfTopK(emb, noQ, cent, 5, 1).count() == 0)
    assert(graft.search.Ann.pqTopK(emb, noQ, 5, m = 4, numCodes = 2).count() == 0)
    assert(graft.search.Ann.ivfPqTopK(emb, noQ, cent, 5, 1, m = 4,
      numCodes = 2).count() == 0)
    // explicit-codebook composition with empty queries / empty codebooks
    val cw = graft.search.Ann.sampleCodebooks(emb, m = 4, numCodes = 2)
    assert(graft.search.Ann.ivfPqTopKWith(emb, noQ, cent, 5, 1, 4, cw)
      .count() == 0)
    assert(graft.search.Ann.ivfPqTopKWith(emb, noQ, cent, 5, 1, 4,
      Array.empty).count() == 0)
    // MMR over an empty candidate frame: no groups, no rows, no throw
    val noCands = Seq.empty[(Long, Long, Double)]
      .toDF("query_id", "vec_id", "sim")
    assert(graft.search.Knn.mmrRerank(emb, noCands, k = 3).count() == 0)
    // residual composition: empty queries, empty codebooks, and an
    // empty centroid frame (residuals of nothing) all yield zero rows
    assert(graft.search.Ann.ivfPqResidualTopK(emb, noQ, cent, 5, 1, m = 4,
      numCodes = 2).count() == 0)
    assert(graft.search.Ann.ivfPqResidualTopKWith(emb, noQ, cent, 5, 1, 4,
      Array.empty).count() == 0)
    val noCent = cent.filter(col("cent_id") < 0)
    assert(graft.search.Ann.residuals(emb, noCent).count() == 0)
    assert(graft.search.Ann.ivfPqResidualTopK(emb, noQ, noCent, 5, 1,
      m = 4, numCodes = 2).count() == 0)
    // SQ composition with empty queries; and the tagged assignment on an
    // empty index emits zero rows (the filtered path's first step)
    assert(graft.search.Ann.ivfSqTopK(emb, noQ, cent, 5, 1).count() == 0)
    val labeled = emb.withColumn("label", lit(0))
    val noIdx = labeled.filter(col("vec_id") < 0)
    assert(graft.search.Ann.assignCellsTagged(noIdx, cent, "label")
      .count() == 0)
  }

  test("dup-span queries skip sub-window docs; BM25 survives an empty corpus") {
    val docs = Seq(
      (0L, "shared words here and more shared words here"),
      (1L, "shared words here and more shared words here"),
      (2L, "ab"), // below both the 3-token shingle and 16-char gram windows
      (3L, ""),
    ).toDF("doc_id", "text")
    val boiler = graft.queries.TextAnalysis.boilerplateFracOf(docs)
      .orderBy("doc_id").collect()
    assert(boiler.map(_.getLong(0)).toSeq == Seq(0L, 1L), "docs 2,3 have no shingles")
    assert(boiler.forall(_.getDouble(3) == 1.0), "identical docs share every shingle")
    val sub = graft.queries.TextAnalysis.substringDedupOf(docs)
    assert(sub.filter(col("doc_id") >= 2).count() == 0)
    assert(sub.filter(col("shared_frac") =!= 1.0).count() == 0)

    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.queries.Bm25.bm25TopKOf(noDocs).count() == 0)
  }

  test("trained means: summation-order / ±1ulp drift is erased by the 1e-6 grid") {
    // The one residual risk every *_trained oracle carried: Spark and
    // DuckDB average cell members in different orders, so the double
    // means differ by ulps, and a bare double→float cast could round
    // them to different floats — flipping a discrete argmin/argmax
    // assignment. Ann.roundMean snaps means to a 1e-6 grid on BOTH
    // sides first. This test constructs the real drift on the real
    // corpus: assign fixture vectors to the trained centroids, average
    // each cell in forward, reverse, and pairwise-merge order, perturb
    // by ±1ulp on top, and requires every variant to land on the same
    // grid point — hence bit-identical float32 centroids, hence stable
    // assignments.
    import graft.search.Ann
    val dir = "/root/testdata/sf0.001"
    val embDf = Tables.embeddings(spark, dir)
    val cents = Ann.trainCentroids(embDf, k = 8, iters = 2)
      .as[(Long, Array[Float])].collect().sortBy(_._1).map(_._2)
    val vecs = embDf.select(col("embedding")).as[Array[Float]].collect()
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val byCell = vecs.groupBy(v => cents.indices.maxBy(c => dot(v, cents(c))))
    assert(byCell.size > 1, "degenerate clustering — corpus check")
    var checked = 0
    byCell.values.foreach { vs =>
      val n = vs.length
      for (d <- vs(0).indices) {
        val fwd = vs.map(_(d).toDouble).sum / n
        val rev = vs.reverse.map(_(d).toDouble).sum / n
        // pairwise merge — the shape a map-side combine actually sums in
        def pair(xs: Array[Double]): Double =
          if (xs.length == 1) xs(0)
          else pair(xs.grouped(2).map(_.sum).toArray)
        val mrg = pair(vs.map(_(d).toDouble)) / n
        val variants = Seq(fwd, rev, mrg).flatMap(x =>
          Seq(x, Math.nextUp(x), Math.nextDown(x)))
        val snapped = variants.map(Ann.roundMean).distinct
        assert(snapped.size == 1,
          s"grid did not erase drift at cell dim $d: $variants -> $snapped")
        checked += 1
      }
    }
    assert(checked >= 8 * 64 / 2, s"only $checked (cell,dim) pairs checked")
  }

  test("span reports survive empty and sub-window corpora") {
    // empty corpus, all-blank docs, and docs below the 3-token shingle
    // window must all yield zero span rows — never a throw, never a
    // NULL-position row
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val blank = Seq((0L, ""), (1L, "   ")).toDF("doc_id", "text")
    val short = Seq((0L, "a b"), (1L, "a b")).toDF("doc_id", "text")
    val ev = Seq(("q0", "a b c d")).toDF("query_id", "qtext")
    for (df <- Seq(empty, blank, short)) {
      assert(graft.queries.DedupQueries.winnowSpansOf(df, 1000).count() == 0)
      assert(graft.queries.DedupQueries.decontaminateSpansOf(df, ev).count() == 0)
    }
    // an eval set below the shingle window contaminates nothing either
    val evShort = Seq(("q0", "a b")).toDF("query_id", "qtext")
    val docs = Seq((0L, "a b c d e f")).toDF("doc_id", "text")
    assert(graft.queries.DedupQueries.decontaminateSpansOf(docs, evShort).count() == 0)
  }

  test("graph ANN survives tiny and singleton indexes; rewrite passes degenerate docs through") {
    import graft.search.NnGraph
    // a singleton index has no non-self seed: zero edges is correct,
    // and search still returns the one vector (entry beam = the seeds)
    val one = Seq((0L, Array.fill(4)(0.5f))).toDF("vec_id", "embedding")
    assert(NnGraph.buildGraph(one, k = 4, iters = 1, sampleSize = 4).count() == 0)
    val q1 = one.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val hits = NnGraph.graphTopK(one,
        NnGraph.buildGraph(one, k = 4, iters = 1, sampleSize = 4),
        q1, k = 3, beamWidth = 3, iters = 2, sampleSize = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(hits.toSeq == Seq((0L, 1, 0L)), hits.mkString("; "))
    // n < sampleSize and k > n: degree caps at n-1, ranks stay dense
    val tiny = (0L until 3L).map(i =>
      (i, Array.tabulate(4)(j => if (j == i) 1f else 0f))).toDF("vec_id", "embedding")
    val g3 = NnGraph.buildGraph(tiny, k = 10, iters = 2, sampleSize = 16)
    assert(g3.groupBy("id").count().collect().forall(_.getLong(1) <= 2))
    val qt = tiny.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val r3 = NnGraph.graphTopK(tiny, g3, qt, k = 10, beamWidth = 10,
      iters = 2, sampleSize = 16).collect()
    assert(r3.length == 9, "3 queries x 3 reachable vectors")
    // decontaminate_rewrite: empty/blank/sub-window docs pass through
    // byte-identical with n_removed = 0 (nothing to excise, no NULLs)
    val weird = Seq((0L, ""), (1L, "   "), (2L, "a b")).toDF("doc_id", "text")
    val ev = Seq(("q0", "a b c d")).toDF("query_id", "qtext")
    val rw = graft.queries.DedupQueries.decontaminateRewriteOf(weird, ev)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rw.map(_._3).forall(_ == 0L))
    assert(rw.map(t => (t._1, t._2)).toSeq ==
      Seq((0L, ""), (1L, "   "), (2L, "a b")))
    // winnow_runs on an empty corpus: zero rows, no throw
    assert(graft.queries.DedupQueries.winnowRunsOf(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), 1000).count() == 0)
  }

  test("corpus_filter pins empty-text flags: no NULL leaks into int columns") {
    // an empty document divides 0/0 in the stopword and digit ratios —
    // semantics are pinned (stop_ok 0, digit_ok 1), never engine-NULL/NaN
    val dir = java.nio.file.Files.createTempDirectory("degdocs").toString
    Seq(
      (0L, "", "en", "s0", 0),
      (1L, "the and is on in of to a the and is on in of to a the and is on in", "en", "s1", 68),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.TextAnalysis.corpusFilter(spark, dir)
      .orderBy("doc_id").collect()
    val empty = rows(0)
    assert(!rows.exists(r => (1 until r.length).exists(r.isNullAt)))
    assert(empty.getAs[Int]("stop_ok") == 0 && empty.getAs[Int]("digit_ok") == 1)
    assert(empty.getAs[Int]("kept") == 0)
  }

  test("BPE and DSIR survive empty and single-character corpora") {
    import org.apache.spark.sql.functions._
    val emptyDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "lang", "text")
    // empty corpus: no merges, no scores — zero rows, never a crash
    assert(graft.queries.TextAnalysis
      .bpeMerges(emptyDocs, iters = 5).count() == 0)
    assert(graft.queries.TextAnalysis.dsirScore(emptyDocs).count() == 0)
    // all-single-character words: no adjacent pair ever exists, so the
    // trainer must stop at zero merges instead of failing the argmax
    val singles = Seq((0L, "en", "a b c a b")).toDF("doc_id", "lang", "text")
    assert(graft.queries.TextAnalysis
      .bpeMerges(singles, iters = 5).count() == 0)
    // encode still works: every word is its own single symbol
    val enc = graft.queries.TextAnalysis.bpeEncodeDocs(singles, iters = 5)
      .as[(Long, Long, Long)].collect()
    assert(enc.toSeq == Seq((0L, 5L, 5L)))
  }

  test("PQ encode/decode frames survive empty corpora; decode∘encode is identity on a one-codeword book") {
    import graft.search.Ann
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    // empty corpus → empty sampled codebooks → empty code/decoded
    // frames, never an NPE or a 0-length subvector slice
    val cwE = Ann.sampleCodebooks(empty, m = 8, numCodes = 16)
    assert(cwE.isEmpty)
    assert(Ann.pqEncodeFrame(empty, 8, cwE).count() == 0)
    assert(Ann.pqDecodeFrame(
      Seq.empty[(Long, Array[Int])].toDF("vec_id", "codes"), cwE).count() == 0)
    // singleton corpus: the only sample IS every subspace's only
    // codeword, so decode(encode(x)) must reproduce x bit-for-bit —
    // the reconstruction-optimality floor case
    val v = Array.tabulate(64)(i => (math.sin(i + 1) / 8).toFloat)
    val one = Seq((7L, v)).toDF("vec_id", "embedding")
    val cw1 = Ann.sampleCodebooks(one, m = 8, numCodes = 16)
    assert(cw1.length == 8 && cw1(0).length == 1)
    val dec = Ann.pqDecodeFrame(Ann.pqEncodeFrame(one, 8, cw1), cw1)
      .as[(Long, Array[Float])].collect()
    assert(dec.length == 1 && dec.head._1 == 7L &&
      dec.head._2.sameElements(v),
      "decode∘encode must be the identity when x is the only codeword")
  }

  test("ADC walk and sharded serve survive empty codebooks and empty query sets") {
    import graft.search.{Ann, NnGraph}
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val emptyQ = Seq.empty[(Long, Array[Float])].toDF("query_id", "qvec")
    val emptyG = Seq.empty[(Long, Long, Double)].toDF("id", "nbr", "sim")
    // empty codebooks short-circuit to an empty ranked frame (the
    // pqEncodeFrame convention), never a 0-length LUT index
    val cwE = Ann.sampleCodebooks(empty, m = 8, numCodes = 16)
    assert(NnGraph.graphTopKAdc(
      Seq.empty[(Long, Array[Int])].toDF("vec_id", "codes"),
      emptyG, emptyQ, 5, 8, 2, 8, cwE).count() == 0)
    // a real index with ZERO queries: entry/rounds score nothing, the
    // ranked output is empty — no per-query state to trip on
    val some = (0L until 10L)
      .map(i => (i, Array.tabulate(64)(j => ((i + j) % 5).toFloat / 4)))
      .toDF("vec_id", "embedding")
    val cw = Ann.sampleCodebooks(some, m = 8, numCodes = 16)
    val g = NnGraph.buildGraph(some, k = 3, iters = 1, sampleSize = 4)
    assert(NnGraph.graphTopKAdc(Ann.pqEncodeFrame(some, 8, cw), g, emptyQ,
      5, 8, 2, 4, cw).count() == 0)
    assert(NnGraph.shardedGraphTopK(some,
      NnGraph.buildShardedGraph(some, 2, 3, 1, 4), emptyQ,
      5, 2, 8, 2, 4).count() == 0)
  }

  test("LR trainer returns zero weights on an empty corpus, never NPEs") {
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    val w = graft.queries.Quality.trainWeightsOf(
      graft.queries.Quality.featsOf(empty))
    assert(w.length == 17 && w.forall(_ == 0.0))
    // single-doc corpus: trains without error, weights move
    val one = Seq((1L, "alpha beta gamma", "en")).toDF("doc_id", "text", "lang")
    val w1 = graft.queries.Quality.trainWeightsOf(
      graft.queries.Quality.featsOf(one))
    assert(w1.exists(_ != 0.0))
  }

  test("k-center with fewer vectors than k stops at exhaustion, seed-only at n=1") {
    val two = Seq(
      (5L, Array(1f, 0f, 0f, 0f)),
      (9L, Array(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    val rows = graft.queries.Similarity.coresetKcenterOf(spark, two, 8)
      .collect().sortBy(_.getInt(0))
    assert(rows.length == 2, s"expected 2 rows: ${rows.toSeq}")
    assert(rows.map(_.getLong(1)).toSeq == Seq(5L, 9L))
    val single = Seq((3L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val solo = graft.queries.Similarity.coresetKcenterOf(spark, single, 8).collect()
    assert(solo.length == 1 && solo.head.getLong(1) == 3L)
    val none = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(graft.queries.Similarity.coresetKcenterOf(spark, none, 8).collect().isEmpty)
  }

  test("maxsim: k beyond the doc count yields dense ranks 1..n; single-doc corpus works") {
    import graft.search.Knn
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // 3 docs of 4 tokens; ask for k=10
    val tiny = emb.filter(col("vec_id") < 12)
    val docs = tiny.select(expr("vec_id div 4").as("doc_id"), col("vec_id"),
      col("embedding"))
    val qtok = tiny.filter(col("vec_id") < 4)
      .select(expr("vec_id div 4").as("query_id"),
        expr("vec_id % 4").as("qt"), col("embedding").as("qvec"))
    val got = Knn.maxsimTopK(docs, qtok, 10, 4)
      .collect().map(r => r.getInt(1)).sorted.toSeq
    assert(got == (1 to 3), s"expected dense ranks 1..3, got $got")
    // single doc
    val one = Knn.maxsimTopK(docs.filter(col("doc_id") === 0), qtok, 10, 4)
      .collect()
    assert(one.length == 1 && one.head.getInt(1) == 1)
  }

  test("pack_nosplit: empty corpus packs nothing; a lone oversized doc takes bin 1") {
    val none = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "source", "text", "lang", "n_chars")
    assert(graft.queries.TextAnalysis.packNosplitOf(none).collect().isEmpty)
    // one doc over the 2048 budget: from the (bin 0, fill 0) start the
    // pure fits-or-new-bin rule sends it to bin 1 (pinned convention)
    val big = Seq((5L, "s", ("w " * 3000).trim, "en", 6000L))
      .toDF("doc_id", "source", "text", "lang", "n_chars")
    val row = graft.queries.TextAnalysis.packNosplitOf(big).collect().head
    assert(row.getLong(3) == 1L && row.getLong(4) == row.getLong(2),
      s"oversized doc: $row")
  }

  test("bloom ingest: an all-existing corpus has no incoming rows; all-incoming has no bloom hits") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val allEven = docs.filter(col("doc_id") % 2 === 0)
    assert(graft.queries.DedupQueries.dedupBloomIngestOf(allEven)
      .collect().isEmpty, "no odd ids -> empty screen output")
    val allOdd = docs.filter(col("doc_id") % 2 === 1)
    val rows = graft.queries.DedupQueries.dedupBloomIngestOf(allOdd).collect()
    // empty existing side -> empty bloom -> nothing can be positive
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L &&
      r.getInt(3) == 0), "empty bloom must admit nothing")
  }

  test("entropy and anisotropy survive empty frames and single rows") {
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.queries.TextAnalysis.tokEntropyOf(noDocs).collect().isEmpty)
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val an = graft.queries.Similarity.embedAnisotropyOf(noVecs).collect()
    // empty corpus: n = 0 -> the aggregate row carries 0 vectors and
    // null/NaN-free integer count; ratios are undefined and must not
    // THROW (the contract is no crash; a gate upstream rejects n = 0)
    assert(an.length == 1 && an.head.getLong(0) == 0L)
    // single vector: no pairs exist — n(n−1) = 0 — must not throw
    val oneV = Seq((0L, Array.fill(64)(0.125f))).toDF("vec_id", "embedding")
    assert(graft.queries.Similarity.embedAnisotropyOf(oneV)
      .collect().head.getLong(0) == 1L)
    // PCA on an empty corpus: no component rows, never 64 NaNs
    assert(graft.queries.Similarity.embedPcaOf(noVecs, 64)
      .collect().isEmpty)
  }

  test("PCA survives a constant corpus and wrong-dimension vectors") {
    // constant corpus: zero covariance -> Cx = 0 on the first power
    // round -> the normalize would mint NaN loadings (ADVICE r17);
    // pcaModel must treat nrm = 0 as "no component exists"
    val const = (0L until 5L).map(i => (i, Array.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
    assert(graft.queries.Similarity.embedPcaOf(const, 64).collect().isEmpty)
    // a short vector must be DROPPED (the Catalyst paths' graceful
    // degradation), not throw ArrayIndexOutOfBoundsException in the
    // Gramian loop — the remaining 64-dim rows still yield a component
    val mixed = (Seq((0L, Array.fill(3)(1.0f))) ++
        (1L until 6L).map(i => (i, Array.tabulate(64)(j =>
          if (j == 0) i.toFloat else 0.1f))))
      .toDF("vec_id", "embedding")
    val rows = graft.queries.Similarity.embedPcaOf(mixed, 64).collect()
    assert(rows.length == 64 && rows.forall(r => !r.getDouble(1).isNaN))
  }

  test("audio resample: sub-outFrames sources repeat frames rather than failing") {
    import graft.multimodal.{MediaFixtures, Multimodal}
    // 3 frames resampled UP to 8: out[j] = sample[j*3/8] — indexes
    // 0,0,0,1,1,1,2,2 (floor mapping; no interpolation, no crash)
    val rows = Seq(Multimodal.MediaRow(9L, "audio",
      MediaFixtures.wav8(8000, 10, 20, 30),
      Multimodal.MediaMeta("wav", 0, 0, 1L, 8000))).toDS()
    val out = Multimodal.resampleNearest(rows, 8)
      .collect().head.getSeq[Int](2)
    assert(out == Seq(10, 10, 10, 20, 20, 20, 30, 30), out.toString)
  }

  test("nearest-neighbor resize: identity at source dims, top-left at 1x1") {
    import graft.multimodal.{MediaFixtures, Multimodal}
    val docs = Seq((6L, "x"), (7L, "y")).toDF("doc_id", "text")
    val media = MediaFixtures.gradientMedia(docs)
    // identity: resizing w×h → w×h must reproduce the exact gradient
    for (m <- media.collect()) {
      val (w, h) = (m.meta.width, m.meta.height)
      val out = Multimodal.resizeNearest(
          media.filter(col("media_id") === m.media_id), w, h)
        .select("gray").as[Seq[Int]].collect().head
      val expected = for (y <- 0 until h; x <- 0 until w)
        yield ((m.media_id + 7 * x + 13 * y) % 256).toInt
      assert(out == expected, s"identity resize mismatch for ${m.media_id}")
    }
    // 1×1 picks source (0,0) = id mod 256
    val one = Multimodal.resizeNearest(media, 1, 1)
      .select(col("media_id"), element_at(col("gray"), 1))
      .as[(Long, Int)].collect().toMap
    assert(one == Map(6L -> 6, 7L -> 7))
  }
}
