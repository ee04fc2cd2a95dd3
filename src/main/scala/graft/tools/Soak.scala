package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Rag
import graft.rag.Pipeline

/** Scaling soak (dev tool): run the retrieval pipeline and minhash dedup
  * over the sf0.1 corpus duplicated 1×/4×/16× (distinct doc ids), and
  * report wall-clock vs corpus size. Linear growth here is the local
  * evidence for the shuffle-inventory claims in SCALING.md — the
  * operators whose exchanges are bounded by winners/signatures (not by
  * corpus pairs) should scale ~proportionally with input rows.
  */
object Soak {
  def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    // optional arg: comma-separated multipliers (e.g. "64" to re-run
    // one leg under a bigger SPARK_DRIVER_MEM — the 64× winnow clique
    // stress wants ≥32g; the default 8g OOMs its ~200M-row pair agg)
    val mults = if (args.nonEmpty) args(0).split(",").map(_.trim.toInt).toSeq
      else Seq(1, 4, 16, 64)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def corpus(mult: Int): DataFrame =
      graft.Tables.documents(spark, sfDir)
        .crossJoin(spark.range(mult).select(col("id").as("rep")))
        .select((col("doc_id") * mult + col("rep")).as("doc_id"),
          concat(col("source"), lit("-"), col("rep")).as("source"),
          col("text"), col("lang"), col("n_chars"))

    // duplicated vectors are the kNN stress analog of the duplicated
    // corpus: every LSH bucket inflates mult×, and exact ties force the
    // heap's vec_id tie-break on every duplicate group
    def vectors(mult: Int): DataFrame =
      graft.Tables.embeddings(spark, sfDir)
        .crossJoin(spark.range(mult).select(col("id").as("rep")))
        .select((col("vec_id") * mult + col("rep")).as("vec_id"),
          col("embedding"))

    // warmup
    Rag.ragEval(spark, sfDir).count()
    spark.sharedState.cacheManager.clearCache()

    mults.foreach { m =>
      val docs = corpus(m).select(
          concat(col("source"), lit("/doc"), col("doc_id"), lit(".md")).as("source_file"),
          col("text").as("content"))
        .as[graft.model.Document]
      val nDocs = docs.count()

      val tRag = time {
        val embedded = Pipeline.chunkEmbed(docs,
          strategies = Seq("fixed_size"),
          models = graft.embed.HashingEmbedder.models.take(2)).cache()
        embedded.count()
        val qv = Pipeline.embedQueries(Rag.syntheticQueries(spark, sfDir),
          graft.embed.HashingEmbedder.models.take(2))
        Pipeline.retrieve(embedded, qv, 10,
          payload = Some(embedded.filter(col("model") === "hash-64")
            .select(col("chunk_id"), col("source_file"), col("content")))).count()
        spark.sharedState.cacheManager.clearCache()
      }

      var pairs: DataFrame = null
      val dropAcc = graft.queries.DedupQueries.droppedBucketsAcc(spark)
      val dropBefore = dropAcc.value
      val tDedup = time {
        val sh = graft.dedup.Dedup.shingleSet(corpus(m), "doc_id", "text").cache()
        sh.count()
        val cands = graft.dedup.Dedup.lshCandidates(
          graft.dedup.Dedup.lshBands(graft.dedup.Dedup.minhash(sh, 16), 4),
          droppedBuckets = Some(dropAcc))
        pairs = graft.dedup.Dedup.candidateJaccard(sh, cands)
          .filter(col("jac") >= 0.7).select(col("a"), col("b")).cache()
        pairs.count()
        spark.sharedState.cacheManager.clearCache()
      }

      // components over the verified pairs alone (pair gen timed above):
      // the m×-duplicated corpus turns every doc into an m-clique, so
      // this is the degenerate-cluster stress for the label loop
      pairs.cache().count()
      val tCc = time {
        graft.dedup.Dedup.connectedComponents(pairs).count()
      }
      pairs.unpersist()

      // BM25: the postings filter means only the matched-token combine
      // grows; boilerplate_frac: the duplicated corpus makes EVERY
      // shingle shared (df = m × base), stressing the window count
      val tBm25 = time {
        graft.queries.Bm25.bm25TopKOf(corpus(m).cache()).count()
        spark.sharedState.cacheManager.clearCache()
      }
      val tBoiler = time {
        graft.queries.TextAnalysis.boilerplateFracOf(corpus(m)).count()
      }

      // real media decode at mult× rows: payload build (spec-built
      // PNG/WAV/BMP/GIF/JPEG) + ImageIO/AudioSystem decode is a narrow
      // per-partition map with no exchange — wall should track rows
      // linearly (per-row decode cost), measured here, not asserted
      val tDecode = time {
        graft.multimodal.Multimodal.probeDecode(
          graft.multimodal.MediaFixtures.realMedia(corpus(m))).count()
      }

      // kNN at mult× vectors: the index never shuffles in either path —
      // brute force is broadcast queries + partition heaps, LSH is the
      // signature pass + bucket join + exact re-rank
      val emb = vectors(m).cache()
      val nVecs = emb.count()
      val qs = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val tKnn = time { graft.search.Knn.bruteForceTopK(emb, qs, 10).count() }
      val tLsh = time { graft.search.Ann.lshTopK(emb, qs, 10, dim = 64).count() }
      // IVF probe join at mult× vectors: the codebook stays 32 rows
      // (broadcast), assignment is a narrow map — flatness here is the
      // measured evidence that the probe join's exchange is bounded by
      // queries×nprobe, not by the index
      val tIvf = time {
        val cents = emb.filter(col("vec_id") % 31 === 0).limit(32)
          .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
        graft.search.Ann.ivfTopK(emb, qs, cents, 10, nprobe = 4).count()
      }
      // PQ ADC at mult× vectors: the 16-codeword codebook is collected
      // once, encode+LUT-scan are narrow maps over the broadcast
      // codebook — like knn_topk the only exchange is heap survivors,
      // but the scan arithmetic is O(m)-per-row instead of O(dim)
      val tPq = time { graft.search.Ann.pqTopK(emb, qs, 10).count() }
      // IVF-PQ at mult× vectors: ONE narrow pass assigns cell + encodes
      // + ADC-scores only probed cells — flatness proves the composed
      // layout's only exchange stays heap-survivor-sized as the index
      // grows (the billion-vector IndexIVFPQ claim)
      val tIvfPq = time {
        val cents = emb.filter(col("vec_id") % 31 === 0).limit(32)
          .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
        graft.search.Ann.ivfPqTopK(emb, qs, cents, 10, nprobe = 4).count()
      }
      // Residual IVF-PQ at mult× vectors: one extra narrow pass over
      // the raw layout (residual sampling for the codebook) and a
      // per-(query, cell) constant at score time — flatness proves the
      // coarse term rides the existing broadcasts and the only exchange
      // stays heap-survivor-sized
      val tIvfPqRes = time {
        val cents = emb.filter(col("vec_id") % 31 === 0).limit(32)
          .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
        graft.search.Ann.ivfPqResidualTopK(emb, qs, cents, 10, nprobe = 4).count()
      }
      // IVF-SQ at mult× vectors: assignment + int8 re-projection is one
      // narrow map, probing/scoring identical to ivfTopK over the 4×-
      // smaller codes — the seventh kNN/ANN shape whose flat line proves
      // the only exchange is heap survivors
      val tIvfSq = time {
        val cents = emb.filter(col("vec_id") % 31 === 0).limit(32)
          .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
        graft.search.Ann.ivfSqTopK(emb, qs, cents, 10, nprobe = 4).count()
      }
      // MMR at mult× vectors: candidate gen is the brute-force top-kCand
      // pass; the greedy re-rank touches only queries×kCand bounded rows,
      // so its cost over knn_topk must stay ~constant as the index grows
      val tMmr = time {
        graft.search.Knn.mmrTopK(emb, qs, k = 5, kCand = 20).count()
      }
      // Binary quantization at mult× vectors: the Hamming proposal is a
      // narrow XOR+popcount scan over dim/8-byte codes with bounded
      // heaps, the refine join touches queries×r rows — the ninth
      // kNN/ANN shape whose flat line proves the exchange stays
      // heap-survivor-sized while per-row memory traffic drops 32×
      val tBinary = time {
        graft.search.Ann.binaryTopKRefined(emb, qs, 10, r = 50).count()
      }
      // BPE training at mult× documents: the duplicated corpus keeps
      // the VOCAB constant, so per-iteration pair aggregates are flat
      // and only the one-time word-count scan grows with rows — the
      // measured form of "per-iteration cost is vocab-bounded"
      val tBpe = time {
        graft.queries.TextAnalysis.bpeMerges(corpus(m), iters = 5).count()
      }
      // DSIR at mult× documents: the (doc, bucket) combine is the only
      // corpus-sized exchange; the ≤256-key lambda aggregates and the
      // broadcast join are size-independent — expect ~linear in rows
      val tDsir = time {
        graft.queries.TextAnalysis.dsirScore(corpus(m)).count()
      }
      // LR quality training at mult× documents: the feature aggregate is
      // the only corpus-sized exchange; each of the 25 GD iterations is
      // a scan of the cached features with d+1 doubles of task state —
      // expect ~linear in rows with a constant iteration factor
      val tQualityLr = time {
        graft.queries.Quality.trainWeightsOf(
          graft.queries.Quality.featsOf(corpus(m)))
      }
      // TextRank at mult× documents: the duplicated corpus keeps the
      // VOCAB constant — edge WEIGHTS scale m× but node/edge COUNTS
      // don't, so per-iteration joins are flat and only the tokenize
      // scan grows (the bpe_train shape for graph centrality)
      val tTextrank = time {
        graft.queries.TextAnalysis.textrankKeywordsOf(corpus(m)).count()
      }
      // release textrank's cached edge frame OUTSIDE the timed window
      // (it was previously inside, charging cache teardown to textrank),
      // then re-materialize the shared emb cache the coreset/rp/
      // semantic-dedup timings below read — the blanket clearCache had
      // those blocks measuring vector-corpus RECOMPUTATION
      spark.sharedState.cacheManager.clearCache()
      emb.cache().count()
      // k-center at mult× vectors: each greedy step is one narrow pass
      // + a struct-min aggregate with the ≤k centers in the closure —
      // expect ~linear in rows × k steps, the corpus never shuffles
      val tCoreset = time {
        graft.queries.Similarity.coresetKcenterOf(spark, emb, 8).count()
      }
      // Random projection at mult× vectors: the projection map emits 16
      // doubles/row, the proposal scan uses bounded heaps — the next
      // flat ANN line (4× less arithmetic per scanned row than float64)
      val tRp = time {
        graft.search.Ann.rpTopKRefined(emb, qs, 10, r = 50).count()
      }
      // SemDeDup at mult× vectors with FIXED-OCCUPANCY clusters (k grows
      // with n, ~64 members per cell — the paper's configuration): total
      // pair work is Σ cluster² ≈ n×occupancy, so wall must track rows
      // ~linearly, NOT quadratically — the measured evidence that the
      // k∝n contract tames the pair stage. Cells are hash-sampled (no
      // Lloyd here; training cost is soaked by ann_ivf's trainCentroids
      // twin) and the sample is a TakeOrdered, never a full sort.
      val tSemDedup = time {
        val kCells = math.max(8, (nVecs / 64).toInt)
        val cents = emb
          .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"),
            md5(concat(lit("sem|"), col("vec_id"))).as("r"))
          .orderBy(col("r"), col("cent_id")).limit(kCells)
          .select(col("cent_id"), col("cvec"))
        graft.dedup.Dedup.semanticDedup(emb, cents, tau = 0.35).count()
      }
      // --- meter-class envelopes (round 12): the recall meters were
      // previously asserted "fixture-bounded" in prose; these columns
      // measure their growth law directly.

      // ann_recall meter shape at mult× vectors: exact side (brute
      // force, linear per query) + three path replays (IVF probe, PQ
      // ADC, binary Hamming — all linear scans) + queries×k semi-joins.
      // Expect ~linear in rows: every stage is a bounded-heap scan.
      val tAnnRecall = time {
        val exact = graft.search.Knn.bruteForceTopK(emb, qs, 10)
          .select(col("query_id"), col("vec_id")).cache()
        exact.count()
        val cents = emb.filter(col("vec_id") % 31 === 0).limit(32)
          .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
        Seq(
          graft.search.Ann.ivfTopK(emb, qs, cents, 10, nprobe = 4),
          graft.search.Ann.pqTopK(emb, qs, 10),
          graft.search.Ann.binaryTopKRefined(emb, qs, 10, r = 50)
        ).foreach { path =>
          path.select(col("query_id"), col("vec_id"))
            .join(exact, Seq("query_id", "vec_id"), "left_semi").count()
        }
        exact.unpersist()
      }

      // NN-descent graph BUILD at mult× vectors (shipped parameters
      // k=10/3 rounds/16 seeds): the duplicated index turns every
      // node's neighborhood into its duplicate clique, but per-node
      // candidate work is capped at ≤ (2k)² by the reverse-edge cap
      // REGARDLESS of n — expect ~linear in rows (the bounded-degree
      // contract, measured; an uncapped reverse join would go
      // quadratic in the clique here). Build includes the checkpoint
      // barriers and the parquet artifact write — the real index-build
      // cost a deployment pays once.
      var nndGraph: DataFrame = null
      val tNndBuild = time {
        nndGraph = graft.search.NnGraph.buildGraph(emb, k = 10, iters = 3,
          sampleSize = 16)
      }
      // graph SERVE at mult× vectors: the beam walk scores
      // ≤ sample + rounds × beam × (k+1) candidates per query
      // INDEPENDENT of corpus size — the flat line that justifies the
      // graph path over cell probing as the index grows
      val tNndServe = time {
        graft.search.NnGraph.graphTopK(emb, nndGraph, qs, 10,
          beamWidth = 16, iters = 4, sampleSize = 16).count()
      }
      // graph point-DELETE at mult× vectors: a FIXED 100-id tombstone
      // batch (ids [100, 200) — disjoint from the query set) through
      // deleteFromGraph. Tombstoning is two broadcast anti-joins, the
      // re-link is ONE lost-edges ⋈ deleted-out-edges join (≤ batch×k²
      // candidate rows, corpus-independent), and the repair round is
      // one NN-descent pass over the survivor edge set — ≈ a third of
      // nnd_build and scaling like it, vs a full rebuild's
      // init + 3 rounds. The line prices retention-pass maintenance
      // honestly: cheaper than rebuild by a constant factor, linear
      // like everything that touches every node's adjacency. (A first
      // cut re-beam-searched every orphan: 8.9/18.0 s at 1×/4× vs the
      // build's 4.8/4.7 — a repair costlier than reconstruction.)
      val tNndDelete = time {
        graft.search.NnGraph.deleteFromGraph(emb, nndGraph,
          emb.filter(col("vec_id") >= 100 && col("vec_id") < 200)
            .select(col("vec_id")), k = 10).count()
      }

      // SHARDED graph build + fan-out serve at mult× vectors (4
      // shards): the unified build runs every shard's NN-descent
      // simultaneously in the job count of ONE build (edges never
      // cross shards), so the column should track nnd_build — while
      // producing 4 INDEPENDENT per-shard graphs, each buildable and
      // servable on its own executor group at 100 TB (the
      // Faiss-IndexShards / DiskANN-partition contract). The serve
      // walks all 4 shards as one composite beam and merges per-query
      // top-k — expect ~nnd_serve with a 4× candidate budget.
      var shardGraph: DataFrame = null
      val tShardBuild = time {
        shardGraph = graft.search.NnGraph.buildShardedGraph(emb,
          numShards = 4, k = 10, iters = 3, sampleSize = 16)
      }
      val tShardServe = time {
        graft.search.NnGraph.shardedGraphTopK(emb, shardGraph, qs, 10,
          numShards = 4, beamWidth = 16, iters = 4, sampleSize = 16).count()
      }

      // full-interaction maxsim at mult× vectors (docs = vec_id div 4
      // token groups, 5 fixed queries): the (query, doc, qt) max
      // aggregate is the only corpus-sized exchange (map-side
      // combined), the top-k tail is bounded heaps — expect ~linear
      val maxsimQ = emb.filter(col("vec_id") < 20)
        .select((col("vec_id") / 4).cast("long").as("query_id"),
          (col("vec_id") % 4).as("qt"), col("embedding").as("qvec"))
      val maxsimDocs = emb.select((col("vec_id") / 4).cast("long").as("doc_id"),
        col("vec_id"), col("embedding"))
      val tMaxsim = time {
        graft.search.Knn.maxsimTopK(maxsimDocs, maxsimQ, 10, 4).count()
      }
      // two-stage maxsim: the gather is 20 single-vector top-8 scans
      // (bounded heaps), scoring touches <= 32 candidate docs/query —
      // the flat-over-corpus stage; expect the gather's knn-like line
      val tMaxsimAnn = time {
        val tq = emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
        val cands = graft.search.Knn.bruteForceTopK(emb, tq, 8)
          .select((col("query_id") / 4).cast("long").as("query_id"),
            (col("vec_id") / 4).cast("long").as("doc_id"))
          .distinct()
        graft.search.Knn.maxsimTopKCandidates(maxsimDocs, maxsimQ, cands,
          10, 4).count()
      }
      // PLAID-shaped maxsim: the gather walks the ALREADY-BUILT graph
      // (20 token beam walks, budget corpus-independent) instead of
      // flat-scanning the token index — this column should stay ~flat
      // where maxsim_ann's gather grows with the corpus
      val tMaxsimPlaid = time {
        val tq = emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
        val cands = graft.search.NnGraph.graphTopK(emb, nndGraph, tq, 8,
            beamWidth = 16, iters = 4, sampleSize = 16)
          .select((col("query_id") / 4).cast("long").as("query_id"),
            (col("vec_id") / 4).cast("long").as("doc_id"))
          .distinct()
        graft.search.Knn.maxsimTopKCandidates(maxsimDocs, maxsimQ, cands,
          10, 4).count()
      }
      // PLAID with the COMPRESSED token index at mult× tokens: codebook
      // training is two narrow passes (linear), the walk scores CODE
      // ROWS via per-query ADC LUTs (m table lookups per scored row —
      // the r20 LUT path, vs the old decode-then-dot's m·subDim
      // multiply-adds) at the 2×-oversampled cut, rescore reads
      // full-width for the gathered docs only — expect the plaid
      // column's near-flat serve plus a linear train+encode
      val tMaxsimPq = time {
        val cw = graft.search.Ann.trainPqCodebooks(emb, m = 8,
          numCodes = 16, iters = 2)
        val codes = graft.search.Ann.pqEncodeFrame(emb, 8, cw)
        val tq = emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
        val cands = graft.search.NnGraph.graphTopKAdc(codes, nndGraph, tq,
            16, beamWidth = 16, iters = 4, sampleSize = 16, cw)
          .select((col("query_id") / 4).cast("long").as("query_id"),
            (col("vec_id") / 4).cast("long").as("doc_id"))
          .distinct()
        graft.search.Knn.maxsimTopKCandidates(maxsimDocs, maxsimQ, cands,
          10, 4).count()
      }
      // MRL graph funnel at mult× vectors: the build runs on the
      // 4×-narrower re-normalized prefixes (expect ~nnd_build/4 per
      // dot), the 50-wide walk proposes corpus-independently, the
      // rescore reads full-width for ≤ 50 rows/query
      val mrlPrefix = emb
        .select(col("vec_id"), slice(col("embedding"), 1, 16).as("tvec"))
        .withColumn("nrm", sqrt(aggregate(col("tvec"), lit(0.0),
          (a, x) => a + x.cast("double") * x.cast("double"))))
        .filter(col("nrm") > 0)
        .select(col("vec_id"), transform(col("tvec"),
          x => (x.cast("double") / col("nrm")).cast("float"))
          .as("embedding"))
      var mrlGraph: DataFrame = null
      val tMrlgBuild = time {
        mrlGraph = graft.search.NnGraph.buildGraph(mrlPrefix, k = 10,
          iters = 3, sampleSize = 16)
      }
      val tMrlgServe = time {
        val pq10 = mrlPrefix.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
        val props = graft.search.NnGraph.graphTopK(mrlPrefix, mrlGraph,
            pq10, 50, beamWidth = 50, iters = 4, sampleSize = 16)
          .select(col("query_id"), col("vec_id"))
        val fullQ = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
        val qw = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(col("sim").desc, col("vec_id").asc)
        emb.join(broadcast(props), "vec_id")
          .join(broadcast(fullQ), "query_id")
          .select(col("query_id"), col("vec_id"),
            graft.functions.Vec.dot(col("qvec"), col("embedding")).as("sim"))
          .select(col("query_id"), row_number().over(qw).as("rank"),
            col("vec_id"))
          .filter(col("rank") <= 10).count()
      }
      // Gramian + power iteration at mult× vectors: the d×d partition
      // accumulators make the corpus scan the ONLY growing stage
      // (4096 multiply-adds per row); iteration cost is driver-constant
      val tPca = time {
        graft.queries.Similarity.embedPcaOf(emb, 64).count()
      }
      // Bloom ingest screen at mult× documents: band signatures are the
      // corpus-sized work (one |docs|-row aggregate), the bit set stays
      // m-bounded and broadcast, the verify join carries only
      // bloom-positive keys — expect ~linear in rows
      val tBloomIngest = time {
        graft.queries.DedupQueries.dedupBloomIngestOf(corpus(m)).count()
      }
      // no-split packing at mult× documents over the FIXED 32 buckets:
      // per-task fold state grows with corpus/32 (the shard-count knob
      // a deployment turns with corpus size — held fixed here to
      // measure the fold itself)
      val tPackNosplit = time {
        graft.queries.TextAnalysis.packNosplitOf(corpus(m)).count()
      }

      // dedup_minhash_recall meter at mult× DISJOINT replicas: every
      // token carries its replica id, so shingle dfs stay CONSTANT as
      // rows grow and the uncapped true-pair join's Σdf² cost is linear
      // in rows — the envelope under which the meter is viable on a
      // validation sample. (The duplicated-corpus adversary inflates
      // dfs m×, making the same join quadratic by design — that case is
      // the documented reason the meter is oracle/sample-only, and it
      // is deliberately not run at 64×.)
      // the uncapped true-pair join carries heavy-hitter shingles
      // (shared boilerplate), so even at constant dfs its absolute cost
      // is the n²-class baseline's — measured to 16× (7.5/43/~170 s,
      // ~linear in rows as predicted); 64× would add ~12 idle minutes
      // to every soak run for a fourth point on an established line
      val tMinhashRecall = if (m > 16) -1.0 else time {
        val disjoint = corpus(m).select(col("doc_id"),
          concat_ws(" ", expr(
            "transform(split(trim(text), '\\s+'), t -> concat(t, '_r', doc_id % " + m + "))"))
            .as("text"))
        val sh = graft.dedup.Dedup.shingleSet(disjoint, "doc_id", "text").cache()
        sh.count()
        val tp = graft.dedup.Dedup.pairJaccard(sh, maxDf = Int.MaxValue)
          .filter(col("jac") >= 0.7).select(col("a"), col("b")).cache()
        val cands = graft.dedup.Dedup.lshCandidates(
          graft.dedup.Dedup.lshBands(graft.dedup.Dedup.minhash(sh, 16), 4),
          droppedBuckets = Some(dropAcc))
        graft.dedup.Dedup.candidateJaccard(sh, cands)
          .filter(col("jac") >= 0.7).select(col("a"), col("b"))
          .join(tp, Seq("a", "b"), "left_semi").count()
      }
      // cache teardown OUTSIDE the timed window (the textrank-fix
      // pattern): charging clearCache — including the shared emb entry —
      // to the minhash-recall number was the same mischarge. No later
      // block reads emb through the cache (tFuzzy is synthetic; emb
      // unpersists below).
      spark.sharedState.cacheManager.clearCache()

      // winnowing pair stage at mult×: the duplicated corpus turns every
      // fingerprint posting into an m-clique (df = m × base_df), so the
      // measured growth is the Σ min(df, cap)² pair-join cost — the
      // minhash_dedup clique stress replayed on the winnowing posting
      // space, where dfs are ~1 at base (fingerprints are near-unique by
      // design) and the duplication factor IS the df. The shared-count
      // groupBy then processes one row per clique pair per shared
      // fingerprint — the quadratic member this envelope exists to see.
      val tWinnow = time {
        graft.queries.DedupQueries
          .dedupWinnowOf(corpus(m), graft.queries.DedupQueries.WinnowMaxDf)
          .count()
      }

      // fuzzy vocab join at mult×2000 synthetic tokens (4-syllable
      // pseudo-words): most 2-gram blocks exceed the df cap on this
      // dense vocabulary, so the measured growth is the CAPPED path —
      // sub-quadratic by construction, with the drop audit counting
      // what the cap discarded. An uncapped run would be Σ block².
      val fuzzyDropAcc = graft.queries.TextAnalysis.vocabFuzzyDroppedBlocksAcc(spark)
      val fuzzyDropBefore = fuzzyDropAcc.value
      val tFuzzy = time {
        val syl = "ba,be,bi,bo,bu,da,de,di,do,du,ka,ke,ki,ko,ku,ma,me,mi,mo,mu"
        val vocab = spark.range(m.toLong * 2000)
          .select(expr(
            s"""concat(
               |  split('$syl', ',')[CAST(id / 8000 AS INT) % 20],
               |  split('$syl', ',')[CAST(id / 400 AS INT) % 20],
               |  split('$syl', ',')[CAST(id / 20 AS INT) % 20],
               |  split('$syl', ',')[CAST(id AS INT) % 20],
               |  CAST(id AS STRING))""".stripMargin).as("tok"))
        graft.queries.TextAnalysis
          .vocabFuzzyPairsOf(vocab, graft.queries.TextAnalysis.VocabGramMaxDf)
          .count()
      }
      val fuzzyDrops = fuzzyDropAcc.value - fuzzyDropBefore

      // sparse-regime twin (round-12 verdict #6): the dense vocabulary
      // above saturates the df cap everywhere, so its column measures
      // only the CAPPED path. This rung draws 10-char tokens from a
      // 128-char pseudo-random alphabet (md5-derived, chr(128+7bit) —
      // no sentinel collision), giving ~16k distinct interior 2-grams:
      // measured avg dfs 2.0/5.4/21 at 1/4/16× with ≥98.5% of blocks
      // under the 64 cap (the measured growth is the TRUE sub-cap
      // blocked-join cost) and avg 85 at 64× with ~24% under (the cap
      // engages — the drop audit records the regime transition).
      // Together the two columns cover both regimes the cap design
      // argues about.
      val fuzzySparseDropBefore = fuzzyDropAcc.value
      val tFuzzySparse = time {
        val vocab = spark.range(m.toLong * 2000)
          .select(expr(
            """concat_ws('', transform(sequence(0, 9), j ->
              |  chr(128 + cast(conv(substring(md5(cast(id as string)), 2*j+1, 2), 16, 10) as int) % 128)))"""
              .stripMargin).as("tok"))
        graft.queries.TextAnalysis
          .vocabFuzzyPairsOf(vocab, graft.queries.TextAnalysis.VocabGramMaxDf)
          .count()
      }
      val fuzzySparseDrops = fuzzyDropAcc.value - fuzzySparseDropBefore

      emb.unpersist()
      spark.sharedState.cacheManager.clearCache()

      println(f"SOAK mult=$m%2d docs=$nDocs%7d  chunk+embed+retrieve=${tRag}%7.2f s  minhash_dedup=${tDedup}%7.2f s  components=${tCc}%7.2f s  bm25=${tBm25}%7.2f s  boilerplate=${tBoiler}%7.2f s  media_decode=${tDecode}%7.2f s  vecs=$nVecs%7d  knn_topk=${tKnn}%6.2f s  knn_lsh=${tLsh}%6.2f s  ann_ivf=${tIvf}%6.2f s  ann_pq=${tPq}%6.2f s  ann_ivf_pq=${tIvfPq}%6.2f s  ann_ivf_pq_res=${tIvfPqRes}%6.2f s  ann_ivf_sq=${tIvfSq}%6.2f s  retrieve_mmr=${tMmr}%6.2f s  ann_binary=${tBinary}%6.2f s  ann_rp=${tRp}%6.2f s  coreset=${tCoreset}%6.2f s  bpe_train=${tBpe}%6.2f s  dsir=${tDsir}%6.2f s  quality_lr=${tQualityLr}%6.2f s  textrank=${tTextrank}%6.2f s  dedup_semantic=${tSemDedup}%6.2f s  ann_recall3=${tAnnRecall}%6.2f s  nnd_build=${tNndBuild}%7.2f s  nnd_serve=${tNndServe}%6.2f s  nnd_delete=${tNndDelete}%7.2f s  shard_build=${tShardBuild}%7.2f s  shard_serve=${tShardServe}%6.2f s  maxsim=${tMaxsim}%6.2f s  maxsim_ann=${tMaxsimAnn}%6.2f s  maxsim_plaid=${tMaxsimPlaid}%6.2f s  maxsim_pq=${tMaxsimPq}%6.2f s  mrlg_build=${tMrlgBuild}%6.2f s  mrlg_serve=${tMrlgServe}%6.2f s  pca=${tPca}%6.2f s  bloom_ingest=${tBloomIngest}%6.2f s  pack_nosplit=${tPackNosplit}%6.2f s  minhash_recall=${tMinhashRecall}%6.2f s  winnow=${tWinnow}%6.2f s  fuzzy_vocab=${tFuzzy}%6.2f s  fuzzy_dropped_blocks=${fuzzyDrops}  fuzzy_sparse=${tFuzzySparse}%6.2f s  fuzzy_sparse_dropped=${fuzzySparseDrops}  dropped_buckets=${dropAcc.value - dropBefore}")
    }
    spark.stop()
  }
}
