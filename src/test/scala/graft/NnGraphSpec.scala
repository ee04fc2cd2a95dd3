package graft

import org.apache.spark.sql.functions._

/** Graph-ANN family ([[graft.search.NnGraph]]): NN-descent construction
  * invariants, beam-search output contract, build-artifact hygiene, and
  * the measured recall bar vs the sampled-cell IVF path (round-15
  * verdict #3's done-criterion).
  */
class NnGraphSpec extends SparkSpec {
  import graft.search.NnGraph

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, dir)

  test("buildGraph: <= k out-edges per node, no self-edges, ids cover the index") {
    val g = NnGraph.buildGraph(emb, k = 6, iters = 1, sampleSize = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(g.nonEmpty)
    assert(g.forall { case (id, nbr, _) => id != nbr }, "self-edge")
    val deg = g.groupBy(_._1).view.mapValues(_.length)
    assert(deg.values.forall(_ <= 6), "out-degree cap")
    // every index vector has a neighborhood (init guarantees >= 1)
    assert(deg.size == emb.count())
    // neighbor lists are duplicate-free
    assert(g.map(e => (e._1, e._2)).distinct.length == g.length)
  }

  test("buildGraph: edge set is partitioning-invariant and deterministic") {
    def edgeSet(parts: Int) =
      NnGraph.buildGraph(emb.repartition(parts), k = 5, iters = 1,
          sampleSize = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a = edgeSet(1)
    val b = edgeSet(13)
    assert(a == b, "the 100 TB property: construction may not depend on layout")
  }

  test("buildGraph leaves no persisted RDDs behind (artifact-served, not cached)") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val g = NnGraph.buildGraph(emb, k = 4, iters = 1, sampleSize = 8)
    g.count()
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "build intermediates must be unpersisted and the graph served " +
        "from the parquet artifact — a lingering block breaks every " +
        "exact-count cache invariant in the suite")
    // the serve plan is a plain file scan: survives caller clearCache
    spark.catalog.clearCache()
    assert(g.count() > 0)
  }

  test("graphTopK: k ranked rows per query, ranks dense from 1, hits are index ids") {
    val g = NnGraph.buildGraph(emb, k = 8, iters = 2, sampleSize = 16)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val res = NnGraph.graphTopK(emb, g, queries, k = 7, beamWidth = 12,
        iters = 3, sampleSize = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(res.map(_._1).distinct.sorted.toSeq == (0L to 4L))
    for (q <- 0L to 4L) {
      val ranks = res.filter(_._1 == q).map(_._2).sorted.toSeq
      assert(ranks == (1 to 7), s"query $q ranks: $ranks")
    }
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(res.forall(r => ids.contains(r._3)))
  }

  test("graphTopKFiltered: every hit matches its query's label; scarce labels under-fill honestly") {
    import org.apache.spark.sql.functions.col
    // 12 vectors, label A on ids {0, 3, 7} only: a query with label A
    // must return ONLY those (3 rows — under-fill, never padding with
    // mismatched labels), and the full-graph navigation must still
    // find them even though the seeds are label-blind
    val spark2 = spark
    import spark2.implicits._
    val rows = (0L until 12L).map { i =>
      val lab = if (i == 0 || i == 3 || i == 7) 0 else 1
      (i, Array.tabulate(8)(j => if (j == (i % 8).toInt) 1f else 0.1f), lab)
    }
    val idx = rows.toDF("vec_id", "embedding", "label")
    val g = NnGraph.buildGraph(idx, k = 4, iters = 2, sampleSize = 8)
    val q = idx.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    val res = NnGraph.graphTopKFiltered(idx, g, q, k = 10, beamWidth = 8,
        iters = 3, sampleSize = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(res.map(_._3).toSet == Set(0L, 3L, 7L), res.mkString("; "))
    assert(res.map(_._2).sorted.toSeq == Seq(1, 2, 3), "dense ranks, no padding")
  }

  test("measured filtered recall: graph traversal beats the filtered-IVF composition") {
    val rows = graft.queries.Similarity.annRecallGraphFiltered(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("ann_graph_filtered", "ann_ivf_filtered"))
    assert(rows("ann_graph_filtered") > rows("ann_ivf_filtered"),
      s"graph ${rows("ann_graph_filtered")} vs ivf ${rows("ann_ivf_filtered")}")
  }

  test("insertIntoGraph: new nodes join the adjacency, caps hold, self found after insert") {
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    val all = (0L until 16L).map { i =>
      (i, Array.tabulate(8)(j => if (j == (i % 8).toInt) 1f else 0.05f * (i % 3)))
    }
    val idx = all.toDF("vec_id", "embedding")
    val base = idx.filter(col("vec_id") >= 4L)
    val nv = idx.filter(col("vec_id") < 4L)
    val g0 = NnGraph.buildGraph(base, k = 4, iters = 2, sampleSize = 8)
    val g1 = NnGraph.insertIntoGraph(base, g0, nv, k = 4, beamWidth = 8,
      iters = 3, sampleSize = 8)
    val edges = g1.collect().map(r => (r.getLong(0), r.getLong(1)))
    // every node — inserted AND base — has a neighborhood, capped at k
    val deg = edges.groupBy(_._1).view.mapValues(_.length)
    assert((0L until 16L).forall(deg.contains), "inserted nodes must join")
    assert(deg.values.forall(_ <= 4))
    assert(edges.forall { case (a, b) => a != b })
    // serve-after-insert: a query identical to an inserted vector must
    // find it at rank 1 (the add_vectors user contract)
    val q = nv.filter(col("vec_id") === 2L)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val hit = NnGraph.graphTopK(idx, g1, q, k = 3, beamWidth = 8,
      iters = 3, sampleSize = 8).collect()
    assert(hit.exists(r => r.getInt(1) == 1 && r.getLong(2) == 2L),
      hit.mkString("; "))
  }

  test("measured insert recall: incremental maintenance ~ full rebuild") {
    // the insert path's whole point: ingest without rebuild at near-zero
    // quality cost (sweep: 82 vs 83 at sf0.01). Allow a small band —
    // the batch insert sees base-only neighbors before its repair round.
    val rows = graft.queries.Similarity.annRecallGraphInsert(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("ann_graph", "ann_graph_insert"))
    assert(rows("ann_graph_insert") >= rows("ann_graph") - 10,
      s"insert ${rows("ann_graph_insert")} vs rebuild ${rows("ann_graph")}")
    assert(rows("ann_graph_insert") >= 70,
      s"insert-path recall regression: ${rows("ann_graph_insert")}")
  }

  test("deleteFromGraph: tombstoned ids vanish from the adjacency and from every search") {
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    // 16 clustered vectors; delete the batch {4..7} — including vector
    // 5, which is (by construction) the nearest neighbor of vector 13
    val all = (0L until 16L).map { i =>
      (i, Array.tabulate(8)(j => if (j == (i % 8).toInt) 1f else 0.05f * (i % 3)))
    }
    val idx = all.toDF("vec_id", "embedding")
    val g0 = NnGraph.buildGraph(idx, k = 4, iters = 2, sampleSize = 8)
    val del = (4L until 8L).toDF("vec_id")
    val g1 = NnGraph.deleteFromGraph(idx, g0, del, k = 4)
    val edges = g1.collect().map(r => (r.getLong(0), r.getLong(1)))
    val deleted = (4L until 8L).toSet
    // no deleted id on EITHER side of any edge — unreachable by construction
    assert(edges.forall { case (a, b) => !deleted(a) && !deleted(b) },
      edges.filter { case (a, b) => deleted(a) || deleted(b) }.mkString("; "))
    // every survivor keeps a neighborhood, capped at k, no self-edges
    val deg = edges.groupBy(_._1).view.mapValues(_.length)
    assert((0L until 16L).filterNot(deleted).forall(deg.contains),
      "survivors that lost edges must be re-linked, not orphaned")
    assert(deg.values.forall(_ <= 4))
    assert(edges.forall { case (a, b) => a != b })
    // serve-after-delete: no deleted id is ever returned, and a query
    // identical to a deleted vector resolves to the nearest SURVIVOR
    val surv = idx.filter(!col("vec_id").isin(4L to 7L: _*))
    val q = idx.filter(col("vec_id") === 5L)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val hits = NnGraph.graphTopK(surv, g1, q, k = 5, beamWidth = 8,
      iters = 3, sampleSize = 8).collect().map(_.getLong(2))
    assert(hits.nonEmpty && hits.forall(!deleted(_)), hits.mkString(", "))
    // vector 13 shares 5's direction (both i%8 == 5): the top survivor
    assert(hits.head == 13L, s"nearest survivor expected 13, got ${hits.head}")
  }

  test("measured delete recall: tombstone+repair ~ survivors-only rebuild") {
    // the delete path's whole point: expire documents without a rebuild
    // at no quality cost (sweep: 92 vs 88 at sf0.01 — the tombstoned
    // graph starts from the FULL build's knowledge, so it can even edge
    // out the rebuild; the bridge repair also beat the first-cut beam
    // re-link's 90 at a fraction of its cost). Allow the same band the
    // insert meter uses.
    val rows = graft.queries.Similarity.annRecallGraphDelete(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("ann_graph_delete", "ann_graph_rebuild"))
    assert(rows("ann_graph_delete") >= rows("ann_graph_rebuild") - 10,
      s"delete ${rows("ann_graph_delete")} vs rebuild ${rows("ann_graph_rebuild")}")
    assert(rows("ann_graph_delete") >= 70,
      s"delete-path recall regression: ${rows("ann_graph_delete")}")
  }

  test("ann_tune_beam: budget rungs are monotone in cost; the middle rung IS the production path") {
    val rows = graft.queries.Similarity.annTuneBeam(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(t => (t._1, t._2)).toSeq == Seq((8, 3), (16, 4), (32, 5)))
    // the cost axis must be strictly monotone (a rung that doesn't buy
    // candidates is mislabeled), and recall should not COLLAPSE as the
    // budget grows (small non-monotonicities are possible in principle;
    // a cheaper rung beating a pricier one by a wide margin is a bug)
    assert(rows.toSeq.sliding(2).forall { case Seq(a, b) => a._5 < b._5 },
      rows.mkString("; "))
    assert(rows.toSeq.sliding(2).forall { case Seq(a, b) => b._3 >= a._3 - 5 },
      rows.mkString("; "))
    // rung (16,4) is exactly the production (BeamWidth, BeamIters):
    // its hits must equal the ann_recall_graph meter's graph row
    val prod = graft.queries.Similarity.annRecallGraph(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.find(t => t._1 == 16 && t._2 == 4).get._3 == prod("ann_graph"),
      s"tune middle rung vs ann_recall_graph: $rows vs $prod")
  }

  test("measured quantized-navigation recall: int8 walk + rescore ~ float walk") {
    // the graph analog of the trained-SQ8 zero-cost finding: navigating
    // with integer dots and rescoring the final beam exactly should
    // cost ~nothing vs the float walk (the rescore recovers int8
    // tie-collapse inside the beam; only a candidate the int8 walk
    // never visits is lost)
    val rows = graft.queries.Similarity.annRecallGraphSq(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("ann_graph", "ann_graph_sq"))
    assert(rows("ann_graph_sq") >= rows("ann_graph") - 10,
      s"sq ${rows("ann_graph_sq")} vs float ${rows("ann_graph")}")
    assert(rows("ann_graph_sq") >= 70,
      s"quantized-navigation recall regression: ${rows("ann_graph_sq")}")
  }

  test("measured sign-bit-navigation recall: 1-bit walk + rescore stays usable, int8 stays close to float") {
    // the BQ row of the graph x quantizer matrix: sign vectors carry
    // only the orientation octant, so some recall loss vs int8 is
    // expected — the meter exists to PRICE it; it must not collapse
    // (a sub-half recall would mean the d-2*ham ranking is broken)
    val rows = graft.queries.Similarity.annRecallGraphBinary(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("ann_graph_binary", "ann_graph_sq"))
    assert(rows("ann_graph_binary") >= 50,
      s"sign-bit-navigation recall collapse: ${rows("ann_graph_binary")}")
    assert(rows("ann_graph_binary") <= rows("ann_graph_sq") + 10,
      s"binary ${rows("ann_graph_binary")} vs sq ${rows("ann_graph_sq")}: " +
        "1-bit navigation beating 8-bit by a wide margin suggests a " +
        "scoring mixup")
  }

  test("annGraphBinary: beam covering the whole corpus degenerates to exact top-k") {
    // with the corpus no larger than the seed sample every vector is
    // scored at entry, survives the sign-dot beam (width >= corpus),
    // and the exact-float rescore IS exact search — the true invariant
    // (the annBinary r = n degeneration, graph edition)
    val tiny = emb.filter(col("vec_id") < 12)
    val g = NnGraph.buildGraph(tiny, k = 4, iters = 1, sampleSize = 16)
    val queries = tiny.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val btiny = tiny.select(col("vec_id"),
      transform(col("embedding"),
        x => when(x > lit(0.0f), lit(1.0f)).otherwise(lit(-1.0f)))
        .as("embedding"))
    val navQ = btiny.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val got = NnGraph.graphTopKRescored(btiny, navQ, tiny, queries, g,
        k = 5, beamWidth = 12, iters = 2, sampleSize = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = graft.search.Knn.bruteForceTopK(tiny, queries, 5)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == exact, "full-coverage sign-bit walk + exact rescore " +
      "must equal exact top-k")
  }

  test("graphTopKRescored: rescored hits are a subset of the navigation beam, ranks dense") {
    val g = NnGraph.buildGraph(emb, k = 8, iters = 2, sampleSize = 16)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    // nav == score here (identity "quantization") must reproduce
    // graphTopK exactly — the rescore is then a no-op re-rank
    val a = NnGraph.graphTopKRescored(emb, queries, emb, queries, g,
        k = 7, beamWidth = 12, iters = 3, sampleSize = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = NnGraph.graphTopK(emb, g, queries, k = 7, beamWidth = 12,
        iters = 3, sampleSize = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b, "identity rescore must equal the plain walk")
  }

  test("measured recall: graph path beats the sampled-cell IVF path on the fixture") {
    // the verdict #3 done-bar, asserted against the LIVE meter (the
    // oracle pins the numbers; this pins the ordering so a parameter
    // regression fails fast). Parameter-sweep context: 86 vs 61 at
    // sf0.001, 83 vs 49 at sf0.01.
    val rows = graft.queries.Similarity.annRecallGraph(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("ann_graph", "ann_ivf"))
    assert(rows("ann_graph") > rows("ann_ivf"),
      s"graph recall ${rows("ann_graph")} must beat IVF ${rows("ann_ivf")}")
    assert(rows("ann_graph") >= 80, s"recall regression: ${rows("ann_graph")}")
  }

  test("graphTopKAdc: full-coverage walk degenerates to the exact ADC scan (pqTopKWith)") {
    // with the corpus no larger than the seed sample every code row is
    // scored at entry, survives the beam (width >= corpus), and the
    // LUT-ordered top-k IS the exact asymmetric-distance scan — the
    // annGraphBinary degeneration, ADC edition. Both sides build the
    // per-query LUT the same way (d-ascending double dots) and sum it
    // j-ascending, so equality here pins the LUT association the
    // oracle replays.
    import graft.search.Ann
    val tiny = emb.filter(col("vec_id") < 24)
    val cw = Ann.trainPqCodebooks(tiny, m = 8, numCodes = 16, iters = 2)
    val codes = Ann.pqEncodeFrame(tiny, 8, cw)
    val g = NnGraph.buildGraph(tiny, k = 4, iters = 1, sampleSize = 16)
    val queries = tiny.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val got = NnGraph.graphTopKAdc(codes, g, queries, k = 5,
        beamWidth = 24, iters = 2, sampleSize = 24, cw)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = Ann.pqTopKWith(tiny, queries, 5, 8, cw)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == exact,
      "full-coverage ADC walk must equal the exact ADC scan")
  }

  test("graphTopKAdc: iters == 0 is the ranked entry beam over the seed sample (the beamWithSims contract)") {
    import graft.search.Ann
    val tiny = emb.filter(col("vec_id") < 40)
    val cw = Ann.trainPqCodebooks(tiny, m = 8, numCodes = 16, iters = 2)
    val codes = Ann.pqEncodeFrame(tiny, 8, cw)
    val g = NnGraph.buildGraph(tiny, k = 4, iters = 1, sampleSize = 8)
    val queries = tiny.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val seedIds = NnGraph.seedSample(tiny, 8)
      .collect().map(_.getLong(0)).toSet
    val got = NnGraph.graphTopKAdc(codes, g, queries, k = 3,
        beamWidth = 8, iters = 0, sampleSize = 8, cw)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.forall(r => seedIds.contains(r._3)),
      "a zero-iteration walk may only return entry candidates")
    // equals the exact ADC scan RESTRICTED to the seed sample
    val exact = Ann.pqTopKWith(
        tiny.filter(col("vec_id").isin(seedIds.toSeq: _*)), queries, 3,
        8, cw)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got.toSet == exact,
      "the entry beam must be the ADC ranking of the seed sample")
  }

  test("buildShardedGraph with numShards = 1 IS buildGraph, bitwise") {
    // shard 0 = everything, the per-shard seed ranking = the global
    // ranking — one shard degenerates the whole sharded machinery to
    // the monolithic build
    val a = NnGraph.buildShardedGraph(emb, numShards = 1, k = 5,
        iters = 2, sampleSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = NnGraph.buildGraph(emb, k = 5, iters = 2, sampleSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b, "numShards = 1 must be the monolithic build")
  }

  test("buildShardedGraph: edges never cross shards, and each shard's graph IS the independent per-shard build") {
    val nS = 2
    val sharded = NnGraph.buildShardedGraph(emb, nS, k = 6, iters = 2,
        sampleSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sharded.nonEmpty)
    assert(sharded.forall { case (id, nbr, _) => id % nS == nbr % nS },
      "an edge crossed shards — the independent-build contract is broken")
    // the 100 TB claim made literal: the unified build (one job chain
    // for all shards) must equal running buildGraph independently on
    // each shard's vectors — so at scale each shard CAN build alone
    // on its own executor group and nothing changes
    val independent = (0 until nS).flatMap { s =>
      NnGraph.buildGraph(emb.filter(col("vec_id") % nS === s), k = 6,
          iters = 2, sampleSize = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }.toSet
    assert(sharded == independent,
      "unified sharded build diverged from independent per-shard builds")
  }

  test("insertIntoShardedGraph: edges stay in-shard and the result IS independent per-shard inserts") {
    val nS = 2
    val base = emb.filter(col("vec_id") >= 24)
    val nv = emb.filter(col("vec_id") < 24)
      .select(col("vec_id"), col("embedding"))
    val g = NnGraph.buildShardedGraph(base, nS, k = 5, iters = 2,
      sampleSize = 8)
    val got = NnGraph.insertIntoShardedGraph(base, g, nv, nS, k = 5,
        beamWidth = 10, iters = 3, sampleSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.forall { case (id, nbr, _) => id % nS == nbr % nS },
      "a maintained edge crossed shards")
    // equals running the monolithic insert independently on each
    // shard's base/new slice — the property that lets each shard's
    // serving group ingest alone at 100 TB
    val independent = (0 until nS).flatMap { s =>
      val baseS = base.filter(col("vec_id") % nS === s)
      val gS = g.filter(col("id") % nS === s)
      NnGraph.insertIntoGraph(baseS, gS,
          nv.filter(col("vec_id") % nS === s), k = 5, beamWidth = 10,
          iters = 3, sampleSize = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }.toSet
    assert(got == independent,
      "sharded insert diverged from independent per-shard inserts")
  }

  test("insertIntoShardedGraph: NEGATIVE vec_ids use the same signed shard as build/seed (ADVICE r20)") {
    // shard = signed `vec_id % numShards` everywhere: buildShardedGraph
    // (Scala %), shardedSeedSample (Spark %), and — fixed this round —
    // the insert's entry filter (previously pmod, which never matched a
    // negative id's negative shard, so new negative nodes got an EMPTY
    // entry beam and were silently inserted with no out-edges).
    val nS = 2
    val negEmb = emb.select((col("vec_id") - 50).as("vec_id"), col("embedding"))
    val base = negEmb.filter(col("vec_id") >= -26)
    val nv = negEmb.filter(col("vec_id") < -26)
      .select(col("vec_id"), col("embedding"))
    val g = NnGraph.buildShardedGraph(base, nS, k = 5, iters = 2,
      sampleSize = 8)
    val got = NnGraph.insertIntoShardedGraph(base, g, nv, nS, k = 5,
        beamWidth = 10, iters = 3, sampleSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // every inserted node has out-edges (the pmod bug left them empty)
    val insertedIds = nv.collect().map(_.getLong(0)).toSet
    val outDeg = got.groupBy(_._1)
    assert(insertedIds.forall(id => outDeg.contains(id)),
      "an inserted negative-id node has no out-edges — entry beam was empty")
    assert(got.forall { case (id, nbr, _) => id % nS == nbr % nS },
      "a maintained edge crossed (signed) shards")
    // equals independent per-shard inserts over the SIGNED shard
    // values — a mixed-sign corpus occupies THREE of them at nS = 2
    // (-1 for negative odd, 0 for even, 1 for positive odd): that IS
    // the signed-% semantics the scaladoc documents
    val shards = Seq(-1L, 0L, 1L)
    val independent = shards.flatMap { s =>
      val baseS = base.filter(col("vec_id") % nS === s)
      val gS = g.filter(col("id") % nS === s)
      NnGraph.insertIntoGraph(baseS, gS,
          nv.filter(col("vec_id") % nS === s), k = 5, beamWidth = 10,
          iters = 3, sampleSize = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }.toSet
    assert(got == independent,
      "negative-id sharded insert diverged from independent per-shard inserts")
  }

  test("graphTopKAdc: k > beamWidth caps at the beam cut (the graphTopK/oracle-ladder contract) and a zero-subspace codebook returns empty") {
    import graft.search.Ann
    val tiny = emb.filter(col("vec_id") < 24)
    val cw = Ann.trainPqCodebooks(tiny, m = 8, numCodes = 16, iters = 2)
    val codes = Ann.pqEncodeFrame(tiny, 8, cw)
    val g = NnGraph.buildGraph(tiny, k = 4, iters = 1, sampleSize = 8)
    val queries = tiny.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val atBw = NnGraph.graphTopKAdc(codes, g, queries, k = 4,
        beamWidth = 4, iters = 2, sampleSize = 8, cw)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val overBw = NnGraph.graphTopKAdc(codes, g, queries, k = 9,
        beamWidth = 4, iters = 2, sampleSize = 8, cw)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(overBw == atBw,
      "k > beamWidth must see the final beam cut, not the raw candidate set")
    // degenerate: a codebook with an empty subspace list (nc = 0) is
    // invalid input — the guard returns the empty frame instead of
    // throwing (ADVICE r20: cw(0)(0) threw IndexOutOfBounds)
    val empty = NnGraph.graphTopKAdc(codes, g, queries, k = 3,
      beamWidth = 4, iters = 1, sampleSize = 8,
      Array(Array.empty[Array[Float]]))
    assert(empty.count() == 0)
  }

  test("deleteFromGraph on a sharded graph IS independent per-shard deletes (shard-preserving by construction)") {
    val nS = 2
    val g = NnGraph.buildShardedGraph(emb, nS, k = 5, iters = 2,
      sampleSize = 8)
    val del = emb.filter(col("vec_id") >= 10 && col("vec_id") < 30)
      .select(col("vec_id"))
    val got = NnGraph.deleteFromGraph(emb, g, del, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.forall { case (id, nbr, _) => id % nS == nbr % nS })
    val independent = (0 until nS).flatMap { s =>
      NnGraph.deleteFromGraph(emb.filter(col("vec_id") % nS === s),
          g.filter(col("id") % nS === s),
          del.filter(col("vec_id") % nS === s), k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }.toSet
    assert(got == independent,
      "sharded delete diverged from independent per-shard deletes")
  }

  test("shardedGraphTopK: fan-out serve equals per-shard walks merged by per-query top-k") {
    val nS = 2
    val g = NnGraph.buildShardedGraph(emb, nS, k = 8, iters = 2,
      sampleSize = 16)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val fanout = NnGraph.shardedGraphTopK(emb, g, queries, k = 7, nS,
        beamWidth = 12, iters = 3, sampleSize = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // reference: walk each shard separately (its own index subset, its
    // own graph slice — exactly what a per-shard serving group would
    // run), keep each walk's final beam WITH sims, merge per query
    val perShard = (0 until nS).flatMap { s =>
      val idx = emb.filter(col("vec_id") % nS === s)
      val gs = g.filter(col("id") % nS === s)
      graft.search.NnGraph.graphTopK(idx, gs, queries, k = 12,
          beamWidth = 12, iters = 3, sampleSize = 16)
        .join(idx.select(col("vec_id"), col("embedding")), "vec_id")
        .join(broadcast(queries), "query_id")
        .select(col("query_id"), col("vec_id"),
          graft.functions.Vec.dot(col("qvec"), col("embedding")).as("sim"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    val merged = perShard.groupBy(_._1).toSeq.flatMap { case (q, rows) =>
      rows.sortBy(t => (-t._3, t._2)).take(7).zipWithIndex
        .map { case ((_, vid, _), i) => (q, i + 1, vid) }
    }.toSet
    assert(fanout == merged,
      "fan-out serve diverged from independently-walked shards")
    // dense ranks per query
    for (q <- 0L to 4L) {
      val ranks = fanout.filter(_._1 == q).map(_._2).toSeq.sorted
      assert(ranks == (1 to 7), s"query $q ranks: $ranks")
    }
  }
}
