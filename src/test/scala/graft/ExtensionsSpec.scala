package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.embed.HashingEmbedder
import graft.multimodal.{MediaFixtures, Multimodal}
import graft.search.{Ann, Knn}
import graft.sources.{DocumentLoader, Sinks}
import graft.streaming.Streams

class DocumentLoaderSpec extends SparkSpec {

  test("recursive multi-format scan extracts per format and drops empties") {
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    DocumentLoader.writeSampleDocuments(s"$dir/sub")
    val stream = "BT /F1 12 Tf 72 720 Td (Glacier melt summary.) Tj ET"
    val realPdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${stream.length} >> stream\n" + stream + "\nendstream endobj\n" +
      "%%EOF\n").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/x.pdf"), realPdf)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/corrupt.pdf"),
      Array.fill[Byte](2048)(7)) // extracts empty -> dropped
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/empty.md"),
      Array.emptyByteArray)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/skip.txt"), "no")

    val docs = DocumentLoader.loadDocuments(spark, dir).collect()
    assert(docs.length == 4) // 3 samples + real pdf; corrupt + empty + txt dropped
    val pdf = docs.find(_.source_file.endsWith("x.pdf")).get
    assert(pdf.content == "--- Page 1 ---\nGlacier melt summary.")
    val md = docs.find(_.source_file.endsWith("alpine_survey.md")).get
    assert(md.content.contains("# Alpine Survey 2031"))
  }

  test("query JSON source round-trips the evaluation-set schema") {
    val dir = java.nio.file.Files.createTempDirectory("queries").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/q.json"),
      """[{"query_id":"q1","query":"snowpack trends",
        |"expected_keywords":["snowpack"],"expected_source_patterns":["alpine"]}]"""
        .stripMargin)
    val q = DocumentLoader.loadQueries(spark, s"$dir/q.json").collect().head
    assert(q.getAs[String]("query_id") == "q1")
    assert(q.getAs[scala.collection.Seq[String]]("expected_keywords").toSeq == Seq("snowpack"))
  }
}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ranked = Seq(
    ("hybrid", "hash-64", 0.8, 0.9, 0.85, 0.5, 2L, 1.75),
    ("recursive", "hash-64", 0.5, 0.6, 0.55, 0.4, 2L, 1.15),
  ).toDF("strategy", "model", "top_1_accuracy", "top_3_accuracy", "mrr",
    "avg_similarity", "num_queries", "combined_score")

  test("csv + json report sinks and console best-of") {
    val dir = java.nio.file.Files.createTempDirectory("report").toString
    Sinks.writeCsvReport(ranked, s"$dir/csv")
    val back = spark.read.option("header", "true").csv(s"$dir/csv")
    assert(back.count() == 2 && back.columns.contains("combined_score"))

    Sinks.writeJsonReport(ranked, s"$dir/json")
    val js = spark.read.json(s"$dir/json")
    assert(js.select(size(col("configurations"))).collect().head.getInt(0) == 2)
    assert(js.select(col("summary_stats.num_configs")).collect().head.getLong(0) == 2)

    val report = Sinks.consoleReport(ranked)
    assert(report.contains("best combined_score: hybrid"))
  }
}

class AnnSpec extends SparkSpec {
  import spark.implicits._

  // clustered vectors: 20 clusters x 25 members around orthant-ish
  // centers — realistic shape for ANN (neighbors are truly close)
  private lazy val clustered = {
    val rnd = new scala.util.Random(7)
    val dim = 32
    val centers = Array.fill(20)(Array.fill(dim)(rnd.nextGaussian()))
    (0 until 500).map { i =>
      val c = centers(i % 20)
      val v = c.map(x => x + 0.15 * rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(x => (x / n).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("LSH recall is high on clustered data and self-retrieval is exact") {
    val queries = clustered.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val exact = Knn.bruteForceTopK(clustered, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Ann.lshTopK(clustered, queries, 10, dim = 32)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall too low: $recall")
    // rank-1 = the query vector itself in every table
    val self = Ann.lshTopK(clustered, queries, 1, dim = 32)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    assert(self.forall { case (q, v) => q == v })
  }

  test("LSH-bucketed near-dup pairs recover the brute-force top pairs") {
    val sigs = Ann.signatures(clustered, "embedding", "vec_id",
      numTables = 8, bits = 8, dim = 32)
    val bands = sigs.select($"vec_id".as("id"), $"table".as("band"), $"sig".as("bkey"))
    def topPairs(cands: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      cands.join(clustered.select($"vec_id".as("a"), $"embedding".as("va")), "a")
        .join(clustered.select($"vec_id".as("b"), $"embedding".as("vb")), "b")
        .withColumn("sim", graft.functions.Vec.dot($"va", $"vb"))
        .orderBy($"sim".desc, $"a", $"b").limit(20)
        .select("a", "b").as[(Long, Long)].collect().toSet
    val lsh = topPairs(graft.dedup.Dedup.lshCandidates(bands))
    val brute = topPairs(
      clustered.select($"vec_id".as("a")).crossJoin(clustered.select($"vec_id".as("b")))
        .filter($"a" < $"b"))
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"near-dup pair recall too low: $recall")
  }

  test("IVF with all clusters probed equals brute force") {
    val queries = clustered.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val centroids = clustered.filter($"vec_id" < 8)
      .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
    val exact = Knn.bruteForceTopK(clustered, queries, 5)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    val ivfAll = Ann.ivfTopK(clustered, queries, centroids, 5, nprobe = 8)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    assert(ivfAll == exact)
  }

  test("IVF at nprobe=4 with hash-sampled centroids keeps useful recall") {
    val queries = clustered.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    // same seeded deterministic sampling as the ann_ivf query
    val centroids = clustered
      .select($"vec_id".as("cent_id"), $"embedding".as("cvec"),
        md5(concat(lit("ivf|"), $"vec_id")).as("r"))
      .orderBy($"r", $"cent_id").limit(16).select("cent_id", "cvec")
    val exact = Knn.bruteForceTopK(clustered, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Ann.ivfTopK(clustered, queries, centroids, 10, nprobe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF nprobe=4 recall too low: $recall")
  }

  test("PQ ADC keeps useful recall on clustered data and is partition-independent") {
    val queries = clustered.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val exact = Knn.bruteForceTopK(clustered, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val pq = df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      (exact & pq).size.toDouble / exact.size
    }
    // pure ADC is tie-collapsed (a tight cluster's members share one
    // code tuple, so ADC orders them by id, not true distance) — recall
    // sits near |top-k|/|cluster|, far above the 2% random floor but
    // capped; this is WHY production PQ re-ranks
    val r16 = recallOf(Ann.pqTopK(clustered, queries, 10, m = 8, numCodes = 16))
    assert(r16 >= 0.25, s"PQ recall too low: $r16")
    val trained = Ann.trainPqCodebooks(clustered, m = 8, numCodes = 16, iters = 3)
    val rT = recallOf(Ann.pqTopKWith(clustered, queries, 10, 8, trained))
    assert(rT >= r16 - 0.05, s"training degraded recall: $rT < $r16")
    // exact re-rank of the top-50 ADC candidates restores the ordering
    val rRef = recallOf(Ann.pqTopKRefined(clustered, queries, 10, r = 50,
      m = 8, cw = trained))
    assert(rRef >= 0.8, s"refined-PQ recall too low: $rRef")
    // fixed-j-order LUT sums are bit-deterministic: any partitioning of
    // the index produces the identical ranking
    val repart = Ann.pqTopK(clustered.repartition(13), queries, 10,
      m = 8, numCodes = 16)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    val base = Ann.pqTopK(clustered, queries, 10, m = 8, numCodes = 16)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    assert(repart == base)
  }

  test("IVF-PQ with all cells probed equals pure PQ; fewer probes keep recall") {
    val queries = clustered.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val centroids = clustered
      .select($"vec_id".as("cent_id"), $"embedding".as("cvec"),
        md5(concat(lit("ivf|"), $"vec_id")).as("r"))
      .orderBy($"r", $"cent_id").limit(16).select("cent_id", "cvec")
    // probing every cell removes the IVF restriction entirely
    val all = Ann.ivfPqTopK(clustered, queries, centroids, 10, nprobe = 16)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    val pq = Ann.pqTopK(clustered, queries, 10, m = 8, numCodes = 16)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    assert(all == pq)
    // nprobe=4 scans a quarter of the cells; against the PQ ranking it
    // must retain most of the ADC top-10 (the IVF loss, not the PQ loss)
    val probed = Ann.ivfPqTopK(clustered, queries, centroids, 10, nprobe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val pqIds = pq.map { case (q, _, v) => (q, v) }
    val recall = (pqIds & probed).size.toDouble / pqIds.size
    assert(recall >= 0.5, s"IVF-PQ nprobe=4 recall vs PQ too low: $recall")
  }

  test("PQ with every vector its own codeword reproduces exact ranks") {
    // 8 vectors, 8 codes: encoding is lossless (each subvector argmins
    // to its own sample), so ADC scores equal true dot products and the
    // ranking matches brute force exactly, including tie-breaks
    val tiny = clustered.filter($"vec_id" < 8)
    val queries = tiny.select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val exact = Knn.bruteForceTopK(tiny, queries, 8)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    val pq = Ann.pqTopK(tiny, queries, 8, m = 8, numCodes = 8)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    assert(pq == exact)
  }

  test("MMR re-rank keeps the top hit and diversifies across clusters") {
    val queries = clustered.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val mmr = Knn.mmrTopK(clustered, queries, k = 5, kCand = 20)
      .select("query_id", "step", "vec_id").as[(Long, Int, Long)].collect()
    assert(mmr.length == 50)
    val top1 = Knn.bruteForceTopK(clustered, queries, 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    // step 1 has no diversity penalty -> it IS the top-sim candidate
    mmr.filter(_._2 == 1).foreach { case (q, _, v) => assert(v == top1(q)) }
    // the fixture's clusters are the near-duplicate groups (vec_id % 20);
    // plain top-5 drowns in the query's own cluster, MMR must spread
    val plain = Knn.bruteForceTopK(clustered, queries, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    def spread(rows: Seq[(Long, Long)]): Double =
      rows.groupBy(_._1).values.map(_.map(_._2 % 20).distinct.size).sum.toDouble
    val mmrSpread = spread(mmr.map(r => (r._1, r._3)).toSeq)
    assert(mmrSpread >= spread(plain.toSeq),
      s"MMR did not diversify: $mmrSpread clusters vs plain")
    // each query's 5 picks are distinct
    mmr.groupBy(_._1).values.foreach(g => assert(g.map(_._3).distinct.size == 5))
  }

  test("k-means codebook training is reproducible and at least matches sampled init") {
    val queries = clustered.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val exact = Knn.bruteForceTopK(clustered, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recall(cents: org.apache.spark.sql.DataFrame): Double = {
      val approx = Ann.ivfTopK(clustered, queries, cents, 10, nprobe = 4)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      (exact & approx).size.toDouble / exact.size
    }
    val sampled = clustered
      .select($"vec_id".as("cent_id"), $"embedding".as("cvec"),
        md5(concat(lit("ivf|"), $"vec_id")).as("r"))
      .orderBy($"r", $"cent_id").limit(16).select("cent_id", "cvec")
    val trained = Ann.trainCentroids(clustered, 16, iters = 3)
    val trained2 = Ann.trainCentroids(clustered, 16, iters = 3)
    assert(trained.collect().map(_.toString).toSeq
      == trained2.collect().map(_.toString).toSeq) // fixed layout -> reproducible
    assert(recall(trained) >= recall(sampled) - 0.05,
      s"training degraded recall: ${recall(trained)} < ${recall(sampled)}")
  }

  test("filteredTopK equals per-segment brute force and never crosses the filter") {
    // pre-filter semantics: each query searches ONLY its own label
    // segment, so the result must equal brute force over that segment
    val labeled = clustered.withColumn("label", ($"vec_id" % 3).cast("int"))
    val queries = labeled.filter($"vec_id" < 9)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"),
        $"label".as("qlabel"))
    val filtered = Knn.filteredTopK(labeled, queries, 5)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    // no result crosses the filter
    filtered.foreach { case (q, _, v) => assert(v % 3 == q % 3) }
    // per segment it IS brute force over the pre-filtered index
    val expected = (0 until 3).flatMap { seg =>
      val segIdx = labeled.filter($"label" === seg)
      val segQ = queries.filter($"qlabel" === seg)
      Knn.bruteForceTopK(segIdx, segQ, 5)
        .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect()
    }.toSet
    assert(filtered == expected)
  }

  test("filtered IVF with all cells probed equals exact filtered search") {
    // with every cell probed the coarse quantizer drops out, so the
    // composition must reduce to the exact pre-filtered top-k; with
    // nprobe=4 results still never cross the filter
    val labeled = clustered.withColumn("label", ($"vec_id" % 3).cast("int"))
    val queries = labeled.filter($"vec_id" < 9)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"),
        $"label".as("qlabel"))
    val centroids = labeled.filter($"vec_id" < 8)
      .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
    val all = Ann.ivfTopKFiltered(labeled, queries, centroids, 5, nprobe = 8)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    val exact = Knn.filteredTopK(labeled, queries, 5)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    assert(all == exact)
    val probed = Ann.ivfTopKFiltered(labeled, queries, centroids, 5, nprobe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    probed.foreach { case (q, v) => assert(v % 3 == q % 3) }
  }

  test("semanticDedup removes exactly the lower-id-mate-above-tau vectors") {
    import graft.dedup.Dedup
    val cents = Ann.trainCentroids(clustered, 16, iters = 2)
    val out = Dedup.semanticDedup(clustered, cents, tau = 0.9)
      .as[(Long, Long, Int)].collect()
    assert(out.length == 500, "one row per vector")
    val removed = out.filter(_._3 == 1).map(_._1).toSet
    assert(removed.nonEmpty, "clustered fixture must contain semantic dups at 0.9")
    // brute-force reference: assignment via assignCells, then the
    // definition applied literally
    val assign = Ann.assignCells(clustered, cents)
      .select("vec_id", "embedding", "cent_id")
      .as[(Long, Array[Float], Long)].collect()
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val expected = (for {
      x <- assign; y <- assign
      if x._3 == y._3 && x._1 < y._1 && dot(x._2, y._2) > 0.9
    } yield y._1).toSet
    assert(removed == expected)
    // exemplars survive: the lowest id of every cluster is never removed
    assign.groupBy(_._3).values.foreach { g =>
      assert(!removed.contains(g.map(_._1).min))
    }
  }

  test("MMR fed ANN candidates equals brute-force-fed MMR when candidates are exact") {
    // the production retriever shape: candidate generation is pluggable.
    // IVF probing every cell returns the exact top-kCand with the exact
    // sims (same left-to-right dot convention), so the greedy selection
    // must be identical to the brute-force-fed one.
    val queries = clustered.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val centroids = clustered.filter($"vec_id" < 8)
      .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
    val annCands = Ann.ivfTopK(clustered, queries, centroids, 20, nprobe = 8)
    val viaAnn = Knn.mmrRerank(clustered, annCands, k = 5)
      .select("query_id", "step", "vec_id").as[(Long, Int, Long)].collect().toSet
    val brute = Knn.mmrTopK(clustered, queries, k = 5, kCand = 20)
      .select("query_id", "step", "vec_id").as[(Long, Int, Long)].collect().toSet
    assert(viaAnn == brute)
    // and an LSH-fed MMR still returns k distinct picks per query with
    // the top-sim candidate first (structural contract under a lossy
    // candidate generator)
    val lshCands = Ann.lshTopK(clustered, queries, 20, dim = 32)
    val viaLsh = Knn.mmrRerank(clustered, lshCands, k = 5)
      .select("query_id", "step", "vec_id").as[(Long, Int, Long)].collect()
    viaLsh.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._3).distinct.length == g.length)
    }
  }

  test("trained IVF-PQ composition: all cells probed equals trained PQ") {
    // ivfPqTopKWith fed trainCentroids + trainPqCodebooks is the Faiss
    // IndexIVFPQ production config; with every cell probed the coarse
    // quantizer drops out and the ranking must equal pure trained-PQ ADC
    val queries = clustered.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val cents = Ann.trainCentroids(clustered, 16, iters = 2)
    val cw = Ann.trainPqCodebooks(clustered, m = 8, numCodes = 16, iters = 2)
    val all = Ann.ivfPqTopKWith(clustered, queries, cents, 10, nprobe = 16,
        m = 8, cw = cw)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    val pq = Ann.pqTopKWith(clustered, queries, 10, 8, cw)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    assert(all == pq)
    // nprobe=4 restricts the scan; picks per query stay ≤ k and distinct
    val probed = Ann.ivfPqTopKWith(clustered, queries, cents, 10, nprobe = 4,
        m = 8, cw = cw)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    probed.groupBy(_._1).values.foreach { g =>
      assert(g.length <= 10 && g.map(_._2).distinct.length == g.length)
    }
  }
}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming index build: chunk + embed lift to readStream") {
    val in = java.nio.file.Files.createTempDirectory("stream-in").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/d1.json"),
      """{"source_file":"s1.md","content":"# T\n\nAlpha beta. Gamma delta."}""" + "\n" +
        """{"source_file":"s2.md","content":"plain text body"}""")
    val q = Streams.indexingStream(spark, in)
      .writeStream.format("memory").queryName("idx")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("idx")
    assert(out.count() > 0)
    assert(out.select("strategy").distinct().count() == 5)
    assert(out.select(size(col("embedding"))).head().getInt(0) == 64)
  }

  test("windowed aggregation with watermark over a file stream") {
    val in = java.nio.file.Files.createTempDirectory("stream-ev").toString
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:01:00"), 1L, "click", 1.0),
      (2L, Timestamp.valueOf("2024-01-01 00:04:00"), 1L, "click", 2.0),
      (3L, Timestamp.valueOf("2024-01-01 00:15:00"), 2L, "view", 3.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(in)
    val events = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(in)
    val q = Streams.windowedEventCounts(events)
      .writeStream.format("memory").queryName("winagg")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("winagg").collect()
    assert(rows.length == 2) // two 10-minute windows
    assert(rows.map(_.getAs[Long]("n")).sum == 3)
  }

  test("streaming hll sketch equals the batch sketch over the same rows") {
    val tmp = java.nio.file.Files.createTempDirectory("stream-hll").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.write.mode("overwrite").parquet(tmp)
    val q = Streams.distinctStream(spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
        .parquet(tmp).as[Streams.Event])
      .writeStream.format("memory").queryName("hllstream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // last update per type carries the full-state estimate; register max
    // is commutative + idempotent, so it must equal the batch sketch
    // bit-for-bit no matter how rows were micro-batched
    val streamed = spark.table("hllstream")
      .groupBy("event_type").agg(max(col("hll_estimate")).as("est"))
      .as[(String, Double)].collect().toMap
    val batch = graft.queries.Events.hllOf(ev)
      .select(col("event_type"), col("hll_estimate"))
      .as[(String, Double)].collect().toMap
    assert(streamed == batch, s"streamed $streamed != batch $batch")
  }

  test("streaming CDC compaction equals the batch struct-max under any batching") {
    val tmp = java.nio.file.Files.createTempDirectory("stream-cdc").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.write.mode("overwrite").parquet(tmp)
    val q = Streams.cdcLatestStream(spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
        .parquet(tmp).as[Streams.Event])
      .writeStream.format("memory").queryName("cdcstream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // the winner-take-max state is commutative + idempotent, so the
    // LAST update per key is the compacted row regardless of batching;
    // take it via max on (ts, event_id) over the update log
    val streamed = spark.table("cdcstream")
      .groupBy("user_id", "event_type")
      .agg(max(struct(col("last_ts"), col("last_event_id"), col("last_value"))).as("m"))
      .select(col("user_id"), col("event_type"),
        col("m.last_ts"), col("m.last_event_id"), col("m.last_value"))
      .as[(Long, String, java.sql.Timestamp, Long, Double)].collect().toSet
    val batch = graft.queries.Events.eventsCdcLatest(spark, "/root/testdata/sf0.001")
      .as[(Long, String, java.sql.Timestamp, Long, Double)].collect().toSet
    assert(streamed == batch,
      s"stream/batch mismatch: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }

  test("streaming dedup canonicalization equals the batch group-min under shuffled arrival") {
    import graft.text.TextFns
    val tmp = java.nio.file.Files.createTempDirectory("stream-dedup").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(md5(TextFns.normalized(col("text"))).as("fingerprint"),
        col("doc_id"))
    // shuffled multi-file layout + one file per trigger: arrival order
    // bears no relation to doc_id order
    docs.orderBy(md5(col("doc_id").cast("string"))).coalesce(5)
      .write.mode("overwrite").parquet(tmp)
    val q = Streams.dedupStream(spark.readStream
        .schema("fingerprint STRING, doc_id LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(tmp).as[(String, Long)])
      .writeStream.format("memory").queryName("dedupstream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // min-merge state is monotone: the smallest emitted canonical per
    // fingerprint is the final state, and must equal the batch min
    val streamed = spark.table("dedupstream")
      .groupBy("fingerprint").agg(min(col("canonical")).as("c"))
      .as[(String, Long)].collect().toMap
    val batch = docs.groupBy("fingerprint").agg(min(col("doc_id")).as("c"))
      .as[(String, Long)].collect().toMap
    assert(streamed == batch, "streamed canonicals differ from batch")
    // and the batch side IS dedup_exact's dup_of column
    val viaQuery = graft.queries.DedupQueries
      .dedupExact(spark, "/root/testdata/sf0.001")
      .select(col("fingerprint"), col("dup_of")).distinct()
      .as[(String, Long)].collect().toMap
    assert(streamed == viaQuery, "streamed canonicals differ from dedup_exact")
  }

  test("streaming cohort assignment equals the batch retention cohorts") {
    val tmp = java.nio.file.Files.createTempDirectory("stream-coh").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.write.mode("overwrite").parquet(tmp)
    val q = Streams.cohortStream(spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
        .parquet(tmp).as[Streams.Event])
      .writeStream.format("memory").queryName("cohstream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // first-seen is a min — monotone across updates, so the smallest
    // emitted cohort per user is the final state; it must equal the
    // batch query's date_trunc('week')-based cohort exactly
    val streamed = spark.table("cohstream")
      .groupBy("user_id").agg(min(col("cohort")).as("cohort"))
      .as[(Long, String)].collect().toMap
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      .groupBy("user_id").agg(min(col("week")).as("c"))
      .select(col("user_id"), date_format(col("c"), "yyyy-MM-dd").as("c"))
      .as[(Long, String)].collect().toMap
    assert(streamed == batch, s"streamed cohorts differ from batch")
  }

  test("ewmaStream: watermark-finalized daily folds equal the batch EWMA exactly") {
    // arrival order is shuffled across micro-batches; a day only folds
    // once the watermark passes its end, days fold in order, and the
    // fold arithmetic is the batch lambda bit-for-bit — so the final
    // per-type baseline must match events_ewma on the same days
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0).getTime
    val tmp = java.nio.file.Files.createTempDirectory("stream-ewma").toString
    val flusher = spark.range(1).select(
      lit(-1L).as("event_id"),
      timestamp_millis(lit(maxTs + 40L * 86400000L)).as("ts"),
      lit(-1L).as("user_id"), lit("zzz_flush").as("event_type"),
      lit(0.0).as("value"))
    ev.unionByName(flusher)
      .orderBy(md5(col("event_id").cast("string"))).coalesce(5)
      .write.mode("overwrite").parquet(tmp)
    val q = Streams.ewmaStream(spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(tmp).as[Streams.Event])
      .writeStream.format("memory").queryName("ewmastream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ewmastream")
      .filter(col("event_type") =!= "zzz_flush")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("n_days").desc)))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n_days"), round(col("ewma"), 4).as("e"))
      .as[(String, Int, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val batch = graft.queries.Events.eventsEwma(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("n_days"), col("ewma"))
      .as[(String, Int, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(streamed.keySet == batch.keySet,
      s"types differ: ${streamed.keySet} vs ${batch.keySet}")
    streamed.foreach { case (t, v) =>
      assert(v == batch(t), s"$t: streamed $v vs batch ${batch(t)}")
    }
  }

  test("stream-stream attribution join equals the batch interval join") {
    // BOTH sides unbounded: clicks and purchases arrive as independent
    // streams in shuffled file order across many micro-batches; the
    // inner interval join must emit exactly the batch join's pairs —
    // co-buffering within the watermark horizon makes every qualifying
    // pair meet exactly once, whatever the interleaving.
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val cdir = java.nio.file.Files.createTempDirectory("stream-attr-c").toString
    val pdir = java.nio.file.Files.createTempDirectory("stream-attr-p").toString
    ev.filter(col("event_type") === "click")
      .orderBy(md5(col("event_id").cast("string"))).coalesce(4)
      .write.mode("overwrite").parquet(cdir)
    ev.filter(col("event_type") === "purchase")
      .orderBy(md5(col("event_id").cast("string"))).coalesce(4)
      .write.mode("overwrite").parquet(pdir)
    def feed(dir: String) = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir).as[Streams.Event]
    val q = Streams.attributionStream(feed(cdir), feed(pdir))
      .writeStream.format("memory").queryName("attrstream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("attrstream")
      .select(col("click_id"), col("purchase_id"))
      .as[(Long, Long)].collect().toSet
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("cts"),
        col("user_id").as("cu"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("pts"),
        col("user_id").as("pu"))
    val batch = c.join(p, col("cu") === col("pu") &&
        col("cts") >= col("pts") - expr("INTERVAL 3600 SECONDS") &&
        col("cts") <= col("pts"))
      .select(col("click_id"), col("purchase_id"))
      .as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty, "fixture produced no attribution pairs — widen the window")
    assert(streamed == batch,
      s"stream ${streamed.size} pairs vs batch ${batch.size}")
  }

  test("streaming knn equals batch brute force under arbitrary micro-batching") {
    // The serving path as a stream-static join: query vectors arrive
    // as a stream (shuffled order, one watermark horizon), the index
    // is static. The TopKAggregator buffer merge is associative and
    // commutative, so the finalized per-(window, query) top-k must be
    // IDENTICAL to the batch heap search no matter how queries split
    // into micro-batches.
    val tmp = java.nio.file.Files.createTempDirectory("stream-knn").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        // all arrivals within ~72s of the base, shuffled file order
        timestamp_millis(lit(1700000000000L) + (col("vec_id") * 7919) % 200000)
          .as("ts"),
        col("embedding").as("qvec"))
    // A far-future arrival pushes the watermark past the real window's
    // end so append mode finalizes it (its own window stays open and
    // is NOT emitted — which the query_id filter below also guards).
    val flusher = emb.filter(col("vec_id") === 0)
      .select(lit(999L).as("query_id"),
        timestamp_millis(lit(1700000000000L + 7200000L)).as("ts"),
        col("embedding").as("qvec"))
    queries.unionAll(flusher)
      .orderBy(md5(col("query_id").cast("string")))
      .coalesce(3).write.mode("overwrite").parquet(tmp)
    val q = Streams.knnStream(
        spark.readStream
          .schema("query_id LONG, ts TIMESTAMP, qvec ARRAY<FLOAT>")
          .option("maxFilesPerTrigger", "1")
          .parquet(tmp).as[Streams.QueryArrival],
        emb, k = 10)
      .writeStream.format("memory").queryName("knnstream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("knnstream")
      .select(col("query_id"), col("rank"), col("vec_id"))
      .as[(Long, Int, Long)].collect().toSet
    val batch = graft.queries.Similarity.knnTopK(spark, "/root/testdata/sf0.001")
      .as[(Long, Int, Long)].collect().toSet
    assert(streamed == batch, s"streamed knn differs from batch")
  }

  test("stateful sessionization closes sessions across the gap") {
    val in = java.nio.file.Files.createTempDirectory("stream-se").toString
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "click", 1.0),
      (2L, Timestamp.valueOf("2024-01-01 00:10:00"), 1L, "click", 1.0),
      (3L, Timestamp.valueOf("2024-01-01 02:00:00"), 1L, "click", 1.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(in)
    val events = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(in).as[Streams.Event]
    val q = Streams.sessionize(events)
      .writeStream.format("memory").queryName("sess")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sess").collect()
    // one closed session (2 events) + one open session (1 event)
    assert(rows.exists(r => r.getAs[Boolean]("closed") && r.getAs[Long]("n_events") == 2))
    assert(rows.exists(r => !r.getAs[Boolean]("closed") && r.getAs[Long]("n_events") == 1))
  }

  test("funnelStream: out-of-order arrival folds exactly like the batch min-chain") {
    // The order-sensitivity trap: user 1's click ARRIVES before their
    // earlier-timestamped signup. A fold-on-arrival discards the click
    // (no signup yet); the ordered-replay stream must buffer both and,
    // once the watermark passes them, fold signup@09:00 then click@10:00
    // then purchase@11:00 — full conversion. Sentinel batches advance
    // the watermark; the timer drains buffered events it has passed.
    val in = java.nio.file.Files.createTempDirectory("stream-funnel").toString
    def write(name: String, rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite").parquet(s"$in/data/$name")
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Streams.FunnelStep]()
    def run(): Unit = {
      val q = Streams.funnelStream(spark.readStream
          .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
          .parquet(s"$in/data/*").as[Streams.Event])
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Streams.FunnelStep], _: Long) =>
          df.collect().foreach(buf.add)
        }
        .option("checkpointLocation", s"$in/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    write("b1", Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0)))
    run()
    write("b2", Seq(
      (2L, Timestamp.valueOf("2024-01-01 09:00:00"), 1L, "signup", 1.0),
      (3L, Timestamp.valueOf("2024-01-01 11:00:00"), 1L, "purchase", 1.0)))
    run()
    write("b3", Seq((4L, Timestamp.valueOf("2024-01-01 20:00:00"), 99L, "signup", 1.0)))
    run()
    write("b4", Seq((5L, Timestamp.valueOf("2024-01-01 21:00:00"), 99L, "signup", 1.0)))
    run()
    import scala.jdk.CollectionConverters._
    val u1 = buf.asScala.filter(_.user_id == 1L).map(s => s.step -> s.ts.toString).toMap
    assert(u1 === Map(
      1 -> "2024-01-01 09:00:00.0",
      2 -> "2024-01-01 10:00:00.0",
      3 -> "2024-01-01 11:00:00.0"), s"got: ${buf.asScala.toSeq}")
  }

  test("funnelStream: multi-user stream equals the batch min-chain ground truth") {
    val in = java.nio.file.Files.createTempDirectory("stream-funnel2").toString
    val rng = new scala.util.Random(7)
    val types = Seq("signup", "click", "purchase", "view")
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val events = (0 until 400).map { i =>
      (i.toLong, new Timestamp(base + rng.nextInt(36000) * 1000L),
        (rng.nextInt(30) + 1).toLong, types(rng.nextInt(4)), 1.0)
    }
    // ground truth: per-user batch min-chain over ts-sorted events
    // (ties at equal ts: step order, matching the strict > contract)
    val stepNo = Map("signup" -> 1, "click" -> 2, "purchase" -> 3)
    val expected = events.filter(e => stepNo.contains(e._4))
      .groupBy(_._3).flatMap { case (u, evs) =>
        var t1 = Option.empty[Long]; var t2 = Option.empty[Long]
        var t3 = Option.empty[Long]
        for ((_, ts, _, typ, _) <- evs.sortBy(e => (e._2.getTime, stepNo(e._4)))) {
          val t = ts.getTime
          typ match {
            case "signup" if t1.isEmpty => t1 = Some(t)
            case "click" if t1.exists(t > _) && t2.isEmpty => t2 = Some(t)
            case "purchase" if t2.exists(t > _) && t3.isEmpty => t3 = Some(t)
            case _ => ()
          }
        }
        Seq(t1.map((u, 1, _)), t2.map((u, 2, _)), t3.map((u, 3, _))).flatten
      }.toSet
    def write(name: String, rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite").parquet(s"$in/data/$name")
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Streams.FunnelStep]()
    def run(): Unit = {
      // 12h watermark: the event-time window spans 10h and arrival order
      // is fully shuffled across runs, so nothing may be late-dropped —
      // the test isolates ordered-replay correctness from late filtering
      val q = Streams.funnelStream(spark.readStream
          .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
          .parquet(s"$in/data/*").as[Streams.Event], watermark = "12 hours")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Streams.FunnelStep], _: Long) =>
          df.collect().foreach(buf.add)
        }
        .option("checkpointLocation", s"$in/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    // arrival order ≠ event-time order: shuffled halves, then sentinels
    // far in the future to advance the watermark and drain every buffer
    val shuffled = rng.shuffle(events)
    write("b1", shuffled.take(200)); run()
    write("b2", shuffled.drop(200)); run()
    write("b3", Seq((9001L, new Timestamp(base + 900000000L), 999L, "signup", 1.0))); run()
    write("b4", Seq((9002L, new Timestamp(base + 900060000L), 999L, "signup", 1.0))); run()
    import scala.jdk.CollectionConverters._
    val streamed = buf.asScala.filter(_.user_id != 999L)
      .map(s => (s.user_id, s.step, s.ts.getTime)).toSet
    assert(streamed === expected,
      s"missing=${expected -- streamed} extra=${streamed -- expected}")
  }

  test("retentionStream: delta log aggregates to the exact batch retention matrix") {
    // 20 users active over ~6 ISO weeks, arrival fully shuffled across
    // two checkpointed runs; sentinels advance the watermark to drain
    // every buffer. count(*) over the streamed (cohort, offset) deltas
    // must equal the batch events_retention matrix on the same rows —
    // ordered replay pins each user's cohort before any offset row is
    // emitted, so the append-only log needs no retractions.
    val in = java.nio.file.Files.createTempDirectory("stream-ret").toString
    val rng = new scala.util.Random(11)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime // a Monday
    val events = (0 until 300).map { i =>
      (i.toLong, new Timestamp(base + rng.nextInt(42 * 24 * 3600) * 1000L),
        (rng.nextInt(20) + 1).toLong, "click", 1.0)
    }
    // batch ground truth runs on a dir WITHOUT the sentinel user
    val batchDir = java.nio.file.Files.createTempDirectory("stream-ret-b").toString
    events.map { case (id, ts, u, t, v) => (id, ts, u, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$batchDir/events.parquet")
    val expected = graft.queries.Events.eventsRetention(spark, batchDir)
      .select(date_format(col("cohort"), "yyyy-MM-dd"), col("week_offset"),
        col("n_users"))
      .as[(String, Int, Long)].collect().toSet
    def write(name: String, rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite").parquet(s"$in/data/$name")
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Streams.RetentionHit]()
    def run(): Unit = {
      // 50-day watermark: disorder spans the whole 42-day window (see
      // funnelStream's multi-user test for the reasoning)
      val q = Streams.retentionStream(spark.readStream
          .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
          .parquet(s"$in/data/*").as[Streams.Event], watermark = "1200 hours")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Streams.RetentionHit], _: Long) =>
          df.collect().foreach(buf.add)
        }
        .option("checkpointLocation", s"$in/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    val shuffled = rng.shuffle(events)
    write("b1", shuffled.take(150)); run()
    write("b2", shuffled.drop(150)); run()
    val far = base + 400L * 24 * 3600 * 1000
    write("b3", Seq((9001L, new Timestamp(far), 999L, "click", 1.0))); run()
    write("b4", Seq((9002L, new Timestamp(far + 60000), 999L, "click", 1.0))); run()
    import scala.jdk.CollectionConverters._
    val streamed = buf.asScala.filter(_.user_id != 999L).toSeq
      .groupBy(h => (h.cohort, h.week_offset))
      .map { case ((c, o), hs) => (c, o, hs.size.toLong) }.toSet
    assert(streamed === expected,
      s"missing=${expected -- streamed} extra=${streamed -- expected}")
  }

  test("sessionize: idle user's session is closed by event-time timeout") {
    // Round-10 gap: with NoTimeout an idle user's open session never
    // emitted closed=true and its state lived forever. Three runs over
    // one checkpoint drive the timer: run 1 opens user 1's session
    // (events 00:00/00:05 → timer at 00:35); run 2's user-2 event at
    // 01:00 advances the watermark to 00:50 (> timer) at batch end;
    // run 3's batch then fires the timer and must emit user 1's
    // session as CLOSED with its state evicted — no user-1 events ever
    // arrived after 00:05.
    val in = java.nio.file.Files.createTempDirectory("stream-sesto").toString
    def write(name: String, rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite").parquet(s"$in/data/$name")
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Streams.SessionUpdate]()
    def run(): Unit = {
      val q = Streams.sessionize(spark.readStream
          .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
          .parquet(s"$in/data/*").as[Streams.Event])
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Streams.SessionUpdate], _: Long) =>
          df.collect().foreach(buf.add)
        }
        .option("checkpointLocation", s"$in/ckpt")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    write("b1", Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "click", 1.0),
      (2L, Timestamp.valueOf("2024-01-01 00:05:00"), 1L, "click", 1.0)))
    run()
    write("b2", Seq((3L, Timestamp.valueOf("2024-01-01 01:00:00"), 2L, "click", 1.0)))
    run()
    write("b3", Seq((4L, Timestamp.valueOf("2024-01-01 01:01:00"), 2L, "click", 1.0)))
    run()
    import scala.jdk.CollectionConverters._
    val rows = buf.asScala.toSeq
    val u1closed = rows.filter(r => r.user_id == 1L && r.closed)
    assert(u1closed.nonEmpty, s"user 1's idle session never closed: $rows")
    assert(u1closed.exists(_.n_events == 2L))
  }

  test("windowed agg drops events older than the watermark across batches") {
    val in = java.nio.file.Files.createTempDirectory("stream-late").toString
    def write(name: String, rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite").parquet(s"$in/$name")
    // two runs over the SAME checkpoint: run 1 advances the watermark to
    // 01:30 (event time 02:00 − 30 min) and persists it; run 2's batch
    // then filters the below-watermark 00:00 event while the fresh 03:00
    // event finalizes the 02:00 window
    def run(name: String): Seq[String] = {
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val q = Streams.windowedEventCounts(spark.readStream
          .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
          .parquet(s"$in/data/*"))
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("window.start").collect().foreach(r => buf.add(r.get(0).toString))
        }
        .option("checkpointLocation", s"$in/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
      import scala.jdk.CollectionConverters._
      buf.asScala.toSeq
    }
    write("data/b1", Seq((1L, Timestamp.valueOf("2024-01-01 02:00:00"), 1L, "click", 1.0)))
    run("late1")
    write("data/b2", Seq(
      (2L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "click", 1.0), // late
      (3L, Timestamp.valueOf("2024-01-01 03:00:00"), 1L, "click", 1.0)))
    val wins = run("late2")
    // the 02:00 window was finalized and emitted; the late 00:00 event
    // never resurrected its window
    assert(wins.exists(_.contains("02:00:00")))
    assert(!wins.exists(_.contains("00:00:00")))
  }

  test("streaming near-dup emits candidate pairs for colliding docs only") {
    val in = java.nio.file.Files.createTempDirectory("stream-nd").toString
    Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), 1L,
        "alpha beta gamma delta epsilon zeta eta theta"),
      (Timestamp.valueOf("2024-01-01 00:01:00"), 2L,
        "alpha beta gamma delta epsilon zeta eta theta"),
      (Timestamp.valueOf("2024-01-01 00:02:00"), 3L,
        "orbital mechanics primer station keeping burns decay altitude"),
    ).toDF("ts", "doc_id", "content").write.mode("overwrite").parquet(in)
    val docs = spark.readStream
      .schema("ts TIMESTAMP, doc_id LONG, content STRING").parquet(in)
    val q = Streams.nearDupStream(docs)
      .writeStream.format("memory").queryName("nd")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val pairs = spark.table("nd").select("a", "b").distinct()
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // identical docs collide, disjoint doc never
    // identical docs collide in EVERY band (4 bands of 4 rows)
    assert(spark.table("nd").count() == 4)
  }

  test("streaming band keys agree with the batch lshBands partition function") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val batch = graft.dedup.Dedup.lshBands(
        graft.dedup.Dedup.minhash(
          graft.dedup.Dedup.shingleSet(df, "doc_id", "text"), 16), 4)
      .select("band", "bkey").as[(Int, String)].collect().toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val streaming = Streams.bandKeys(text, 16, 4)
    assert(streaming.size == 4)
    streaming.foreach { k =>
      val Array(band, key) = k.split(":", 2)
      // the batch key is md5 of the same pipe-joined signature slice
      assert(batch(band.toInt) == md5hex(key), s"band $band diverged")
    }
  }

  test("bloom ingest screen: stream equals batch under any micro-batch split") {
    // even docs = the accumulated corpus, odd docs = the incoming batch
    // (the batch operator's split); doc 1 republishes doc 0, doc 5
    // republishes doc 2, doc 3 is clean
    val texts = Seq(
      0L -> "alpha beta gamma delta epsilon zeta eta theta",
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "one two three four five six seven eight nine",
      3L -> "unrelated words entirely different content here now",
      4L -> "lorem ipsum dolor sit amet consectetur adipiscing elit",
      5L -> "one two three four five six seven eight nine")
    val docs = texts.toDF("doc_id", "text")
    val expected = graft.queries.DedupQueries.dedupBloomIngestOf(docs)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3)))
      .toMap
    assert(expected(1L)._3 == 1 && expected(5L)._3 == 1
      && expected(3L)._3 == 0, s"fixture lost its signal: $expected")

    // the static side the daily pipeline keeps: the corpus band table
    import graft.dedup.Dedup
    val existing = Dedup.lshBands(Dedup.minhash(
        Dedup.shingleSet(docs.filter($"doc_id" % 2 === 0), "doc_id", "text"),
        16), 4)
      .select(col("band"), col("bkey")).distinct()

    // incoming docs land one parquet file each — maxFilesPerTrigger=1
    // then carves one micro-batch per document
    val in = java.nio.file.Files.createTempDirectory("bloom-stream").toString
    texts.filter(_._1 % 2 == 1).foreach { case (id, t) =>
      Seq((id, t)).toDF("doc_id", "content")
        .coalesce(1).write.mode("append").parquet(in)
    }

    var runId = 0
    def run(maxFiles: Option[Int]): Map[Long, (Long, Long, Int)] = {
      runId += 1
      val name = s"bloom_screen_$runId"
      val reader = spark.readStream.schema("doc_id LONG, content STRING")
      val src = maxFiles.fold(reader)(n =>
        reader.option("maxFilesPerTrigger", n)).parquet(in)
      val q = Streams.bloomIngestStream(src, existing)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
      spark.table(name).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3)))
        .toMap
    }

    val oneBatch = run(None)
    val perDoc = run(Some(1))
    // split-invariance AND batch equality over the incoming (odd) docs
    assert(oneBatch == perDoc,
      s"micro-batch split changed the screen: $oneBatch vs $perDoc")
    assert(oneBatch == expected,
      s"stream screen diverged from batch: $oneBatch vs $expected")
  }

  test("ingest loop: stream → screen → embed → upsert serves like the batch upsert; no rebuild per batch; dups never indexed") {
    import graft.index.VectorStore
    val m = HashingEmbedder.modelsByName("hash-64")
    def q(text: String) = Seq((0L, HashingEmbedder.embed(text, m)))
      .toDF("query_id", "qvec")
    def mkStore(): (VectorStore, String) = {
      val base = java.nio.file.Files.createTempDirectory("ingest-loop").toString
      val store = new VectorStore(spark, base)
      val rows = (0 until 20)
        .map(i => (i.toLong, s"seed document number $i",
          HashingEmbedder.embed(s"seed document number $i", m)))
        .toDF("row_order", "content", "embedding")
      store.createCollection("c", rows, "row_order")
      // first search pays the one full build; every later maintenance
      // must be incremental
      assert(store.graphSearch("c", q("seed document number 3"), 3)
        .collect().nonEmpty)
      assert(VectorStore.graphBuildsOf(base, "c") == 1L)
      (store, base)
    }
    // the existing corpus's band-key table — the screen's static side
    import graft.dedup.Dedup
    val seedDocs = (0 until 20)
      .map(i => (i.toLong, s"seed document number $i")).toDF("doc_id", "text")
    val bands = Dedup.lshBands(Dedup.minhash(
        Dedup.shingleSet(seedDocs, "doc_id", "text"), 16), 4)
      .select(col("band"), col("bkey")).distinct()

    // incoming: six fresh docs + one republication of seed doc 0 (the
    // screen must drop it) + one republication of STREAMED doc 100
    // (the accumulated-state screen must drop it: in per-file mode it
    // arrives batches after 100; in one-batch mode the intra-batch
    // exact dedup catches it) — one parquet file each, with explicit
    // ascending mtimes so maxFilesPerTrigger=1 processes them in this
    // order (FileStreamSource takes oldest-first)
    // fresh docs interleave SHARED vocabulary with id-specific tokens:
    // every 3-token shingle contains an id token, so no two docs share
    // a shingle (the screen must not cross-flag them — a first fixture
    // of near-identical texts was LEGITIMATELY flagged), while the
    // shared words keep their embeddings mutually similar enough that
    // the incremental graph stays navigable to each of them (a second
    // fixture of fully-orthogonal token sets produced an unreachable
    // node — every backlink pruned, the known graph-index behavior on
    // no-one's-neighbor vectors)
    val fresh = (100L to 105L).map(i =>
      (i, i, s"retrieval x$i corpus y$i quality z$i training w$i"))
    val dup = (110L, 110L, "seed document number 0")
    val dupOfStreamed = (120L, 120L,
      "retrieval x100 corpus y100 quality z100 training w100")
    val in = java.nio.file.Files.createTempDirectory("ingest-in").toString
    val t0 = System.currentTimeMillis() - 3600 * 1000L
    ((fresh :+ dup) :+ dupOfStreamed).zipWithIndex
      .foreach { case ((id, ro, t), i) =>
        val before = Option(new java.io.File(in).listFiles())
          .getOrElse(Array.empty).toSet
        Seq((id, ro, t)).toDF("doc_id", "row_order", "content")
          .coalesce(1).write.mode("append").parquet(in)
        Option(new java.io.File(in).listFiles()).getOrElse(Array.empty)
          .filterNot(before).foreach(_.setLastModified(t0 + i * 10000L))
      }
    def runStream(store: VectorStore, maxFiles: Option[Int]): Unit = {
      val reader = spark.readStream
        .schema("doc_id LONG, row_order LONG, content STRING")
      val src = maxFiles.fold(reader)(n =>
        reader.option("maxFilesPerTrigger", n)).parquet(in)
      val sq = Streams.ingestIndexStream(src, store, "c", Some(bands), m)
        .trigger(Trigger.AvailableNow()).start()
      sq.processAllAvailable(); sq.stop()
    }

    // leg 1: ONE micro-batch — must serve exactly like ONE direct
    // upsertPoints of the same screened rows (foreachBatch IS that call)
    val (storeS, baseS) = mkStore()
    runStream(storeS, None)
    val (storeB, baseB) = mkStore()
    storeB.upsertPoints("c", fresh.map { case (id, ro, t) =>
        (id, ro, t, HashingEmbedder.embed(t, m)) }
      .toDF("id", "row_order", "content", "embedding"))
    val panel = Seq(fresh(2)._3, "seed document number 7", fresh(5)._3)
    panel.foreach { text =>
      val a = storeS.graphSearch("c", q(text), 5).orderBy("rank").collect()
        .map(r => (r.getInt(1), r.getLong(2))).toSeq
      val b = storeB.graphSearch("c", q(text), 5).orderBy("rank").collect()
        .map(r => (r.getInt(1), r.getLong(2))).toSeq
      assert(a == b, s"stream != batch for '$text': $a vs $b")
    }

    // leg 2: per-file micro-batches — same final contents, still ZERO
    // rebuilds (each batch maintains incrementally), every fresh doc
    // self-served at rank 1, the republication never indexed
    val (storeP, baseP) = mkStore()
    runStream(storeP, Some(1))
    import spark.implicits._
    val idsP = storeP.read("c").select("id").as[Long].collect().toSet
    val idsS = storeS.read("c").select("id").as[Long].collect().toSet
    assert(idsP == idsS, s"split changed contents: $idsP vs $idsS")
    assert(!idsP.contains(110L), "screened near-dup reached the index")
    assert(!idsP.contains(120L),
      "republication of a STREAMED doc reached the index — the screen " +
        "state is not accumulating across batches")
    assert(idsP.intersect((100L to 105L).toSet) == (100L to 105L).toSet)
    assert(VectorStore.graphBuildsOf(baseP, "c") == 1L,
      "per-batch maintenance must never rebuild")
    assert(VectorStore.graphBuildsOf(baseS, "c") == 1L)
    fresh.foreach { case (id, _, t) =>
      val hit = storeP.graphSearch("c", q(t), 3).orderBy("rank").collect()
      assert(hit.head.getLong(2) == id,
        s"stream-ingested doc $id not self-served: ${hit.toSeq}")
    }
  }

  test("ingest loop: restarted stream still screens near-dups of docs the PREVIOUS incarnation kept (persisted screen state)") {
    import graft.index.VectorStore
    val m = HashingEmbedder.modelsByName("hash-64")
    // two independent store+screen universes: one WITH screenDir (the
    // durable path under test), one WITHOUT (the r19 boundary control —
    // proving the persistence is what closes it)
    def mkUniverse(): (VectorStore, String, String, String) = {
      val base = java.nio.file.Files.createTempDirectory("ingest-rs").toString
      val store = new VectorStore(spark, base)
      val rows = (0 until 8)
        .map(i => (i.toLong, s"seed document number $i",
          HashingEmbedder.embed(s"seed document number $i", m)))
        .toDF("row_order", "content", "embedding")
      store.createCollection("c", rows, "row_order")
      val in = java.nio.file.Files.createTempDirectory("ingest-rs-in").toString
      val screen = java.nio.file.Files.createTempDirectory("ingest-rs-sc").toString
      (store, base, in, screen)
    }
    def writeDoc(in: String, id: Long, text: String): Unit =
      Seq((id, id, text)).toDF("doc_id", "row_order", "content")
        .coalesce(1).write.mode("append").parquet(in)
    // one incarnation: a FRESH ingestIndexStream call (fresh driver
    // state — exactly what a restart produces), existingBands = None
    // (zero caller-side band re-derivation, the done-bar)
    def incarnation(store: VectorStore, in: String,
        screen: Option[String]): Unit = {
      val src = spark.readStream
        .schema("doc_id LONG, row_order LONG, content STRING").parquet(in)
      val sq = Streams.ingestIndexStream(src, store, "c", None, m, screen)
        .trigger(Trigger.AvailableNow()).start()
      sq.processAllAvailable(); sq.stop()
    }
    val doc = "retrieval x100 corpus y100 quality z100 training w100"

    // durable universe: incarnation 1 ingests doc 100; incarnation 2
    // (new stream, new state, SAME screenDir) sees a republication of
    // it plus one fresh doc — the dup must be screened from the
    // persisted bands alone, the fresh doc must land
    val (storeD, _, inD, screenD) = mkUniverse()
    writeDoc(inD, 100L, doc)
    incarnation(storeD, inD, Some(screenD))
    val inD2 = java.nio.file.Files.createTempDirectory("ingest-rs-in2").toString
    writeDoc(inD2, 200L, doc) // republication across the restart
    writeDoc(inD2, 201L, "wholly different a201 b201 c201 d201 e201")
    incarnation(storeD, inD2, Some(screenD))
    val idsD = storeD.read("c").select("id").as[Long].collect().toSet
    assert(idsD.contains(100L) && idsD.contains(201L),
      s"fresh docs must land: $idsD")
    assert(!idsD.contains(200L),
      "near-dup of a pre-restart streamed doc reached the index — " +
        "the screen state did not survive the restart")

    // control universe: same two incarnations WITHOUT screenDir — the
    // dup passes (driver-memory state died with incarnation 1), the
    // r19 boundary this feature closes
    val (storeC, _, inC, _) = mkUniverse()
    writeDoc(inC, 100L, doc)
    incarnation(storeC, inC, None)
    val inC2 = java.nio.file.Files.createTempDirectory("ingest-rs-in3").toString
    writeDoc(inC2, 200L, doc)
    incarnation(storeC, inC2, None)
    val idsC = storeC.read("c").select("id").as[Long].collect().toSet
    assert(idsC.contains(200L),
      "control: without screenDir the restarted stream cannot know " +
        s"the previous incarnation's docs, so 200 should pass: $idsC")
  }

  test("ingest screen: a crash mid-compaction never loses persisted bands (ADVICE r20)") {
    // The compaction swap renames the live table ASIDE before
    // installing the compacted copy; startup recovers whichever
    // complete table a crash left behind. Two simulated crash points:
    //  A) after the set-aside rename, before install — `bands` missing,
    //     `.bands-old` complete, `.bands-compact` PARTIAL (no _SUCCESS):
    //     must recover the set-aside original and discard the partial;
    //  B) compacted copy fully written and set-aside done, crash before
    //     install — `bands` missing, `.bands-compact` complete: must
    //     adopt the compacted copy.
    // The old delete-then-rename order had a window that destroyed ALL
    // persisted screen state and silently re-ingested near-dups.
    import graft.index.VectorStore
    val m = HashingEmbedder.modelsByName("hash-64")
    val base = java.nio.file.Files.createTempDirectory("ingest-cr").toString
    val store = new VectorStore(spark, base)
    val rows = (0 until 8)
      .map(i => (i.toLong, s"seed document number $i",
        HashingEmbedder.embed(s"seed document number $i", m)))
      .toDF("row_order", "content", "embedding")
    store.createCollection("c", rows, "row_order")
    val screen = java.nio.file.Files.createTempDirectory("ingest-cr-sc").toString
    def writeDoc(in: String, id: Long, text: String): Unit =
      Seq((id, id, text)).toDF("doc_id", "row_order", "content")
        .coalesce(1).write.mode("append").parquet(in)
    def incarnation(in: String): Unit = {
      val src = spark.readStream
        .schema("doc_id LONG, row_order LONG, content STRING").parquet(in)
      val sq = Streams.ingestIndexStream(src, store, "c", None, m, Some(screen))
        .trigger(Trigger.AvailableNow()).start()
      sq.processAllAvailable(); sq.stop()
    }
    val doc = "retrieval x100 corpus y100 quality z100 training w100"
    val in1 = java.nio.file.Files.createTempDirectory("ingest-cr-in1").toString
    writeDoc(in1, 100L, doc)
    incarnation(in1)
    val bd = new java.io.File(screen, "bands")
    val old = new java.io.File(screen, ".bands-old")
    val tmp = new java.io.File(screen, ".bands-compact")
    // crash state A
    assert(bd.renameTo(old), "test setup: set-aside rename")
    tmp.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(tmp, "part-00000-partial.parquet").toPath,
      Array[Byte](1, 2, 3))
    val in2 = java.nio.file.Files.createTempDirectory("ingest-cr-in2").toString
    writeDoc(in2, 200L, doc) // republication across the "crash"
    writeDoc(in2, 201L, "wholly different a201 b201 c201 d201 e201")
    incarnation(in2)
    import spark.implicits._
    val idsA = store.read("c").select("id").as[Long].collect().toSet
    assert(!idsA.contains(200L),
      "crash state A: recovery from the set-aside table failed — a " +
        "near-dup of a previously ingested doc reached the index")
    assert(idsA.contains(201L), s"fresh doc must land: $idsA")
    assert(!old.exists() && !tmp.exists(),
      "recovery must clear the crash leftovers")
    // crash state B: the (recovered, appended) live table plays the
    // fully-written compacted copy — a parquet dir with _SUCCESS
    assert(bd.renameTo(tmp), "test setup: simulate installed-copy crash")
    val in3 = java.nio.file.Files.createTempDirectory("ingest-cr-in3").toString
    writeDoc(in3, 300L, doc) // republication again
    incarnation(in3)
    val idsB = store.read("c").select("id").as[Long].collect().toSet
    assert(!idsB.contains(300L),
      "crash state B: the complete compacted copy was not adopted")
  }

  test("streaming dedup drops same-fingerprint docs within the watermark") {
    val in = java.nio.file.Files.createTempDirectory("stream-dd").toString
    Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), "alpha  beta"),
      (Timestamp.valueOf("2024-01-01 00:01:00"), "Alpha Beta"), // same normalized fp
      (Timestamp.valueOf("2024-01-01 00:02:00"), "gamma delta"),
    ).toDF("ts", "content").write.mode("overwrite").parquet(in)
    val docs = spark.readStream
      .schema("ts TIMESTAMP, content STRING")
      .parquet(in)
    val q = Streams.dedupStream(docs)
      .writeStream.format("memory").queryName("dd")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val fps = spark.table("dd").select("fingerprint").collect().map(_.getString(0))
    assert(fps.length == 2)
    assert(fps.distinct.length == 2)
  }
}

class StreamingMediaSpec extends SparkSpec {

  test("media decode runs inside a streaming micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("media-stream").toString
    val pngBytes = MediaFixtures.png(2, 2,
      (0, 0, 0), (64, 64, 64), (128, 128, 128), (255, 255, 255))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.png"), pngBytes)
    val wavBytes = MediaFixtures.wav(8000, 0, 16384, -16384, 32767)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.wav"), wavBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/c.bin"),
      "no codec for this".getBytes)

    val q = Streams.mediaFeaturesStream(spark, dir)
      .writeStream.format("memory").queryName("media_feats")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val rows = spark.table("media_feats")
      .select(col("n_bytes"), col("features")).collect()
      .map(r => r.getAs[Int]("n_bytes") -> r.getSeq[Float](1)).toMap
    assert(rows.size == 3)
    // every path L2-normalizes
    rows.values.foreach { f =>
      assert(math.abs(math.sqrt(f.map(x => x.toDouble * x.toDouble).sum) - 1.0) < 1e-5)
    }
    // the PNG row decoded to pixels: exactly bins {0,16,32,63} at 0.5
    val png = rows(pngBytes.length)
    Seq(0, 16, 32, 63).foreach(b => assert(math.abs(png(b) - 0.5f) < 1e-6))
    assert(png.count(_ != 0f) == 4)
    // the WAV row decoded to samples: bins {16,32,48,63} at 0.5
    val wav = rows(wavBytes.length)
    Seq(16, 32, 48, 63).foreach(b => assert(math.abs(wav(b) - 0.5f) < 1e-6))
  }

  test("streaming media decode resumes from a checkpoint without reprocessing") {
    val in = java.nio.file.Files.createTempDirectory("media-restart").toString
    new java.io.File(s"$in/data").mkdirs()
    def run(): Seq[Int] = {
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
      val q = Streams.mediaFeaturesStream(spark, s"$in/data")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("n_bytes").collect().foreach(r => buf.add(r.getInt(0)))
        }
        .option("checkpointLocation", s"$in/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
      import scala.jdk.CollectionConverters._
      buf.asScala.toSeq
    }
    val png = MediaFixtures.grayPng(2, 2, 40)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/data/a.png"), png)
    assert(run() == Seq(png.length))
    // second run over the SAME checkpoint: only the new file decodes
    val wav = MediaFixtures.wav(8000, 0, 16384)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/data/b.wav"), wav)
    assert(run() == Seq(wav.length))
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    Multimodal.MediaRow(0L, "image", "img-bytes-payload".getBytes,
      Multimodal.MediaMeta("raw", 64, 48, 0L, 0)),
    Multimodal.MediaRow(1L, "video", "video-bytes".getBytes,
      Multimodal.MediaMeta("raw", 64, 48, 5000L, 0)),
  ).toDS()

  test("batched feature extraction produces normalized vectors") {
    val f = Multimodal.extractFeatures(media).collect()
    assert(f.length == 2)
    f.foreach { r =>
      val n = math.sqrt(r.features.map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(n - 1.0) < 1e-5)
      assert(r.n_bytes > 0)
    }
    // deterministic
    assert(Multimodal.extractFeatures(media).collect().map(_.features.toSeq).toSeq
      == f.map(_.features.toSeq).toSeq)
  }

  test("frame sampling explodes video rows only") {
    val frames = Multimodal.sampleFrames(media).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.media_id == 1L))
    assert(frames.length == 5) // 5000ms / 1000ms
  }

  test("resampleNearest: floor frame selection on a hand-built WAV; full-rate is identity") {
    val samples = Seq(10, 20, 30, 40, 50, 60, 70, 80, 90, 100)
    val rows = Seq(Multimodal.MediaRow(3L, "audio",
      MediaFixtures.wav8(8000, samples: _*),
      Multimodal.MediaMeta("wav", 0, 0, 1L, 8000))).toDS()
    // 10 frames -> 4: out[j] = sample[j*10/4] = samples(0,2,5,7)
    val down = Multimodal.resampleNearest(rows, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
    assert(down.head == ((3L, 10, Seq(10, 30, 60, 80))))
    // outFrames = n degenerates to the identity (j*n/n = j)
    val same = Multimodal.resampleNearest(rows, samples.length)
      .collect().head.getSeq[Int](2)
    assert(same == samples)
  }

  test("real PNG decodes to a luminance-histogram feature") {
    // 2×2 truecolor PNG, gray values 0/64/128/255 → bins 0,16,32,63
    val rows = Seq(Multimodal.MediaRow(7L, "image",
      MediaFixtures.png(2, 2, (0, 0, 0), (64, 64, 64), (128, 128, 128), (255, 255, 255)),
      Multimodal.MediaMeta("png", 2, 2, 0L, 0))).toDS()
    val f = Multimodal.extractFeatures(rows).collect().head
    Seq(0, 16, 32, 63).foreach(b => assert(math.abs(f.features(b) - 0.5f) < 1e-6))
    // exactly those four bins — a byte histogram of the encoded PNG
    // payload would spread mass over many more
    assert(f.features.count(_ != 0f) == 4)
  }

  test("real WAV decodes to an amplitude-histogram feature") {
    val rows = Seq(Multimodal.MediaRow(8L, "audio",
      MediaFixtures.wav(8000, 0, 16384, -16384, 32767),
      Multimodal.MediaMeta("wav", 0, 0, 0L, 8000))).toDS()
    val f = Multimodal.extractFeatures(rows).collect().head
    Seq(32, 48, 16, 63).foreach(b => assert(math.abs(f.features(b) - 0.5f) < 1e-6))
  }

  test("image and audio probeMeta read real dimensions / rate") {
    val img = Multimodal.probeMeta(MediaFixtures.grayPng(3, 2, 9)).get
    assert(img.format == "png" && img.width == 3 && img.height == 2)
    val aud = Multimodal.probeMeta(
      MediaFixtures.wav(8000, Seq.fill(1600)(5.toShort): _*)).get
    assert(aud.format == "wav" && aud.sample_rate == 8000 && aud.duration_ms == 200)
    assert(Multimodal.probeMeta("just text".getBytes).isEmpty)
  }

  test("probeDecode reports decoded metadata; decode_differs separates real decode from fallback") {
    val rows = Seq(
      Multimodal.MediaRow(0L, "image", MediaFixtures.grayPng(5, 4, 9),
        Multimodal.MediaMeta("png", 5, 4, 0L, 0)),
      Multimodal.MediaRow(1L, "audio",
        MediaFixtures.wav(8000, Seq.fill(800)(3.toShort): _*),
        Multimodal.MediaMeta("wav", 0, 0, 100L, 8000)),
      Multimodal.MediaRow(2L, "image", "not media at all".getBytes,
        Multimodal.MediaMeta("raw", 0, 0, 0L, 0)),
    ).toDS()
    val out = Multimodal.probeDecode(rows).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(0L).getAs[String]("format") == "png")
    assert(out(0L).getAs[Int]("width") == 5 && out(0L).getAs[Int]("height") == 4)
    assert(out(0L).getAs[Boolean]("decode_differs"))
    assert(out(1L).getAs[String]("format") == "wav")
    assert(out(1L).getAs[Int]("sample_rate") == 8000)
    assert(out(1L).getAs[Long]("duration_ms") == 100L)
    assert(out(1L).getAs[Boolean]("decode_differs"))
    // undecodable payload: sentinel meta, byte-histogram fallback ran
    assert(out(2L).getAs[String]("format") == "none")
    assert(!out(2L).getAs[Boolean]("decode_differs"))
  }

  test("decoded image features feed Knn: near-duplicate images rank first") {
    // a feature is just an ARRAY<FLOAT> — the whole similarity stack
    // works on decoded media unchanged. Two near-identical images (one
    // pixel differs slightly), one very different image: each near-dup's
    // top non-self neighbor must be its twin.
    val a = MediaFixtures.png(2, 2, (10, 10, 10), (10, 10, 10), (200, 200, 200), (200, 200, 200))
    val b = MediaFixtures.png(2, 2, (12, 12, 12), (10, 10, 10), (200, 200, 200), (200, 200, 200))
    val c = MediaFixtures.png(2, 2, (90, 90, 90), (130, 130, 130), (60, 60, 60), (250, 250, 250))
    val rows = Seq(a, b, c).zipWithIndex.map { case (bytes, i) =>
      Multimodal.MediaRow(i.toLong, "image", bytes, Multimodal.MediaMeta("png", 2, 2, 0L, 0))
    }.toDS()
    val feats = Multimodal.extractFeatures(rows).toDF()
      .select(col("media_id").as("vec_id"), col("features").as("embedding"))
    val queries = feats.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val top = graft.search.Knn.bruteForceTopK(feats, queries, k = 2)
      .filter(col("query_id") =!= col("vec_id")) // drop self-match
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("vec_id")).toMap
    assert(top(0L) == 1L)
    assert(top(1L) == 0L)
  }

  test("animated GIF video rows sample real per-frame rasters") {
    val gif = MediaTestGifs.animatedGif(4, 10, 100, 200)
    val rows = Seq(Multimodal.MediaRow(11L, "video", gif,
      Multimodal.MediaMeta("gif", 4, 4, 3000L, 0))).toDS()
    val frames = Multimodal.sampleFrames(rows).collect().sortBy(_.frame_index)
    assert(frames.length == 3)
    assert(frames(0).frame_bytes.toSeq == Seq.fill(16)(10.toByte))
    assert(frames(1).frame_bytes.toSeq == Seq.fill(16)(100.toByte))
    assert(frames(2).frame_bytes.toSeq == Seq.fill(16)(200.toByte))
  }

  test("MJPEG-style video payload yields decoded keyframe pixels per offset") {
    val payload = MediaFixtures.grayPng(2, 2, 10) ++
      MediaFixtures.grayPng(2, 2, 100) ++ MediaFixtures.grayPng(2, 2, 200)
    val rows = Seq(Multimodal.MediaRow(9L, "video", payload,
      Multimodal.MediaMeta("mjpeg", 2, 2, 3000L, 0))).toDS()
    val frames = Multimodal.sampleFrames(rows).collect().sortBy(_.frame_index)
    assert(frames.length == 3)
    // frame i decodes still i: all four pixels carry that still's gray level
    assert(frames(0).frame_bytes.toSeq == Seq.fill(4)(10.toByte))
    assert(frames(1).frame_bytes.toSeq == Seq.fill(4)(100.toByte))
    assert(frames(2).frame_bytes.toSeq == Seq.fill(4)(200.toByte))
  }
}
