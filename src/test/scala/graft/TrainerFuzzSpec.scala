package graft

import org.apache.spark.sql.functions._

/** Property fuzz for the round-11 trainers against independent
  * in-memory references (the BpeFuzzSpec pattern): the distributed
  * implementation and a naive driver-side reimplementation must agree
  * on random corpora. The DuckDB oracle replays the SAME algorithm in
  * SQL — these references are the second, algorithm-independent leg:
  * a shared design bug (wrong tie rule, off-by-one in a fold, a
  * missed snap) breaks the agreement here even when both engines
  * faithfully reproduce it.
  */
class TrainerFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def snap(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("k-center greedy: distributed struct-min equals the naive in-memory greedy") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 15) {
      val n = 5 + rnd.nextInt(30)
      val dim = 4
      val vecs: Seq[(Long, Array[Float])] = (0 until n).map { i =>
        // small integer grids force exact ties — the adversarial case
        // for the (maxsim, vec_id) lexicographic tie rule
        (i.toLong * 3 + 1, Array.fill(dim)((rnd.nextInt(5) - 2).toFloat))
      }
      val k = 2 + rnd.nextInt(6)
      val got = graft.queries.Similarity
        .coresetKcenterOf(spark, vecs.toDF("vec_id", "embedding"), k)
        .collect().sortBy(_.getInt(0))
        .map(r => (r.getInt(0), r.getLong(1)))

      // naive reference: same semantics, plain loops
      val byId = vecs.toMap
      def dot(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < math.min(a.length, b.length)) { s += a(i).toDouble * b(i).toDouble; i += 1 }
        s
      }
      var sel = Vector(vecs.map(_._1).min)
      val expect = Seq.newBuilder[(Int, Long)]
      expect += ((1, sel.head))
      var step = 2
      var exhausted = false
      while (step <= k && !exhausted) {
        val cands = vecs.filter(v => !sel.contains(v._1))
        if (cands.isEmpty) exhausted = true
        else {
          val picked = cands
            .map { case (id, v) => (sel.map(s => dot(v, byId(s))).max, id) }
            .minBy(identity) // (maxsim asc, id asc) — the struct-min rule
          sel :+= picked._2
          expect += ((step, picked._2))
          step += 1
        }
      }
      assert(got.toSeq == expect.result(),
        s"trial $trial (n=$n, k=$k): ${got.toSeq} vs ${expect.result()}")
    }
  }

  test("TextRank: distributed PageRank equals the naive adjacency loop") {
    val rnd = new scala.util.Random(47)
    val words = Vector("a", "b", "c", "d", "e", "f")
    for (trial <- 1 to 10) {
      val nDocs = 3 + rnd.nextInt(8)
      val docs = (0 until nDocs).map { i =>
        val len = 2 + rnd.nextInt(15)
        (i.toLong, Seq.fill(len)(words(rnd.nextInt(words.length))).mkString(" "))
      }
      val got = graft.queries.TextAnalysis
        .textrankKeywordsOf(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq

      // naive reference: build the undirected count-weighted adjacency
      // from scratch, run the same 5 snapped damped iterations
      val pairs = docs.flatMap { case (_, text) =>
        val t = text.trim.split("\\s+").toSeq
        t.zip(t.drop(1)).filter { case (x, y) => x != y }
      }
      val w = scala.collection.mutable.Map.empty[(String, String), Long]
      pairs.foreach { case (x, y) =>
        w((x, y)) = w.getOrElse((x, y), 0L) + 1
        w((y, x)) = w.getOrElse((y, x), 0L) + 1
      }
      val nodes = w.keys.map(_._1).toSeq.distinct.sorted
      if (nodes.isEmpty) assert(got.isEmpty)
      else {
        val wdeg = nodes.map(n => n -> w.collect {
          case ((s, _), c) if s == n => c
        }.sum).toMap
        def snap8(x: Double): Double = math.floor(x * 1e8 + 0.5) / 1e8
        var pr = nodes.map(n => n -> snap8(1.0 / nodes.length)).toMap
        for (_ <- 1 to 5) {
          pr = nodes.map { n =>
            val s = w.collect {
              case ((src, dst), c) if dst == n =>
                c.toDouble / wdeg(src) * pr(src)
            }.sum
            n -> snap8(0.15 / nodes.length + 0.85 * s)
          }.toMap
        }
        val expect = pr.toSeq.sortBy { case (t, p) => (-p, t) }.take(10)
          .zipWithIndex.map { case ((t, p), i) => (i + 1, t, p) }
        // the naive neighbor sums accumulate in a DIFFERENT order than
        // the distributed aggregate; the per-iteration 1e-8 snap must
        // erase that, so equality here is exact (the LR-fuzz argument)
        assert(got == expect, s"trial $trial: $got vs $expect")
      }
    }
  }

  test("LR trainer: distributed gradient descent equals the naive in-memory loop") {
    val rnd = new scala.util.Random(43)
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    for (trial <- 1 to 8) {
      val n = 10 + rnd.nextInt(40)
      val docs = (0 until n).map { i =>
        val len = 3 + rnd.nextInt(20)
        (i.toLong, Seq.fill(len)(words(rnd.nextInt(words.length))).mkString(" "),
          "xx")
      }
      val feats = graft.queries.Quality.featsOf(
        docs.toDF("doc_id", "text", "lang"))
      val got = graft.queries.Quality.trainWeightsOf(feats)

      // naive reference: recompute features + labels from first
      // principles (md5 bucketing reimplemented directly), run the
      // same 25 snapped full-batch iterations with plain loops
      val B = 16
      def h(s: String): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        java.lang.Long.parseLong(md.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
      }
      val raw = (0 until B).map(j => h(s"qlr|$j") % 401 - 200)
      val s0 = raw.sum
      val x = docs.map { case (_, text, _) =>
        val toks = text.trim.split("\\s+").toSeq
        val cnt = Array.fill(B)(0L)
        toks.foreach(t => cnt((h(s"lr|$t") % B).toInt) += 1)
        val nn = toks.length
        val xs = 1.0 +: (0 until B).map(j => (cnt(j) * B - nn).toDouble / nn)
        val y = if ((0 until B).map(j => (raw(j) * B - s0) * cnt(j)).sum > 0) 1.0 else 0.0
        (xs.toArray, y)
      }
      var w = Array.fill(B + 1)(0.0)
      for (_ <- 1 to 25) {
        val g = Array.fill(B + 1)(0.0)
        for ((xs, y) <- x) {
          var m = 0.0
          var j = 0
          while (j <= B) { m += w(j) * xs(j); j += 1 }
          val p = 1.0 / (1.0 + math.exp(-m))
          j = 0
          while (j <= B) { g(j) += (p - y) * xs(j); j += 1 }
        }
        w = Array.tabulate(B + 1)(j => snap(w(j) - 2.0 * g(j) / x.length))
      }
      // the distributed sum order differs from the loop's — exact
      // equality holds because every iteration snaps to the 1e-6 grid
      // before the drift can reach a decision
      assert(got.toSeq == w.toSeq, s"trial $trial (n=$n)")
    }
  }
}
