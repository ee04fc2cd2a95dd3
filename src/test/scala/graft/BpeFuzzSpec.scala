package graft

import org.apache.spark.sql.functions._

import graft.queries.TextAnalysis

/** Property fuzz for the BPE trainer: the Spark implementation (pair
  * aggregate + sentinel-delimited literal replace) against an
  * independent in-memory reference that manipulates symbol LISTS
  * directly — no string encoding at all. Random corpora over a tiny
  * alphabet force the adversarial cases: overlapping pairs ("aaaa"),
  * count ties resolved lexicographically, merged symbols that are
  * substrings of other symbols, and single-character words.
  */
class BpeFuzzSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE: greedy left-to-right non-overlapping merge over
    * symbol sequences, argmax pair by (count desc, left asc, right asc).
    */
  private def referenceBpe(words: Map[String, Long], iters: Int)
      : Seq[(Int, String, String, Long)] = {
    var vocab: Map[List[String], Long] =
      words.map { case (w, c) => w.toList.map(_.toString) -> c }
        .groupMapReduce(_._1)(_._2)(_ + _)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (i <- 1 to iters) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) = counts.getOrElse((syms(j), syms(j + 1)), 0L) + c
      if (counts.isEmpty) return out.result()
      val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
      out += ((i, l, r, c))
      def mergeWord(syms: List[String]): List[String] = syms match {
        case a :: b :: rest if a == l && b == r => (l + r) :: mergeWord(rest)
        case a :: rest => a :: mergeWord(rest)
        case Nil => Nil
      }
      vocab = vocab.toSeq.map { case (syms, c) => (mergeWord(syms), c) }
        .groupMapReduce(_._1)(_._2)(_ + _)
    }
    out.result()
  }

  test("Spark BPE merges equal the list-based reference on 25 random corpora") {
    val rnd = new scala.util.Random(1117)
    for (trial <- 1 to 25) {
      val alphabet = "ab" + ("cde".take(rnd.nextInt(3)))
      val nWords = 3 + rnd.nextInt(8)
      val words = (0 until nWords).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val counts = words.map(w => w -> (1L + rnd.nextInt(5))).toMap
      val text = counts.toSeq
        .flatMap { case (w, c) => Seq.fill(c.toInt)(w) }.mkString(" ")
      val docs = Seq((0L, text)).toDF("doc_id", "text")
      val expected = referenceBpe(counts, iters = 5)
      val got = TextAnalysis.bpeMerges(docs, iters = 5)
        .as[(Int, String, String, Long)].collect().toSeq
      assert(got == expected,
        s"trial $trial corpus=$counts\n got=$got\n expected=$expected")
    }
  }
}
