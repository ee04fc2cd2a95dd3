package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.chunk.Chunkers
import graft.embed.HashingEmbedder

/** Property tests for the pure per-document operators (SURVEY §5:
  * chunk coverage invariants, cosine symmetry, token-count semantics).
  * Uses ScalaCheck generators with a fixed seed (no scalatestplus bridge
  * in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private val word = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "metric", "sensor", "valley",
    "reading", "Snowpack", "trail.", "window?", "burns!", "x1", "42")
  private val sentenceText: Gen[String] = for {
    n <- Gen.choose(1, 400)
    ws <- Gen.listOfN(n, word)
  } yield ws.mkString(" ")

  private def samples(gen: Gen[String], n: Int): Seq[String] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("fixed_size: chunks cover all sentences, in order, with exact metadata") {
    for (text <- samples(sentenceText, 60)) {
      val chunks = Chunkers.fixedSize(text, "p.md")
      val sentences = Chunkers.splitSentences(text)
      assert(chunks.nonEmpty == sentences.nonEmpty)
      sentences.foreach(s => assert(chunks.exists(_.content.contains(s))))
      assert(chunks.map(_.chunk_index) == chunks.indices)
      chunks.foreach { c =>
        assert(c.chunk_id == s"p.md_fixed_size_${c.chunk_index}")
        assert(c.metadata.chunk_size.contains(Chunkers.tokenCount(c.content)))
        assert(c.metadata.sentence_count.exists(_ >= 1))
      }
    }
  }

  test("all strategies: non-empty output on non-blank text, contiguous indices") {
    for (text <- samples(sentenceText, 40); (name, fn) <- Chunkers.all) {
      val chunks = fn(text, "d.md")
      assert(chunks.nonEmpty, s"$name produced no chunks")
      assert(chunks.map(_.chunk_index) == chunks.indices, s"$name indices")
      chunks.foreach(c => assert(c.content.trim.nonEmpty, s"$name blank chunk"))
    }
  }

  test("embeddings: unit norm (or zero), symmetry, bounded cosine") {
    val m = HashingEmbedder.modelsByName("hash-64")
    val texts = samples(sentenceText, 40)
    for ((a, b) <- texts.zip(texts.reverse)) {
      val va = HashingEmbedder.embed(a, m)
      val vb = HashingEmbedder.embed(b, m)
      val na = math.sqrt(va.map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(na - 1.0) < 1e-5 || na == 0.0)
      val sab = HashingEmbedder.similarity(va, vb)
      assert(sab == HashingEmbedder.similarity(vb, va))
      assert(sab >= -1e-9 && sab <= 1.0 + 1e-9)
    }
  }

  test("token count equals Python semantics on edge inputs") {
    assert(Chunkers.tokenCount("") == 0)
    assert(Chunkers.tokenCount("   ") == 0 + 3 / 4)
    assert(Chunkers.tokenCount("\n\t x") == 1 + 4 / 4)
  }
}
