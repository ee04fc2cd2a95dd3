package graft

import org.apache.spark.sql.functions._

import graft.chunk.Chunkers

/** Parity spec: the Scala chunkers must reproduce the reference
  * implementation's output EXACTLY. The golden file was produced by
  * running the reference chunkers (read-only, tools/gen_chunk_golden.py)
  * on this repo's own fixture documents — multi-chunk paths included
  * (fixed-size overlap, recursive sentence packing, structure merge,
  * hybrid fallback, table alternation).
  */
case class GoldenRow(
    strategy: String, source_file: String, chunk_id: String,
    chunk_index: Long, content: String, chunk_size: Option[Long],
    sentence_count: Option[Long], level: Option[String],
    heading: Option[String], is_table: Option[Boolean],
    chunk_type: Option[String], merged: Option[Boolean])

class ChunkersGoldenSpec extends SparkSpec {

  private def res(name: String): String =
    getClass.getClassLoader.getResource(name).getPath

  lazy val docs: Seq[(String, String)] = {
    import spark.implicits._
    spark.read.json(res("chunk_docs.json"))
      .select("source_file", "content").as[(String, String)].collect().toSeq
  }

  lazy val golden: Seq[GoldenRow] = {
    import spark.implicits._
    spark.read.json(res("chunk_golden.json")).as[GoldenRow].collect().toSeq
  }

  for (strategy <- Chunkers.strategyNames) {
    test(s"$strategy matches the reference implementation exactly") {
      val expected = golden.filter(_.strategy == strategy)
        .sortBy(r => (r.source_file, r.chunk_index))
      val actual = docs.flatMap { case (src, text) =>
        Chunkers.all(strategy)(text, src)
      }.sortBy(c => (c.source_file, c.chunk_index))

      assert(actual.size == expected.size,
        s"chunk count: got ${actual.size}, want ${expected.size}")
      actual.zip(expected).foreach { case (a, e) =>
        assert(a.chunk_id == e.chunk_id)
        assert(a.content == e.content, s"content mismatch in ${e.chunk_id}")
        assert(a.chunk_index.toLong == e.chunk_index)
        assert(a.metadata.chunk_size.map(_.toLong) == e.chunk_size,
          s"chunk_size mismatch in ${e.chunk_id}")
        assert(a.metadata.sentence_count.map(_.toLong) == e.sentence_count,
          s"sentence_count mismatch in ${e.chunk_id}")
        assert(a.metadata.level == e.level, s"level mismatch in ${e.chunk_id}")
        assert(a.metadata.heading == e.heading, s"heading mismatch in ${e.chunk_id}")
        assert(a.metadata.is_table == e.is_table, s"is_table mismatch in ${e.chunk_id}")
        assert(a.metadata.chunk_type == e.chunk_type, s"chunk_type mismatch in ${e.chunk_id}")
        assert(a.metadata.merged == e.merged, s"merged mismatch in ${e.chunk_id}")
      }
    }
  }

  test("token count matches the reference heuristic") {
    assert(Chunkers.tokenCount("") == 0)
    assert(Chunkers.tokenCount("hello world") == 2 + 11 / 4)
    assert(Chunkers.tokenCount("  spaced   out  ") == 2 + 16 / 4)
    assert(Chunkers.tokenCount("a.b") == 1 + 0) // no whitespace → one word
  }

  test("coverage: every golden content is non-empty and within documents") {
    golden.foreach { g =>
      assert(g.content.trim.nonEmpty)
    }
  }
}
