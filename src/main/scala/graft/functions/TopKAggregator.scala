package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k aggregate with a bounded buffer (SURVEY §4's optional
  * "streaming-friendly exact top-k buffer") — the typed-UDAF member of
  * the engine's custom-function family (UDTF = chunker flatMap, UDF =
  * embedder, UDAF = this).
  *
  * Keeps the k best (sim desc, id asc on ties) candidates in a buffer of
  * at most 2k entries (compacting on overflow), merges associatively,
  * and finishes with the rank-ordered winners. Used as the merge stage
  * of distributed top-k: each partition's partial winners reduce without
  * a sort-the-world exchange.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def compact(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortBy { case (s, id) => (-s, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], row: (Long, Double)): Seq[(Double, Long)] = {
    val appended = buf :+ ((row._2, row._1))
    if (appended.size >= 2 * k) compact(appended) else appended
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    compact(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = compact(buf)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}
