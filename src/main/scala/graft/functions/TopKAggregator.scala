package graft.functions

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
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
  * a sort-the-world exchange. Generic in the id type (Long vec ids,
  * String chunk ids).
  */
class TopKAggregator[I: TypeTag: Ordering](k: Int)
    extends Aggregator[(I, Double), Seq[(Double, I)], Seq[(Double, I)]] {

  private val idOrd = implicitly[Ordering[I]]
  private val bufOrd: Ordering[(Double, I)] = new Ordering[(Double, I)] {
    override def compare(a: (Double, I), b: (Double, I)): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // sim desc
      if (c != 0) c else idOrd.compare(a._2, b._2) // id asc
    }
  }

  private def compact(buf: Seq[(Double, I)]): Seq[(Double, I)] =
    buf.sorted(bufOrd).take(k)

  override def zero: Seq[(Double, I)] = Seq.empty

  override def reduce(buf: Seq[(Double, I)], row: (I, Double)): Seq[(Double, I)] = {
    val appended = buf :+ ((row._2, row._1))
    if (appended.size >= 2 * k) compact(appended) else appended
  }

  override def merge(a: Seq[(Double, I)], b: Seq[(Double, I)]): Seq[(Double, I)] =
    compact(a ++ b)

  override def finish(buf: Seq[(Double, I)]): Seq[(Double, I)] = compact(buf)

  override def bufferEncoder: Encoder[Seq[(Double, I)]] =
    ExpressionEncoder[Seq[(Double, I)]]()
  override def outputEncoder: Encoder[Seq[(Double, I)]] = bufferEncoder
}
