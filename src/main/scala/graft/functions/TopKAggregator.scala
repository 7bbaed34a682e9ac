package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY §7.5: "similarity top-k UDAF").
  *
  * `bruteTopK` ranks with a window function, which sorts every
  * (probe, neighbor) pair inside each probe partition. This aggregator
  * instead keeps a bounded k-sized buffer per group and merges buffers
  * — the map side reduces each partition's contribution to k rows
  * BEFORE the exchange, so the shuffle carries O(partitions x k) rows
  * per probe instead of O(corpus). At 100 TB corpus fan-in this is the
  * difference between shuffling gigabytes and kilobytes per probe.
  *
  * Scores are (score desc, id asc)-ordered with the same tiebreak as
  * the window implementation, so results are identical.
  */
object TopKAggregator {

  /** One scored candidate. */
  final case class Scored(id: Long, score: Double)

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  final class TopK(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
    require(k > 0, s"topK needs k > 0, got $k")
    override def zero: List[Scored] = Nil

    // insert keeping the buffer sorted best-first, truncated at k
    override def reduce(buf: List[Scored], v: Scored): List[Scored] = {
      if (buf.sizeIs >= k && better(buf.last, v)) buf
      else {
        val (pre, post) = buf.span(better(_, v))
        (pre ::: v :: post).take(k)
      }
    }

    override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
      b.foldLeft(a)(reduce)

    override def finish(r: List[Scored]): Seq[Scored] = r

    override def bufferEncoder: Encoder[List[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  def topK(k: Int): TypedColumn[Scored, Seq[Scored]] =
    new TopK(k).toColumn
}
