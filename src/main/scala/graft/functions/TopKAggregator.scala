package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, TypedColumn}
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

  /** Grouped top-k over a scored frame: for each `groupCol` value, the
    * k best (scoreCol desc, idCol asc) rows, emitted as
    * (groupCol, idCol, rank, scoreCol).
    *
    * This is the scale-shaped ranking primitive: the aggregator's
    * partial (map-side) phase truncates every input partition's
    * contribution to k rows BEFORE the exchange, so the shuffle carries
    * O(partitions x k) rows per group instead of the full candidate
    * stream — where a `row_number` window would exchange every scored
    * row. Null scores are excluded (a candidate with no defined score
    * cannot rank).
    */
  def groupedTopK(scored: DataFrame, groupCol: String, idCol: String,
                  scoreCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val tk = udaf(new TopK(k), Encoders.product[Scored])
    scored
      .filter(col(scoreCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(tk(col(idCol).cast("long"), col(scoreCol).cast("double")).as("__top"))
      .select(col(groupCol), posexplode(col("__top")))
      .select(col(groupCol), col("col.id").as(idCol),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.score").as(scoreCol))
  }
}
