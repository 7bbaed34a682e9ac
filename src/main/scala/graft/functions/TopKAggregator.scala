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

  /** String-id variant of [[TopK]] (same ordering contract: score
    * desc, id asc lexicographically).
    */
  final case class ScoredS(id: String, score: Double)

  private def betterS(a: ScoredS, b: ScoredS): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  final class TopKString(k: Int) extends Aggregator[ScoredS, List[ScoredS], Seq[ScoredS]] {
    require(k > 0, s"topK needs k > 0, got $k")
    override def zero: List[ScoredS] = Nil
    override def reduce(buf: List[ScoredS], v: ScoredS): List[ScoredS] = {
      if (buf.sizeIs >= k && betterS(buf.last, v)) buf
      else {
        val (pre, post) = buf.span(betterS(_, v))
        (pre ::: v :: post).take(k)
      }
    }
    override def merge(a: List[ScoredS], b: List[ScoredS]): List[ScoredS] =
      b.foldLeft(a)(reduce)
    override def finish(r: List[ScoredS]): Seq[ScoredS] = r
    override def bufferEncoder: Encoder[List[ScoredS]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[ScoredS]]()
    override def outputEncoder: Encoder[Seq[ScoredS]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredS]]()
  }

  /** Grouped top-k over a scored frame: for each `groupCol` value, the
    * k best (scoreCol desc, idCol asc) rows, emitted as
    * (groupCol, idCol, rank, scoreCol) with idCol's ORIGINAL type.
    *
    * This is the scale-shaped ranking primitive: the aggregator's
    * partial (map-side) phase truncates every input partition's
    * contribution to k rows BEFORE the exchange, so the shuffle carries
    * O(partitions x k) rows per group instead of the full candidate
    * stream — where a `row_number` window would exchange every scored
    * row. Null scores are excluded (a candidate with no defined score
    * cannot rank).
    *
    * Integral and string id columns take the aggregator path; any
    * other id type falls back to a `row_number` window with the
    * identical (score desc, id asc) ordering — correct, just without
    * the map-side truncation.
    */
  def groupedTopK(scored: DataFrame, groupCol: String, idCol: String,
                  scoreCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val idType = scored.schema(idCol).dataType
    val nonNull = scored.filter(col(scoreCol).isNotNull)
    idType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val tk = udaf(new TopK(k), Encoders.product[Scored])
        nonNull.groupBy(col(groupCol))
          .agg(tk(col(idCol).cast("long"), col(scoreCol).cast("double")).as("__top"))
          .select(col(groupCol), posexplode(col("__top")))
          .select(col(groupCol), col("col.id").cast(idType).as(idCol),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.score").as(scoreCol))
      case StringType =>
        val tk = udaf(new TopKString(k), Encoders.product[ScoredS])
        nonNull.groupBy(col(groupCol))
          .agg(tk(col(idCol), col(scoreCol).cast("double")).as("__top"))
          .select(col(groupCol), posexplode(col("__top")))
          .select(col(groupCol), col("col.id").as(idCol),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.score").as(scoreCol))
      case _ =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol))
          .orderBy(col(scoreCol).desc, col(idCol).asc)
        nonNull
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= k)
          .select(col(groupCol), col(idCol), col("rank"), col(scoreCol))
    }
  }
}
