package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY §7.5: "similarity top-k UDAF").
  *
  * A `row_number` ranking window sorts every (group, candidate) pair
  * inside each group partition. This aggregator instead keeps a bounded
  * k-sized buffer per group and merges buffers — the map side reduces
  * each partition's contribution to k rows BEFORE the exchange, so the
  * shuffle carries O(partitions x k) rows per group instead of
  * O(candidates). At 100 TB corpus fan-in this is the difference
  * between shuffling gigabytes and kilobytes per probe.
  *
  * Buffers are (score desc, id asc)-ordered with the same tiebreak as
  * the window implementation, so results are identical.
  */
object TopKAggregator {

  /** One scored candidate (long ids). */
  final case class Scored(id: Long, score: Double)

  /** One scored candidate (string ids). */
  final case class ScoredS(id: String, score: Double)

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** Spark orders strings by UTF-8 BYTES (UTF8String binary order),
    * which diverges from JVM UTF-16 compareTo for non-BMP code points —
    * tie-breaking must match the window implementation it replaces.
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  private def betterS(a: ScoredS, b: ScoredS): Boolean =
    a.score > b.score || (a.score == b.score && utf8Less(a.id, b.id))

  /** Shared bounded-buffer top-k: insert keeping the buffer sorted
    * best-first (by `beats`), truncated at k; merge = fold.
    */
  sealed abstract class BoundedTopK[S](k: Int, beats: (S, S) => Boolean)(
      implicit bufEnc: Encoder[List[S]], outEnc: Encoder[Seq[S]])
      extends Aggregator[S, List[S], Seq[S]] {
    require(k > 0, s"topK needs k > 0, got $k")
    final override def zero: List[S] = Nil

    final override def reduce(buf: List[S], v: S): List[S] = {
      if (buf.sizeIs >= k && beats(buf.last, v)) buf
      else {
        val (pre, post) = buf.span(beats(_, v))
        (pre ::: v :: post).take(k)
      }
    }

    final override def merge(a: List[S], b: List[S]): List[S] =
      b.foldLeft(a)(reduce)

    final override def finish(r: List[S]): Seq[S] = r
    final override def bufferEncoder: Encoder[List[S]] = bufEnc
    final override def outputEncoder: Encoder[Seq[S]] = outEnc
  }

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  final class TopK(k: Int) extends BoundedTopK[Scored](k, better)(
    ExpressionEncoder[List[Scored]](), ExpressionEncoder[Seq[Scored]]())

  final class TopKString(k: Int) extends BoundedTopK[ScoredS](k, betterS)(
    ExpressionEncoder[List[ScoredS]](), ExpressionEncoder[Seq[ScoredS]]())

  def topK(k: Int): TypedColumn[Scored, Seq[Scored]] =
    new TopK(k).toColumn

  /** Grouped top-k over a scored frame: for each `groupCol` value, the
    * k best (scoreCol desc, idCol asc) rows, emitted as
    * (groupCol, idCol, rank, scoreCol) with idCol's ORIGINAL type and
    * scoreCol as double.
    *
    * This is the scale-shaped ranking primitive: the aggregator's
    * partial (map-side) phase truncates every input partition's
    * contribution to k rows BEFORE the exchange, so the shuffle carries
    * O(partitions x k) rows per group instead of the full candidate
    * stream — where a `row_number` window would exchange every scored
    * row. Null scores and null ids are excluded (a candidate with no
    * defined score cannot rank; a null id identifies nothing).
    *
    * Integral and string id columns take the aggregator path; any
    * other id type falls back to a `row_number` window with the
    * identical (score desc, id asc) ordering — correct, just without
    * the map-side truncation. String ties break by UTF-8 byte order on
    * every path (Spark's native string ordering).
    *
    * Scale note: the UDAF plans as ObjectHashAggregateExec, whose
    * hash map falls back to SORT-based aggregation after
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    * distinct keys (default 128). For top-k that fallback is pure
    * loss: the buffers are bounded at k rows, so the hash map stays
    * small at any group count, while the sort pays for the FULL
    * scored stream (observed: 30 GB of spill on a 640 M-row candidate
    * stream at the 10 M-vector stress tier, from 1024 probe groups
    * tripping the 128-key default). Every graft session builder
    * raises the threshold to 131072; buffers here are k-bounded so
    * hash aggregation is safe at any realistic group count.
    */
  def groupedTopK(scored: DataFrame, groupCol: String, idCol: String,
                  scoreCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val idType = scored.schema(idCol).dataType
    val ranked = scored.filter(col(scoreCol).isNotNull && col(idCol).isNotNull)
    idType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val tk = udaf(new TopK(k), Encoders.product[Scored])
        ranked.groupBy(col(groupCol))
          .agg(tk(col(idCol).cast("long"), col(scoreCol).cast("double")).as("__top"))
          .select(col(groupCol), posexplode(col("__top")))
          .select(col(groupCol), col("col.id").cast(idType).as(idCol),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.score").as(scoreCol))
      case StringType =>
        val tk = udaf(new TopKString(k), Encoders.product[ScoredS])
        ranked.groupBy(col(groupCol))
          .agg(tk(col(idCol), col(scoreCol).cast("double")).as("__top"))
          .select(col(groupCol), posexplode(col("__top")))
          .select(col(groupCol), col("col.id").as(idCol),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.score").as(scoreCol))
      case _ =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol))
          .orderBy(col(scoreCol).desc, col(idCol).asc)
        ranked
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= k)
          .select(col(groupCol), col(idCol), col("rank"),
            col(scoreCol).cast("double").as(scoreCol))
    }
  }
}
