package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items ("heavy hitters") sketch as a typed,
  * MERGEABLE aggregator (SURVEY §2.10 text analysis) — the
  * bounded-memory answer to "what are the most frequent tokens per
  * slice of a 100 TB corpus": tokenizer-vocabulary candidates,
  * stopword discovery, boilerplate-phrase detection.
  *
  * Exact per-group term counting materializes the full (group, term)
  * matrix through the exchange — O(vocabulary) rows per group. The
  * Misra–Gries summary caps the buffer at `capacity` counters with the
  * classic guarantee: any term with true frequency > N/(capacity+1)
  * survives, and every reported estimate is within N/(capacity+1)
  * UNDER of its true count (never over, after the decrement steps).
  * When `capacity` >= the group's distinct-term count the sketch never
  * decrements and the counts are EXACT — the regime the oracle-checked
  * catalog query pins (the [[graft.operators.Profile]] approx-NDV
  * stance: the bound is the contract, exactness where the bound
  * degenerates).
  *
  * Merging follows Agarwal et al. ("Mergeable summaries", PODS 2012):
  * sum counters pairwise, then if more than `capacity` survive,
  * subtract the (capacity+1)-th largest count from all and drop the
  * non-positive — the merged sketch keeps the same error class, which
  * is what makes the aggregation map-side combinable: each partition
  * ships at most `capacity` counters to the exchange regardless of
  * partition size.
  *
  * Determinism: reduce/merge order affects WHICH below-threshold terms
  * survive in the general regime (inherent to MG under any engine);
  * in the exact regime (no decrements ever trigger) the buffer is the
  * exact count map and the result is order-independent. The final
  * ranking always breaks count ties by term (UTF-8 order) so equal
  * sketches render identically.
  */
object FreqItemsAggregator {

  /** One reported item. */
  final case class TermCount(term: String, est: Long)

  /** The MG point update, shared verbatim by the batch aggregator and
    * the streaming state machine ([[graft.streaming.StreamingHeavyHitters]])
    * so the two tiers provably apply the same rule.
    */
  def mgReduce(buf: Map[String, Long], term: String,
               capacity: Int): Map[String, Long] =
    buf.get(term) match {
      case Some(c) => buf.updated(term, c + 1L)
      case None if buf.size < capacity => buf.updated(term, 1L)
      case None =>
        // the MG decrement: every counter -1, drop the zeroed
        buf.foldLeft(Map.empty[String, Long]) { case (m, (t, c)) =>
          if (c > 1L) m.updated(t, c - 1L) else m
        }
    }

  /** Mergeable-summaries combine (Agarwal et al., PODS 2012). */
  def mgMerge(a: Map[String, Long], b: Map[String, Long],
              capacity: Int): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= capacity) summed
    else {
      // subtract the (capacity+1)-th largest count, keep positive
      val cut = summed.valuesIterator.toArray.sortBy(-_)(Ordering.Long)
        .apply(capacity)
      summed.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  /** Deterministic top-k rendering: count desc, UTF-8 term asc. */
  def mgTopK(buf: Map[String, Long], k: Int): Seq[TermCount] =
    buf.toSeq
      .map { case (t, c) => TermCount(t, c) }
      .sortWith((x, y) =>
        x.est > y.est || (x.est == y.est && utf8Less(x.term, y.term)))
      .take(k)

  final class FreqItems(capacity: Int, k: Int)
      extends Aggregator[String, Map[String, Long], Seq[TermCount]] {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(k > 0 && k <= capacity, s"need 0 < k <= capacity, got k=$k")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], term: String): Map[String, Long] =
      mgReduce(buf, term, capacity)

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      mgMerge(a, b, capacity)

    override def finish(buf: Map[String, Long]): Seq[TermCount] =
      mgTopK(buf, k)

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[TermCount]] =
      ExpressionEncoder[Seq[TermCount]]()
  }

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

  /** Top-`k` most frequent values of `termCol` per `groupCol`:
    * (groupCol, term, est, rank). `capacity` bounds the per-group
    * sketch memory; see the class doc for the exactness/error
    * contract. The UDAF plans as ObjectHashAggregate with map-side
    * partials — each partition contributes <= capacity counters per
    * group to the shuffle, never the vocabulary.
    */
  def frequentTerms(df: DataFrame, groupCol: String, termCol: String,
                    capacity: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val fi = udaf(new FreqItems(capacity, k), Encoders.STRING)
    df.filter(col(termCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(fi(col(termCol)).as("__top"))
      .select(col(groupCol), posexplode(col("__top")))
      .select(col(groupCol), col("col.term").as("term"),
        col("col.est").as("est"), (col("pos") + 1).cast("long").as("rank"))
  }
}
