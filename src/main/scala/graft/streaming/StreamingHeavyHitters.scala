package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.FreqItemsAggregator

/** Streaming heavy hitters: the Misra–Gries sketch as per-group
  * `mapGroupsWithState` — "what are the trending terms per language
  * RIGHT NOW" over an unbounded token stream, with per-group state
  * capped at `capacity` counters FOREVER (the sketch IS the state; no
  * watermark needed because memory does not grow with the stream).
  *
  * The update rule is literally [[FreqItemsAggregator.mgReduce]] — the
  * same function the batch UDAF applies — so the streamed sketch after
  * N batches equals a batch sketch over the concatenated input
  * whenever the batch side reduces in arrival order; in the EXACT
  * regime (capacity >= the group's distinct-term count, so the
  * decrement never fires) the equality is order-independent and
  * total, which is what the spec pins (the q_heavy_hitters catalog
  * stance). Emission: each micro-batch outputs the group's current
  * top-k (update mode), rank-stamped with the deterministic
  * count-desc/UTF-8-asc order.
  */
object StreamingHeavyHitters {

  final case class GroupTerm(group: String, term: String)
  final case class HeavyHitter(group: String, term: String, est: Long,
                               rank: Int)

  /** `rows`(groupCol, termCol) — streaming or static — to the
    * per-batch top-`k` per group. State: one MG buffer per group,
    * <= `capacity` entries.
    */
  def heavyHittersStream(rows: DataFrame, groupCol: String, termCol: String,
                         capacity: Int, k: Int): Dataset[HeavyHitter] = {
    require(capacity > 0 && k > 0 && k <= capacity,
      s"need 0 < k <= capacity, got k=$k capacity=$capacity")
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .select(col(groupCol).cast("string").as("group"),
        col(termCol).cast("string").as("term"))
      .as[GroupTerm]
      .groupByKey(_.group)
      .mapGroupsWithState[Map[String, Long], List[HeavyHitter]](
        GroupStateTimeout.NoTimeout) {
        (group: String, it: Iterator[GroupTerm],
         state: GroupState[Map[String, Long]]) =>
          var buf = state.getOption.getOrElse(Map.empty[String, Long])
          it.foreach(r => buf = FreqItemsAggregator.mgReduce(buf, r.term, capacity))
          state.update(buf)
          FreqItemsAggregator.mgTopK(buf, k).zipWithIndex.map {
            case (tc, i) => HeavyHitter(group, tc.term, tc.est, i + 1)
          }.toList
      }
      .flatMap(identity)
  }

  /** Convenience sink wiring for tests/demos: run the stream into an
    * in-memory table in update mode and return the query name.
    */
  def outputMode: OutputMode = OutputMode.Update()
}
