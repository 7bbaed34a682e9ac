package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered funnel: the batch
  * [[graft.operators.EventAnalytics.funnel]] semantics maintained
  * incrementally per user with `flatMapGroupsWithState` — "who just
  * converted" as the events arrive, instead of a nightly batch sweep.
  *
  * State per user is TWO fields (current stage ordinal + its reach
  * time) regardless of stream length or event volume — no watermark is
  * needed because the funnel state machine never buffers events.
  *
  * Equivalence contract (spec-pinned): when each user's events arrive
  * in event-time order ACROSS batches (within a batch any order —
  * the group iterator is sorted here), the advancement rows equal the
  * batch funnel's reach table on the same prefix. The reasoning: in
  * ts order, the first stage-0 event IS min(ts); and once stage i-1 is
  * reached at r, the first stage-i event with ts > r IS the batch
  * min-after-r — any stage-i event skipped earlier (state not yet at
  * i-1) had ts <= r and would not have counted in batch either. Late
  * (out-of-order) cross-batch events degrade to at-least semantics:
  * a conversion can be missed, never invented.
  */
object StreamingFunnel {

  final case class FunnelEvent(user: Long, ts: Timestamp, etype: String)
  final case class FunnelState(stage: Int, reachMicros: Long)
  final case class Advancement(user: Long, stage: Int, stage_name: String,
                               reach_ts: Timestamp)

  /** `events`(userCol: long, tsCol: timestamp, typeCol: string) —
    * streaming or static — to the advancement rows (one per
    * stage-reach, emitted in the micro-batch where it happens).
    * `stage` is 1-based to match the batch funnel's output.
    */
  def funnelStream(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, stages: Seq[String]): Dataset[Advancement] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    val stageOf: Map[String, Int] = stages.zipWithIndex.toMap
    events
      .select(col(userCol).cast("long").as("user"), col(tsCol).as("ts"),
        col(typeCol).cast("string").as("etype"))
      .as[FunnelEvent]
      .groupByKey(_.user)
      .flatMapGroupsWithState[FunnelState, Advancement](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[FunnelEvent],
         state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(-1, Long.MinValue))
          val out = List.newBuilder[Advancement]
          // sort the batch slice by event time so within-batch arrival
          // order cannot differ from event order (ties: any order is
          // equivalent — a tied next-stage event fails the strict >)
          it.toArray.sortBy(e => (e.ts.getTime, e.ts.getNanos)).foreach { e =>
            val next = st.stage + 1
            if (next < stages.length && stageOf.get(e.etype).contains(next)) {
              val micros = e.ts.getTime * 1000L + e.ts.getNanos / 1000 % 1000
              if (st.stage < 0 || micros > st.reachMicros) {
                st = FunnelState(next, micros)
                out += Advancement(user, next + 1, stages(next), e.ts)
              }
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  def outputMode: OutputMode = OutputMode.Append()
}
