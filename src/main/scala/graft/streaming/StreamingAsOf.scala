package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-time as-of (temporal) join — the reference's
  * FlinkJoiner path: each probe row joins the build-side version valid
  * at the probe's event time (`LATERAL TABLE(JoinAgents(l.rowtime))`,
  * reference FlinkJoiner.scala:231-232, :246-257), with correctness
  * under out-of-order arrival guaranteed by the watermark.
  *
  * Mechanics (one `flatMapGroupsWithState` keyed by the join key):
  *  - build rows accumulate as a versions list in state;
  *  - probe rows BUFFER in state until the group's event-time watermark
  *    passes their timestamp — only then can no earlier build version
  *    still arrive (the reference's temporal join does exactly this,
  *    pausing probes on the watermark);
  *  - on each trigger, ripe probes emit matched against the latest
  *    build version at-or-before their ts; build versions older than
  *    the oldest possible future probe are pruned.
  *
  * State per key is O(live versions + buffered probes within the
  * lateness bound) — bounded by the watermark delay, not by history.
  * Upstream must call `.withWatermark` on the event-time column, and
  * that same (watermarked) timestamp column must be the `ts` field of
  * [[Tagged]] — event-time timeouts require it to reach this operator
  * unprojected.
  */
object StreamingAsOf {

  /** Tagged input: probe or build, reduced to (key, event-ts-millis,
    * opaque payload).
    */
  final case class Tagged(key: String, ts: java.sql.Timestamp,
                          isProbe: Boolean, payload: String)

  /** One joined result: the probe row plus the matched build payload
    * (None = no build version at-or-before the probe ts).
    */
  final case class AsOfMatch(key: String, probeTs: Long, probePayload: String,
                             buildTs: Option[Long], buildPayload: Option[String])

  /** Internal operator state (public only for encoder codegen). */
  final case class AsOfState(
      versions: Seq[(Long, String)], // build versions, ts desc
      pending: Seq[(Long, String)])  // buffered probes, ts asc

  implicit private val taggedEnc: Encoder[Tagged] = Encoders.product[Tagged]
  implicit private val matchEnc: Encoder[AsOfMatch] = Encoders.product[AsOfMatch]
  implicit private val stateEnc: Encoder[AsOfState] = Encoders.product[AsOfState]
  implicit private val keyEnc: Encoder[String] = Encoders.STRING

  def asOfStream(tagged: Dataset[Tagged]): Dataset[AsOfMatch] =
    tagged.groupByKey(_.key)
      .flatMapGroupsWithState[AsOfState, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[Tagged], state: GroupState[AsOfState]) =>
          val cur = state.getOption.getOrElse(AsOfState(Nil, Nil))
          val (probes, builds) = rows.toList.partition(_.isProbe)
          // ts desc, payload desc: equal-ts ties resolve to the
          // lexicographically greatest payload (same rule as
          // LatestState), never to micro-batch arrival order
          val versions =
            (builds.map(b => b.ts.getTime -> b.payload) ++ cur.versions)
              .distinct
              .sortBy { case (t, p) => (-t, p) }(
                Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
          val pending =
            (probes.map(p => p.ts.getTime -> p.payload) ++ cur.pending)
              .sortBy(_._1)

          // watermark: 0 before the first trigger with event-time stats.
          // Inclusive ripening is EXACT under Spark's late-data
          // contract: FlatMapGroupsWithState drops incoming rows with
          // ts <= wm (boundary pinned by StreamingAsOfSpec), so once
          // pts <= wm no build row at-or-before pts can ever arrive —
          // a probe ripening at ts == wm cannot miss an equal-ts match.
          // (A build at ts == wm arriving in the SAME batch is merged
          // into `versions` above before this partition runs.)
          val wm = state.getCurrentWatermarkMs()
          val (ripe, stillPending) = pending.partition(_._1 <= wm)

          val out = ripe.map { case (pts, ppay) =>
            versions.find(_._1 <= pts) match {
              case Some((bts, bpay)) =>
                AsOfMatch(key, pts, ppay, Some(bts), Some(bpay))
              case None => AsOfMatch(key, pts, ppay, None, None)
            }
          }

          // prune: any version older than the newest version still
          // at-or-before the watermark can never be matched again
          val cutoffIdx = versions.indexWhere(_._1 <= wm)
          val prunedVersions =
            if (cutoffIdx < 0) versions else versions.take(cutoffIdx + 1)

          if (prunedVersions.isEmpty && stillPending.isEmpty) state.remove()
          else {
            state.update(AsOfState(prunedVersions, stillPending))
            // wake this group when the watermark passes its earliest
            // buffered probe — without a timeout, a group with no new
            // input is never re-invoked and buffered probes would hang.
            // Pending implies pts > wm, so pts is a legal timeout; it
            // fires once the watermark advances beyond pts, at which
            // point the probe is ripe under the inclusive rule.
            stillPending.headOption.foreach { case (pts, _) =>
              state.setTimeoutTimestamp(pts)
            }
          }
          out.iterator
      }
}
