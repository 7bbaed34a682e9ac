package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming latest-version-per-key state — the exact semantics of the
  * reference's continuous argmax dedup (reference CRMLSJoiner.scala:182:
  * a newer version replaces the old one and the downstream join sees
  * only the current version).
  *
  * Spark's `dropDuplicates` keeps the FIRST arrival per key and
  * `dropDuplicatesWithinWatermark` bounds state by time — neither is
  * argmax. This operator is `flatMapGroupsWithState` keeping the max-ts
  * record per key and emitting an upsert whenever the champion changes.
  * Late or duplicate versions (ts <= current max) are absorbed
  * silently, which is what the reference's retract stream converges to.
  *
  * State per key is one record — at 100 TB of history the state size is
  * bounded by live key cardinality, not by event count, and lives in the
  * RocksDB state store when
  * `spark.sql.streaming.stateStore.providerClass` is set to the RocksDB
  * provider.
  */
object LatestState {

  /** A change-capture record reduced to (key, version-ts, payload).
    * Payload stays an opaque string (the envelope JSON) so one operator
    * serves all six CRMLS topics — schema is re-applied downstream with
    * `from_json`, mirroring the reference's schema-on-read stance.
    */
  final case class Versioned(key: String, ts: Long, payload: String)

  implicit private val versionedEnc: Encoder[Versioned] =
    Encoders.product[Versioned]
  implicit private val stringEnc: Encoder[String] = Encoders.STRING

  /** Upsert stream of per-key champions: emits the new latest record
    * whenever a key's max-ts record changes.
    */
  def latestByKey(ds: Dataset[Versioned]): Dataset[Versioned] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Versioned, Versioned](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Versioned], state: GroupState[Versioned]) =>
          val incoming = rows.reduceOption { (a, b) =>
            if (b.ts > a.ts || (b.ts == a.ts && b.payload > a.payload)) b else a
          }
          incoming match {
            case None => Iterator.empty
            case Some(cand) =>
              val cur = state.getOption
              val newer = cur.forall(c =>
                cand.ts > c.ts || (cand.ts == c.ts && cand.payload > c.payload))
              if (newer && !cur.contains(cand)) {
                state.update(cand)
                Iterator.single(cand)
              } else Iterator.empty
          }
      }
}
