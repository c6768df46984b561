package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ARRIVAL-SEQUENCE numbering — the live twin of
  * `Relational.arrivalSeq` and the primitive under ingest quota
  * enforcement: an event's seq is its 1-based position within its
  * (user, day) cell, carried ACROSS batches by keyed state, so a
  * downstream `seq <= cap` filter admits exactly the first `cap`
  * events per cell no matter how the stream is batched.
  *
  * State is one counter per active (day) per key — it grows with a
  * key's active days, not its event count (same bound as
  * [[NoveltyStream]]'s seen-day set), and is partitioned across
  * executors by the state store.
  *
  * Parity contract (spec-asserted): when each key's events arrive in
  * (ts, event_id) order across batches — the append-ordered ingest
  * shape — the emitted seqs equal the batch window's row_number under
  * the same (ts, event_id) tiebreak chain. Within a batch arrival
  * order is irrelevant (events are sorted before numbering); genuinely
  * late data (an earlier ts landing after a later one was numbered)
  * shifts seqs relative to the batch twin — the divergence every
  * order-sensitive streaming numbering shares. Emission is
  * append-only; no retractions.
  */
object QuotaStream {

  case class Ev(user_id: Long, day: Long, ts: Long, event_id: Long)
  case class Counts(perDay: Map[Long, Long])
  case class Numbered(user_id: Long, day: Long, ts: Long, event_id: Long,
      seq: Long)

  /** Number every event with its cross-batch arrival seq per
    * (user, day).
    */
  def numberEvents(events: Dataset[Ev]): Dataset[Numbered] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (u: Long, it: Iterator[Ev], state: GroupState[Counts]) =>
          val counts = collection.mutable.Map[Long, Long]() ++
            state.getOption.map(_.perDay).getOrElse(Map.empty[Long, Long])
          // batch-internal arrival order must not matter: number in the
          // batch twin's total order (day rides on ts, so (ts, event_id)
          // already orders within each day)
          val out = it.toSeq.sortBy(e => (e.ts, e.event_id)).map { e =>
            val seq = counts.getOrElse(e.day, 0L) + 1L
            counts(e.day) = seq
            Numbered(u, e.day, e.ts, e.event_id, seq)
          }
          state.update(Counts(counts.toMap))
          out.iterator
      }
  }
}
