package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming FIRST-SEEN novelty flags — the live twin of the batch
  * novelty monitor (ext_events_novelty): while
  * `dropDuplicatesWithinWatermark` DROPS repeats, a curation pipeline
  * also wants to COUNT them — the fraction of never-before-seen
  * (key, day) activity per day is the "is the crawl finding anything
  * new" drift telemetry.
  *
  * State is one small record per key — the first day ever seen plus the
  * set of days already emitted (bounded by a key's active days, not by
  * its event count) — partitioned across executors by the state store,
  * so memory scales with |keys|, not |events|.
  *
  * Parity contract (spec-asserted): when a key's batches arrive in
  * day order — the normal shape of an append-only event ingest — the
  * emitted flags aggregate to exactly the batch monitor's per-day
  * (n_active_keys, n_new_keys) counts. Genuinely late data (a batch
  * delivering an EARLIER day after a later one was flagged first) is a
  * stream/batch divergence this operator shares with every first-seen
  * system; the flag stream stays append-only and never retracts.
  */
object NoveltyStream {

  case class KeyDay(user_id: Long, event_type: String, day: Long)
  case class Seen(firstDay: Long, seenDays: Seq[Long])
  case class Flag(user_id: Long, event_type: String, day: Long, is_new: Boolean)

  /** Distinct (key, day) flags across batches: a day is emitted the
    * first time its key sees it, flagged new iff it is the key's first
    * day ever.
    */
  def noveltyFlags(keyDays: Dataset[KeyDay]): Dataset[Flag] = {
    import keyDays.sparkSession.implicits._
    keyDays.groupByKey(k => (k.user_id, k.event_type))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Long, String), it: Iterator[KeyDay], state: GroupState[Seen]) =>
          val (u, e) = key
          val prior = state.getOption
          val priorSeen = prior.map(_.seenDays.toSet).getOrElse(Set.empty[Long])
          val fresh = it.map(_.day).toSet.diff(priorSeen).toSeq.sorted
          if (fresh.isEmpty) Iterator.empty
          else {
            val firstDay = (prior.map(_.firstDay).toSeq ++ fresh).min
            state.update(Seen(firstDay, (priorSeen ++ fresh).toSeq.sorted))
            fresh.iterator.map(day => Flag(u, e, day, day == firstDay))
          }
      }
  }

  /** Aggregate a flag table to the batch monitor's output shape:
    * (day, n_active_keys, n_new_keys, novelty_rate).
    */
  def noveltyCounts(flags: DataFrame): DataFrame =
    flags.groupBy("day")
      .agg(count(lit(1)).as("n_active_keys"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new_keys"))
      .select(col("day"), col("n_active_keys"), col("n_new_keys"),
        round(col("n_new_keys") / col("n_active_keys"), 6).as("novelty_rate"))
}
