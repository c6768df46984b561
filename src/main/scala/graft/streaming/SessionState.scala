package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Custom streaming state: per-user running aggregates via
  * mapGroupsWithState — the KeyValueGroupedDataset state API the
  * reference has no analog for (pure batch), included as the
  * streaming-extension surface (SURVEY §7 M5).
  *
  * State is one small case class per key, partitioned by user across
  * executors by the state store — memory scales with |users|, not
  * |events|.
  */
object SessionState {

  case class Ev(user_id: Long, event_type: String, value: Double)
  case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  /** Fold each user's events into running (count, sum) state; emit the
    * state after every batch (Update mode downstream).
    */
  def runningUserAgg(events: Dataset[Ev]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(user, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          evs.foreach { e => n += 1; tot += e.value }
          val next = UserAgg(user, n, tot)
          state.update(next)
          next
      }
  }

  case class TsEv(user_id: Long, event_time: Timestamp, value: Double)
  case class SessionAgg(user_id: Long, n_events: Long, first_ms: Long, last_ms: Long)
  case class SessionOut(user_id: Long, n_events: Long, duration_ms: Long)

  /** Streaming gap-based sessionization via flatMapGroupsWithState with an
    * EVENT-TIME TIMEOUT — the streaming twin of `Relational.sessionize`.
    *
    * Per user, events accumulate into an open-session state; when the
    * watermark passes last_event + gap the state times out, the COMPLETED
    * session is emitted (append semantics: each session exactly once) and
    * the state is removed. State is one small case class per ACTIVE user —
    * memory scales with concurrently-active users, not history, and the
    * timeout is what guarantees eviction on an unbounded stream.
    *
    * Input must carry a watermark on `event_time` (the caller sets it);
    * within a batch, a group's iterator is not order-guaranteed, so the
    * fold tracks min/max event times instead of assuming order. Gap
    * splits WITHIN a batch are resolved by timeout only — sessions closer
    * than the watermark delay merge, the documented approximation of the
    * single-pass streaming form.
    */
  def streamingSessions(events: Dataset[TsEv],
      gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, evs: Iterator[TsEv], state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(s.user_id, s.n_events, s.last_ms - s.first_ms))
          } else {
            var agg = state.getOption.getOrElse(SessionAgg(user, 0L, Long.MaxValue, Long.MinValue))
            evs.foreach { e =>
              val t = e.event_time.getTime
              agg = SessionAgg(user, agg.n_events + 1,
                math.min(agg.first_ms, t), math.max(agg.last_ms, t))
            }
            state.update(agg)
            state.setTimeoutTimestamp(agg.last_ms + gapMs)
            Iterator.empty
          }
      }
  }

  /** Drive streaming sessionization over the static events parquet
    * (memory sink, Append mode). The final watermark closes every session
    * whose gap elapsed before max(event_time) - delay; later ones stay
    * open in state — the bounded-state behavior under test.
    */
  def runSessions(spark: SparkSession, dir: String, name: String,
      gapMs: Long): Unit = {
    import spark.implicits._
    val evs = EventsStream.eventsFileStream(spark, dir)
      .withWatermark("event_time", "5 minutes")
      .select(col("user_id"), col("event_time"), col("value"))
      .as[TsEv]
    val q = streamingSessions(evs, gapMs).writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Drive the stateful aggregate over the static events parquet as a
    * streaming query (memory sink, Update mode).
    */
  def runOnce(spark: SparkSession, dir: String, name: String): Unit = {
    import spark.implicits._
    val evs = EventsStream.eventsFileStream(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"))
      .as[Ev]
    val q = runningUserAgg(evs).writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
