package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Drive the stateful aggregate over the static events parquet as a
    * streaming query (memory sink, Update mode).
    */
  def runOnce(spark: SparkSession, dir: String, name: String): Unit = {
    import spark.implicits._
    val evs = spark.readStream.schema(EventsStream.EventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
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
