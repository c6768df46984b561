package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._

/** Structured Streaming: the streaming windowed aggregate over the static
  * events parquet must agree with the batch twin (unified-API guarantee),
  * driven through a real streaming query with a watermark + memory sink.
  */
class StreamingSpec extends SparkSpec {

  test("streaming windowed agg matches batch twin on sf0.001") {
    val q = EventsStream.runOnce(spark, sf0001, "ev_agg")
    try {
      val streamed = spark.table("ev_agg")
        .select(unix_timestamp(col("window.start")).as("window_start"),
          col("event_type"), col("n_events"))
      val batch = EventsStream.windowedAgg(Tables.events(spark, sf0001))
        .select(col("window_start"), col("event_type"), col("n_events"))
      assert(streamed.count() > 0)
      // append mode: every emitted window must match the batch twin...
      assert(streamed.exceptAll(batch).count() == 0)
      // ...and only windows still open at the final watermark (window end
      // > max(event_time) - 5 min, i.e. the last <= 2 window starts per
      // event type) may be withheld
      val withheld = batch.exceptAll(streamed)
      val cutoff = batch.agg(max(col("window_start"))).collect().head.getLong(0) -
        EventsStream.WindowSeconds
      assert(withheld.where(col("window_start") < cutoff).count() == 0)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessions: timeout emits completed sessions") {
    import spark.implicits._
    graft.streaming.SessionState.runSessions(spark, sf0001, "ev_sessions",
      gapMs = 30L * 60 * 1000)
    val sessions = spark.table("ev_sessions")
    assert(sessions.count() > 0)
    // single-batch drive: each user's events fold into one open session,
    // so an EMITTED (timed-out) session must carry the user's FULL batch
    // event count and min-max duration — check against the static table
    val perUser = Tables.events(spark, sf0001)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_all"),
        // state folds ms-truncated per-event times, so truncate BEFORE
        // differencing (floor(max/1e6) - floor(min/1e6), not floor(diff))
        expr("max(ts) div 1000000 - min(ts) div 1000000").as("dur_ms"))
    val joined = sessions.join(perUser, Seq("user_id"))
    assert(joined.where(col("n_events") =!= col("n_all")).count() == 0)
    assert(joined.where(col("duration_ms") =!= col("dur_ms")).count() == 0)
    // at most one emitted session per user in a single-batch run
    val dups = sessions.groupBy("user_id").count().where(col("count") > 1)
    assert(dups.count() == 0)
  }
}
