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
}
