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
      assert(streamed.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(streamed).count() == 0)
    } finally q.stop()
  }
}
