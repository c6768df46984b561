package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table: event-time tumbling
  * windows with a watermark for late data, plus the batch-equivalent
  * transform used by the correctness gate (same aggregation expressed
  * over a static DataFrame — Structured Streaming's unified-API
  * guarantee makes the two share semantics).
  *
  * The driver parquet ships `ts` as plain `timestamp[us]` (TIMESTAMP_NTZ
  * to Spark); [[eventsFileStream]] normalizes it to the engine's internal
  * convention — Long NANOSECONDS since epoch (`Tables.tsToNanos`) — so
  * windows are computed on exact integer nanos, then reported as
  * epoch-second window starts so engines with different timestamp
  * precisions (Spark µs vs DuckDB ns) agree bit-for-bit.
  */
object EventsStream {

  /** File-source schema for the events stream. A file stream cannot
    * infer schema, so derive it from the BATCH read of the same parquet
    * (one footer read, driver-side, once per stream construction): the
    * streaming `ts` dtype then tracks whatever vintage the fixture
    * actually ships (TIMESTAMP_NTZ today; Long nanos if the driver ever
    * regenerates the TIMESTAMP(NANOS) vintage under the nanosAsLong
    * flag) instead of a hardcoded pin that could disagree with the
    * batch path while FixtureCanary passes.
    */
  def eventsSchema(spark: SparkSession, dir: String): StructType =
    spark.read.parquet(s"$dir/events.parquet").schema

  val WindowSeconds = 600L

  /** Tumbling-window aggregate, batch or streaming input alike:
    * (window_start_sec, event_type) -> count, rounded sum(value),
    * distinct users.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      // integer division on the exact nanos (double math would lose
      // precision above 2^53)
      .withColumn("window_start",
        expr(s"ts div ${WindowSeconds * 1000000000L}") * WindowSeconds)
      .groupBy("window_start", "event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 3).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))

  val SlideSeconds = 300L

  /** SLIDING-window aggregate, batch form: 10-minute windows advancing
    * every 5 — each event lands in exactly len/slide = 2 windows, the
    * overlap that gives trend dashboards smooth updates without waiting
    * a full window. The batch twin materializes the window membership
    * by exploding a 2-element start sequence per row (integer nanos
    * arithmetic, like [[windowedAgg]]); the streaming flavor
    * ([[streamingSlidingAgg]]) expresses the same thing with Spark's
    * native window(col, len, slide), and the unified-API guarantee is
    * spec-asserted. At scale the explode doubles rows BEFORE the
    * aggregate — the map-side combine absorbs it (each partial row is
    * (window, type) keyed), so the shuffle carries windows × types, not
    * 2 × events.
    */
  def slidingWindowedAgg(events: DataFrame): DataFrame = {
    val slideNs = SlideSeconds * 1000000000L
    val steps = (WindowSeconds / SlideSeconds).toInt // windows per event
    events
      .withColumn("window_start", explode(expr(
        s"sequence((ts div $slideNs - ${steps - 1}) * $SlideSeconds," +
          s" (ts div $slideNs) * $SlideSeconds, $SlideSeconds)")))
      .groupBy("window_start", "event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 3).as("sum_value"))
  }

  /** Streaming sliding windows: native window(event_time, 10 min, 5 min)
    * under the same 5-minute watermark as the tumbling flavor. State
    * holds len/slide concurrently-open windows per key instead of 1 —
    * still bounded by the watermark horizon, the property that matters.
    */
  def streamingSlidingAgg(spark: SparkSession, dir: String): DataFrame =
    eventsFileStream(spark, dir)
      .withWatermark("event_time", "5 minutes")
      .groupBy(window(col("event_time"), "10 minutes", "5 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 3).as("sum_value"))

  /** Drive [[streamingSlidingAgg]] to completion via the memory sink
    * (append mode, same finalize-and-evict reasoning as [[runOnce]]).
    */
  def runSlidingOnce(spark: SparkSession, dir: String,
      name: String): StreamingQuery = {
    val q = streamingSlidingAgg(spark, dir).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming flavor with a real event-time watermark: nanos -> timestamp
    * (µs precision suffices for a 10-minute window), 10-minute tumbling
    * window, 5-minute late-data watermark. Late rows beyond the watermark
    * are dropped by the state store instead of accumulating forever —
    * the property that keeps state bounded on an unbounded stream.
    */
  def streamingWindowedAgg(spark: SparkSession, dir: String): DataFrame =
    eventsFileStream(spark, dir)
      .withWatermark("event_time", "5 minutes")
      .groupBy(window(col("event_time"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 3).as("sum_value"))

  /** Drive the streaming aggregate to completion against the static
    * parquet via the memory sink. APPEND mode on purpose: that is the
    * mode where the watermark actually finalizes-and-evicts window state
    * (complete mode retains everything and the watermark is inert), so
    * windows newer than max(event_time) - watermark stay unemitted —
    * the bounded-state behavior this module exists to demonstrate.
    */
  def runOnce(spark: SparkSession, dir: String, name: String): StreamingQuery = {
    val q = streamingWindowedAgg(spark, dir).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q
  }

  /** File stream over the events parquet with an event-time column — the
    * shared head of every streaming operator here. FileStreamSource needs
    * a directory: stream the sf dir, filtered to the events file. `ts` is
    * normalized to Long nanos (the batch-side convention, so the unified
    * transforms like [[windowedAgg]] run on either frame) and the
    * conversions are integer micros arithmetic end-to-end (double math
    * would round ns values above 2^53); µs precision suffices for
    * minute-scale windows and watermarks.
    */
  def eventsFileStream(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.tsToNanos(
      spark.readStream.schema(eventsSchema(spark, dir))
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Streaming dedup: first arrival of each key is emitted, replays
    * within the watermark horizon are dropped, and — the part plain
    * dropDuplicates can't do on an unbounded stream — key state is
    * EVICTED once the watermark passes it, so memory is bounded by the
    * horizon, not the key cardinality. The streaming face of the dedup
    * family (exact/MinHash/SimHash batch variants in operators/Dedup).
    */
  def dedupedStream(events: DataFrame, horizon: String,
      keys: String*): DataFrame =
    events.withWatermark("event_time", horizon)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-stream INTERVAL join: each purchase pairs with same-user
    * clicks at most `gapSeconds` before it. Both sides carry watermarks
    * and the join condition carries the time range — together they bound
    * the state store (a click older than purchase-watermark + gap can
    * never match again and is evicted). The streaming face of
    * Relational.rangeJoinBinned; inner-join append output emits exactly
    * the batch join's matches once both sides are drained.
    */
  def purchaseClickJoin(spark: SparkSession, dir: String,
      gapSeconds: Long): DataFrame = {
    val p = eventsFileStream(spark, dir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("event_time").as("p_time"))
      .withWatermark("p_time", "10 minutes")
    val c = eventsFileStream(spark, dir)
      .where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("event_time").as("c_time"))
      .withWatermark("c_time", "10 minutes")
    p.join(c, expr(
      s"user_id = c_user AND c_time BETWEEN p_time - INTERVAL $gapSeconds SECONDS AND p_time"))
      .select(col("purchase_id"), col("user_id"), col("click_id"))
  }

  /** LEFT-OUTER flavor of [[purchaseClickJoin]]: purchases with NO click
    * in the gap window still emit, with null click columns — the
    * attribution-report semantic (every purchase accounted for). The
    * outer side emits only once its watermark passes the join window
    * (the row is provably unmatched), so results are append-mode
    * eventually-complete; state is bounded exactly as in the inner join.
    */
  def purchaseClickJoinOuter(spark: SparkSession, dir: String,
      gapSeconds: Long): DataFrame = {
    val p = eventsFileStream(spark, dir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("event_time").as("p_time"))
      .withWatermark("p_time", "10 minutes")
    val c = eventsFileStream(spark, dir)
      .where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("event_time").as("c_time"))
      .withWatermark("c_time", "10 minutes")
    p.join(c, expr(
      s"user_id = c_user AND c_time BETWEEN p_time - INTERVAL $gapSeconds SECONDS AND p_time"),
      "left_outer")
      .select(col("purchase_id"), col("user_id"), col("click_id"))
  }

  /** STREAM-STATIC enrichment join: each streamed event picks up its
    * user's dimension attributes (segment, nation) from the static
    * customer table. Stateless — no watermark and NO state store: the
    * static side is planned as an ordinary batch relation per
    * micro-batch, so the natural physical plan is a broadcast hash join
    * of dimension onto the stream (exactly the star-schema enrichment a
    * feature pipeline runs in front of a training sink). Inner join:
    * events with no dimension row are dropped, identically in the batch
    * twin — [[enrichEvents]] over the same inputs, the spec's gate.
    */
  def enrichedStream(spark: SparkSession, dir: String): DataFrame =
    enrichEvents(eventsFileStream(spark, dir),
      spark.read.parquet(s"$dir/customer.parquet"))

  /** The unified-API transform behind [[enrichedStream]]: works on a
    * streaming or static `events` frame alike.
    */
  def enrichEvents(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(
        customer.select(col("c_custkey").as("user_id"),
          col("c_mktsegment").as("segment"), col("c_nationkey").as("nation_key")),
        Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("segment"), col("nation_key"), col("value"))
}
