package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING READ FACE of the persisted graft indexes — the connector's
  * own MicroBatchStream (sources/GraftIndexSource.scala,
  * `toMicroBatchStream`) driven as a module, completing the repo's
  * streaming-twin discipline for its own serving tables: every
  * admission batch (`Similarity.appendToIvfIndex` /
  * `appendToGraphIndex` parquet appends) arrives as a micro-batch of
  * exactly the newly-admitted rows.
  *
  * Semantics inherited from the stream (and pinned by the spec):
  *  - the OFFSET is a position in a checkpoint-local admission log
  *    (round-12; O(1) bytes however many files the index accretes —
  *    the round-11 file-list offset grew with the index), so ordered
  *    replay of N admission batches accumulates exactly the batch-read
  *    state after each admission, restart-safe from the checkpoint
  *    alone;
  *  - exactly-once row delivery holds on APPEND-ONLY sub-tables
  *    (vecs/cells); a dynamically-overwritten table (edges) re-emits
  *    rewritten partitions as fresh batches by design.
  *
  * At 100 TB this is the serving-side change-data feed: downstream
  * monitors (recall trackers, drift fences, leaderboard refreshers)
  * subscribe to admissions instead of re-scanning the index.
  */
object IndexAdmissionStream {

  /** The admissions stream over one index sub-table. The optional caps
    * are the connector's admission control (SupportsAdmissionControl):
    * at 100 TB an uncapped restart replays the whole backlog as one
    * batch — `maxFiles`/`maxBytes` bound each trigger instead (always
    * at least one file, so an oversized file still makes progress).
    */
  def admissions(spark: SparkSession, subTablePath: String,
      maxFiles: Option[Int] = None, maxBytes: Option[Long] = None,
      logRetention: Option[String] = None): DataFrame = {
    val r = spark.readStream.format("graft-index")
    maxFiles.foreach(n => r.option("maxFilesPerTrigger", n.toString))
    maxBytes.foreach(n => r.option("maxBytesPerTrigger", n.toString))
    // "committed" turns on the admission-log retention janitor: entries
    // at or below the newest committed offset fold into a compact
    // snapshot and delete — on a year-lived stream the log directory
    // stays O(uncommitted), not O(admissions)
    logRetention.foreach(v => r.option("admissionLogRetention", v))
    r.load(subTablePath)
  }

  /** Drive the admissions stream into a memory table (append mode) and
    * drain everything currently admitted. The returned query stays
    * open: call `processAllAvailable()` again after the next admission
    * lands, and the new rows arrive as their own micro-batch. Caps
    * thread through to the connector's admission control — a capped
    * replay drains the same state, just in bounded batches.
    */
  def replay(spark: SparkSession, subTablePath: String, name: String,
      maxFiles: Option[Int] = None,
      maxBytes: Option[Long] = None): StreamingQuery = {
    val q = admissions(spark, subTablePath, maxFiles, maxBytes).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q
  }
}
