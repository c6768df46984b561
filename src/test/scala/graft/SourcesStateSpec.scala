package graft

import graft.sources.Sources
import graft.streaming.SessionState
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Parquet source/sink round-trip (the harness half of the IO surface —
  * the JDBC half shares the same mode mapping but has no database in this
  * container) and the stateful-streaming running aggregate.
  */
class SourcesStateSpec extends SparkSpec {
  import spark.implicits._

  test("parquet sink: replace vs append mirror to_sql if_exists") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sources.writeParquetTable(df, dir, "t", replace = true)
    Sources.writeParquetTable(df, dir, "t", replace = false)
    assert(spark.read.parquet(s"$dir/t").count() == 4)
    Sources.writeParquetTable(df, dir, "t", replace = true)
    assert(spark.read.parquet(s"$dir/t").count() == 2)
  }

  test("readParquetTable reflects schema like read_sql_table") {
    val got = Sources.readParquetTable(spark, sf0001, "nation")
    assert(got.columns.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
  }

  test("stateful streaming: running per-user agg matches batch groupBy") {
    SessionState.runOnce(spark, sf0001, "user_agg")
    // Update-mode memory sink may hold one row per state update; the
    // final state per user is the last row — with a single input batch
    // there is exactly one update per user.
    val streamed = spark.table("user_agg")
      .select(col("user_id"), col("n_events"))
    val batch = Tables.events(spark, sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }
}
