package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query plus (optionally) its DuckDB-oracle twin.
  *
  * The driver's correctness gate (t2) runs `fn` on sf0.01 parquet, runs
  * `oracle` in DuckDB on the same files, and hash-compares the results as
  * unordered multisets with columns sorted by name — so every computed
  * column must carry the SAME alias on both sides, results must be
  * deterministic (no now(), no order-dependent dedupe), and value types
  * must line up (Spark IntegerType <-> DuckDB INTEGER, LongType <->
  * BIGINT, count(*) is 64-bit in both).
  */
final case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

trait QueryGroup {
  def queries: Seq[GQuery]
}
