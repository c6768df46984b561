package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's whole program as one composable call: dmCustomerProc.py
  * runs 16 SQL blocks top-to-bottom, fully materializing between steps,
  * and accumulates three outputs — the dwd_customer upsert image, the
  * new-customer insert image, and the dwd_hstr SCD2 delta (dm:17-232,
  * SURVEY §3). Here the same dataflow is ONE lazy DAG per output:
  * Catalyst prunes and fuses across all block boundaries, so a column
  * only the final select needs is read exactly once, and shared subtrees
  * (the staging snapshot, the changed-key set) plan once.
  *
  * Inputs are role-mapped testdata tables (FIXTURES.md): customer plays
  * the customer/party staging join product, orders the account/update
  * stream. Timestamps are injected literals (G9).
  */
object CustomerDimPipeline {

  final case class Outputs(
      upsertImage: DataFrame, // SQL-12: current dim after keyed upsert
      insertImage: DataFrame, // SQL-13: brand-new customers to insert
      histDelta: DataFrame)   // SQL-14..16: expired ∪ new-current rows

  def run(spark: SparkSession, sfDir: String, ts: String = "2026-01-01 00:00:00",
      cdate: String = "2023-06-15 00:00:00",
      histFrom: String = "2020-01-01 00:00:00"): Outputs = {
    val t = graft.Tables
    def lts(s: String) = to_timestamp(lit(s))

    // -- staging denorm + derived metrics (SQL-1..5 shapes)
    val cust = t.customer(spark, sfDir)
    val ord = t.orders(spark, sfDir)
    val acctCounts = Relational.groupCount(ord, "o_custkey", "acct_count")
    val latest = Relational.latestPerKey(ord, "o_custkey", "o_orderkey")
      .select(col("o_custkey").as("__k"), col("o_orderdate").as("latest_order_date"))
    val staged = cust
      .select(col("c_custkey").as("cust_id"), col("c_name").as("cust_name"),
        col("c_mktsegment").as("mkt_segment"), col("c_acctbal").as("acct_bal"))
      .join(acctCounts, col("cust_id") === col("o_custkey"), "left").drop("o_custkey")
      .join(latest, col("cust_id") === col("__k"), "left").drop("__k")

    // -- new snapshot with business change (SQL-14 input)
    val newSnap = staged.withColumn("mkt_segment",
      when(col("mkt_segment") === "BUILDING", "BLDG").otherwise(col("mkt_segment")))

    // -- current dim + history (seeded roles)
    val dim = staged.withColumn("etl_date", lts(histFrom))
    val hist = staged
      .withColumn("effective_from_date", lts(histFrom))
      .withColumn("is_current_record", lit(1))

    // -- SQL-12: keyed upsert of changed segments into the dim
    val updates = newSnap.select(col("cust_id"),
      col("mkt_segment").as("mkt_segment_new"))
    val upsert = Scd2.keyedUpsert(dim, updates, Seq("cust_id"),
        Map("mkt_segment" -> "mkt_segment_new"))
      .withColumn("etl_date", lts(ts))

    // -- SQL-13: anti-join insert image (customers with no F/urgent order)
    val insert = Scd2.antiInsert(
      newSnap,
      ord.where(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("cust_id")),
      Seq("cust_id"))
      .withColumn("etl_date", lts(ts))

    // -- SQL-14..16: change detect -> expire -> new-current -> delta
    val compareCols = Seq("cust_id", "cust_name", "mkt_segment", "acct_bal")
    val changedKeys = Scd2.changedRows(newSnap, staged, compareCols)
      .select("cust_id").distinct()
    val udate = coalesce(col("latest_order_date"), lts(cdate))
    val expired = hist
      .join(changedKeys, Seq("cust_id"), "inner")
      .withColumn("effective_to_date", udate)
      .withColumn("is_current_record", lit(0))
      .withColumn("sys_effective_to_date", lts(ts))
      .withColumn("etl_date", lts(ts))
    val newCurrent = newSnap
      .join(changedKeys, Seq("cust_id"), "inner")
      .withColumn("effective_from_date", udate)
      .withColumn("effective_to_date", lit(null).cast("timestamp"))
      .withColumn("is_current_record", lit(1))
      .withColumn("sys_effective_from_date", lts(ts))
      .withColumn("sys_effective_to_date", lit(null).cast("timestamp"))
      .withColumn("etl_date", lts(ts))
    val delta = expired.unionByName(newCurrent, allowMissingColumns = true)

    Outputs(upsert, insert, delta)
  }
}
