package graft

import graft.operators.CustomerDimPipeline
import org.apache.spark.sql.functions._

/** End-to-end invariants of the composed customer-dimension pipeline —
  * the "whole proc in one call" surface.
  */
class PipelineSpec extends SparkSpec {

  lazy val out: CustomerDimPipeline.Outputs =
    CustomerDimPipeline.run(spark, sf0001)

  test("upsert image keeps exactly one row per customer") {
    val n = Tables.customer(spark, sf0001).count()
    assert(out.upsertImage.count() == n)
    assert(out.upsertImage.select("cust_id").distinct().count() == n)
  }

  test("insert image ∩ matched customers = ∅ and ∪ = all customers") {
    val matched = Tables.orders(spark, sf0001)
      .where(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct().count()
    val total = Tables.customer(spark, sf0001).count()
    assert(out.insertImage.count() == total - matched)
  }

  test("history delta: one expired + one new-current per changed key") {
    val perKey = out.histDelta.groupBy("cust_id")
      .agg(sum("is_current_record").as("cur"), count(lit(1)).as("n"))
    assert(perKey.where(col("cur") =!= 1 || col("n") =!= 2).count() == 0)
    // only BUILDING customers changed
    assert(out.histDelta.where(col("is_current_record") === 1)
      .where(col("mkt_segment") =!= "BLDG").count() == 0)
  }
}
