package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling: exact quotas, partition-independent
  * draws, salt-independent draws, and the WindowGroupLimit scale shape.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf0001)

  test("exact quotas per stratum; small strata taken whole") {
    val got = Sampling.stratified(docs, Seq("lang", "source"),
      "doc_id", "text", lit(3), "|s1")
    val sizes = got.groupBy("lang", "source").count()
    assert(sizes.where(col("count") > 3).count() == 0)
    val strata = docs.groupBy("lang", "source")
      .agg(count(lit(1)).as("n"))
    // every stratum is represented with min(n, 3) rows
    val joined = sizes.join(strata, Seq("lang", "source"), "full")
    assert(joined.where(col("count") =!= least(col("n"), lit(3))).count() == 0)
  }

  test("draw is partition-independent and rank is stable") {
    val a = Sampling.stratified(docs, Seq("lang"), "doc_id", "text", lit(5), "|s2")
      .select("lang", "smp_rank", "doc_id")
    val b = Sampling.stratified(docs.repartition(7, col("doc_id")),
        Seq("lang"), "doc_id", "text", lit(5), "|s2")
      .select("lang", "smp_rank", "doc_id")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("different salts give (near-)independent draws") {
    val a = Sampling.stratified(docs, Seq("lang"), "doc_id", "text", lit(5), "|s3")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.stratified(docs, Seq("lang"), "doc_id", "text", lit(5), "|s4")
      .select("doc_id").as[Long].collect().toSet
    assert(a != b, "two salts drew the identical sample — the salt is dead")
  }

  test("rank filter compiles to WindowGroupLimit (map-side top-k pruning)") {
    val plan = Sampling.stratified(docs, Seq("lang"), "doc_id", "text", lit(3), "|s5")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected rank-limit pushdown in:\n$plan")
  }
}
