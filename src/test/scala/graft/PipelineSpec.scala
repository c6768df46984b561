package graft

import graft.operators.CustomerDimPipeline
import org.apache.spark.sql.functions._

/** End-to-end invariants of the composed customer-dimension pipeline —
  * the "whole proc in one call" surface.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  lazy val out: CustomerDimPipeline.Outputs =
    CustomerDimPipeline.run(spark, sf0001)

  test("corpus clean funnel: observe() metrics match independent counts") {
    import graft.operators.{CorpusPipeline, Dedup, TextAnalysis}
    val docs = Tables.documents(spark, sf0001)
    val f = CorpusPipeline.cleanObserved(docs, "doc_id", "text", 0.7,
      Seq("sqlish", "streamish"), 16, 2, 0.8, Dedup.PolyHash)
    val nClean = f.cleaned.count()
    // the pipeline's own checkpoint action populated both observations —
    // no extra scan happened to produce these numbers
    val scored = f.scored.get.apply("n").asInstanceOf[Long]
    val kept = f.kept.get.apply("n").asInstanceOf[Long]
    assert(scored == docs.count())
    val keptDirect = docs
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .withColumn("l", TextAnalysis.langId(col("text")))
      .where(col("q") >= 0.7 && col("l").isin("sqlish", "streamish"))
      .count()
    assert(kept == keptDirect)
    assert(nClean > 0 && nClean <= kept) // dedup only ever removes
  }

  test("curation lineage: nested stages yield only masks {0,1,3,7,15}, funnel consistent") {
    import graft.operators.{CorpusPipeline, Dedup}
    val docs = Tables.documents(spark, sf0001)
    val lin = CorpusPipeline.lineage(docs, "doc_id", "text", 0.7,
        Seq("sqlish", "streamish"), 16, 2, 0.8, Dedup.PolyHash,
        lit(40), "|s1", "n_chars", 4000L, "|p1")
      .localCheckpoint()
    // one row per input document
    assert(lin.count() == docs.count())
    // nesting: the stage bits can only accumulate in order
    val masks = lin.groupBy("lineage").count()
      .as[(Int, Long)].collect().toMap
    assert(masks.keySet.subsetOf(Set(0, 1, 3, 7, 15)),
      s"unreachable mask present: ${masks.keySet -- Set(0, 1, 3, 7, 15)}")
    // funnel consistency vs the standalone clean: canonical docs (bit 1)
    // = clean() survivors
    val nClean = CorpusPipeline.clean(docs, "doc_id", "text", 0.7,
      Seq("sqlish", "streamish"), 16, 2, 0.8, Dedup.PolyHash).count()
    val nCanonical = lin.where((col("lineage").bitwiseAND(2)) === 2).count()
    assert(nCanonical == nClean, s"canonical $nCanonical != clean $nClean")
    // sampled (bit 2) respects the per-stratum quota
    val perLang = lin.where((col("lineage").bitwiseAND(4)) === 4)
      .groupBy("pred_lang").count().as[(String, Long)].collect()
    assert(perLang.nonEmpty && perLang.forall(_._2 <= 40))
  }

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
