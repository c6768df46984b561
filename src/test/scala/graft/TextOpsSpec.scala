package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Unit tests for the per-document text operators where expected values
  * are known by hand.
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: hand-computed repetition profile") {
    val docs = Seq(
      (1L, "a b a b a b"), // grams: "a b a","b a b","a b a","b a b"
      (2L, "u v w x y z"), // all grams distinct
      (3L, "t t t t"),     // "t t t" twice; one distinct token
      (4L, "p q")          // < 3 tokens -> dropped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L))

    val r1 = got(1L)
    assert(r1.getInt(1) == 4 && r1.getInt(2) == 2 && r1.getInt(3) == 2)
    assert(r1.getDouble(4) == 0.5)      // dup_gram_frac (4-2)/4
    assert(r1.getDouble(5) == 0.5)      // top_gram_frac 2/4
    assert(r1.getDouble(6) == 0.666667) // dup_token_frac (6-2)/6

    val r2 = got(2L)
    assert(r2.getInt(1) == 4 && r2.getInt(2) == 4 && r2.getInt(3) == 1)
    assert(r2.getDouble(4) == 0.0 && r2.getDouble(5) == 0.25 && r2.getDouble(6) == 0.0)

    val r3 = got(3L)
    assert(r3.getInt(1) == 2 && r3.getInt(2) == 1 && r3.getInt(3) == 2)
    assert(r3.getDouble(4) == 0.5)  // (2-1)/2
    assert(r3.getDouble(5) == 1.0)  // 2/2
    assert(r3.getDouble(6) == 0.75) // (4-1)/4
  }

  test("repetitionStats is a zero-exchange per-row projection") {
    val plan = TextAnalysis
      .repetitionStats(Tables.documents(spark, sf0001), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "repetition profile must stay map-only — an Exchange means the " +
        "grams escaped the per-row fold")
  }
}
