package graft

import graft.functions.{GraftFunctions, VectorOps}
import org.apache.spark.sql.functions._

/** The fused codegen dot product must be BIT-IDENTICAL to the built-in
  * ordered fold (same float64 accumulation order) — that equivalence is
  * what keeps the DuckDB oracle valid after the fast-path swap.
  */
class DotProductSpec extends SparkSpec {

  test("graft_dot ≡ fold dot, bit for bit, on real embeddings") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf0001).limit(100)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib"))
      .withColumn("fast", VectorOps.dot(col("va"), col("vb")))
      .withColumn("ref", VectorOps.dotFold(col("va"), col("vb")))
    assert(pairs.where(col("fast") =!= col("ref")).count() == 0)
    assert(pairs.count() > 0)
  }

  test("graft_dot is callable from SQL via GraftExtensions") {
    val got = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(got == 11.0)
  }

  test("graft_dot: length mismatch is NULL, like the fold and the oracle") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D)) AS d").collect().head
    assert(r.isNullAt(0))
  }

  test("graft_dot handles mixed float/double arrays (vec x plane)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq((Seq(1.0f, 2.0f), Seq(0.5, 0.25))).toDF("f", "d")
    val got = df.select(VectorOps.dot(col("f"), col("d")).as("x"))
      .collect().head.getDouble(0)
    assert(got == 1.0)
  }
}
