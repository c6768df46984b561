package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B harness (not part of the driver contract) — currently:
  * recall sweep for the k-means-refined IVF quantizer.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    val d = "/root/testdata/sf0.01"
    val corpus = Tables.embeddings(spark, d)
    val queries = corpus.where(col("vec_id") % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      import spark.implicits._
      df.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    }
    val exact = pairs(Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5))
    def rec(p: Set[(Long, Long)]) = (p & exact).size.toDouble / exact.size
    for (ce <- Seq(25, 20)) {
      val seeded = rec(pairs(Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", 5, ce)))
      println(f"PROBE ce=$ce seeded recall=$seeded%.4f")
      for (iters <- 1 to 4; np <- Seq(1, 2)) {
        val r = rec(pairs(Similarity.ivfKmeansTopK(corpus, queries, "vec_id", "embedding", 5, ce, iters, np)))
        println(f"PROBE ce=$ce iters=$iters nprobe=$np recall=$r%.4f")
      }
    }
    spark.stop()
  }
}
