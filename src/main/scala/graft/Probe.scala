package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B harness (not part of the driver contract) — currently:
  * timing the IVF assignment shapes at sf0.1.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    val d = "/root/testdata/sf0.1"
    val corpus = Tables.embeddings(spark, d)
    val queries = corpus.where(col("vec_id") % 50 === 0)
    def run(label: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $label MIN ${ts.drop(1).min}%.3f ALL ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    run("ivf") { Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", 5, 25).count() }
    run("ivf2") { Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", 5, 25, nprobe = 2).count() }
    run("kmeans") { Similarity.ivfKmeansTopK(corpus, queries, "vec_id", "embedding", 5, 25, 2).count() }
    spark.stop()
  }
}
