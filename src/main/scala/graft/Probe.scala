package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    import graft.operators.Dedup
    def t(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime()-t0)/1e9
      println(f"PROBE $label $s%.3f"); s
    }
    val docs = Tables.documents(spark, d)
    def run(label: String)(f: => Unit): Unit = {
      val ts = (1 to 4).map(_ => t(label)(f))
      println(f"PROBE $label MIN ${ts.drop(1).min}%.3f")
    }
    run("edges_native") { Dedup.shingleEdges(docs, "doc_id", "text").count() }
    run("edges_hof") { Dedup.shingleEdgesHof(docs, "doc_id", "text").count() }
    run("minhash_poly") { Dedup.minhashLshPairs(docs, "doc_id", "text", 16, 2, 0.8, Dedup.PolyHash).count() }
    run("jaccard") { Dedup.jaccardPairs(docs, "doc_id", "text", 0.5).count() }
    spark.stop()
  }
}
