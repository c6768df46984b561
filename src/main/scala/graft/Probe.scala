package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B harness (not part of the driver contract): point it at
  * whatever needs measuring this round; always compare min-of-warm
  * within ONE session (cross-run numbers carry ±15-30% machine noise).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    // round-10: why do partition-grouped pushed-agg partial rows shuffle?
    val path = s"${sys.props("java.io.tmpdir")}/graft_probe_kgp"
    graft.operators.Similarity.writeIvfIndex(
      Tables.embeddings(spark, d), "vec_id", "embedding", 25, path)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val agg = spark.read.format("graft-index").load(s"$path/cells")
      .groupBy("cell").agg(count(lit(1)).as("n"), max("vec_b").as("mx"))
    agg.explain(true)
    spark.stop()
  }
}
