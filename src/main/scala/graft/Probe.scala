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
      // dormant compat for TIMESTAMP(NANOS) fixture vintages (see Verify)
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def run(label: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $label MIN ${ts.drop(1).min}%.3f ALL ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val cutoffNs = 1705363200000000000L
    run("incr_filter") {
      Tables.events(spark, d).where(col("ts") < cutoffNs).count()
    }
    spark.stop()
  }
}
