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
    // round-10: raw full-scan decode A/B — graft-index vectorized lane
    // vs spark.read.parquet vs (reference) the row lane
    val path = s"${sys.props("java.io.tmpdir")}/graft_probe_idx"
    graft.operators.Similarity.writeGraphIndex(
      Tables.embeddings(spark, d), "vec_id", "embedding", 25, 8, path)
    val v2vecs = spark.read.format("graft-index").load(s"$path/vecs")
    println("V2 vecs columnar: " + v2vecs.select("vid", "vec", "nsq")
      .queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.supportsColumnar
      })
    run("vecs_v2") {
      v2vecs.select(sum(col("vid")), sum(col("nsq")), sum(element_at(col("vec"), 1))).collect()
    }
    run("vecs_pq") {
      spark.read.parquet(s"$path/vecs")
        .select(sum(col("vid")), sum(col("nsq")), sum(element_at(col("vec"), 1))).collect()
    }
    val v2edges = spark.read.format("graft-index").load(s"$path/edges")
    run("edges_v2") {
      v2edges.select(sum(col("src") + col("dst"))).collect()
    }
    run("edges_pq") {
      spark.read.parquet(s"$path/edges")
        .select(sum(col("src") + col("dst"))).collect()
    }
    // whole-probe A/B: the persisted-graph search through each read path
    val emb = Tables.embeddings(spark, d)
    val q = emb.where(col("vec_id") % 50 === 0)
    run("probe_pq") {
      graft.operators.Similarity.probeGraphIndex(path, q, "vec_id",
        "embedding", 10, 8, 8, 3).count()
    }
    run("probe_v2") {
      graft.operators.Similarity.probeGraphIndex(path, q, "vec_id",
        "embedding", 10, 8, 8, 3, viaV2 = true).count()
    }
    spark.stop()
  }
}
