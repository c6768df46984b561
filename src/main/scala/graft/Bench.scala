package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Each query runs twice: the first (cold) execution carries one-time
    // whole-stage-codegen compilation + JIT for that plan shape — real,
    // but not what steady-state throughput looks like. value/queries are
    // the warm (second-run) numbers; cold numbers ride along for honesty.
    // (seconds, succeeded) — a query that throws must NOT masquerade as a
    // fast run; it is reported in the errors list
    def timed(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (cold, okCold) = timed(fn)
      val (warm, okWarm) = timed(fn)
      (name, cold, warm, okCold && okWarm)
    }
    def toJson(vs: Seq[(String, Double)]) =
      vs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val warmTotal = results.map(_._3).sum
    val coldTotal = results.map(_._2).sum
    val qs = toJson(results.map(r => r._1 -> r._3))
    val qsCold = toJson(results.map(r => r._1 -> r._2))
    val errs = results.filterNot(_._4).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$warmTotal,"unit":"sec","queries":$qs,"cold_total":$coldTotal,"queries_cold":$qsCold,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
