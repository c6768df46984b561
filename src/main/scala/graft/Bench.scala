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
    // Each query runs four times: the first (cold) execution carries
    // one-time whole-stage-codegen compilation + JIT for that plan shape —
    // real, but not steady-state throughput. value/queries are the best of
    // the three warm runs (min damps scheduler/GC jitter); cold numbers
    // ride along on a diagnostic line.
    // (seconds, succeeded) — a query that throws must NOT masquerade as a
    // fast run; it is reported in the errors list
    def timed(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (cold, okCold) = timed(fn)
      val warm = Seq.fill(3)(timed(fn))
      (name, cold, warm.map(_._1).min, okCold && warm.forall(_._2))
    }
    // The driver keeps only the final ~2000 chars of output, so the
    // canonical line printed LAST must stay short: per-query values
    // rounded to ms, no cold map (that goes on the earlier bench_detail
    // line, which may scroll off).
    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def toJson(vs: Seq[(String, Double)]) =
      vs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val warmTotal = results.map(_._3).sum
    val coldTotal = results.map(_._2).sum
    val errs = results.filterNot(_._4).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    println(s"""{"bench_detail":{"cold_total":${fmt(coldTotal)},"queries_cold":${toJson(results.map(r => r._1 -> r._2))},"errors":$errs}}""")
    def finalLine(qs: String, errsJson: String) =
      s"""{"metric":"total","value":${fmt(warmTotal)},"unit":"sec","queries":$qs,"cold_total":${fmt(coldTotal)},"errors":$errsJson,"sf":"${sfDir.take(120)}"}"""
    // hard guard: the canonical line must survive the driver's ~2000-char
    // output tail or the whole bench reads as unparsed (round-1 lesson).
    // Degrade in steps — drop the per-query map, then collapse the error
    // list (itself unbounded when every query fails) to a count.
    val line = Seq(
      finalLine(toJson(results.map(r => r._1 -> r._3)), errs),
      finalLine("{}", errs),
      finalLine("{}", s"""["${results.count(!_._4)}_queries_failed"]"""))
      .find(_.length <= 1900).get
    println(line)
    spark.stop()
  }
}
