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
      .master("local[4]").config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","America/New_York") // deliberately non-UTC: conversion must be tz-independent
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    val raw = spark.read.parquet(s"$d/events.parquet")
    // tz-independent NTZ -> epoch nanos
    val norm = raw.withColumn("ts",
      expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)") * lit(1000L))
    norm.select(col("ts")).orderBy("ts").limit(3).collect().foreach(r => println("PROBE norm " + r))
    // streaming read declaring NTZ schema + same conversion
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val st = spark.readStream.schema(sch).option("pathGlobFilter", "events.parquet").parquet(d)
      .select((expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)") * lit(1000L)).as("ts"))
    val q = st.writeStream.outputMode("append").format("memory").queryName("probe_ts").start()
    q.processAllAvailable(); q.stop()
    spark.sql("select ts from probe_ts order by ts limit 3").collect()
      .foreach(r => println("PROBE stream " + r))
    spark.stop()
  }
}
