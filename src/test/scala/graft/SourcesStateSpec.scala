package graft

import graft.sources.Sources
import graft.streaming.SessionState
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink round-trips for BOTH halves of the IO surface — parquet
  * (the harness flavor) and real JDBC against embedded Derby (the
  * reference's read_sql_table / to_sql shape: schema reflection from DB
  * metadata, replace/append modes, partitioned parallel read) — plus the
  * stateful-streaming running aggregate.
  */
class SourcesStateSpec extends SparkSpec {
  import spark.implicits._

  test("JDBC source/sink round-trip (embedded Derby): replace, append, partitioned read") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val df = (1L to 20L).map(i => (i, s"name_$i", i * 1.5)).toDF("id", "name", "score")
    Sources.writeJdbcTable(df, url, "APP", "customers", "app", "", replace = true)
    // schema reflected from database metadata, like read_sql_table
    val back = Sources.readJdbcTable(spark, url, "APP", "customers", "app", "")
    assert(back.columns.map(_.toLowerCase).toSeq == Seq("id", "name", "score"))
    assert(back.count() == 20)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      df.as[(Long, String, Double)].collect().toSet)
    // append doubles; replace resets
    Sources.writeJdbcTable(df, url, "APP", "customers", "app", "", replace = false)
    assert(Sources.readJdbcTable(spark, url, "APP", "customers", "app", "").count() == 40)
    Sources.writeJdbcTable(df, url, "APP", "customers", "app", "", replace = true)
    // partitioned read: 4 range predicates, same multiset
    val part = Sources.readJdbcTable(spark, url, "APP", "customers", "app", "",
      partition = Some(("id", 1L, 20L, 4)))
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 20)
    assert(part.select("id").as[Long].collect().toSet == (1L to 20L).toSet)
  }

  test("incremental JDBC pull: exclusive watermark bound, delta-only wire, marks chain to the full table") {
    val url = "jdbc:derby:memory:graftincr;create=true"
    // a staging table with a monotone sequence watermark (wm)
    val day1 = (1L to 10L).map(i => (i, s"v$i", i)).toDF("id", "val", "wm")
    Sources.writeJdbcTable(day1, url, "APP", "stg", "app", "", replace = true)
    // first pull from the epoch mark: everything. Snapshot it — a JDBC
    // frame is a LIVE view and would re-read the grown table later
    // (a real pull materializes to its landing zone at pull time)
    val p1 = Sources.readJdbcIncrement(spark, url, "APP", "stg", "app", "",
      "wm", "0").localCheckpoint()
    assert(p1.count() == 10)
    val mark1 = p1.agg(max(col("wm"))).collect().head.getLong(0)
    assert(mark1 == 10L)
    // day 2 lands; pull ONLY the delta past the stored mark
    val day2 = (11L to 15L).map(i => (i, s"v$i", i)).toDF("id", "val", "wm")
    Sources.writeJdbcTable(day2, url, "APP", "stg", "app", "", replace = false)
    val p2 = Sources.readJdbcIncrement(spark, url, "APP", "stg", "app", "",
      "wm", mark1.toString)
    assert(p2.count() == 5, "the pull must carry the delta, not the table")
    assert(p2.select("id").as[Long].collect().toSet == (11L to 15L).toSet)
    // the bound is EXCLUSIVE: re-pulling from the same mark re-reads
    // nothing already processed
    assert(p2.select("wm").as[Long].collect().forall(_ > mark1))
    // increments chain to the full table (no row lost, none duplicated)
    val full = Sources.readJdbcTable(spark, url, "APP", "stg", "app", "")
    val chained = p1.unionByName(p2)
    assert(chained.exceptAll(full).count() == 0 &&
      full.exceptAll(chained).count() == 0)
    // partitioned delta read: same multiset through 3 range predicates
    val p2part = Sources.readJdbcIncrement(spark, url, "APP", "stg", "app", "",
      "wm", mark1.toString, partition = Some(("id", 11L, 15L, 3)))
    assert(p2part.rdd.getNumPartitions == 3)
    assert(p2part.select("id").as[Long].collect().toSet == (11L to 15L).toSet)
  }

  test("schema-evolved parquet corpus: mergeSchema unions vintages, old rows null-fill, pushdown survives") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_evolve").toString
    try {
      // vintage 1: (doc_id, text); vintage 2 adds quality
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
        .write.mode("append").parquet(s"$dir/docs")
      Seq((3L, "c", 0.9), (4L, "d", 0.2)).toDF("doc_id", "text", "quality")
        .write.mode("append").parquet(s"$dir/docs")
      val evolved = Sources.readParquetEvolved(spark, dir, "docs")
      assert(evolved.columns.sorted.toSeq == Seq("doc_id", "quality", "text"))
      val rows = evolved.select("doc_id", "quality")
        .as[(Long, Option[Double])].collect().toMap
      assert(rows(1L).isEmpty && rows(2L).isEmpty,
        "pre-evolution rows must serve null for the new column")
      assert(rows(3L).contains(0.9) && rows(4L).contains(0.2))
      // a plain read without mergeSchema picks ONE footer — the trap the
      // evolved reader exists to avoid (which footer wins is nondeterministic,
      // so only pin that the union width is what mergeSchema adds)
      assert(evolved.columns.length == 3)
      // pushdown on an all-vintage column still prunes per file
      val filtered = evolved.where(col("doc_id") === 3L)
      assert(filtered.queryExecution.executedPlan.toString
        .contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,3)"),
        "predicates on common columns must keep reaching the scan")
      assert(filtered.count() == 1)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("JDBC second dialect (DuckDB, Postgres-flavored): replace/append/partitioned round-trip") {
    // the driver jar is attached as an unmanaged test jar only when the
    // local cache has it — cancel (don't fail) when it's absent
    assume(
      try { Class.forName("org.duckdb.DuckDBDriver"); true }
      catch { case _: Throwable => false },
      "duckdb_jdbc not on the test classpath")
    // Spark 4's tableExists RETHROWS the probe's SQLException unless the
    // dialect classifies it as object-not-found (JdbcUtils.tableExists →
    // isObjectNotFoundException); unregistered URLs get the NOOP dialect,
    // which classifies by SQLState — null in DuckDB's driver. Registering
    // a minimal dialect is the production answer for any out-of-tree
    // JDBC target (the same hook a real Postgres fork would use).
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DuckDbTestDialect)
    val db = Files.createTempDirectory("graft_duck").resolve("g.duckdb")
    val url = s"jdbc:duckdb:$db"
    // single partition per write: embedded DuckDB uses optimistic
    // concurrency, so two executor connections appending the same table
    // in one transaction window could conflict — a property of the
    // EMBEDDED target, not of the sink (server Postgres takes the
    // parallel executor inserts as-is)
    val df = (1L to 20L).map(i => (i, s"name_$i", i * 1.5))
      .toDF("id", "name", "score").coalesce(1)
    // unquoted identifiers fold to lower case (the Postgres rule; Derby
    // folds UPPER — exactly the dialect delta Sources.scala documents)
    Sources.writeJdbcTable(df, url, "main", "customers", "", "", replace = true)
    val back = Sources.readJdbcTable(spark, url, "main", "customers", "", "")
    assert(back.columns.map(_.toLowerCase).toSeq == Seq("id", "name", "score"))
    assert(back.as[(Long, String, Double)].collect().toSet ==
      df.as[(Long, String, Double)].collect().toSet)
    Sources.writeJdbcTable(df, url, "main", "customers", "", "", replace = false)
    assert(Sources.readJdbcTable(spark, url, "main", "customers", "", "").count() == 40)
    Sources.writeJdbcTable(df, url, "main", "customers", "", "", replace = true)
    val part = Sources.readJdbcTable(spark, url, "main", "customers", "", "",
      partition = Some(("id", 1L, 20L, 4)))
    assert(part.rdd.getNumPartitions == 4)
    assert(part.select("id").as[Long].collect().toSet == (1L to 20L).toSet)
  }

  test("parquet sink: replace vs append mirror to_sql if_exists") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sources.writeParquetTable(df, dir, "t", replace = true)
    Sources.writeParquetTable(df, dir, "t", replace = false)
    assert(spark.read.parquet(s"$dir/t").count() == 4)
    Sources.writeParquetTable(df, dir, "t", replace = true)
    assert(spark.read.parquet(s"$dir/t").count() == 2)
  }

  test("CSV source/sink: declared-schema round-trip incl. quoted newlines, replace/append") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_csv").toString
    // embedded newline + comma + quote exercise the quoting/escape path
    val df = Seq((1L, "plain", 1.5), (2L, "has,comma", 2.5),
      (3L, "line\nbreak \"q\"", 3.5)).toDF("id", "txt", "score")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("txt", StringType), StructField("score", DoubleType)))
    Sources.writeCsvTable(df, dir, "t", replace = true)
    val back = Sources.readCsvTable(spark, dir, "t", schema)
    assert(back.schema == schema)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      df.as[(Long, String, Double)].collect().toSet)
    Sources.writeCsvTable(df, dir, "t", replace = false)
    assert(Sources.readCsvTable(spark, dir, "t", schema).count() == 6)
  }

  test("JSON-lines source/sink: declared-schema round-trip keeps types") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_json").toString
    val df = Seq((1L, "a \"quoted\" str", 10), (2L, "unicode é", 20))
      .toDF("id", "txt", "n")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("txt", StringType), StructField("n", IntegerType)))
    Sources.writeJsonTable(df, dir, "t", replace = true)
    val back = Sources.readJsonTable(spark, dir, "t", schema)
    assert(back.schema == schema)
    assert(back.as[(Long, String, Int)].collect().toSet ==
      df.as[(Long, String, Int)].collect().toSet)
  }

  test("JSON quarantine: malformed lines rejected with accounting, strict mode throws") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_jsonq").toString
    // 3 good lines, 2 broken (truncated JSON; schema-violating scalar)
    Files.write(java.nio.file.Paths.get(s"$dir/t.jsonl"),
      java.util.Arrays.asList(
        """{"id": 1, "txt": "ok"}""",
        """{"id": 2, "txt": "also ok"}""",
        """{"id": 3, "txt": tru""",
        """not json at all""",
        """{"id": 4, "txt": "fine"}"""))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("txt", StringType)))
    // Spark refuses queries that touch ONLY the corrupt column over a raw
    // file scan (SPARK-25271 semantics) — materialize the parse once, as
    // the helper's scaladoc directs, then split.
    val back = Sources.readJsonTableQuarantine(spark, dir, "t", schema).cache()
    try {
      val clean = back.where(col("__rejected").isNull)
      val rejected = back.where(col("__rejected").isNotNull)
      assert(clean.select("id", "txt").as[(Long, String)].collect().toSet ==
        Set((1L, "ok"), (2L, "also ok"), (4L, "fine")))
      // every input line is accounted for: parsed or quarantined verbatim
      assert(rejected.count() == 2)
      assert(rejected.select("__rejected").as[String].collect().toSet ==
        Set("""{"id": 3, "txt": tru""", "not json at all"))
    } finally back.unpersist()
    // FAILFAST: the trusted-feed posture surfaces the breakage instead
    val strict = Sources.readJsonTableStrict(spark, dir, "t", schema)
    assertThrows[org.apache.spark.SparkException](strict.collect())
  }

  test("ORC source/sink: self-describing round-trip, replace/append, pushdown") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val df = Tables.documents(spark, sf0001).select("doc_id", "lang", "n_chars")
    Sources.writeOrcTable(df, dir, "docs", replace = true)
    val back = Sources.readOrcTable(spark, dir, "docs")
    assert(back.schema == df.schema) // self-describing like parquet
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    Sources.writeOrcTable(df, dir, "docs", replace = false)
    assert(Sources.readOrcTable(spark, dir, "docs").count() == 2 * df.count())
    // predicate reaches the ORC scan (stripe-skipping path), as parquet
    val plan = Sources.readOrcTable(spark, dir, "docs")
      .where(col("doc_id") === 7L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)]"),
      s"filter must push into the ORC scan, plan was: $plan")
  }

  test("readParquetTable reflects schema like read_sql_table") {
    val got = Sources.readParquetTable(spark, sf0001, "nation")
    assert(got.columns.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
  }

  test("stateful streaming: running per-user agg matches batch groupBy") {
    SessionState.runOnce(spark, sf0001, "user_agg")
    // Update-mode memory sink may hold one row per state update; the
    // final state per user is the last row — with a single input batch
    // there is exactly one update per user.
    val streamed = spark.table("user_agg")
      .select(col("user_id"), col("n_events"))
    val batch = Tables.events(spark, sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }
}

/** Minimal dialect for the embedded-DuckDB test target: URL routing plus
  * the object-not-found classification Spark 4's tableExists probe needs
  * (DuckDB SQLExceptions carry no SQLState, so the NOOP dialect would
  * rethrow the probe failure instead of returning "absent").
  */
object DuckDbTestDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
  override def canHandle(url: String): Boolean = url.startsWith("jdbc:duckdb:")
  override def isObjectNotFoundException(e: java.sql.SQLException): Boolean =
    e.getMessage != null && e.getMessage.contains("does not exist")
  // the driver's ResultSetMetaData.isSigned returns false, which makes
  // Spark's default mapping read BIGINT back as DECIMAL(20,0) — the
  // unsigned-bigint rule misfiring; DuckDB BIGINT is signed 64-bit
  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: org.apache.spark.sql.types.MetadataBuilder): Option[org.apache.spark.sql.types.DataType] =
    if (sqlType == java.sql.Types.BIGINT) Some(org.apache.spark.sql.types.LongType) else None
}
