package graft

import org.apache.spark.sql.functions._

/** The engine is consumable from pure SQL, not just the DataFrame API:
  * testdata tables register as temp views, graft's native expressions
  * (graft_dot, graft_polyhash) parse in SQL text via GraftExtensions,
  * and a SQL restatement of an operator matches its DataFrame twin —
  * the "spark.sql(...)" surface a cluster user would script against.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("VARIANT lane: typed extraction, malformed → NULL, parity with string-path JSON") {
    import spark.implicits._
    // a malformed row, a missing key, a type surprise, and a clean row —
    // the shapes a 100 TB props column actually contains
    val df = Seq(
      ("a", """{"k": 7, "tag": "x"}"""),
      ("b", """{"tag": "y"}"""),
      ("c", """not json at all"""),
      ("d", """{"k": "not a number"}"""))
      .toDF("id", "props")
      .withColumn("v", expr("try_parse_json(props)"))
    val got = df.select(col("id"),
        expr("try_variant_get(v, '$.k', 'bigint')").as("k"),
        expr("try_variant_get(v, '$.tag', 'string')").as("tag"))
      .as[(String, Option[Long], Option[String])].collect()
      .map { case (id, k, t) => id -> ((k, t)) }.toMap
    assert(got("a") == ((Some(7L), Some("x"))),   "clean row extracts typed")
    assert(got("b") == ((None, Some("y"))),       "missing key is NULL, row survives")
    assert(got("c") == ((None, None)),            "malformed parses to NULL, never a task failure")
    assert(got("d") == ((None, None)),            "type surprise nulls, never a task failure")
    // the STRICT form variant_get throws on the type surprise — the
    // ANSI split try_variant_get exists for (pinned so nobody swaps it
    // back into a 100 TB job where one bad row kills the stage)
    val strict = intercept[Exception] {
      df.where(col("id") === "d")
        .select(expr("variant_get(v, '$.k', 'bigint')")).collect()
    }
    assert(strict.getMessage.contains("INVALID_VARIANT_CAST"),
      s"strict variant_get must raise the variant-cast error: $strict")
    // parity with the string-path lane on well-formed rows: the VARIANT
    // answer equals get_json_object re-parsing the string per path
    val ev = Tables.events(spark, sf0001)
    val viaVariant = ev.select(
      expr("try_variant_get(try_parse_json(props), '$.k', 'bigint')").as("k"))
    val viaString = ev.select(
      get_json_object(col("props"), "$.k").cast("long").as("k"))
    assert(viaVariant.exceptAll(viaString).count() == 0 &&
      viaString.exceptAll(viaVariant).count() == 0)
  }

  test("temp views + SQL restatement match the DataFrame operator") {
    Tables.orders(spark, sf0001).createOrReplaceTempView("orders_v")
    val sql = spark.sql(
      """SELECT o_custkey, count(*) AS n FROM orders_v
         WHERE o_custkey IS NOT NULL GROUP BY o_custkey""")
    val df = graft.operators.Relational
      .groupCount(Tables.orders(spark, sf0001), "o_custkey", "n")
    assert(sql.count() > 0)
    assert(sql.exceptAll(df).count() == 0 && df.exceptAll(sql).count() == 0)
  }

  test("native graft expressions are callable from SQL text") {
    val row = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "graft_polyhash('ab') AS h").head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getLong(1) == 'a'.toLong * 31 + 'b')
    // null propagation + length-mismatch null, same as the DataFrame path
    val nulls = spark.sql(
      "SELECT graft_dot(array(1.0D), array(1.0D, 2.0D)) AS mism, " +
        "graft_polyhash(CAST(NULL AS STRING)) AS nh").head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("graft_nearest_centroid is callable from SQL text, argmax + tie-break") {
    // centroid 20 ties centroid 10 on cosine (same direction) -> smaller
    // id wins; empty centroid array -> null
    val row = spark.sql(
      """SELECT graft_nearest_centroid(
           array(named_struct('cent_id', 10L, 'cvec', array(1.0D, 0.0D), 'cn', 1.0D),
                 named_struct('cent_id', 20L, 'cvec', array(2.0D, 0.0D), 'cn', 4.0D),
                 named_struct('cent_id', 30L, 'cvec', array(0.0D, 1.0D), 'cn', 1.0D)),
           array(0.9D, 0.1D), 0.82D) AS cell,
           graft_nearest_centroid(
             CAST(array() AS ARRAY<STRUCT<cent_id: BIGINT, cvec: ARRAY<DOUBLE>, cn: DOUBLE>>),
             array(1.0D), 1.0D) AS empty""").head()
    assert(row.getLong(0) == 10L)
    assert(row.isNullAt(1))
  }

  test("graft_shingles generator works as a SQL table-generating function") {
    import spark.implicits._
    val got = spark.sql("SELECT graft_shingles('a b c d') AS shingle")
      .as[String].collect().toSeq
    assert(got == Seq("a b c", "b c d"))
    // LATERAL VIEW form, and null/short inputs generate zero rows
    Seq((1L, "x y z w"), (2L, "x y"), (3L, null)).toDF("id", "t")
      .createOrReplaceTempView("sql_sh_docs")
    val lv = spark.sql(
      """SELECT id, s FROM sql_sh_docs
         LATERAL VIEW graft_shingles(t) g AS s ORDER BY id, s""")
      .as[(Long, String)].collect().toSeq
    assert(lv == Seq((1L, "x y z"), (1L, "y z w")))
  }
}
