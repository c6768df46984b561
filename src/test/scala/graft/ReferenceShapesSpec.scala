package graft

import graft.operators.{Relational, Scd2}
import org.apache.spark.sql.functions._

/** The reference's own staging shapes (FIXTURES.md §2: stg_dce_* column
  * names and the null/duplicate edge cases dmCustomerProc.py actually
  * hits), driven through the operator library — the "switch from the
  * reference" path with its original vocabulary.
  */
class ReferenceShapesSpec extends SparkSpec {
  import spark.implicits._

  test("SQL-2 shape: stg_dce_cust_acct group-count drops the NULL cust_id") {
    val acct = Seq((1L, Some(10L)), (2L, Some(10L)), (3L, None), (4L, Some(20L)))
      .toDF("cust_acct_id", "cust_id")
    val got = Relational.groupCount(acct, "cust_id", "cust_acct_count")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 2L, 20L -> 1L)) // dm:52 semantics (G2)
  }

  test("SQL-4 shape: stg_dce_addr latest address with addr_id ties fans out") {
    val addr = Seq((100L, 1L, "ankara"), (101L, 1L, "izmir"), (101L, 1L, "bursa"),
      (200L, 2L, "istanbul")).toDF("addr_id", "row_id", "city_name")
    val got = Relational.latestPerKey(addr, "row_id", "addr_id")
      .select("city_name").as[String].collect().toSet
    assert(got == Set("izmir", "bursa", "istanbul")) // dm:65-67 tie fan-out
  }

  test("SQL-4 shape: stg_dce_lylty_prg_memb duplicate membership fans out (G7)") {
    val cust = Seq(1L, 2L).toDF("cust_id")
    val lpm = Seq(1L, 1L).toDF("cust_id_lpm") // duplicated membership
    val got = cust.join(lpm, col("cust_id") === col("cust_id_lpm"), "left")
    assert(got.count() == 3) // reference keeps the fan-out; so do we
  }

  test("SQL-6 shape: dwf_gift_detail sentinel filter passes NULL (G1)") {
    val dwf = Seq(Some(" "), Some("C42"), None).toDF("trgt_cust_id")
    val got = dwf.where(Relational.neqNullPasses(col("trgt_cust_id"), " ")).count()
    assert(got == 2) // 'C42' and NULL pass; the single-space row drops (dm:84)
  }

  test("SQL-16 shape: udate_party NULL coalesces to cdate_party (dm:219-225)") {
    val ts = java.sql.Timestamp.valueOf("2021-03-04 00:00:00")
    val cd = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    val party = Seq((1L, Some(ts), cd), (2L, None, cd))
      .toDF("party_id", "udate_party", "cdate_party")
    val got = party
      .withColumn("effective_from_date", coalesce(col("udate_party"), col("cdate_party")))
      .select("party_id", "effective_from_date")
      .as[(Long, java.sql.Timestamp)].collect().toMap
    assert(got(1L) == ts && got(2L) == cd)
  }

  test("SQL-12/13 shape: dwd_customer upsert + anti-insert partition") {
    val dwd = Seq((10L, "eski", "t0"), (20L, "kalan", "t0"))
      .toDF("cust_id", "cust_tp", "etl_date")
    val cstInsert = Seq((10L, "yeni"), (30L, "sifir")).toDF("cust_id", "cust_tp_new")
    val upserted = Scd2.keyedUpsert(dwd, cstInsert, Seq("cust_id"),
      Map("cust_tp" -> "cust_tp_new"))
      .select("cust_id", "cust_tp").as[(Long, String)].collect().toMap
    assert(upserted == Map(10L -> "yeni", 20L -> "kalan")) // dm:191-194
    val inserts = Scd2.antiInsert(cstInsert, dwd, Seq("cust_id"))
      .select("cust_id").as[Long].collect().toSeq
    assert(inserts == Seq(30L)) // dm:197-199
  }

  test("SQL-10 shape: apl_user invalid_email range flag with NULL st_id") {
    val apl = Seq((1L, Some(176L)), (2L, Some(10L)), (3L, None))
      .toDF("prty_id", "st_id")
    val got = apl.select(col("prty_id"),
        Relational.rangeFlag(col("st_id"), 174, 178).as("invalid_email"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 0, 3L -> 0)) // dm:182 NaN -> 0
  }
}
