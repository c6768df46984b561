package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport, GroupWriteSupport}
import org.apache.parquet.schema.MessageTypeParser

/** Minimal, graft-free reproducer for the parquet-mr 1.16.0 record-level
  * `notIn` bug this repo works around (see the NOT-IN claim in
  * `GraftIndexSource` and `tools/PARQUET_NOTIN_BUG.md`).
  *
  * The record-level inspector built for `FilterApi.notIn(col, set)` by
  * `IncrementallyUpdatedFilterPredicateBuilder` keeps a record as soon
  * as its value differs from ANY element of the set — correct only for
  * singleton sets. For a ≥2-element set, every non-null value differs
  * from at least one element, so the filter degenerates to "keep all
  * non-null rows".
  *
  * Run: `sbt "runMain graft.tools.ParquetNotInRepro"` — writes a 10-row
  * file (v = 0..9), reads it back through plain parquet-mr (no Spark)
  * with three filters, and prints expected vs observed row counts:
  *
  *   notIn {1}    → expected 9, observed 9   (singleton: correct)
  *   notIn {1,2}  → expected 8, observed 10  (THE BUG: keeps all rows)
  *   in   {1,2}   → expected 2, observed 2   (control: In is fine)
  *
  * Exits 1 when the bug reproduces so the repro doubles as a canary for
  * parquet upgrades: once a fixed parquet-mr lands, this main exits 0
  * and the `GraftNotInSet` workaround can be reconsidered.
  */
object ParquetNotInRepro {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("pq_notin_repro")
    val file = new Path(dir.resolve("t.parquet").toString)
    val schema = MessageTypeParser.parseMessageType(
      "message t { required int64 v; }")
    val conf = new Configuration(false)
    GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter.builder(file).withConf(conf)
      // plain encoding: rule out dictionary-based row-group pruning so
      // the record-level inspector is the only filter in play
      .withDictionaryEncoding(false)
      .build()
    try (0L until 10L).foreach { v =>
      w.write(new SimpleGroupFactory(schema).newGroup().append("v", v))
    } finally w.close()

    def countWith(f: org.apache.parquet.filter2.predicate.FilterPredicate): Long = {
      val r = ParquetReader.builder(new GroupReadSupport(), file)
        .withConf(conf).withFilter(FilterCompat.get(f)).build()
      try Iterator.continually(r.read()).takeWhile(_ != null).size.toLong
      finally r.close()
    }
    val col = FilterApi.longColumn("v")
    def set(vs: Long*) = {
      val s = new java.util.HashSet[java.lang.Long]()
      vs.foreach(v => s.add(v))
      s
    }
    val cases = Seq(
      ("notIn {1}", countWith(FilterApi.notIn(col, set(1L))), 9L),
      ("notIn {1,2}", countWith(FilterApi.notIn(col, set(1L, 2L))), 8L),
      ("in {1,2}", countWith(FilterApi.in(col, set(1L, 2L))), 2L))
    var buggy = false
    cases.foreach { case (name, got, want) =>
      val verdict = if (got == want) "OK" else { buggy = true; "WRONG" }
      println(f"$name%-12s expected $want%2d  observed $got%2d  $verdict")
    }
    println(
      if (buggy) "BUG REPRODUCED: FilterApi.notIn with a >=2-element set " +
        "keeps every non-null row (parquet-mr record-level inspector)"
      else "bug NOT reproduced — parquet-mr notIn is fixed; the " +
        "GraftNotInSet workaround can be revisited")
    if (buggy) sys.exit(1)
  }
}
