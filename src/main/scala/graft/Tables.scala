package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table loaders for the driver testdata star schema
  * (see /root/repo/TESTDATA.md, FIXTURES.md).
  *
  * Mirrors the reference's only source: full-table scans via
  * `pandas.read_sql_table` (/root/reference/dmCustomerProc.py:18-22 et al.).
  * Unlike the reference — which always fetches every row and column into
  * driver RAM — these return *lazy* scans: Catalyst pushes projections and
  * predicates into the parquet reader, so downstream `select`/`where`
  * become column pruning + row-group skipping at the source. At 100 TB the
  * same code reads only the touched columns/row groups.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    graft.sources.Sources.readParquetTable(spark, sfDir, name)

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
