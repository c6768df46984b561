package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{ExtQueries, RefQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries come from two registries: `RefQueries` (the reference's 16 SQL
  * blocks, dm:17-232, re-expressed over the testdata star schema) and
  * `ExtQueries` (the LLM-data-pipeline extensions: dedup, similarity
  * search, text analysis, multimodal plumbing, streaming-equivalent).
  */
object SparkEntry {
  private def all: Seq[GQuery] = {
    val qs = RefQueries.queries ++ ExtQueries.queries
    // a name collision would silently drop a query from the driver's
    // correctness gate when converted to a Map — fail loudly instead
    val dups = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query (SCD2 delta, SQL-16) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.q17(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
