package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type-2 maintenance, the reference's flagship
  * composite (dm:185-232, SQL-11..16), canonicalized to *keyed* semantics
  * (SURVEY G5): the reference's index-aligned `DataFrame.update` /
  * `isin(DataFrame)` / cross-frame column assign are positional accidents;
  * the documented intent — and the only deterministic distributed reading —
  * is upsert/diff/expiry keyed on the business key.
  *
  * Everything is built from joins, anti-joins, and unions, so Catalyst
  * plans shuffles on the business key once and AQE handles skew. No state
  * lives on the driver; at 100 TB both sides of the diff are just shuffled
  * scans.
  */
object Scd2 {

  /** Keyed upsert (dm:191-194, SQL-12): left-join source onto target on
    * `keys`, take the source value when present else keep the target's
    * (per-column coalesce). `updated` maps target column -> source column
    * holding its new value.
    *
    * PRECONDITION: `source` must be unique on `keys` — a duplicate
    * business key in source fans out the matching target row once per
    * duplicate (a left join cannot do otherwise). Callers with
    * possibly-duplicated sources should dedupe first, e.g.
    * `Relational.dedupeByKey(source, key, tiebreak)` for a deterministic
    * pick; this operator does not dedupe silently because which duplicate
    * wins is a policy decision.
    */
  def keyedUpsert(target: DataFrame, source: DataFrame, keys: Seq[String],
      updated: Map[String, String]): DataFrame = {
    val joined = target.join(source, keys, "left")
    val outCols = target.columns.map { c =>
      updated.get(c) match {
        case Some(srcCol) => coalesce(col(srcCol), col(c)).as(c)
        case None         => col(c)
      }
    }
    joined.select(outCols.toIndexedSeq: _*)
  }

  /** Rows of `source` whose key is absent from `target` (dm:197-199,
    * SQL-13). The reference encodes this as left-join + notnull-flag +
    * mask; the direct Spark form is a left-anti join (no flag column, no
    * second pass, and Catalyst may broadcast the smaller side).
    */
  def antiInsert(source: DataFrame, target: DataFrame,
      keys: Seq[String]): DataFrame =
    source.join(target.select(keys.map(col).toIndexedSeq: _*), keys, "left_anti")

  /** Change detection (dm:208, SQL-14): rows of `newSnap` that differ from
    * `oldSnap` in at least one of `compareCols` (or are entirely new).
    * The reference's `~isin(df).all(axis=1)` compares positionally; the
    * keyed canonical form is a multiset difference on the compared columns.
    */
  def changedRows(newSnap: DataFrame, oldSnap: DataFrame,
      compareCols: Seq[String]): DataFrame = {
    val cols = compareCols.map(col).toIndexedSeq
    newSnap.select(cols: _*).exceptAll(oldSnap.select(cols: _*))
  }

  /** Point-in-time lookup over an SCD2 history — the READ side of the
    * maintenance the reference performs (dm:185-232 writes dwd_hstr;
    * this reconstructs the dimension AS OF `at`): keep rows whose
    * validity interval contains `at`, where the open (current) row has
    * a null `toCol`. With the SCD2 invariant — per-key intervals
    * disjoint, expiry stamp = successor's from stamp — any `at` matches
    * at most one row per key (Scd2Spec asserts on a crafted history).
    * A pure filter: pushes into the scan, no shuffle, and on a
    * time-partitioned history layout it prunes partitions too.
    */
  def asOf(hist: DataFrame, fromCol: String, toCol: String,
      at: Column): DataFrame =
    hist.where(col(fromCol) <= at &&
      (col(toCol).isNull || at < col(toCol)))
}
