package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational operators re-expressing the reference's pandas
  * idioms Spark-first. Citations are into /root/reference/dmCustomerProc.py
  * (abbreviated `dm`).
  *
  * Scale notes: every operator here is a pure lazy plan over DataFrames —
  * no collect(), no driver-side loops. Aggregations get map-side partial
  * combine from Catalyst automatically; joins pick broadcast-hash when one
  * side is small (all the lookup-dim helpers below are broadcast
  * candidates).
  */
object Relational {

  /** Group-count per key with pandas null-key-drop semantics
    * (`groupby(...).size()`, dm:52,58 — pandas >=1.1 drops null keys).
    * ≡ `SELECT key, count(*) FROM df WHERE key IS NOT NULL GROUP BY key`.
    * Partial aggregation on the map side means the shuffle carries one row
    * per (partition, key), not per input row.
    */
  def groupCount(df: DataFrame, key: String, outName: String): DataFrame =
    df.where(col(key).isNotNull)
      .groupBy(key)
      .agg(count(lit(1)).as(outName))

  /** "Latest record per key": grouped dense_rank on `orderCol` descending,
    * keep rank 1 (dm:65-67, 75-77). Ties on `orderCol` fan out, exactly as
    * the reference's `rank('dense') == 1` does. One shuffle on `key`; the
    * window sorts within partitions only.
    */
  def latestPerKey(df: DataFrame, key: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(orderCol).desc)
    df.withColumn("__rnk", dense_rank().over(w))
      .where(col("__rnk") === 1)
      .drop("__rnk")
  }

  /** Deterministic dedupe-by-key: the reference's `drop_duplicates(
    * subset=key)` keeps an arbitrary first row (dm:101); the canonical
    * deterministic reading (SURVEY G6) keeps the row with the smallest
    * `tiebreak`. row_number (not dense_rank) guarantees exactly one row.
    */
  def dedupeByKey(df: DataFrame, key: String, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(tiebreak).asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Match-indicator after a left join: the reference's
    * `apply(lambda x: 1 if pd.notnull(x) else 0)` (dm:70,87,95,198),
    * expressed as a codegen'd conditional — no UDF.
    */
  def existsFlag(probe: Column): Column =
    when(probe.isNotNull, 1).otherwise(0)

  /** Attach a 0/1 "key exists in `right`" flag to `left`, replicating the
    * reference's distinct -> left-join -> notnull-flag chain (dm:85-88,
    * 93-96). The distinct shrinks the build side so Catalyst can broadcast
    * it; semantically identical to a left-semi-derived flag.
    */
  def semiFlag(left: DataFrame, leftKey: String, right: DataFrame,
      rightKey: String, flagName: String): DataFrame = {
    // same-named keys would make the join condition self-referential
    // (col(k) === col(k) resolves both sides to one of them) — callers
    // must rename the probe side first, so misuse fails loudly here
    require(leftKey != rightKey,
      s"semiFlag: leftKey and rightKey must differ (both '$leftKey'); " +
        "rename the right key before the call")
    val keys = right.select(col(rightKey)).where(col(rightKey).isNotNull).distinct()
    left.join(keys, col(leftKey) === col(rightKey), "left")
      .withColumn(flagName, existsFlag(col(rightKey)))
      .drop(rightKey)
  }

  /** Pandas `!=`-with-NaN semantics (SURVEY G1): `NaN != x` is True in
    * numpy, but `NULL <> x` is NULL in SQL — bridge with an explicit
    * null-pass arm (dm:84).
    */
  def neqNullPasses(c: Column, sentinel: String): Column =
    c.isNull || c =!= sentinel

  /** Range membership flag with null -> 0 (dm:182: 174 <= st_id <= 178;
    * NaN comparisons are False in numpy, and `between` on NULL falls to
    * `otherwise` in Spark — semantics line up for free).
    */
  def rangeFlag(c: Column, lo: Int, hi: Int): Column =
    when(c.between(lo, hi), 1).otherwise(0)

  /** As-of join: for each left row, the latest right row with
    * `right.tsCol <= left.tsCol` within the same `key` (inclusive) —
    * the operator Spark's join zoo lacks.
    *
    * Implemented as UNION + ORDERED WINDOW instead of a range join:
    * tag both sides, union them, and carry the right side's payload
    * forward with `last(_, ignoreNulls)` over (key, ts) order. Cost is
    * one shuffle on the key plus a per-partition sort — O(n log n) —
    * where a range-join formulation explodes to |L| x |matching R| rows
    * before its filter. At equal timestamps the right row sorts first,
    * so same-instant matches are included; `tiebreak` must totally order
    * rows within (key, ts) for determinism.
    *
    * Right payload columns must not collide with left column names
    * (alias them before the call).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      tiebreak: String, payloadCols: Seq[String]): DataFrame = {
    val l = left.withColumn("__is_r", lit(0))
    val r = right.select(Seq(col(key), col(tsCol), col(tiebreak)) ++
        payloadCols.map(col): _*)
      .withColumn("__is_r", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol).asc, col("__is_r").desc, col(tiebreak).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(unioned) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried.where(col("__is_r") === 0).drop("__is_r")
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event (per key, ordered by ts) exceeds `gapNanos`. Returns
    * the input plus a dense per-key `session_id` (cumulative sum of
    * session starts) — lag + prefix-sum windows, one shuffle on the key.
    */
  def sessionize(df: DataFrame, key: String, tsCol: String,
      gapNanos: Long): DataFrame = {
    val order = Window.partitionBy(key).orderBy(col(tsCol).asc)
    val prefix = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev", lag(col(tsCol), 1).over(order))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsCol) - col("__prev") > gapNanos, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(prefix))
      .drop("__prev", "__new")
  }

  /** Binned range join: rows of `right` with
    * `left.leftTs + lo <= right.rightTs <= left.leftTs + hi`, equi-matched
    * on `key` — the interval/range join Spark's join zoo lacks.
    *
    * A naive theta-join (key equality + range predicate) degenerates to a
    * per-key nested loop; the binned form stays an EQUI-join: time is
    * bucketed into bins of the window width, each left row's window
    * overlaps at most two bins, so the left side explodes into <= 2 rows
    * joined on (key, bin) and the exact range predicate filters the
    * residue. Shuffle keys are (key, bin) — adding the bin also shears a
    * hot key's rows across time, so a skewed key only concentrates within
    * single windows. Timestamps are plain longs (any monotonic unit).
    *
    * Left and right column names must not collide (alias before the call).
    */
  def rangeJoinBinned(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lo: Long, hi: Long): DataFrame = {
    require(hi > lo, s"rangeJoinBinned: empty window [$lo, $hi]")
    val w = hi - lo
    val lbinned = left.withColumn("__bin",
      explode(array_distinct(array(
        expr(s"($leftTs + $lo) div $w"), expr(s"($leftTs + $hi) div $w")))))
    val rbinned = right.withColumn("__bin", expr(s"$rightTs div $w"))
    lbinned.join(rbinned, Seq(key, "__bin"))
      .where(col(rightTs) >= col(leftTs) + lo && col(rightTs) <= col(leftTs) + hi)
      .drop("__bin")
  }

  /** Arrival sequence number per key: seq = 1, 2, ... in `orderCols`
    * order within each key — the primitive under ingest QUOTA
    * enforcement (keep the first N events per user per day, drop or
    * deprioritize the rest) and its telemetry (how much traffic the cap
    * sheds). A total order requires `orderCols` to be a key-unique
    * tiebreak chain (e.g. ts then event_id); then every engine ranks
    * identically and replays are stable.
    *
    * Scale shape: ONE exchange on the key columns; the per-key sort is
    * the window sort. The live twin is
    * [[graft.streaming.QuotaStream]] — same numbering carried across
    * batches by keyed state.
    */
  def arrivalSeq(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[Column]): DataFrame =
    df.withColumn("seq", row_number().over(
      Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)))

  /** Skew-mitigating salted equi-join, semantically identical to
    * `left.join(right, Seq(key), "inner")`.
    *
    * A hot key funnels all its rows through one reducer in a plain
    * shuffle join; salting splits each left key across `salts` shuffle
    * partitions (deterministic salt from a hash of the whole left row, so
    * replays are stable) and replicates each right row once per salt.
    * Use when AQE's skew-join split isn't enough (e.g. one key is >10% of
    * the fact table); `salts` multiplies the build side, so keep the
    * right side the smaller input.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    val leftSalted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    val rightSalted = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    leftSalted.join(rightSalted, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** CALENDAR RESAMPLE with gap fill — pandas `resample('D').sum()` +
    * `ffill()` re-expressed relationally: left-join a per-group daily
    * aggregate onto the DENSE (group × day) spine spanning the data's
    * own [min, max] day window, zero-fill the count, keep the value
    * NULL on silent days, and forward-fill the last observed value with
    * an ignore-nulls running window. The spine is data-relative (no
    * wall-clock): its bounds come from a 1-row global aggregate that
    * broadcasts onto the (tiny) distinct-group frame before one
    * sequence-explode — spine size = |groups| × days, never
    * corpus-shaped. The corpus-sized work is exactly one groupBy
    * (group, day); the ffill window repartitions only the spine.
    * `aggs` must be DETERMINISTIC aggregates of `df`'s columns (the
    * caller owns exactness — integer grids for float sums).
    */
  def resampleDailyFfill(df: DataFrame, groupCol: String, dayCol: Column,
      aggs: Seq[Column], ffillCols: Seq[String]): DataFrame = {
    val keyed = df.withColumn("__day", dayCol)
    val daily = keyed.groupBy(col(groupCol), col("__day").as("day"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    val bounds = keyed.agg(min(col("__day")).as("__lo"), max(col("__day")).as("__hi"))
    val spine = keyed.select(groupCol).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(groupCol),
        explode(sequence(col("__lo"), col("__hi"))).as("day"))
    val joined = spine.join(daily, Seq(groupCol, "day"), "left")
      .withColumn("n_rows", coalesce(col("n_rows"), lit(0L)))
    val w = Window.partitionBy(groupCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ffillCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(s"${c}_ffill", last(col(c), ignoreNulls = true).over(w))
    }
  }
}
