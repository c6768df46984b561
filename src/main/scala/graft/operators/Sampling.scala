package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data curation.
  *
  * Why not `DataFrame.sample` / `rand(seed)`: those draw from a
  * partition-dependent RNG stream — the selected set changes with
  * partitioning, cluster size, and engine, which is poison for
  * reproducible dataset builds (and for the DuckDB oracle). Here the
  * "random" order is the [[Dedup.polyHash]] char fold of (text + salt):
  * an engine-independent PRNG keyed on content, so a draw reproduces
  * bit-for-bit anywhere, and different salts give independent draws
  * (same trick as ExtQueries' train/val/test split).
  *
  * Scale shape: the rank filter compiles to WindowGroupLimit (Spark 4's
  * rank-limit pushdown — see PLANS.md "Top-k"): every map task keeps at
  * most `quota` rows per stratum BEFORE the shuffle, so the per-stratum
  * reducer receives ≤ quota x mapTasks rows no matter how hot the
  * stratum — stratified sampling of a 100 TB corpus moves only
  * sample-sized data. One exchange total.
  */
object Sampling {

  /** Exact per-stratum quota sample. `quota` is a Column so mixing
    * weights can vary by stratum (e.g. boost an under-represented
    * source); strata smaller than their quota are taken whole. Output =
    * input columns + `smp_rank` (1..quota within the stratum, in the
    * salted-hash draw order; ties on the hash — e.g. exact-duplicate
    * texts — break by `idCol` so the rank is total).
    *
    * The salt is a PREFIX, deliberately: a suffix only adds a constant
    * offset to the char fold (`poly(text||s) = poly(text)*31^|s| +
    * poly(s) mod P`), which preserves the relative ORDER of almost every
    * pair — two "independent" suffix-salted draws select nearly the same
    * rows (spec-caught). A prefix multiplies by 31^|text| per document,
    * scrambling order properly. (The train/val/test split's suffix salt
    * is fine — it consumes the absolute VALUE, which a constant shift
    * does change.)
    *
    * `quotaCap`: the rank-limit pushdown (WindowGroupLimit) only fires
    * on a LITERAL bound — a dynamic per-stratum quota expression alone
    * would shuffle every row of a hot stratum. Pass the maximum quota so
    * the plan carries a constant `smp_rank <= cap` conjunct (map tasks
    * prune to cap rows per stratum pre-shuffle) with the dynamic quota
    * refining after; semantically redundant, physically essential.
    */
  def stratified(df: DataFrame, strataCols: Seq[String], idCol: String,
      textCol: String, quota: Column, salt: String,
      quotaCap: Option[Int] = None): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(Dedup.polyHash(concat(lit(salt), col(textCol))), col(idCol))
    val ranked = df.withColumn("smp_rank", row_number().over(w))
    quotaCap match {
      case Some(cap) => ranked.where(col("smp_rank") <= cap && col("smp_rank") <= quota)
      case None => ranked.where(col("smp_rank") <= quota)
    }
  }

  /** Sequence packing for LLM pretraining: documents are concatenated in
    * a deterministic salted-hash order and chunked into fixed
    * `budget`-sized context windows; each document's PACK id is the
    * window its first unit lands in (`floor(prefix_before / budget)` —
    * the concat-then-chunk pipeline, where a document may span the
    * boundary into the next window; `spans_next` flags those).
    *
    * Packing runs PER STRATUM (e.g. per language), which is both the
    * realistic shape (streams are packed per domain/language, not across
    * a 100 TB global order) and the scale-correct one: the prefix sum is
    * a window over the stratum key, never the single-partition global
    * window PLANS.md bans. Determinism: same salted-hash order as
    * [[stratified]] (prefix salt), integer unit sums only.
    *
    * Output: input columns + `pack_id` (0-based window index within the
    * stratum) + `spans_next` (1 when the document crosses into the next
    * window).
    */
  def packSequences(df: DataFrame, strataCols: Seq[String], idCol: String,
      unitsCol: String, budget: Long, salt: String): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(Dedup.polyHash(concat(lit(salt), col(idCol).cast("string"))), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(unitsCol)).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col(unitsCol)) / budget).cast("long"))
      .withColumn("spans_next",
        when(floor((col("__cum") - lit(1)) / budget).cast("long") > col("pack_id"), 1)
          .otherwise(0))
      .drop("__cum")
  }

  /** Value-based decile (n-quantile) profile per stratum — the curation
    * threshold primitive ("keep the top 3 quality deciles per
    * language"). Buckets are assigned to VALUES, not rows: every row
    * with score v lands in bucket ceil(nBuckets * cumCount(>=v) /
    * total), so ties share a bucket and a single hot value can leave
    * neighbouring buckets empty — the deterministic reading (row-level
    * NTILE splits ties by arbitrary row identity AND serializes each
    * stratum through one reducer).
    *
    * Scale shape: the raw table is reduced FIRST to a per-(stratum,
    * value) histogram — one map-side-combinable aggregate, output
    * bounded by |distinct scores| (scores are rounded, so this is
    * vocabulary-sized) — and the cumulative window + bucket aggregate
    * run over that tiny histogram. Compare NTILE over the raw rows: a
    * 100 TB stratum would funnel through a single window task. Bucket
    * arithmetic is pure integer math (`(n*cum + total - 1) div total`),
    * exact in any engine.
    *
    * Output: strataCol, decile (1..nBuckets), n_docs, max_q, min_q.
    */
  def valueDeciles(df: DataFrame, strataCol: String, value: Column,
      nBuckets: Int = 10): DataFrame = {
    val hist = df.groupBy(col(strataCol), value.as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val ordered = Window.partitionBy(strataCol).orderBy(col("__v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(strataCol)
    hist
      .withColumn("__cum", sum("__cnt").over(ordered))
      .withColumn("__tot", sum("__cnt").over(whole))
      .withColumn("decile",
        expr(s"CAST(($nBuckets * __cum + __tot - 1) DIV __tot AS INT)"))
      .groupBy(col(strataCol), col("decile"))
      .agg(sum("__cnt").as("n_docs"),
        max(col("__v")).as("max_q"),
        min(col("__v")).as("min_q"))
  }
}
