package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end training-data corpus clean — the operation the
  * BASELINE.json north star describes: keep documents that
  *
  *  1. meet a quality bar (type-token ratio / stopword-density score),
  *  2. are in an accepted language (marker-heuristic language ID),
  *  3. survive near-duplicate removal (MinHash-LSH pairs, lower-id-wins
  *     sweep).
  *
  * One lazy DAG: the quality and language predicates are per-row codegen
  * and push down to the scan; only the dedup leg shuffles (on shingle and
  * band keys). At 100 TB the cheap per-row filters run FIRST, shrinking
  * the corpus the near-dup machinery sees.
  */
object CorpusPipeline {

  /** The cleaned corpus plus the funnel counts, observed IN the pass:
    * `scored` (documents scored) and `kept` (survivors of the quality +
    * language bar) are `observe()` metrics — accumulator-backed
    * CollectMetrics nodes populated by the pipeline's own checkpoint
    * action, so monitoring a 100 TB clean costs zero extra scans (three
    * separate count() jobs would each re-read the corpus). The final
    * corpus size is just count() on `cleaned`.
    */
  final case class CleanFunnel(cleaned: DataFrame,
      scored: org.apache.spark.sql.Observation,
      kept: org.apache.spark.sql.Observation)

  def clean(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double, langs: Seq[String],
      numPerm: Int, rowsPerBand: Int, tau: Double,
      mode: Dedup.HashMode = Dedup.XxHash): DataFrame =
    cleanObserved(docs, idCol, textCol, minQuality, langs,
      numPerm, rowsPerBand, tau, mode).cleaned

  def cleanObserved(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double, langs: Seq[String],
      numPerm: Int, rowsPerBand: Int, tau: Double,
      mode: Dedup.HashMode = Dedup.XxHash): CleanFunnel = {
    val t = col(textCol)
    // fresh Observation instances per call: an Observation attaches to
    // exactly one Dataset, and bench/verify invoke the pipeline repeatedly
    val oScored = org.apache.spark.sql.Observation()
    val oKept = org.apache.spark.sql.Observation()
    // quality + langId are heavy string expressions (each re-splits the
    // text); the filtered set feeds BOTH the near-dup pair derivation and
    // the final sweep, so materialize it once. localCheckpoint also cuts
    // the lineage, keeping the sweep's plan independent of the scoring
    // subtree (blocks are reclaimed when the result is unreferenced) —
    // and doubles as the action that populates both observations.
    val prefiltered = docs
      .withColumn("quality", TextAnalysis.qualityScore(t))
      .withColumn("pred_lang", TextAnalysis.langId(t))
      .observe(oScored, count(lit(1)).as("n"))
      .where(col("quality") >= minQuality && col("pred_lang").isin(langs.map(x => x: Any): _*))
      .observe(oKept, count(lit(1)).as("n"))
      .localCheckpoint()
    val pairs = Dedup.minhashLshPairs(prefiltered, idCol, textCol,
      numPerm, rowsPerBand, tau, mode)
    CleanFunnel(Dedup.sweep(prefiltered, idCol, pairs), oScored, oKept)
  }

  /** Per-document curation LINEAGE — the governance/provenance column a
    * training-data pipeline must carry: a stage bitmask recording how
    * far each document advanced through clean → dedup → sample → pack.
    *
    *   bit 0 (1): passed the quality + language prefilter;
    *   bit 1 (2): survived the near-dup sweep (kept as canonical);
    *   bit 2 (4): drawn by the stratified sample;
    *   bit 3 (8): packed spanning a context-window boundary.
    *
    * Stages are nested (sampled ⊆ canonical ⊆ prefiltered), so the only
    * reachable masks are 0, 1, 3, 7 and 15 — any other value is a
    * pipeline bug, which is exactly what makes the column auditable.
    * Returns one row per input document: (idCol, pred_lang, unitsCol,
    * lineage); callers roll up per (pred_lang, lineage) for the audit
    * table.
    *
    * Scale shape: one scored corpus checkpoint feeds both the filter
    * chain and the final assembly (the quality/langId string work runs
    * once); the flag attachments are doc_id equi-joins against frames
    * that shrink down the funnel, never a second corpus scan.
    */
  def lineage(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double, langs: Seq[String],
      numPerm: Int, rowsPerBand: Int, tau: Double, mode: Dedup.HashMode,
      quota: Column, sampleSalt: String,
      unitsCol: String, budget: Long, packSalt: String): DataFrame = {
    val t = col(textCol)
    val scored = docs
      .withColumn("quality", TextAnalysis.qualityScore(t))
      .withColumn("pred_lang", TextAnalysis.langId(t))
      .localCheckpoint()
    val keep = col("quality") >= minQuality &&
      col("pred_lang").isin(langs.map(x => x: Any): _*)
    val pre = scored.where(keep)
    val removed = Dedup.minhashLshPairs(pre, idCol, textCol,
        numPerm, rowsPerBand, tau, mode)
      .select(col("doc_b").as(idCol)).distinct()
    val cleaned = pre.join(removed, Seq(idCol), "left_anti")
    val sampled = Sampling.stratified(cleaned, Seq("pred_lang"),
      idCol, textCol, quota, sampleSalt)
    val packed = Sampling.packSequences(sampled, Seq("pred_lang"),
      idCol, unitsCol, budget, packSalt)
    scored.select(col(idCol), col("pred_lang"), col(unitsCol),
        keep.cast("int").as("__pre"))
      .join(removed.select(col(idCol), lit(1).as("__rm")), Seq(idCol), "left")
      .join(sampled.select(col(idCol), lit(1).as("__smp")), Seq(idCol), "left")
      .join(packed.select(col(idCol), col("spans_next").as("__span")),
        Seq(idCol), "left")
      .select(col(idCol), col("pred_lang"), col(unitsCol),
        (col("__pre")
          + when(col("__pre") === 1 && col("__rm").isNull, 2).otherwise(0)
          + coalesce(col("__smp") * 4, lit(0))
          + when(col("__span") === 1, 8).otherwise(0)).cast("int")
          .as("lineage"))
  }
}
