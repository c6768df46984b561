package graft.operators

import org.apache.spark.sql.DataFrame
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
}
