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

  def clean(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double, langs: Seq[String],
      numPerm: Int, rowsPerBand: Int, tau: Double,
      mode: Dedup.HashMode = Dedup.XxHash): DataFrame = {
    val t = col(textCol)
    // quality + langId are heavy string expressions (each re-splits the
    // text); the filtered set feeds BOTH the near-dup pair derivation and
    // the final sweep, so materialize it once. localCheckpoint also cuts
    // the lineage, keeping the sweep's plan independent of the scoring
    // subtree (blocks are reclaimed when the result is unreferenced).
    val prefiltered = docs
      .withColumn("quality", TextAnalysis.qualityScore(t))
      .withColumn("pred_lang", TextAnalysis.langId(t))
      .where(col("quality") >= minQuality && col("pred_lang").isin(langs.map(x => x: Any): _*))
      .localCheckpoint()
    val pairs = Dedup.minhashLshPairs(prefiltered, idCol, textCol,
      numPerm, rowsPerBand, tau, mode)
    Dedup.sweep(prefiltered, idCol, pairs)
  }
}
