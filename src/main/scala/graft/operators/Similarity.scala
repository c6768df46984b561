package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k — the baseline. The query set
  *    is broadcast against the corpus, so the corpus is never shuffled;
  *    cost is |Q| x |corpus| dot products, each a codegen'd ordered fold.
  *  - `lshTopK`: random-hyperplane LSH — the 100 TB path. Corpus and
  *    queries hash to sign-pattern buckets; candidates come from an
  *    equi-join on the bucket id, so per-query work drops from |corpus|
  *    to the bucket occupancy (recall < 1, deterministic given the seeded
  *    hyperplanes).
  *
  * Hyperplanes are PSEUDO-RANDOM FROM INTEGER ARITHMETIC (LCG over
  * (plane, dim)), not an RNG: reproducible in any engine, including the
  * DuckDB oracle, with no stored model.
  */
object Similarity {

  /** Top-k per query by cosine, exact. Ties broken by ascending id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("vec_b"), col(vecCol).as("vb"),
      VectorOps.normSq(col(vecCol)).as("nb"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("va"),
      VectorOps.normSq(col(vecCol)).as("na"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_b").asc)
    broadcast(q).crossJoin(c)
      .where(col("q_id") =!= col("vec_b"))
      .withColumn("cosine", VectorOps.cosine(col("va"), col("vb"), col("na"), col("nb")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_b").as("neighbor_id"))
  }

  /** LCG hyperplane coefficient for (plane j, dim d), in [-0.5, 0.5):
    * ((1103515245 * (j * dim + d) + 12345) mod 2048) / 2048 - 0.5.
    * Pure integer arithmetic then one exact binary-fraction division —
    * bit-identical in any IEEE engine.
    */
  def planeCoef(j: Int, d: Int, dim: Int): Double =
    ((1103515245L * (j * dim + d) + 12345L) % 2048L).toDouble / 2048.0 - 0.5

  /** IVF-style ANN (nprobe=1): a small deterministic coarse quantizer —
    * `numCells` "centroids" drawn from the corpus itself (every
    * `centroidEvery`-th id, the seeded stand-in for a k-means training
    * step) — assigns each vector to its nearest centroid by cosine
    * (ties broken by centroid id); queries search only their own cell.
    *
    * Scale shape: assignment is |corpus| x numCells dot products against
    * a BROADCAST centroid set (numCells is small by construction), then
    * the search is an equi-join on cell id — per-query work is the cell
    * occupancy, |corpus|/numCells in expectation. Recall < 1 at cell
    * borders, the classic IVF trade; `nprobe` > 1 is the standard
    * mitigation — each QUERY probes its nprobe nearest cells (the corpus
    * side stays single-cell, so the pair space is still unique: a corpus
    * vector reaches a query only through its one cell), multiplying
    * per-query work by nprobe and recovering border neighbors.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, centroidEvery: Int, nprobe: Int = 1): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val cents = corpus.where(col(idCol) % centroidEvery === 0)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cvec"),
        VectorOps.normSq(col(vecCol)).as("cn"))
    def assign(df: DataFrame, idAs: String, vecAs: String, nAs: String,
        cells: Int): DataFrame = {
      val w = Window.partitionBy(idAs).orderBy(col("__ccos").desc, col("cent_id").asc)
      df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
          VectorOps.normSq(col(vecCol)).as(nAs))
        .crossJoin(broadcast(cents))
        .withColumn("__ccos", VectorOps.cosine(col(vecAs), col("cvec"), col(nAs), col("cn")))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= cells)
        .select(col(idAs), col(vecAs), col(nAs), col("cent_id").as("cell"))
    }
    val c = assign(corpus, "vec_b", "vb", "nb", 1)
    val q = assign(queries, "q_id", "va", "na", nprobe)
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_b").asc)
    q.join(c, Seq("cell"))
      .where(col("q_id") =!= col("vec_b"))
      .withColumn("cosine", VectorOps.cosine(col("va"), col("vb"), col("na"), col("nb")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_b").as("neighbor_id"))
  }

  /** Sign-pattern bucket for band `bb` over `planesPerBand` hyperplanes
    * (planes bb*planesPerBand .. +planesPerBand-1).
    */
  def bandBucket(vec: Column, bb: Int, planesPerBand: Int, dim: Int): Column = {
    val bits = (0 until planesPerBand).map { r =>
      val j = bb * planesPerBand + r
      val plane = array((0 until dim).map(d => lit(planeCoef(j, d, dim))): _*)
      when(VectorOps.dot(vec, plane) > 0.0, lit(1L << r)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Banded (multi-probe) LSH ANN: `bands` hash tables of `planesPerBand`
    * hyperplanes each; candidates share ANY band's bucket (union over
    * bands — recall 1-(1-p^r)^b instead of single-table p^(r*b)), then
    * exact cosine re-rank over the distinct candidate set. Candidates
    * still come from equi-joins on (band, bucket); per-query work is the
    * sum of its bands' bucket occupancies.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, bands: Int, planesPerBand: Int,
      dim: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    def banded(df: DataFrame, idAs: String, vecAs: String, nAs: String) = {
      val base = df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
        VectorOps.normSq(col(vecCol)).as(nAs))
      base.select(col(idAs), col(vecAs), col(nAs),
        posexplode(array((0 until bands).map(bb =>
          bandBucket(col(vecAs), bb, planesPerBand, dim)): _*)).as(Seq("band", "bucket")))
    }
    val c = banded(corpus, "vec_b", "vb", "nb")
    val q = banded(queries, "q_id", "va", "na")
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_b").asc)
    q.join(c, Seq("band", "bucket"))
      .where(col("q_id") =!= col("vec_b"))
      .select("q_id", "va", "na", "vec_b", "vb", "nb").distinct()
      .withColumn("cosine", VectorOps.cosine(col("va"), col("vb"), col("na"), col("nb")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_b").as("neighbor_id"))
  }
}
