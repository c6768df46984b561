package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payload columns with typed
  * metadata, and a partition-batched "decode / feature-extract" stage.
  *
  * The image/audio codecs aren't in this container, so the decode body is
  * a clearly-marked DETERMINISTIC STUB — but the Spark-side plumbing is
  * real and load-bearing: a binary payload column, an explicit output
  * StructType, and a `mapPartitions` stage that processes rows in
  * partition-sized batches exactly where a Pandas-UDF / mapInArrow decode
  * would sit. Swapping the stub for a real codec changes only
  * `decodeBytes`.
  *
  * Scale notes: decode is per-row embarrassing work — no shuffle at all;
  * partition sizing (spark.sql.files.maxPartitionBytes) is the only knob.
  * Feature columns come back as typed scalars so downstream stays
  * codegen'd.
  */
object Multimodal {

  /** Attach the opaque payload column (here: utf-8 bytes of `textCol`
    * standing in for image bytes) plus typed metadata derived from it.
    */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"),
      octet_length(col(textCol)).as("byte_len"))

  /** Deterministic fake decode: replaces image decode + feature extraction.
    * Returns (width, height, n_frames, checksum). A real implementation
    * would parse the codec header and run the feature net; the stub
    * derives everything from the payload bytes so it is reproducible in
    * the oracle.
    */
  def decodeBytes(bytes: Array[Byte]): (Int, Int, Int, Long) = {
    // ??? <- real codec goes here; deterministic fake below.
    // Checksum sums UNICODE CODEPOINTS of the decoded payload (not raw
    // bytes) so the SQL oracle — which only sees characters — can
    // reproduce it for non-ASCII content too. Long arithmetic throughout:
    // len * 31 overflows Int already at ~69 MB payloads.
    val len = bytes.length
    val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    var sum = 0L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      sum += cp
      i += Character.charCount(cp)
    }
    val width = 64 + len % 577
    val height = 64 + (len.toLong * 31 % 389).toInt
    val frames = 1 + len % 7
    (width, height, frames, sum % 1000000007L)
  }

  val DecodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("checksum", LongType)))

  /** Frame sampling: explode each media item into its frames with a
    * deterministic per-frame fingerprint (stub for "decode frame k and
    * hash/feature it"). Row count multiplies by n_frames — the Spark
    * side of a video pipeline's frame extraction; the real decoder slots
    * into the fingerprint expression.
    */
  def sampleFrames(decoded: DataFrame): DataFrame =
    decoded.select(col("doc_id"), col("n_frames"), col("checksum"),
        explode(sequence(lit(1), col("n_frames"))).as("frame_idx"))
      .withColumn("frame_hash",
        (col("checksum") * 31L + col("frame_idx")) % 1000000007L)
      .select("doc_id", "frame_idx", "frame_hash")

  /** Resize stage (stub): cap the longer side at `maxSide`, preserving
    * aspect ratio with pure integer arithmetic, and re-fingerprint the
    * "resized" payload. A real implementation swaps the checksum formula
    * for the actual pixel resample; dims/scale plumbing — the part a
    * pipeline schema depends on — is real. Per-row codegen expressions,
    * no shuffle, no UDF.
    */
  def resizeStub(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded
      // cap the LONGER side at maxSide; the shorter side scales by the
      // same integer ratio (never upscales: least() is a no-op when the
      // media is already within bounds)
      .withColumn("out_w",
        when(col("width") >= col("height"), least(col("width"), lit(maxSide)))
          .otherwise(expr(s"CAST((width * least(height, $maxSide)) div height AS INT)")))
      .withColumn("out_h",
        when(col("width") >= col("height"),
          expr(s"CAST((height * least(width, $maxSide)) div width AS INT)"))
          .otherwise(least(col("height"), lit(maxSide))))
      .withColumn("resized_checksum",
        (col("checksum") * 37L + col("out_w").cast("long") * 31L
          + col("out_h")) % 1000000007L)
      .select("doc_id", "width", "height", "out_w", "out_h", "resized_checksum")

  /** The decode stage: partition-batched, binary in, typed features out.
    * Sits exactly where `mapInPandas`/`mapInArrow` would; the iterator
    * shape means constant memory per task regardless of partition size.
    */
  def decodeFeatures(payloads: DataFrame): DataFrame = {
    val enc = Encoders.row(DecodedSchema)
    payloads.select("doc_id", "media", "byte_len").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val bl = r.getInt(2)
        val (w, h, f, cs) = decodeBytes(bytes)
        Row(id, bl, w, h, f, cs)
      }
    }(enc)
  }
}
