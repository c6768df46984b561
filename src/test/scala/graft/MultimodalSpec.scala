package graft

import graft.operators.Multimodal

/** Resize-stage contract: the LONGER side is capped at maxSide with the
  * shorter side scaled by the same integer ratio; media already within
  * bounds is untouched.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("resizeStub caps the longer side, preserving aspect ratio") {
    val decoded = Seq(
      (1L, 5, 100, 400, 2, 1000L), // portrait: height capped, width scaled
      (2L, 5, 400, 100, 2, 1000L), // landscape: width capped, height scaled
      (3L, 5, 100, 120, 2, 1000L)  // within bounds: untouched
    ).toDF("doc_id", "byte_len", "width", "height", "n_frames", "checksum")
    val got = Multimodal.resizeStub(decoded, 224)
      .select("doc_id", "out_w", "out_h").as[(Long, Int, Int)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == (56, 224))   // 100*224/400 = 56
    assert(got(2L) == (224, 56))
    assert(got(3L) == (100, 120))
    assert(got.values.forall { case (w, h) => math.max(w, h) <= 224 })
  }
}
