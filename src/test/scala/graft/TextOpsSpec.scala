package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Unit tests for the per-document text operators where expected values
  * are known by hand.
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: hand-computed repetition profile") {
    val docs = Seq(
      (1L, "a b a b a b"), // grams: "a b a","b a b","a b a","b a b"
      (2L, "u v w x y z"), // all grams distinct
      (3L, "t t t t"),     // "t t t" twice; one distinct token
      (4L, "p q")          // < 3 tokens -> dropped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L))

    val r1 = got(1L)
    assert(r1.getInt(1) == 4 && r1.getInt(2) == 2 && r1.getInt(3) == 2)
    assert(r1.getDouble(4) == 0.5)      // dup_gram_frac (4-2)/4
    assert(r1.getDouble(5) == 0.5)      // top_gram_frac 2/4
    assert(r1.getDouble(6) == 0.666667) // dup_token_frac (6-2)/6

    val r2 = got(2L)
    assert(r2.getInt(1) == 4 && r2.getInt(2) == 4 && r2.getInt(3) == 1)
    assert(r2.getDouble(4) == 0.0 && r2.getDouble(5) == 0.25 && r2.getDouble(6) == 0.0)

    val r3 = got(3L)
    assert(r3.getInt(1) == 2 && r3.getInt(2) == 1 && r3.getInt(3) == 2)
    assert(r3.getDouble(4) == 0.5)  // (2-1)/2
    assert(r3.getDouble(5) == 1.0)  // 2/2
    assert(r3.getDouble(6) == 0.75) // (4-1)/4
  }

  test("bm25: tf monotonicity, zero for no-match, idf favors rare terms") {
    val docs = Seq(
      (1L, "rare common common filler filler"),
      (2L, "rare rare common filler filler"),  // more 'rare' than doc 1
      (3L, "common common common filler filler"),
      (4L, "filler filler filler filler filler") // no query terms
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, "doc_id", "text",
        Seq("rare", "common"), 1.2, 0.75)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(4L) == 0.0)
    assert(got(2L) > got(1L), "higher tf of a query term must raise the score")
    // 'rare' (df 2) must outscore 'common' (df 3) at equal tf and dl:
    // doc2 (2x rare + 1x common) vs doc3 (3x common, saturating tf)
    assert(got(2L) > got(3L), "idf must favor the rarer term")
    assert(got.values.forall(_ >= 0.0))
  }

  test("bm25 + orderBy/limit plans as TakeOrderedAndProject (no global sort)") {
    val ranked = TextAnalysis.bm25(Tables.documents(spark, sf0001),
        "doc_id", "text", Seq("join", "stream", "hash"), 1.2, 0.75)
      .orderBy(col("bm25").desc, col("doc_id")).limit(20)
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must merge per-partition heaps, plan was: $plan")
  }

  test("repetitionStats is a zero-exchange per-row projection") {
    val plan = TextAnalysis
      .repetitionStats(Tables.documents(spark, sf0001), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "repetition profile must stay map-only — an Exchange means the " +
        "grams escaped the per-row fold")
  }

  test("hashedLinearScore: exact fold, sign label, zero-exchange, hash-stable") {
    val docs = Seq((1L, "x"), (2L, "x x x"), (3L, "y z")).toDF("doc_id", "text")
    val got = TextAnalysis.hashedLinearScore(docs, "doc_id", "text", 1024)
      .select("doc_id", "n_tokens", "score", "label")
      .as[(Long, Int, Long, Int)].collect().map(r => r._1 -> r).toMap
    // same token k times scores exactly k * w(token)
    assert(got(2L)._3 == 3 * got(1L)._3)
    assert(got.values.forall(r => (r._4 == 1) == (r._3 >= 0)))
    // vocabulary-free: the whole corpus scores as one map-only projection
    val plan = TextAnalysis
      .hashedLinearScore(Tables.documents(spark, sf0001), "doc_id", "text", 1024)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "hashed classifier inference must be a zero-shuffle projection")
    // partition-independent (exact integer fold)
    val a = TextAnalysis.hashedLinearScore(
      Tables.documents(spark, sf0001), "doc_id", "text", 1024)
    val b = TextAnalysis.hashedLinearScore(
      Tables.documents(spark, sf0001).repartition(7), "doc_id", "text", 1024)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("cdcChunks: edit locality — a prefix insertion leaves shared-tail chunks identical") {
    import spark.implicits._
    // a long shared tail behind differing prefixes: content-defined
    // boundaries must realign, so most tail chunks dedup across the two
    // docs; fixed-size chunking would misalign every one of them
    val tail = (1 to 400).map(i => s"w${i % 37}tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha $tail"),
      (2L, s"beta gamma delta injected $tail")).toDF("doc_id", "text")
    val chunks = TextAnalysis.cdcChunks(docs, "doc_id", "text", Seq.empty, 3, 8)
      .select("doc_id", "chash", "n_words").collect()
    val h1 = chunks.filter(_.getLong(0) == 1L).map(_.getLong(1))
    val h2 = chunks.filter(_.getLong(0) == 2L).map(_.getLong(1))
    val shared = h1.toSet.intersect(h2.toSet)
    // the bulk of each doc's chunks are the realigned shared tail
    assert(shared.size >= (h1.length * 2) / 3,
      s"only ${shared.size} of ${h1.length}/${h2.length} chunks realigned")
    // chunks partition every document exactly
    val words1 = chunks.filter(_.getLong(0) == 1L).map(_.getLong(2)).sum
    assert(words1 == 401L, s"doc 1 chunk words sum to $words1, not 401")
    // determinism across partitionings (sorted struct reassembly)
    val re = TextAnalysis.cdcChunks(docs.repartition(5), "doc_id", "text",
      Seq.empty, 3, 8).select("doc_id", "chash", "n_words")
    val orig = TextAnalysis.cdcChunks(docs, "doc_id", "text", Seq.empty, 3, 8)
      .select("doc_id", "chash", "n_words")
    assert(orig.exceptAll(re).isEmpty && re.exceptAll(orig).isEmpty)
  }

  test("bpeTrain: hand-checked 3-round merge schedule") {
    // wc: low->2, lower->1
    // r1 pairs: "l o":3, "o w":3, "w e":1, "e r":1 -> tie, asc -> "l o"
    // r2: low=[lo,w], lower=[lo,w,e,r] -> "lo w":3 wins
    // r3: low=[low] (no pairs), lower=[low,e,r] -> "e r" vs "low e" tie
    //     at 1, asc -> "e r"
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, "text", 3)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, "l o", 3L), (2, "lo w", 3L), (3, "e r", 1L)))
  }

  test("bpeTrain: greedy non-overlapping merge; adjacent occurrences both merge") {
    // "aaaa": (a,a) counted 3x overlapping; the merge is greedy
    // left-to-right -> [aa, aa] (not [aa, a, a]), then round 2 merges
    // the two new symbols
    val aa = TextAnalysis.bpeTrain(
        Seq((1L, "aaaa")).toDF("doc_id", "text"), "text", 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(aa.toSeq == Seq((1, "a a", 3L), (2, "aa aa", 1L)))
    // "abab": BOTH (a,b) occurrences merge in one round even though they
    // are adjacent in the delimited representation (each match consumes
    // only its own padding)
    val ab = TextAnalysis.bpeTrain(
        Seq((1L, "abab")).toDF("doc_id", "text"), "text", 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(ab.toSeq == Seq((1, "a b", 2L), (2, "ab ab", 1L)))
  }

  test("bpeApplyBudget: hand-checked per-source token budget under trained merges") {
    // trained on both docs: wc low->3, lower->1 (x dropped, len < 2)
    // r1 "l o":4, r2 "lo w":4, r3 "e r":1 -> seg: low=1 sym, lower=2 syms
    // source a: low x2 + lower -> words 3, chars 11, tokens 1+1+2=4
    // source b: low + x (unseen -> 1 token) -> words 2, chars 4, tokens 2
    val docs = Seq((1L, "low low lower", "a"), (2L, "low x", "b"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.bpeApplyBudget(docs, "source", "text", 3)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("a", 1L, 3L, 11L, 4L, 2.75),
      ("b", 1L, 2L, 4L, 2L, 2.0)))
  }

  test("bpe merges: hand-checked pair frequencies, weighted by word count") {
    // fixture registered under a temp dir so the registry query runs as-is
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    import spark.implicits._
    // words: abab ×2 ("abab abab" + the solo doc's one) is 3 total,
    // abc ×1, x dropped (len < 2)
    Seq((1L, "abab abab abc", "en", "s", 13L), (2L, "abab x", "en", "s", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("ext_text_bpe_merges")(spark, dir)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    // abab: pairs ab, ba, ab -> ab×2, ba×1 per occurrence (3 occurrences)
    // abc: ab×1, bc×1
    assert(got("ab") == 3 * 2 + 1, s"got $got")
    assert(got("ba") == 3L)
    assert(got("bc") == 1L)
    // ranks deterministic: ab (7) first, then ba (3), then bc (1)
    val ranked = SparkEntry.queries("ext_text_bpe_merges")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(ranked.sortBy(_._1).map(_._2).toSeq == Seq("ab", "ba", "bc"))
  }

  test("hashedPerceptronTrain ≡ sequential reference loop on a micro-corpus") {
    val docs = Seq(
      (1L, "cat cat dog", 1L),
      (2L, "dog dog dog", -1L),
      (3L, "cat bird", 1L),
      (4L, "dog bird bird", -1L),
      (5L, "cat cat cat cat", 1L)
    ).toDF("doc_id", "text", "y")
    val dim = 8
    val rounds = 3

    // sequential reference: same hashed features, same batch update
    def bucket(tok: String): Int =
      (tok.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + b) % 2147483647L)
        % dim).toInt
    val feats = Seq(
      (1L, 1L, Seq("cat", "cat", "dog")),
      (2L, -1L, Seq("dog", "dog", "dog")),
      (3L, 1L, Seq("cat", "bird")),
      (4L, -1L, Seq("dog", "bird", "bird")),
      (5L, 1L, Seq("cat", "cat", "cat", "cat"))
    ).map { case (id, y, ts) =>
      (id, y, ts.groupBy(bucket).view.mapValues(_.size.toLong).toMap)
    }
    var w = Map.empty[Int, Long].withDefaultValue(0L)
    val expected = (1 to rounds).map { t =>
      val preds = feats.map { case (_, y, x) =>
        val margin = x.map { case (b, c) => c * w(b) }.sum
        (y, if (margin >= 0) 1L else -1L, x)
      }
      val nCorrect = preds.count(p => p._1 == p._2).toLong
      val wrong = preds.filter(p => p._1 != p._2)
      val delta = wrong.flatMap { case (y, _, x) =>
        x.map { case (b, c) => b -> y * c } }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      w = (0 until dim).map(b => b -> (w(b) + delta.getOrElse(b, 0L))).toMap
        .withDefaultValue(0L)
      (t, nCorrect, feats.size - nCorrect,
        w.values.map(math.abs).sum, w.values.count(_ != 0L).toLong)
    }

    val got = TextAnalysis.hashedPerceptronTrain(docs, "doc_id", "text", "y",
        dim, rounds)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == expected)
    // the loop must actually learn this separable fixture
    assert(got.last._2 == feats.size.toLong)
  }

  test("hashedPerceptronApply: trained weights classify the separable fixture") {
    val docs = Seq(
      (1L, "cat cat dog", 1L, "s1"),
      (2L, "dog dog dog", -1L, "s1"),
      (3L, "cat bird", 1L, "s2"),
      (4L, "dog bird bird", -1L, "s2"),
      (5L, "cat cat cat cat", 1L, "s2")
    ).toDF("doc_id", "text", "y", "src")
    val got = TextAnalysis.hashedPerceptronApply(docs, "doc_id", "text", "y",
        "src", dim = 8, rounds = 3)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    // 3 rounds converge on this fixture (proven by the train spec), so
    // the applied model is perfect: pred == y everywhere
    assert(got("s1") == ((2L, 1L, 1L, 2L, 1.0)))
    assert(got("s2") == ((3L, 2L, 2L, 3L, 1.0)))
  }

  test("ext_text_zipf: slope matches a direct grid recompute, fit sane") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("ext_text_zipf")(spark, sf0001).collect().head
    val (n, slope, r2) = (r.getLong(0), r.getDouble(1), r.getDouble(3))
    assert(slope < 0.0, "word frequency must decay with rank")
    assert(r2 >= 0.0 && r2 <= 1.0)
    // direct recompute on the same 1e6 grid from the raw word counts
    // (the tiny fixture's vocabulary can be smaller than the top-100)
    val counts = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(row => (row.getString(0), row.getLong(1)))
      .sortBy { case (w, c) => (-c, w) }.take(100)
    val k = counts.length.toLong
    assert(n == k, s"n_top must be min(100, vocab) = $k")
    val g = counts.zipWithIndex.map { case ((_, c), i) =>
      (math.round(math.log(i + 1.0) * 1e6), math.round(math.log(c.toDouble) * 1e6))
    }
    val (sx, sy) = (g.map(_._1).sum, g.map(_._2).sum)
    val sxy = g.map(p => p._1 * p._2).sum
    val sxx = g.map(p => p._1 * p._1).sum
    val a = k * sxy - sx * sy
    val b = k * sxx - sx * sx
    val expected = BigDecimal(a.toDouble / b.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(slope - expected) < 1e-9, s"$slope vs $expected")
  }

  test("ext_search_phrase: occurrence counts match a direct substring scan") {
    val got = SparkEntry.queries("ext_search_phrase")(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty)
    // ground truth: count adjacent ("table","hash") pairs per doc
    val truth = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.split(" ").sliding(2)
          .count(p => p.length == 2 && p(0) == "table" && p(1) == "hash").toLong
      }.filter(_._2 > 0).toMap
    got.foreach { case (id, n) =>
      assert(truth.get(id).contains(n), s"doc $id: $n vs ${truth.get(id)}")
    }
    // top-k really keeps the best: every kept count >= every omitted count
    if (truth.size > got.size) {
      val minKept = got.values.min
      val omitted = truth.filterNot { case (id, _) => got.contains(id) }
      assert(omitted.values.forall(_ <= minKept))
    }
  }

  test("ext_text_colloc: PMI matches a driver recompute; min-count and top-k hold") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("ext_text_colloc")(spark, sf0001)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 50)
    // ground truth: adjacent pairs from the raw text
    val pairs = Tables.documents(spark, sf0001)
      .select(col("text")).as[String].collect()
      .flatMap(_.split(" ").sliding(2).collect { case Array(a, b) => (a, b) })
    val pc = pairs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = pairs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val c2 = pairs.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val nBi = pairs.length.toLong
    rows.foreach { case (w1, w2, nPair, gc1, gc2, pmi) =>
      assert(nPair >= 5, "min-count floor")
      assert(pc((w1, w2)) == nPair && c1(w1) == gc1 && c2(w2) == gc2)
      val grid = math.round((math.log(nPair.toDouble) + math.log(nBi.toDouble)
        - math.log(gc1.toDouble) - math.log(gc2.toDouble)) * 1e6)
      val expected = BigDecimal(grid / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(pmi - expected) < 1e-9, s"($w1,$w2): $pmi vs $expected")
    }
    // the ranking really is by PMI: every returned pair scores >= every
    // eligible pair left out (when the fixture has more than top-k)
    val minKept = rows.map(_._6).min
    val leftOut = pc.filter { case (k, c) =>
      c >= 5 && !rows.exists(r => (r._1, r._2) == k) }
    leftOut.foreach { case ((a, b), c) =>
      val p = math.round((math.log(c.toDouble) + math.log(nBi.toDouble)
        - math.log(c1(a).toDouble) - math.log(c2(b).toDouble)) * 1e6) / 1e6
      assert(p <= minKept + 1e-9, s"($a,$b) outside top-k outranks a kept pair")
    }
  }
}
