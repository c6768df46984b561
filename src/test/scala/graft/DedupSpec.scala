package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Unit tests for the dedup family on crafted micro-corpora where the
  * expected pairs are known by hand.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f g h"),
    (2L, "a b c d e f g h"),          // exact dup of 1
    (3L, "a b c d e f g x"),          // near dup of 1/2
    (4L, "p q r s t u v w"),          // unrelated
    (5L, "q r")                       // too short for 3-shingles
  ).toDF("doc_id", "text")

  test("exact: min id kept with multiplicity") {
    val got = Dedup.exact(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 2L) // docs 1+2 collapse onto min id 1
    assert(got.values.sum == 5L)
  }

  test("shingleEdges: n-2 shingles per doc, none for short docs") {
    val counts = Dedup.shingleEdges(docs, "doc_id", "text")
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(counts(1L) == 6L && counts(4L) == 6L)
    assert(!counts.contains(5L))
  }

  test("graft_shingles generator ≡ HOF shingling, incl. empty-word edges") {
    // consecutive/leading/trailing spaces make empty words; unicode words
    // exercise the multi-byte path of the byte-slice emission
    val tricky = Seq(
      (1L, "a b c d"),
      (2L, "a  b c"),          // double space -> empty middle word
      (3L, " a b"),            // leading space, still < 3 shingle words? (4 words: "", a, b)
      (4L, "a b c "),          // trailing space -> trailing empty word
      (5L, ""),                // one empty word
      (6L, "é ü 漢 x"),        // multi-byte codepoints
      (7L, "x y")              // too short
    ).toDF("doc_id", "text")
    for (df <- Seq(tricky, Tables.documents(spark, sf0001))) {
      val native = Dedup.shingleEdges(df, "doc_id", "text")
      val hof = Dedup.shingleEdgesHof(df, "doc_id", "text")
      assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    }
  }

  test("jaccardPairs finds exact and near dups, skips unrelated") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // jaccard 1.0
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("containmentPairs catches quote-inclusion that Jaccard misses") {
    // doc 11 is quoted whole inside doc 10 (10's set strictly contains
    // 11's): containment = 1.0, but jaccard = 4/16 = 0.25
    val quote = Seq(
      (10L, "z1 z2 z3 z4 z5 z6 a b c d e f z7 z8 z9 z10 z11 z12"),
      (11L, "a b c d e f"),
      (12L, "m n o p q r")            // unrelated
    ).toDF("doc_id", "text")
    val contained = Dedup.containmentPairs(quote, "doc_id", "text", 0.99)
      .as[(Long, Long, Double)].collect()
    assert(contained.map(p => (p._1, p._2)).toSet == Set((10L, 11L)))
    assert(contained.head._3 == 1.0)
    val jac = Dedup.jaccardPairs(quote, "doc_id", "text", 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((10L, 11L)))
  }

  test("jaccardPairsCapped: high cap ≡ uncapped; cap 1 kills shared-shingle candidates") {
    val uncapped = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5)
      .select("doc_a", "doc_b", "jaccard")
    val highCap = Dedup.jaccardPairsCapped(docs, "doc_id", "text", 0.5, 100)
      .select("doc_a", "doc_b", "jaccard")
    assert(highCap.exceptAll(uncapped).count() == 0 &&
      uncapped.exceptAll(highCap).count() == 0)
    // docs 1/2/3 share every shingle pairwise (df >= 2), so cap 1 finds nothing
    assert(Dedup.jaccardPairsCapped(docs, "doc_id", "text", 0.5, 1).count() == 0)
    // intermediate cap: only 'fgh' (df 2) and 'fgx' (df 1) are rare, so the
    // sole candidate is (1,2) — and its jaccard must still be the EXACT
    // full-set value (1.0), hot shingles included via the survivor path
    val mid = Dedup.jaccardPairsCapped(docs, "doc_id", "text", 0.5, 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(mid == Set((1L, 2L, 1.0)))
  }

  test("minhashLshPairs: identical docs always collide (all hash modes)") {
    for (mode <- Seq(Dedup.DenseId, Dedup.PolyHash, Dedup.XxHash)) {
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 16, 2, 0.9, mode)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)), s"mode $mode")
    }
  }

  test("XxHash-mode LSH: exact recall at the fixture operating point; signatures partition-invariant") {
    // the gate ext_dedup_minhash_fast rides: the production (XxHash)
    // path's verified pairs equal the EXACT pair set at 16 perms / r=2 /
    // τ=0.8 — a recall miss would fail this (and the oracle gate) loudly
    val corpus = Tables.documents(spark, sf0001)
    val fast = Dedup.minhashLshPairs(corpus, "doc_id", "text", 16, 2, 0.8,
      Dedup.XxHash)
    val exact = Dedup.jaccardPairs(corpus, "doc_id", "text", 0.8)
    assert(fast.count() > 0)
    // the two failure modes are DIFFERENT diagnoses, so they are
    // recorded separately (round-10 ADVICE): a spurious pair is a
    // PIPELINE bug (verification re-checks exact Jaccard, it can never
    // legitimately admit one); a missed pair is an OPERATING-POINT
    // recall miss (a just-above-τ pair that collided in none of the 8
    // bands — data-dependent, fixable by loosening r, not by code)
    val spurious = fast.exceptAll(exact).count()
    val missed = exact.exceptAll(fast).count()
    val total = exact.count()
    info(f"band recall at 16 perms / r=2 / tau=0.8: ${(total - missed).toDouble / total}%.4f ($missed missed of $total)")
    assert(spurious == 0,
      s"$spurious spurious pairs — a PIPELINE bug (exact verification must reject them)")
    assert(missed == 0,
      s"band recall ${(total - missed).toDouble / total} < 1.0: $missed of " +
        s"$total exact pairs collided in no band — an OPERATING-POINT " +
        "recall miss on this fixture, not a pipeline bug (the " +
        "ext_dedup_minhash_fast oracle gate reads the same way)")
    // the raw XxHash signature values — engine-specific, so no SQL
    // oracle can restate them — stay deterministic under repartitioning
    val edges = Dedup.shingleEdges(corpus, "doc_id", "text")
    val sig = Dedup.minhashSignatures(edges, 16, Dedup.XxHash)
    val sig2 = Dedup.minhashSignatures(edges.repartition(7), 16, Dedup.XxHash)
    assert(sig.exceptAll(sig2).count() == 0 && sig2.exceptAll(sig).count() == 0)
  }

  test("simhashPairs: identical docs at hamming 0 (all hash modes)") {
    for (mode <- Seq(Dedup.DenseId, Dedup.PolyHash, Dedup.XxHash)) {
      val got = Dedup.simhashPairs(docs, "doc_id", "text", 3, mode)
        .as[(Long, Long, Int)].collect()
      assert(got.exists(r => r._1 == 1L && r._2 == 2L && r._3 == 0), s"mode $mode")
    }
  }

  test("ensemblePairs ≡ unioned detectors with vote threshold (shared edge build)") {
    val corpus = Tables.documents(spark, sf0001)
    val got = Dedup.ensemblePairs(corpus, "doc_id", "text",
      0.5, 16, 2, 0.8, 3, 2, Dedup.PolyHash)
    val expected = Seq(
        Dedup.jaccardPairs(corpus, "doc_id", "text", 0.5),
        Dedup.minhashLshPairs(corpus, "doc_id", "text", 16, 2, 0.8, Dedup.PolyHash),
        Dedup.simhashPairs(corpus, "doc_id", "text", 3, Dedup.PolyHash))
      .map(_.select("doc_a", "doc_b"))
      .reduce(_ unionByName _)
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).cast("int").as("n_methods"))
      .where(col("n_methods") >= 2)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    assert(got.count() > 0) // fixture actually exercises the consensus path
  }

  test("polyHash: integer char fold, stable and order-sensitive") {
    graft.functions.GraftFunctions.register(spark)
    val got = Seq("ab", "ba", "ab", "").toDF("s")
      .select(Dedup.polyHash(col("s")).as("h")).as[Long].collect()
    assert(got(0) == ('a'.toLong * 31 + 'b'))  // (0*31+97)*31+98
    assert(got(0) != got(1) && got(0) == got(2) && got(3) == 0L)
  }

  test("polyHash native kernel ≡ HOF fold on real corpus shingles") {
    graft.functions.GraftFunctions.register(spark)
    val edges = Dedup.shingleEdges(Tables.documents(spark, sf0001), "doc_id", "text")
    val diff = edges
      .select(Dedup.polyHash(col("shingle")).as("a"),
        Dedup.polyHashFold(col("shingle")).as("b"))
      .where(col("a") =!= col("b"))
    assert(diff.count() == 0)
  }

  test("sweepByComponent diverges from greedy sweep on doc_a-only duplicates") {
    // pairs (1,3),(2,3): greedy drops only doc_b's (3) and keeps BOTH 1
    // and 2; component {1,2,3} has one survivor (1) under transitive sweep
    val corpus = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("doc_a", "doc_b")
    val greedy = Dedup.sweep(corpus, "doc_id", pairs).as[Long].collect().toSet
    assert(greedy == Set(1L, 2L, 4L))
    val labels = Dedup.connectedComponents(pairs, iterations = 3)
    val transitive = Dedup.sweepByComponent(corpus, "doc_id", labels)
      .as[Long].collect().toSet
    assert(transitive == Set(1L, 4L))
  }

  test("connectedComponents: min-label propagation finds transitive groups") {
    // chain 1-2-3, pair 7-8, and 1-3 redundant edge
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("labelPropagation: dense communities survive the bridge edge components merge") {
    // two triangles joined by one bridge (3-5): min-label CC collapses
    // everything to one component; mode-label LPA keeps the two dense
    // families apart because each side's mode stays local
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L), (5L, 7L),
      (6L, 7L), (3L, 5L)).toDF("doc_a", "doc_b")
    val lpa = Dedup.labelPropagation(pairs, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(lpa == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 3L, 6L -> 3L, 7L -> 3L),
      s"hand-simulated 3-round sync LPA with (count desc, label asc) ties: $lpa")
    assert(lpa.values.toSet.size == 2, "the bridge must NOT merge the triangles")
    val cc = Dedup.connectedComponents(pairs, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet.size == 1, "components DO merge across the bridge")
  }

  test("bfsDistance: exact hops from a multi-source seed set, unreached = -1") {
    // path 1-2-3-4-5 plus island 8-9; seeds {1, 9}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
      .toDF("doc_a", "doc_b")
    val seeds = Seq(1L, 9L).toDF("doc_id")
    val got = Dedup.bfsDistance(pairs, seeds, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> -1L, // 4 hops away, beyond the 3-round horizon
      8L -> 1L, 9L -> 0L))
    // one more round reaches node 5
    val more = Dedup.bfsDistance(pairs, seeds, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(more(5L) == 4L)
  }

  test("connectedComponentsStar: log-round convergence matches propagation") {
    // chain of 16 — propagation needs 15 rounds, star pairs need ~log2
    val chain = (1L until 16L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val star = Dedup.connectedComponentsStar(chain, maxRounds = 8)
      .as[(Long, Long)].collect().toMap
    assert(star.size == 16 && star.values.toSet == Set(1L))
    // mixed graph: two components + redundant edge + reversed pair order
    val pairs = Seq((5L, 2L), (2L, 9L), (9L, 5L), (11L, 12L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponentsStar(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 2L, 5L -> 2L, 9L -> 2L, 11L -> 11L, 12L -> 11L))
  }

  test("connectedComponentsStar ≡ propagation on seeded random graphs") {
    // bounded deterministic sweep (a 100-case scalacheck run of two
    // distributed CC algorithms costs minutes; 12 seeds catch the same
    // structural variety: multi-component, cycles, isolated chains)
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 12) {
      val pairs = Seq.fill(10)((rng.nextInt(13).toLong, rng.nextInt(13).toLong))
        .filter(p => p._1 != p._2)
      val df = pairs.toDF("doc_a", "doc_b")
      // 13 nodes -> diameter < 13 bounds propagation convergence
      val prop = Dedup.connectedComponents(df, iterations = 13)
        .as[(Long, Long)].collect().toMap
      val star = Dedup.connectedComponentsStar(df)
        .as[(Long, Long)].collect().toMap
      assert(star == prop, s"pairs $pairs")
    }
  }

  test("connectedComponents: chain converges within diameter rounds") {
    val chain = (1L until 9L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(chain, iterations = 8)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L))
    // under-iterating leaves distant nodes unconverged — documented behavior
    val partial = Dedup.connectedComponents(chain, iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(partial(9L) == 7L)
  }

  test("blocked cosine pairs ≡ declarative plan, bit for bit") {
    val emb = Tables.embeddings(spark, sf0001)
    val fast = Dedup.embeddingCosinePairsBlocked(emb, "vec_id", "embedding", 0.3)
    val ref = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", 0.3)
    assert(fast.count() > 0)
    assert(fast.exceptAll(ref).count() == 0 && ref.exceptAll(fast).count() == 0)
  }

  test("crossContamination: bipartite coverage of the EVAL doc's shingles") {
    val train = Seq(
      (1L, "a b c d e f"),      // contains eval 10 wholly
      (2L, "x y z w v u"),      // shares half of eval 11's shingles
      (3L, "p q r s t")         // unrelated
    ).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "b c d e"),         // 2 shingles, both in train 1 -> 1.0
      (11L, "x y z k1 k2 k3"),  // 4 shingles, 1 in train 2 -> 0.25
      (12L, "m n o")            // no overlap -> absent
    ).toDF("doc_id", "text")
    val got = Dedup.crossContamination(train, eval, "doc_id", "text", 0.2)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((10L, 1L, 1.0), (11L, 2L, 0.25)))
    // threshold excludes the partial hit; denominator is EVAL-side only
    val strict = Dedup.crossContamination(train, eval, "doc_id", "text", 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(strict == Set((10L, 1L, 1.0)))
  }

  test("triangleCounts: K4 vs chain, ≡ id-ordered reference join on random graphs") {
    import org.apache.spark.sql.DataFrame
    // K4 on {1..4}: every vertex sits in C(3,2) = 3 triangles; the chain
    // 10-11-12-13 has none and must not appear at all
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val chain = Seq((10L, 11L), (11L, 12L), (12L, 13L))
    val pairs = (k4 ++ chain).toDF("doc_a", "doc_b")
    val got = Dedup.triangleCounts(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
    // reference: the naive id-ordered triple join (a<b<c)
    def reference(p: DataFrame): DataFrame = {
      val e = p.select("doc_a", "doc_b").distinct()
      e.toDF("a", "b")
        .join(e.toDF("b", "c"), Seq("b"))
        .join(e.toDF("a", "c"), Seq("a", "c"))
        .select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
    }
    // seeded random graphs: orientation must never change the counts
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val es = (1 to 60).map { _ =>
        val a = rnd.nextInt(18).toLong; val b = rnd.nextInt(18).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val df = es.toDF("doc_a", "doc_b")
      val fast = Dedup.triangleCounts(df)
      val ref = reference(df)
      assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty,
        s"trial $trial: degree-ordered counts diverged from reference")
    }
  }

  test("source matrix conserves the pair mass and normalizes pair order") {
    val got = SparkEntry.queries("ext_dedup_srcmatrix")(spark, sf0001).collect()
    val totalPairs = Dedup.jaccardPairs(
      Tables.documents(spark, sf0001), "doc_id", "text", 0.5).count()
    assert(got.map(_.getLong(2)).sum == totalPairs,
      "matrix cells must partition the pair set exactly")
    got.foreach(r => assert(r.getString(0) <= r.getString(1),
      "source pair must be order-normalized"))
  }

  test("verbatimSpans: exact span arithmetic; catches quotes Jaccard misses") {
    val corpus = Seq(
      (1L, "x1 x2 x3 s1 s2 s3 s4 s5 s6 s7 s8 y1 y2 y3 y4 y5 y6 y7"),
      (2L, "z1 z2 s1 s2 s3 s4 s5 s6 s7 s8 w1 w2 w3 w4 w5 w6 w7 w8"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")
    ).toDF("doc_id", "text")
    val got = Dedup.verbatimSpans(corpus, "doc_id", "text", 4, 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    // the 8-token shared passage = 5 consecutive 4-grams on one diagonal
    assert(got == Set((1L, 2L, 8L, 5L)), s"got $got")
    // set-overlap at the same strength misses it: jaccard ≈ 6/26
    assert(Dedup.jaccardPairs(corpus, "doc_id", "text", 0.5).count() == 0)
    // minSpan excludes it when raised past the span length
    assert(Dedup.verbatimSpans(corpus, "doc_id", "text", 4, 9).count() == 0)
    // df cap 1 kills the candidate grams (each shared gram has df 2)
    assert(Dedup.verbatimSpans(corpus, "doc_id", "text", 4, 8, maxDf = 1).count() == 0)
    // a split passage yields TWO runs: max_span stays the longer one
    val split = Seq(
      (1L, "s1 s2 s3 s4 s5 GAP s6 s7 s8 s9 t1 t2"),
      (2L, "s1 s2 s3 s4 s5 XX s6 s7 s8 s9 q1 q2")
    ).toDF("doc_id", "text")
    val sp = Dedup.verbatimSpans(split, "doc_id", "text", 4, 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    // runs: "s1..s5" (2 grams -> span 5) and "s6..s9" (1 gram -> span 4)
    assert(sp == Set((1L, 2L, 5L, 3L)), s"got $sp")
  }

  test("incrementalMinhashDups: bipartite only, exact verify, DenseId rejected") {
    val existing = Seq(
      (1L, "a b c d e f g h"),
      (2L, "p q r s t u v w")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "a b c d e f g h"),  // exact copy of existing 1
      (11L, "a b c d e f g h"),  // intra-batch dup of 10 — must NOT pair with 11
      (12L, "k l m n o k2 l2 m2") // novel
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalMinhashDups(existing, incoming, "doc_id", "text",
      16, 2, 0.8, Dedup.PolyHash).as[(Long, Long, Double)].collect().toSet
    // both copies hit the EXISTING doc; the intra-batch (10,11) pair is
    // out of scope by design (bipartite join only)
    assert(got == Set((10L, 1L, 1.0), (11L, 1L, 1.0)), s"got $got")
    intercept[IllegalArgumentException] {
      Dedup.incrementalMinhashDups(existing, incoming, "doc_id", "text",
        16, 2, 0.8, Dedup.DenseId)
    }
  }

  test("minhashEstimateAudit: exact dups estimate 1.0; error is |est - exact|") {
    val real = Tables.documents(spark, sf0001)
    val rows = Dedup.minhashEstimateAudit(real, "doc_id", "text", 16, 2, Dedup.PolyHash)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, est, j, err) =>
      assert(est >= 0.0 && est <= 1.0 && j >= 0.0 && j <= 1.0, s"($a,$b)")
      assert(math.abs(err - math.abs(est - j)) <= 2e-6, s"($a,$b) err=$err est=$est j=$j")
    }
    // identical texts share every permutation minimum AND every shingle
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "an entirely different sentence about something else here")
    ).toDF("doc_id", "text")
    val dup = Dedup.minhashEstimateAudit(d, "doc_id", "text", 16, 2, Dedup.PolyHash)
      .as[(Long, Long, Double, Double, Double)].collect()
    val exact = dup.filter(r => r._1 == 1L && r._2 == 2L)
    assert(exact.length == 1 &&
      exact.forall(r => r._3 == 1.0 && r._4 == 1.0 && r._5 == 0.0))
  }

  test("minhashBandSweep: nested candidate sets, monotone cost and recall down the ladder") {
    val d = Tables.documents(spark, sf0001)
    val got = Dedup.minhashBandSweep(d, "doc_id", "text", 16, Seq(1, 2, 4),
        0.8, Dedup.PolyHash)
      .orderBy("rows_per_band").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == Seq(1, 2, 4))
    assert(got.map(_._2).toSeq == Seq(16, 8, 4))
    // a pair sharing an r-row band shares every 1-row sub-band: candidate
    // sets nest, so counts and recall are monotone non-increasing in r
    assert(got.map(_._3).toSeq == got.map(_._3).sortBy(-_).toSeq)
    assert(got.map(_._4).toSeq == got.map(_._4).sortBy(-_).toSeq)
    got.foreach { case (_, _, nCand, nPairs, recall) =>
      assert(nPairs <= nCand && recall >= 0.0 && recall <= 1.0)
    }
    // identical duplicate docs collide in every band: r=1 recall is 1.0
    // only if the fixture's exact dups dominate; assert nonzero instead
    assert(got.head._5 > 0.0)
  }

  test("appendMinhashIndex: write(A) + append(B) ≡ write(A ∪ B) for the probe") {
    val d = Tables.documents(spark, sf0001)
    val bucket = Dedup.polyHash(concat(col("text"), lit("|graft-split-42"))) % 100
    val a = d.where(bucket < 60)
    val b = d.where(bucket >= 60 && bucket < 90)
    val probeDocs = d.where(bucket >= 90)
    val p1 = java.nio.file.Files.createTempDirectory("graft_idx_app1").toString
    val p2 = java.nio.file.Files.createTempDirectory("graft_idx_app2").toString
    try {
      Dedup.writeMinhashIndex(a, "doc_id", "text", 16, 2, Dedup.PolyHash, p1)
      Dedup.appendMinhashIndex(b, "doc_id", "text", 16, 2, Dedup.PolyHash, p1)
      Dedup.writeMinhashIndex(a.unionAll(b), "doc_id", "text", 16, 2,
        Dedup.PolyHash, p2)
      def probe(p: String) =
        Dedup.probeMinhashIndex(p, probeDocs, "doc_id", "text", 16, 2, 0.6,
          Dedup.PolyHash).as[(Long, Long, Double)].collect().toSet
      assert(probe(p1) == probe(p2))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p1))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p2))
    }
  }

  test("persisted minhash index: written-index probe ≡ in-plan incremental, sf data") {
    val d = Tables.documents(spark, sf0001)
    val bucket = Dedup.polyHash(concat(col("text"), lit("|graft-split-42"))) % 100
    val existing = d.where(bucket < 80)
    val incoming = d.where(bucket >= 80 && bucket < 90)
    val path = java.nio.file.Files
      .createTempDirectory("graft_idx_spec").toString
    try {
      Dedup.writeMinhashIndex(existing, "doc_id", "text", 16, 2,
        Dedup.PolyHash, path)
      val fromIndex = Dedup.probeMinhashIndex(path, incoming, "doc_id",
        "text", 16, 2, 0.6, Dedup.PolyHash)
        .as[(Long, Long, Double)].collect().toSet
      val inPlan = Dedup.incrementalMinhashDups(existing, incoming,
        "doc_id", "text", 16, 2, 0.6, Dedup.PolyHash)
        .as[(Long, Long, Double)].collect().toSet
      assert(fromIndex == inPlan,
        s"round-tripped index diverged: ${fromIndex.diff(inPlan)} vs ${inPlan.diff(fromIndex)}")
      assert(fromIndex.nonEmpty, "vacuous: split produced no near-dup pairs")
      // a SECOND batch probes the SAME stored index - no index rebuild
      val batch2 = d.where(bucket >= 90)
      val fromIndex2 = Dedup.probeMinhashIndex(path, batch2, "doc_id",
        "text", 16, 2, 0.6, Dedup.PolyHash)
        .as[(Long, Long, Double)].collect().toSet
      val inPlan2 = Dedup.incrementalMinhashDups(existing, batch2,
        "doc_id", "text", 16, 2, 0.6, Dedup.PolyHash)
        .as[(Long, Long, Double)].collect().toSet
      assert(fromIndex2 == inPlan2)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("bloomContamination: superset of exact coverage, tight at generous sizing") {
    val d = Tables.documents(spark, sf0001)
    val bucket = Dedup.polyHash(concat(col("text"), lit("|graft-split-42"))) % 100
    val train = d.where(bucket < 80)
    val eval = d.where(bucket >= 90)
    // exact train-side coverage: fraction of a train doc's shingles
    // present anywhere in the eval shingle set
    val te = Dedup.shingleEdges(train, "doc_id", "text")
    val ee = Dedup.shingleEdges(eval, "doc_id", "text")
      .select("shingle").distinct()
    val exact = te.join(ee, Seq("shingle")).groupBy("doc_id")
      .agg(count(lit(1)).as("n_in"))
      .join(te.groupBy("doc_id").agg(count(lit(1)).as("n_sh")), Seq("doc_id"))
      .where(col("n_in") / col("n_sh") >= 0.3)
      .select("doc_id").as[Long].collect().toSet
    // generous sizing: FP ~0 -> flagged set should EQUAL exact here,
    // and must be a superset at ANY sizing (no false negatives)
    val roomy = Dedup.bloomContamination(train, eval, "doc_id", "text",
      2048, 3, 0.3).select("doc_id").as[Long].collect().toSet
    assert(exact.subsetOf(roomy) && roomy == exact,
      s"generous bloom diverged: exact=$exact got=$roomy")
    // starved sizing (63*8 bits for ~hundreds of shingles): saturation
    // inflates coverage but can never LOSE a genuinely covered doc
    val tiny = Dedup.bloomContamination(train, eval, "doc_id", "text",
      8, 3, 0.3).select("doc_id").as[Long].collect().toSet
    assert(exact.subsetOf(tiny), s"bloom lost true positives: $exact vs $tiny")
  }

  test("sharded GEMM cosine pairs ≡ declarative plan, bit for bit, any block count") {
    val emb = Tables.embeddings(spark, sf0001)
    val ref = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", 0.3)
    assert(ref.count() > 0)
    // B=1 (single diagonal block), B=3 (ids don't split evenly), B=8 (default)
    for (b <- Seq(1, 3, 8)) {
      val sharded = Dedup.embeddingCosinePairsSharded(emb, "vec_id", "embedding", 0.3, b)
      assert(sharded.exceptAll(ref).count() == 0 && ref.exceptAll(sharded).count() == 0,
        s"numBlocks=$b diverged from the declarative reference")
    }
  }

  test("embeddingLshPairs: identical vectors collide in every band") {
    val emb = Seq(
      (1L, Seq(0.5f, 0.5f, -0.5f, 0.25f)),
      (2L, Seq(0.5f, 0.5f, -0.5f, 0.25f)),
      (3L, Seq(-0.5f, -0.5f, 0.5f, -0.25f))) // antipodal: no shared bucket
      .toDF("vec_id", "embedding")
    val got = Dedup.embeddingLshPairs(emb, "vec_id", "embedding", 0.9, 2, 2, 4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("embeddingCosinePairs: parallel vectors pair up, orthogonal don't") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(2.0f, 0.0f, 0.0f)),   // cos(1,2) = 1
      (3L, Seq(0.0f, 1.0f, 0.0f))    // orthogonal
    ).toDF("vec_id", "embedding")
    val got = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("pageRank: symmetry, hub dominance, mass conservation, partition-independence") {
    // triangle 1-2-3 with pendant 4 hanging off 3
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val got = Dedup.pageRank(pairs, 3).as[(Long, Long)].collect().toMap
    val g = Dedup.PageRankGrid
    // symmetric nodes rank identically — the integer arithmetic cannot
    // break a graph symmetry
    assert(got(1L) == got(2L))
    // the hub outranks everyone; the pendant leans entirely on the hub
    assert(got(3L) > got(1L) && got(3L) > got(4L))
    // total mass stays ~1.0: each truncating DIV sheds < 1 grid unit
    val lost = g - got.values.sum
    assert(lost >= 0 && lost < 100L, s"mass drifted by $lost grid units")
    // bit-identical under re-partitioning (integer sums are order-free)
    val again = Dedup.pageRank(pairs.repartition(7, col("doc_a")), 3)
      .as[(Long, Long)].collect().toMap
    assert(again == got)
  }

  test("pageRank: zero iterations = uniform prior") {
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val got = Dedup.pageRank(pairs, 0).as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(Dedup.PageRankGrid / 4))
  }

  private val sigCorpus = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "alpha beta gamma delta epsilon"), // identical -> cos exactly 1.0
    (3L, "alpha beta gamma delta zeta"),    // 4/5 signature terms shared
    (4L, "one two three four five")         // no shared terms at all
  ).toDF("doc_id", "text")

  test("tfidfCosinePairs: identical signatures score exactly 1.0") {
    val got = Dedup.tfidfCosinePairs(sigCorpus, "doc_id", "text", k = 5, tau = 0.0)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // doc 4 shares no vocabulary: never joins into a pair
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    assert(got((1L, 2L)) == 1.0)
    // 1-3 share only the low-IDF common terms; the differing term is the
    // HIGH-idf one, so the weighted score is far below jaccard's 4/6
    assert(got((1L, 3L)) > 0.2 && got((1L, 3L)) < 0.3)
    assert(got((1L, 3L)) == got((2L, 3L))) // identical docs score alike
  }

  test("tfidfCosinePairs: tau thresholds and k truncates the signature") {
    val strict = Dedup.tfidfCosinePairs(sigCorpus, "doc_id", "text", 5, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(strict == Set((1L, 2L)))
    // k=1 keeps only each doc's single top term: docs 1/2 keep 'epsilon',
    // doc 3 keeps 'zeta' -> only the identical pair survives even at tau=0
    val k1 = Dedup.tfidfCosinePairs(sigCorpus, "doc_id", "text", 1, 0.0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(k1 == Set((1L, 2L)))
  }

  test("tfidfCosinePairs: df cap — high cap ≡ exact, cap 1 starves shared signatures") {
    val exact = Dedup.tfidfCosinePairs(sigCorpus, "doc_id", "text", 5, 0.0)
    val high = Dedup.tfidfCosinePairs(sigCorpus, "doc_id", "text", 5, 0.0,
      maxDf = Some(1000))
    assert(high.exceptAll(exact).isEmpty && exact.exceptAll(high).isEmpty)
    // every SHARED term has df >= 2 by definition, so cap 1 keeps only
    // unshared terms in signatures — no pair can form
    val starved = Dedup.tfidfCosinePairs(sigCorpus, "doc_id", "text", 5, 0.0,
      maxDf = Some(1))
    assert(starved.count() == 0)
  }

  test("leakage-safe split: zero cross-split pairs, full partition, cluster-atomic") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("ext_split_leakfree")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the whole point: no near-dup pair straddles splits
    assert(out.forall(_._4 == 0L),
      s"cross-split near-dup pairs leaked: ${out.mkString(", ")}")
    // splits partition the corpus exactly
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(out.map(_._2).sum == nDocs)
    assert(out.map(_._1).toSet.subsetOf(Set("train", "val", "test")))
    // every component lives in exactly one split: per-split component
    // counts sum to the global distinct-component count
    val comp = graft.operators.Dedup.connectedComponents(
      graft.operators.Dedup.minhashLshPairs(
        Tables.documents(spark, sf0001), "doc_id", "text", 16, 2, 0.8,
        graft.operators.Dedup.PolyHash).select("doc_a", "doc_b"),
      4, broadcastLabels = true)
    val nComponents = Tables.documents(spark, sf0001).select("doc_id")
      .join(comp, Seq("doc_id"), "left")
      .select(coalesce(col("component"), col("doc_id"))).distinct().count()
    assert(out.map(_._3).sum == nComponents,
      "a component was counted in two splits — cluster atomicity broken")
  }

  test("kCore: K4 survives 2/3-core, chain peels empty, triangle holds at 2 only") {
    import spark.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    // complete graph on 4: every node has degree 3 — intact at k=2 and 3
    assert(Dedup.kCore(k4, 2, 4).count() == 4)
    val c3 = Dedup.kCore(k4, 3, 4).collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(c3.length == 4 && c3.forall(_._2 == 3))
    // a path has endpoints of degree 1 — peeling unravels it completely
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("doc_a", "doc_b")
    assert(Dedup.kCore(chain, 2, 4).count() == 0)
    // triangle with a pendant: the pendant (and only it) peels at k=2;
    // nothing survives k=3
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val core2 = Dedup.kCore(tri, 2, 4).collect().map(_.getLong(0)).sorted
    assert(core2.toSeq == Seq(1L, 2L, 3L))
    assert(Dedup.kCore(tri, 3, 4).count() == 0)
  }

  test("detectorPrf: derived capped set ≡ standalone pipeline; subset detectors at precision 1") {
    val prf = SparkEntry.queries("ext_dedup_prf")(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(prf.keySet == Set("minhash", "simhash", "jaccard_capped"))
    // minhash and capped verify exactly against their own truth, so
    // every reported pair is a true pair (hit = det, precision 1)
    assert(prf("minhash")._3 == prf("minhash")._2)
    assert(prf("jaccard_capped")._3 == prf("jaccard_capped")._2)
    // hits can never exceed the truth
    assert(prf.values.forall { case (t, _, h) => h <= t })
    // the survivor-only derivation of the capped set must equal the
    // standalone rare-self-join pipeline (same tau/maxDf as the query)
    val standalone = graft.operators.Dedup.jaccardPairsCapped(
      Tables.documents(spark, sf0001), "doc_id", "text", 0.5, 20).count()
    assert(prf("jaccard_capped")._2 == standalone,
      s"derived capped ${prf("jaccard_capped")._2} != standalone $standalone")
  }

  test("canonical selection: one survivor per component, at the component's max quality") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("ext_dedup_canonical")(spark, sf0001)
      .localCheckpoint()
    val perComp = out.groupBy("component").agg(
      sum("is_canonical").as("n_canon"), max("quality").as("qmax"))
    assert(perComp.where(col("n_canon") =!= 1).count() == 0,
      "a component has zero or multiple canonicals")
    assert(out.where(col("is_canonical") === 1)
      .join(perComp, Seq("component"))
      .where(col("quality") =!= col("qmax")).count() == 0,
      "a canonical is not at its component's max quality")
    // every document receives a verdict
    assert(out.count() == Tables.documents(spark, sf0001).count())
  }

  test("tfidfCosinePairs: top-k rank filter compiles to WindowGroupLimit") {
    val plan = Dedup.tfidfCosinePairs(Tables.documents(spark, sf0001),
        "doc_id", "text", 5, 0.9, materialize = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "signature top-k must prune map-side before the doc_id shuffle")
  }

  test("editVerifiedPairs: edit distance separates in-place edits from reshuffles") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i x"), // one word replaced: lev = 1
      (3L, "j i h g f e d c b a"), // same words reversed: high lev
      (4L, "p q r s t u v w x y")  // unrelated
    ).toDF("doc_id", "text")
    val got = Dedup.editVerifiedPairs(corpus, "doc_id", "text",
        numPerm = 16, rowsPerBand = 2, simTau = 0.5, maxChars = 4000,
        Dedup.PolyHash)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.contains((1L, 2L)), "the in-place edit pair must survive")
    val (lev, sim) = got((1L, 2L))
    assert(lev == 1L)
    // 19 chars, 1 edit: 1 - 1/19 rounded at 6
    assert(sim == BigDecimal(1.0 - 1.0 / 19)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // the reversal (3) shares NO 3-gram shingles with (1) — identical
    // word multiset, zero shingle overlap -> never even a candidate;
    // the unrelated doc must not appear either
    assert(!got.keys.exists(k => k._1 == 3L || k._2 == 3L || k._1 == 4L || k._2 == 4L))
  }

  test("dupShingleCoverage: full coverage for clones, zero for unique docs") {
    val corpus = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"),  // clone: every shingle duplicated
      (3L, "p q r s t u")   // unique: nothing duplicated
    ).toDF("doc_id", "text")
    val got = Dedup.dupShingleCoverage(corpus, "doc_id", "text", minDf = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) == ((4L, 4L, 1.0)))
    assert(got(2L) == ((4L, 4L, 1.0)))
    assert(got(3L) == ((4L, 0L, 0.0)))
  }

  test("dupShingleCoverage: df shuffle is planned once (ReusedExchange)") {
    val df = Dedup.dupShingleCoverage(Tables.documents(spark, sf0001),
      "doc_id", "text", 2)
    // AQE applies exchange reuse at stage materialization — execute
    // first, then read the FINAL adaptive plan
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      "both sides of the df join must read ONE shingle-partitioned exchange")
  }

  test("minhashPrCurve: exact duplicate survives every threshold, ladder monotone") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"), // exact dup of 1: jaccard 1, m = 16
      (3L, "x y z w q r s t")  // disjoint: never truth, never candidate with 1/2
    ).toDF("doc_id", "text")
    val ks = Seq(6, 8, 10, 12, 14)
    val out = Dedup.minhashPrCurve(docs, "doc_id", "text", 16, 2, 80, ks,
        Dedup.PolyHash)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == ks.map(_ / 16.0))
    // the identical pair has all 16 perms matching -> detected at every
    // k, and it is the only truth pair
    out.foreach { case (_, nDet, nHit, nTruth, prec, rec, f1) =>
      assert(nTruth == 1L && nHit == 1L)
      assert(nDet >= 1L && prec <= 1.0 && rec == 1.0 && f1 <= 1.0)
    }
    // raising the threshold can only shrink the detector set
    assert(out.map(_._2).sliding(2).forall(p => p.head >= p.last))
  }
}
