package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling: exact quotas, partition-independent
  * draws, salt-independent draws, and the WindowGroupLimit scale shape.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf0001)

  test("exact quotas per stratum; small strata taken whole") {
    val got = Sampling.stratified(docs, Seq("lang", "source"),
      "doc_id", "text", lit(3), "|s1")
    val sizes = got.groupBy("lang", "source").count()
    assert(sizes.where(col("count") > 3).count() == 0)
    val strata = docs.groupBy("lang", "source")
      .agg(count(lit(1)).as("n"))
    // every stratum is represented with min(n, 3) rows
    val joined = sizes.join(strata, Seq("lang", "source"), "full")
    assert(joined.where(col("count") =!= least(col("n"), lit(3))).count() == 0)
  }

  test("draw is partition-independent and rank is stable") {
    val a = Sampling.stratified(docs, Seq("lang"), "doc_id", "text", lit(5), "|s2")
      .select("lang", "smp_rank", "doc_id")
    val b = Sampling.stratified(docs.repartition(7, col("doc_id")),
        Seq("lang"), "doc_id", "text", lit(5), "|s2")
      .select("lang", "smp_rank", "doc_id")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("different salts give (near-)independent draws") {
    val a = Sampling.stratified(docs, Seq("lang"), "doc_id", "text", lit(5), "|s3")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.stratified(docs, Seq("lang"), "doc_id", "text", lit(5), "|s4")
      .select("doc_id").as[Long].collect().toSet
    assert(a != b, "two salts drew the identical sample — the salt is dead")
  }

  test("rank filter compiles to WindowGroupLimit (map-side top-k pruning)") {
    val plan = Sampling.stratified(docs, Seq("lang"), "doc_id", "text", lit(3), "|s5")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected rank-limit pushdown in:\n$plan")
  }

  test("weighted quota + quotaCap: pushdown restored, same rows as uncapped") {
    // a dynamic quota expression alone defeats the rank-limit pushdown
    // (literal bounds only); the cap conjunct brings it back without
    // changing results
    val q = when(col("source") === "src0", 4).otherwise(2)
    val uncapped = Sampling.stratified(docs, Seq("lang", "source"),
      "doc_id", "text", q, "|s6")
    val capped = Sampling.stratified(docs, Seq("lang", "source"),
      "doc_id", "text", q, "|s6", quotaCap = Some(4))
    assert(!uncapped.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    assert(capped.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    assert(capped.exceptAll(uncapped).count() == 0 &&
      uncapped.exceptAll(capped).count() == 0)
  }

  test("packSequences: concat-then-chunk arithmetic, hand-checked") {
    // one stratum, force the draw order to the id order by checking
    // invariants that hold under ANY order: total unit conservation,
    // contiguous pack ids from 0, every non-final pack filled to >=
    // budget by its docs plus its spanning doc's overflow
    val df = Seq((1L, "g", 4L), (2L, "g", 4L), (3L, "g", 4L))
      .toDF("doc_id", "grp", "n")
    val got = Sampling.packSequences(df, Seq("grp"), "doc_id", "n", 10L, "|p1")
      .select("doc_id", "pack_id", "spans_next")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    // cum prefix per draw order: first two docs fit window 0 (prefix 0, 4),
    // the third starts at prefix 8 < 10 -> pack 0 but ends at 12 -> spans
    assert(got.map(_._2).toSet == Set(0L), s"all three start in pack 0: $got")
    assert(got.count(_._3 == 1) == 1, s"exactly one doc crosses the boundary: $got")
  }

  test("packSequences: packs are contiguous, conserve units, deterministic") {
    val packed = Sampling.packSequences(docs, Seq("lang"), "doc_id", "n_chars",
      4096L, "|p2")
    // unit conservation: no doc lost or duplicated
    assert(packed.count() == docs.count())
    // pack ids contiguous 0..max per lang (concat-then-chunk leaves no gap)
    val gaps = packed.groupBy("lang")
      .agg(countDistinct(col("pack_id")).as("n"), max(col("pack_id")).as("mx"))
      .where(col("n") =!= col("mx") + 1)
    assert(gaps.count() == 0)
    // partition-independence
    val again = Sampling.packSequences(docs.repartition(5, col("doc_id")),
      Seq("lang"), "doc_id", "n_chars", 4096L, "|p2")
      .select("doc_id", "pack_id", "spans_next")
    assert(again.exceptAll(packed.select("doc_id", "pack_id", "spans_next")).count() == 0)
  }

  test("chunkDocuments: window arithmetic, overlap, trailing-chunk rule, no shuffle") {
    // 10 tokens, chunk 4, overlap 1 (stride 3): windows at 0,3,6 cover
    // 1-4, 4-7, 7-10; a window at 9 would add nothing past the overlap
    val doc = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")).toDF("doc_id", "text")
    val got = Sampling.chunkDocuments(doc, "doc_id", "text", 4, 1)
      .orderBy("chunk_id")
      .as[(Long, Int, Int, String)].collect()
    assert(got.map(_._4).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(got.map(_._3).toSeq == Seq(4, 4, 4))
    // consecutive chunks share exactly `overlap` tokens
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._4.split(' ').last == b._4.split(' ').head)
    }
    // trailing rule: 11 tokens DOES need a 4th window (9+1 < 11)
    val doc11 = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11")).toDF("doc_id", "text")
    val got11 = Sampling.chunkDocuments(doc11, "doc_id", "text", 4, 1)
    assert(got11.count() == 4)
    // a short doc yields exactly one (partial) chunk
    val short = Sampling.chunkDocuments(
      Seq((2L, "a b")).toDF("doc_id", "text"), "doc_id", "text", 4, 1)
      .as[(Long, Int, Int, String)].collect()
    assert(short.toSeq == Seq((2L, 0, 2, "a b")))
    // corpus-scale: coverage conserves every token position, plan is
    // a pure projection+explode (no Exchange)
    val corpus = Sampling.chunkDocuments(
      Tables.documents(spark, sf0001), "doc_id", "text", 32, 8)
    val n = Tables.documents(spark, sf0001)
      .select(sum(size(split(col("text"), " ")))).as[Long].head()
    val covered = corpus.select(
      sum(col("n_tokens")) - sum(when(col("chunk_id") > 0, 8).otherwise(0)))
      .as[Long].head()
    assert(covered == n, s"token coverage $covered != corpus mass $n")
    assert(!corpus.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("domainDivergence: 0 for a lone domain, 1 - n_d/n for disjoint vocab") {
    // single domain: its distribution IS the corpus distribution -> TV 0
    val lone = Seq((1L, "only", "a b a c")).toDF("doc_id", "source", "text")
    val tv0 = Sampling.domainDivergence(lone, "source", col("text"))
      .as[(String, Long, Double)].collect().head
    assert(tv0._2 == 4L && tv0._3 == 0.0)
    // disjoint vocabularies: TV(d) = 1 - n_d/n exactly
    // A = "a a a" (3 tokens), B = "b" (1 token) -> TV(A)=0.25, TV(B)=0.75
    val two = Seq((1L, "A", "a a a"), (2L, "B", "b")).toDF("doc_id", "source", "text")
    val got = Sampling.domainDivergence(two, "source", col("text"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got("A") == 0.25 && got("B") == 0.75, s"got $got")
    // real data: TV strictly within (0, 1) for every source
    val real = Sampling.domainDivergence(
      Tables.documents(spark, sf0001), "source", col("text"))
      .as[(String, Long, Double)].collect()
    assert(real.nonEmpty && real.forall(r => r._3 > 0.0 && r._3 < 1.0))
  }

  test("perplexityBands: bands partition each stratum, kept=middle, lp ranges ordered") {
    val bands = Sampling.perplexityBands(docs, "lang", "doc_id", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(4), r.getDouble(5), r.getInt(6)))
      .toMap
    // kept flag is exactly the middle band
    bands.foreach { case ((_, band), (_, _, _, kept)) =>
      assert((kept == 1) == (band == "middle"), s"$band kept=$kept")
    }
    // per lang: band doc counts sum to the scored-doc count (docs with
    // >= 2 tokens score; the fixture's docs all do)
    val scored = docs.where(size(split(col("text"), " ")) >= 2)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    scored.foreach { case (lang, n) =>
      val got = bands.collect { case ((l, _), (nd, _, _, _)) if l == lang => nd }.sum
      assert(got == n, s"$lang: bands sum $got != $n docs")
    }
    // head holds the HIGHEST log-probs (lowest perplexity): ranges are
    // ordered and non-overlapping across bands (histogram buckets are
    // distinct values)
    scored.keys.foreach { lang =>
      for (Seq(hi, lo) <- Seq("head", "middle", "tail").sliding(2))
        (bands.get((lang, hi)), bands.get((lang, lo))) match {
          case (Some((_, hiMin, _, _)), Some((_, _, loMax, _))) =>
            assert(hiMin > loMax, s"$lang: $hi min <= $lo max")
          case _ => // a band can be empty in a tiny stratum
        }
    }
  }

  test("mixtureWeights: shares sum to 1, sqrt flattens head and lifts tail") {
    val corpus = Seq.tabulate(120) { i =>
      // head domain = 100 docs of 9 tokens, tail = 20 docs of 4 tokens
      if (i < 100) (i.toLong, "head", "a b c d e f g h i")
      else (i.toLong, "tail", "a b c d")
    }.toDF("doc_id", "source", "text")
    val w = Sampling.mixtureWeights(corpus, "source", col("text"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val (hTok, hRaw, hTemp, hBoost) = w("head")
    val (tTok, tRaw, tTemp, tBoost) = w("tail")
    assert(hTok == 900L && tTok == 80L)
    assert(math.abs(hRaw + tRaw - 1.0) < 1e-6 && math.abs(hTemp + tTemp - 1.0) < 1e-6)
    // temperature compresses: head loses share (boost < 1), tail gains
    assert(hTemp < hRaw && tTemp > tRaw)
    assert(hBoost < 1.0 && tBoost > 1.0)
    // ordering by mass is preserved (flattened, not inverted)
    assert(hTemp > tTemp)
    // partition-independence of the integer-grid normalizer
    val w8 = Sampling.mixtureWeights(corpus.repartition(8), "source", col("text"))
    assert(w8.exceptAll(Sampling.mixtureWeights(corpus, "source", col("text"))).isEmpty)
  }

  test("valueDeciles: counts conserved, buckets ordered and value-disjoint") {
    val scored = docs.select(col("lang"), (col("doc_id") % 97).as("q"))
    val dec = Sampling.valueDeciles(scored, "lang", col("q"))
    // per-stratum doc counts conserved
    val got = dec.groupBy("lang").agg(sum("n_docs").as("n"))
      .as[(String, Long)].collect().toMap
    val want = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(got == want)
    // buckets in 1..10, and within a stratum value ranges are disjoint
    // and DESCENDING in the decile number (decile 1 = best values)
    val rows = dec.select("lang", "decile", "max_q", "min_q")
      .as[(String, Int, Long, Long)].collect()
    assert(rows.forall(r => r._2 >= 1 && r._2 <= 10))
    rows.groupBy(_._1).values.foreach { rs =>
      rs.sortBy(_._2).sliding(2).foreach {
        case Array(hi, lo) => assert(hi._4 > lo._3,
          s"decile ${hi._2} range must sit wholly above decile ${lo._2}")
        case _ =>
      }
    }
  }

  test("valueDeciles: a single hot value collapses into one bucket") {
    val tied = docs.select(col("lang"), lit(5L).as("q"))
    val dec = Sampling.valueDeciles(tied, "lang", col("q"))
      .as[(String, Int, Long, Long, Long)].collect()
    // every stratum: exactly one bucket, number 10 (value-based buckets
    // never split ties), holding all rows
    assert(dec.forall(_._2 == 10))
    val want = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(dec.map(r => r._1 -> r._3).toMap == want)
  }

  test("robustFences: histogram order-stat quartiles ≡ builtin percentile") {
    // events.value is effectively continuous — the histogram degenerates
    // to one row per value, the worst case for the order-stat read-off,
    // so agreement here means the interpolation is exactly type-7
    val ev = Tables.events(spark, sf0001)
    val got = Sampling.robustFences(ev, "event_type", col("value"))
      .select("event_type", "q1", "q3")
    val want = ev.groupBy("event_type").agg(
      round(expr("percentile(value, 0.25)"), 6).as("q1"),
      round(expr("percentile(value, 0.75)"), 6).as("q3"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("robustFences: hand-checked fences and outlier counts") {
    val df = (Seq.fill(10)(10L) ++ Seq.fill(10)(20L) ++ Seq(1000L))
      .map(("a", _)).toDF("g", "v")
    // n=21: h25=5 -> q1=10, h75=15 -> q3=20, IQR=10 -> fences [-5, 35]
    val got = Sampling.robustFences(df, "g", col("v"))
      .as[(String, Double, Double, Double, Double, Long, Long, Long)]
      .collect().head
    assert(got == (("a", 10.0, 20.0, -5.0, 35.0, 0L, 1L, 21L)))
  }

  test("valueDeciles: windows run over the histogram, not raw rows") {
    val dec = Sampling.valueDeciles(
      docs.select(col("lang"), col("doc_id").as("q")), "lang", col("q"))
    val plan = dec.queryExecution.executedPlan.toString
    // the aggregate that builds the histogram must sit BELOW the first
    // window: a Window directly over the scan would serialize each
    // stratum through one task at corpus scale
    val firstWindow = plan.indexOf("Window")
    val firstAgg = plan.indexOf("HashAggregate")
    assert(firstWindow >= 0 && firstAgg >= 0,
      s"expected both Window and HashAggregate in: $plan")
    // executedPlan prints top-down: the aggregate appearing AFTER the
    // window in the text means it executes BEFORE it (it is deeper)
    assert(plan.lastIndexOf("HashAggregate") > firstWindow,
      "histogram aggregate must feed the cumulative window")
  }

  test("epochSchedule: hand-checked budget split; repeats small, subsamples big") {
    // tokens: big = 9, small = 1; sqrt shares s = 3e6 / 1e6
    val two = Seq(("big", "w w w w w w w w w"), ("small", "w"))
      .toDF("source", "text")
    val got = Sampling.epochSchedule(two, "source", col("text"), 1)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // budget 10: big gets 10*3/4 = 7 (floor), small 10*1/4 = 2
    assert(got("big") == (("big", 9L, 7L, 1L, 0.777778)))
    assert(got("small") == (("small", 1L, 2L, 2L, 2.0)))
    // real corpus: targets never exceed the budget; every nonempty
    // domain is drawn at least once
    val real = Tables.documents(spark, sf0001)
    val sched = Sampling.epochSchedule(real, "source", col("text"), 2)
      .as[(String, Long, Long, Long, Double)].collect()
    val totalTokens = sched.map(_._2).sum
    assert(sched.map(_._3).sum <= 2L * totalTokens)
    sched.foreach { r =>
      assert(r._4 >= 1L, s"domain ${r._1} never drawn")
      // epochs is the ceiling of the repetition ratio
      assert(r._4 == math.ceil(r._3.toDouble / r._2).toLong)
    }
  }

  test("snapshotDiff: all four statuses on a hand-built vintage pair") {
    import spark.implicits._
    val prev = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("doc_id", "text")
    val cur = Seq((2L, "two"), (3L, "three revised"), (4L, "four"))
      .toDF("doc_id", "text")
    val got = Sampling.snapshotDiff(prev, cur, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(got == Map("removed" -> 1L, "unchanged" -> 1L,
      "changed" -> 1L, "added" -> 1L))
  }

  test("ext_split_kfold: folds partition each stratum, audit matches the HOF hash twin") {
    val got = SparkEntry.queries("ext_split_kfold")(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // independent recompute through polyHashFold (the built-in-HOF twin of
    // the native kernel the query uses) — same fold iff the hashes agree
    val folds = docs
      .select(col("lang"),
        (graft.operators.Dedup.polyHashFold(
          concat(col("doc_id").cast("string"), lit("|graft-kfold-7"))) % 5)
          .as("fold"))
      .groupBy("lang", "fold").agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect()
    assert(got.keySet == folds.map(_._1).toSet)
    folds.groupBy(_._1).foreach { case (lang, xs) =>
      val cs = xs.map(_._3)
      val (_, nDocs, used, mn, mx, ppm) = got(lang)
      assert(nDocs == cs.sum, s"$lang: folds must partition the stratum")
      assert(used == xs.length)
      assert(mn == (if (xs.length < 5) 0L else cs.min) && mx == cs.max)
      assert(ppm == (mx - mn) * 1000000L / nDocs)
    }
  }
}
