package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with SparkTestSession {

  private lazy val docs = graft.Tables.documents(spark, sf)
    .select(col("doc_id"), col("lang")).cache()

  test("hashSample is deterministic and close to the requested rate") {
    val a = Sampling.hashSample(docs, "doc_id", 0.3).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs, "doc_id", 0.3).collect().map(_.getLong(0)).toSet
    assert(a === b, "same rate must keep the same ids on every run")
    val total = docs.count().toDouble
    assert(math.abs(a.size / total - 0.3) < 0.1,
      s"sampled ${a.size}/$total, expected ~30%")
    // rate monotonicity: a smaller rate keeps a SUBSET (nested samples)
    val smaller = Sampling.hashSample(docs, "doc_id", 0.1).collect().map(_.getLong(0)).toSet
    assert(smaller.subsetOf(a), "samples must be nested as the rate grows")
  }

  test("hashSample boundary rates keep nothing / everything") {
    assert(Sampling.hashSample(docs, "doc_id", 0.0).count() === 0)
    assert(Sampling.hashSample(docs, "doc_id", 1.0).count() === docs.count())
  }

  test("stratifiedSample applies per-stratum rates and drops unlisted strata") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.0))
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enTotal = docs.filter(col("lang") === "en").count()
    assert(byLang.getOrElse("en", 0L) === enTotal, "rate 1.0 keeps every row")
    assert(!byLang.contains("de"), "rate 0.0 keeps none")
    assert(byLang.keySet === Set("en"), "unlisted strata are dropped")
  }

  test("tokenBudgetSample meets budgets, keeps null strata, and rejects __tbs_ columns") {
    import spark.implicits._
    // small deterministic corpus: 40 rows/stratum × 10 tokens, one NULL stratum
    val rows = (0L until 120L).map { i =>
      val st = i % 3 match { case 0 => "a"; case 1 => "b"; case _ => null }
      (i, st, 10L)
    }.toDF("id", "st", "toks")
    val budget = coalesce(
      when(col("st") === "a", lit(100L)).when(col("st") === "b", lit(0L)),
      lit(50L)) // null stratum budgeted via coalesce
    val kept = Sampling.tokenBudgetSample(rows, "id", "st", "toks", budget)
    val byStratum = kept.groupBy("st").agg(sum("toks").as("t")).collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // coverage >= budget (first crossing bucket kept), bounded by one extra bucket
    assert(byStratum(Some("a")) >= 100L && byStratum(Some("a")) <= 110L,
      s"stratum a: ${byStratum.get(Some("a"))}")
    assert(!byStratum.contains(Some("b")), "zero budget keeps nothing")
    assert(byStratum(None) >= 50L && byStratum(None) <= 60L,
      "null stratum must survive the null-safe filter-back join: " +
        s"${byStratum.get(None)}")
    // determinism: the same rows survive on re-evaluation
    val again = Sampling.tokenBudgetSample(rows, "id", "st", "toks", budget)
    assert(kept.select("id").except(again.select("id")).count() === 0)
    // schema untouched, temp columns gone
    assert(kept.columns.toSeq === Seq("id", "st", "toks"))
    // reserved-prefix guard fires instead of silently clobbering
    val clash = rows.withColumn("__tbs_bucket", lit(1))
    assertThrows[IllegalArgumentException] {
      Sampling.tokenBudgetSample(clash, "id", "st", "toks", budget)
    }
  }

  test("assignSplit partitions every row exactly once with stable membership") {
    val split = Sampling.assignSplit(docs, "doc_id", valPct = 0.1, testPct = 0.1)
    assert(split.count() === docs.count())
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum === docs.count())
    val total = docs.count().toDouble
    assert(counts("train") / total > 0.7, s"train share too small: $counts")
    // membership is a pure function of the id: re-assignment identical
    val again = Sampling.assignSplit(docs, "doc_id", valPct = 0.1, testPct = 0.1)
    assert(split.select("doc_id", "split").except(
      again.select("doc_id", "split")).count() === 0)
  }

  test("leakageSafeSplit keeps duplicate clusters whole; id-keyed split leaks on the same corpus") {
    import spark.implicits._
    val texts = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    // exact copies under fresh ids: ids hash independently, content doesn't
    val aug = texts.unionByName(texts.filter(col("doc_id") < 100)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val safe = Sampling.leakageSafeSplit(aug, "doc_id", md5(col("text")))
    assert(safe.count() === aug.count(), "split must keep every row exactly once")
    val straddling = safe.groupBy(md5(col("text")).as("fp"))
      .agg(countDistinct(col("split")).as("k")).filter(col("k") > 1).count()
    assert(straddling === 0, "no duplicate cluster may straddle splits")
    // the invariant is not vacuous: the id-keyed split DOES leak here
    val leaky = Sampling.assignSplit(aug, "doc_id").groupBy(md5(col("text")).as("fp"))
      .agg(countDistinct(col("split")).as("k")).filter(col("k") > 1).count()
    assert(leaky > 0, "corpus must contain clusters an id-keyed split separates")
    // originals (no copies) get their plain assignSplit membership: the
    // representative of a singleton cluster is the row itself
    val lone = texts.filter(col("doc_id") >= 100)
    val a = Sampling.leakageSafeSplit(lone, "doc_id", md5(col("text")))
      .select("doc_id", "split")
    val b = Sampling.assignSplit(lone, "doc_id").select("doc_id", "split")
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      "singleton clusters must match the id-keyed assignment")
  }

  test("temperatureSample up-weights small strata and stays deterministic") {
    val kept = Sampling.temperatureSample(docs, "doc_id", "lang", targetFrac = 0.5)
    val keptBy = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalBy = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = totalBy.map { case (l, n) =>
      l -> keptBy.getOrElse(l, 0L).toDouble / n }
    val largest = totalBy.maxBy(_._2)._1
    val smallest = totalBy.minBy(_._2)._1
    assert(rates(smallest) > rates(largest),
      s"α=0.5 must keep a larger FRACTION of the smallest stratum: $rates vs sizes $totalBy")
    // overall take stays near the target (quantization + bucket grain)
    val frac = kept.count().toDouble / docs.count()
    assert(math.abs(frac - 0.5) < 0.15, s"overall kept fraction $frac far from target")
    // same inputs, same survivors — the reproducibility contract
    val again = Sampling.temperatureSample(docs, "doc_id", "lang", targetFrac = 0.5)
    assert(kept.select("doc_id").except(again.select("doc_id")).count() === 0)
    assert(again.select("doc_id").except(kept.select("doc_id")).count() === 0)
  }

  test("temperatureCuts stays exact on 100 TB-scale histograms (no BIGINT overflow)") {
    import spark.implicits._
    // T_scaled * w for the dominant stratum is ~4.5e23 — far past
    // Long.MaxValue, the regime where the pre-fix chain wrapped negative
    // and silently dropped the stratum (ADVICE r8). DECIMAL(38,0) keeps
    // it exact; pin cell-by-cell against a BigInt replay of the chain.
    val hist = Seq(("big", 900000000000L), ("mid", 90000000000L), ("small", 1000000L))
    val cuts = Sampling.temperatureCuts(hist.toDF("lang", "__ts_n"), "lang", 500000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = hist.map { case (l, n) =>
      l -> math.floor(math.sqrt(n.toDouble) * 1048576.0).toLong }.toMap
    val sw = BigInt(w.values.sum)
    val total = BigInt(hist.map(_._2).sum)
    val expected = hist.map { case (l, n) =>
      val tScaled = (total * 500000) / 1000000
      val budget = (tScaled * BigInt(w(l))) / sw
      l -> (BigInt(10000) * budget / n).min(10000).toLong
    }.toMap
    assert(cuts === expected, "decimal chain must equal the BigInt replay")
    assert(cuts.values.forall(c => c >= 0 && c <= 10000),
      s"cut out of bucket range (overflow wrap): $cuts")
    assert(cuts("big") > 0L, "dominant stratum must not be dropped")
    assert(cuts("small") === 10000L, "tiny stratum is fully kept under sqrt weighting")
  }

  test("ppsSample selects exactly k per stratum when no weight exceeds W/k, never zero-weight rows") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "x" else "y", (i % 7) + 1))
      .toDF("id", "s", "w")
      .unionByName(Seq((1000L, "x", 0L), (1001L, "y", 0L)).toDF("id", "s", "w"))
    val sel = Sampling.ppsSample(df, "id", "s", "w", k = 10)
    val perStratum = sel.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum === Map("x" -> 10L, "y" -> 10L),
      s"each stratum must yield exactly k rows, got $perStratum")
    assert(sel.filter(col("w") === 0).count() === 0L,
      "zero-weight rows can never contain a sampling point")
    // deterministic: the same ids every run
    val again = Sampling.ppsSample(df, "id", "s", "w", k = 10)
    assert(sel.select("id").collect().map(_.getLong(0)).toSet ===
      again.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("epochShuffled: each epoch is a distinct full permutation, reproducible across runs") {
    val ids = docs.select("doc_id")
    val e0 = Sampling.epochShuffled(ids, "doc_id", 0).collect().map(_.getLong(0))
    val e1 = Sampling.epochShuffled(ids, "doc_id", 1).collect().map(_.getLong(0))
    // permutations: same membership, different order per epoch
    assert(e0.toSet === e1.toSet, "an epoch must keep the whole corpus")
    assert(e0.length === ids.count())
    assert(!(e0 sameElements e1), "distinct epochs must yield distinct orders")
    // pure function of (id, epoch): bit-identical on rerun
    val again = Sampling.epochShuffled(ids, "doc_id", 0).collect().map(_.getLong(0))
    assert(e0 sameElements again, "epoch order must be reproducible")
    // and not id-sorted (i.e. actually shuffled)
    assert(!(e0 sameElements e0.sorted), "epoch order must differ from id order")
  }

  test("ppsSample inclusion probability tracks weight (heavy rows always in, at most one row absorbed)") {
    import spark.implicits._
    // one row carries >W/k weight: it MUST be selected (its interval
    // spans at least one point) and the total can dip below k only by
    // points pooled into that row
    val df = ((1L to 50L).map(i => (i, "s", 1L)) :+ (99L, "s", 1000L)).toDF("id", "s", "w")
    val sel = Sampling.ppsSample(df, "id", "s", "w", k = 5).collect()
    assert(sel.exists(_.getLong(0) == 99L), "a >W/k row is always selected")
    assert(sel.length <= 5 && sel.length >= 1)
  }
}
