package graft.operators

import graft.SparkTestSession
import graft.Tables
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Value-level checks for the hash-based dedup pipelines that have no
  * DuckDB oracle: plant near-duplicates (pair (i, i+1000000), ` dup`
  * suffix) and require each method to recover them. */
class DedupSpec extends AnyFunSuite with SparkTestSession {

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val aug = Dedup.augmentWithNearDups(docs)
  private val Offset = 1000000L

  private def plantedFound(pairs: DataFrame): Long =
    pairs.filter(pairs("doc_b") === pairs("doc_a") + Offset).count()

  test("minhash LSH recovers planted near-dups; every reported pair is a true near-dup") {
    val pairs = Dedup.minhashNearDups(aug).cache()
    val planted = plantedFound(pairs)
    assert(planted >= 40, s"only $planted/50 planted near-dup pairs found")
    val bad = pairs.filter(pairs("est_jaccard") < 0 || pairs("est_jaccard") > 1).count()
    assert(bad === 0)
    // precision against ground truth: the synthetic corpus contains
    // NATURAL near-dup pairs (exact 3-gram jaccard up to 0.99), so
    // validate reported pairs by exact jaccard, not by planted-ness.
    val exact = Dedup.ngramJaccardDups(aug, threshold = 0.0)
    val checked = pairs.join(exact, Seq("doc_a", "doc_b"), "left")
    val falsePos = checked.filter(checked("jaccard").isNull || checked("jaccard") < 0.2).count()
    assert(falsePos === 0, s"$falsePos reported pairs have exact jaccard < 0.2")
  }

  test("simhash recovers planted near-dups within Hamming 8") {
    val pairs = Dedup.simhashNearDups(aug).cache()
    val planted = plantedFound(pairs)
    assert(planted >= 40, s"only $planted/50 planted pairs found")
    assert(pairs.filter(pairs("hamming") > 8).count() === 0)
  }

  test("exact n-gram Jaccard recovers planted near-dups with high scores") {
    val pairs = Dedup.ngramJaccardDups(aug).cache()
    val planted = pairs.filter(pairs("doc_b") === pairs("doc_a") + Offset)
    assert(planted.count() >= 40)
    // a one-token suffix on an n-token doc keeps jaccard ~ (n-3)/(n+1)
    assert(planted.filter(planted("jaccard") < 0.6).count() === 0)
  }

  test("clusters: chains merge into one component labeled by the min id") {
    import spark.implicits._
    val d = Seq(1L, 2L, 3L, 4L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 9L)).toDF("doc_a", "doc_b")
    val got = Dedup.clusters(d, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 9L -> 4L))
  }

  test("dedupCorpus keeps one representative per near-dup cluster") {
    val pairs = Dedup.minhashNearDups(aug)
    val deduped = Dedup.dedupCorpus(aug.select("doc_id"), pairs).cache()
    val total = aug.count()
    val clusters = Dedup.clusters(aug.select(org.apache.spark.sql.functions.col("doc_id")), pairs)
    val expectedKept = clusters.select("cluster_id").distinct().count()
    assert(deduped.count() === expectedKept)
    // every planted copy (i+1000000) whose original was paired must be gone
    val planted = pairs.filter(pairs("doc_b") >= Offset).select(pairs("doc_b").as("doc_id"))
    assert(deduped.join(planted, "doc_id").count() === 0)
    assert(deduped.count() < total)
  }

  test("minhashSignature (row-local API) matches the columnar signatures") {
    import org.apache.spark.sql.functions.col
    val docs = aug.limit(50)
    val rowLocal = docs.select(col("doc_id"),
      Dedup.minhashSignature(col("text"), 8, 3).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val columnar = Dedup.signatures(docs, 8, 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rowLocal === columnar)
  }

  test("segmentDedupStats: planted copies lose their repeated spans, originals keep all") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p q r s t"), // 2 full segments
      (2L, "a b c d e f g h i j k l m n o p q r s t"), // exact copy: keeps 0
      (3L, "z y x w v u")                               // unrelated: keeps all
    ).toDF("doc_id", "text")
    val got = Dedup.segmentDedupStats(docs, width = 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) === ((2L, 2L, 0L)), "first occurrence keeps every segment")
    assert(got(2L) === ((2L, 0L, 2L)), "exact copy loses every segment")
    assert(got(3L) === ((1L, 1L, 0L)), "unique doc keeps its partial segment")
  }

  test("simhash of identical text is identical; near text is near") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(
      (1L, "the fast key order sort table scan merge part window"),
      (2L, "the fast key order sort table scan merge part window"),
      (3L, "the fast key order sort table scan merge part window extra"),
      (4L, "completely different tokens entirely unrelated content here now")
    ).toDF("doc_id", "text")
    val sigs = df.select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) <= 8)
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(4L)) > 8)
  }

  test("bloom membership: zero false negatives; sound exact verdicts") {
    import org.apache.spark.sql.functions._
    val fps = docs.select(col("doc_id"),
      graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    val members = fps.filter(col("doc_id") % 3 === 0)
    val planted = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 9000000L).as("doc_id"),
        graft.functions.TextFunctions.fingerprint(
          concat(col("text"), lit(" q"))).as("fp"))
    val got = Dedup.bloomMembership(fps.select(col("fp")),
      members.union(planted))
    // the defining Bloom guarantee: every true member passes
    val memberIds = members.select("doc_id")
    assert(got.filter(!col("bloom_pass")).join(memberIds, "doc_id").count() === 0,
      "a corpus member failed the bloom probe — false negative")
    assert(got.filter(col("doc_id") < 9000000L && col("bloom_pass")).count() ===
      members.count(), "every member must pass")
    // false-positive rate of the planted non-members stays plausible
    // for 4096 bits / 3 hashes at this corpus size (deterministic, so
    // this is a regression pin, not a flaky statistical test)
    val fp = got.filter(col("doc_id") >= 9000000L && col("bloom_pass")).count()
    val nonMembers = got.filter(col("doc_id") >= 9000000L).count()
    assert(fp.toDouble / nonMembers < 0.5,
      s"false-positive rate $fp/$nonMembers out of range for 4096 bits")
  }

  test("bloom membership: duplicate probe ids and rows get independent verdicts") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val corpus = Seq(100L, 200L).toDF("fp")
    // doc 1 probed with a member AND a non-member fp; doc 2's member
    // probe repeated verbatim — neither shape may pool probe positions
    // into one sum-vs-k comparison (the pre-fix failure, ADVICE r8)
    val probes = Seq((1L, 100L), (1L, 999L), (2L, 200L), (2L, 200L))
      .toDF("doc_id", "fp")
    val got = Dedup.bloomMembership(corpus, probes).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2))
    assert(got.length === 4, "row multiplicity must be preserved")
    val verdicts = got.toMap
    assert(verdicts((1L, 100L)), "member fp must pass despite sibling probe")
    assert(verdicts((2L, 200L)), "repeated member probe must pass")
    // 999 may collide into a false positive in principle, but must get
    // ITS OWN verdict — with 4096 bits and 2 corpus keys it misses
    assert(!verdicts((1L, 999L)), "non-member fp must fail independently")
  }

  test("content-defined chunks survive a prefix edit (the CDC property)") {
    import org.apache.spark.sql.functions._
    // prepend one token to every doc: fixed-size blocks would all shift
    // and share ~nothing; content-defined boundaries must keep most
    // chunks identical (only the first chunk's hash context changes)
    val base = docs.limit(20).select(col("doc_id"), col("text"))
    val edited = base.select((col("doc_id") + 1000L).as("doc_id"),
      concat(lit("zzz "), col("text")).as("text"))
    val a = Dedup.contentChunks(base)
      .select(col("doc_id"), col("chunk_fp")).distinct()
    val b = Dedup.contentChunks(edited)
      .select((col("doc_id") - 1000L).as("doc_id"), col("chunk_fp")).distinct()
    val shared = a.join(b, Seq("doc_id", "chunk_fp")).count()
    val total = a.count()
    assert(shared.toDouble / total > 0.5,
      s"only $shared/$total chunks survived a one-token prefix edit — " +
        "boundaries are behaving like fixed-size blocks")
    // and identical inputs chunk identically (determinism)
    val again = Dedup.contentChunks(base)
      .select(col("doc_id"), col("chunk_fp")).distinct()
    assert(a.except(again).count() === 0 && again.except(a).count() === 0)
  }

  test("winnowing finds every planted near-dup; disjoint docs share nothing") {
    import spark.implicits._
    // the ` dup` suffix leaves every original window intact → every planted
    // pair shares at least one fingerprint; very short docs (one window)
    // can't clear the default minShared=5, so the thresholded count may
    // drop a couple
    assert(plantedFound(Dedup.winnowingDups(aug, minShared = 1)) === 50)
    assert(plantedFound(Dedup.winnowingDups(aug)) >= 45)

    // winnowing guarantee: a shared run of >= w+k-1 tokens yields a shared
    // fingerprint; fully-disjoint token streams must share none
    val disjoint = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine")).toDF("doc_id", "text")
    assert(Dedup.winnowingDups(disjoint, minShared = 1).count() === 0)

    val overlapping = Seq(
      (1L, "xx yy alpha beta gamma delta epsilon zeta zz ww"),
      (2L, "qq rr alpha beta gamma delta epsilon zeta ss tt")).toDF("doc_id", "text")
    // shared run of 6 tokens = w+k-1 → at least one shared fingerprint
    assert(Dedup.winnowingDups(overlapping, minShared = 1).count() === 1)
  }

  test("star contraction: long chain converges in O(log diameter) rounds") {
    import spark.implicits._
    // a 64-node chain (diameter 63) — the adversarial shape for
    // round-per-hop label propagation
    val n = 64L
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val canon = pairs.select(
      org.apache.spark.sql.functions.greatest($"doc_a", $"doc_b").as("u"),
      org.apache.spark.sql.functions.least($"doc_a", $"doc_b").as("v"))
    val (labels, rounds) = Dedup.starRounds(canon, maxRounds = 25)
    // log2(63) ≈ 6; allow the alternation's constant factor
    assert(rounds <= 10, s"took $rounds rounds for diameter 63")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L until n).map(_ -> 0L).toMap)
  }

  test("star contraction fails loudly when its round budget cannot reach a fixed point") {
    import spark.implicits._
    // the terminal fallback must never hand back labels off a non-star
    // edge set — a diameter-63 chain cannot contract in 1 round
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val canon = pairs.select(
      org.apache.spark.sql.functions.greatest($"doc_a", $"doc_b").as("u"),
      org.apache.spark.sql.functions.least($"doc_a", $"doc_b").as("v"))
    val e = intercept[IllegalStateException] {
      Dedup.starRounds(canon, maxRounds = 1)._1.collect()
    }
    assert(e.getMessage.contains("fixed point"))
  }

  test("clustersStar matches clusters on chains, forests and unpaired docs") {
    import spark.implicits._
    val d = (1L to 12L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (7L, 8L), (9L, 10L), (10L, 9L), (8L, 7L)).toDF("doc_a", "doc_b")
    val prop = Dedup.clusters(d, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = Dedup.clustersStar(d, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star === prop)
    assert(star(6L) === 1L && star(8L) === 7L && star(11L) === 11L)
  }

  test("duplicatedSpans: hand-built corpus — exact spans, merging, and no false positives") {
    import spark.implicits._
    // doc 1 and doc 2 share the 10-token run w0..w9 (at offsets 0 and 2);
    // doc 3 is disjoint; doc 4 repeats ITS OWN 8-gram twice (self-dup)
    val shared = (0 until 10).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, shared + " xa xb xc"),
      (2L, "ya yb " + shared),
      (3L, (0 until 16).map(i => s"z$i").mkString(" ")),
      (4L, ((0 until 8).map(i => s"r$i") ++ (0 until 8).map(i => s"r$i")).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(d, width = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    // doc 1: grams 0..2 duplicated (w0..w9 = 3 overlapping 8-grams) -> one span [0, 9]
    // doc 2: same run at offset 2 -> span [2, 11]
    // doc 4: r0..r7 r0..r7 has period 8, so exactly grams 0 and 8
    // coincide; distance 8 <= width merges them -> span [0, 15], n=2
    assert(got === Set((1L, 0, 9, 3L), (2L, 2, 11, 3L), (4L, 0, 15, 2L)))
  }

  test("duplicatedSpans: planted near-dup copies surface long spans in source and copy") {
    import org.apache.spark.sql.functions.col
    val spans = Dedup.duplicatedSpans(aug, width = 8).cache()
    val srcDocs = spans.filter(col("doc_id") < 50).select("doc_id").distinct().count()
    val copyDocs = spans.filter(col("doc_id") >= Offset).select("doc_id").distinct().count()
    assert(srcDocs === 50, s"all 50 planted sources must carry a duplicated span, got $srcDocs")
    assert(copyDocs === 50, s"all 50 planted copies must carry a duplicated span, got $copyDocs")
    // the copy is source + ' dup': the shared prefix must span (nearly)
    // the whole source token stream — require length >= 8 (one gram) and
    // assert spans never overlap within a doc (maximal-merge property)
    import spark.implicits._
    val overlaps = spans.as("a").join(spans.as("b"),
      col("a.doc_id") === col("b.doc_id") &&
        col("a.span_start") < col("b.span_start") &&
        col("b.span_start") <= col("a.span_end")).count()
    assert(overlaps === 0, "maximal spans must not overlap")
  }

  test("containmentDups finds every planted excerpt; resemblance misses them") {
    import org.apache.spark.sql.functions.col
    val withExcerpts = Dedup.augmentWithExcerpts(docs)
    val planted = withExcerpts.filter(col("doc_id") >= 2000000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(planted.nonEmpty, "fixture must plant excerpts")
    val got = Dedup.containmentDups(withExcerpts)
    // every planted excerpt is contained in its source (id - 2000000)
    val foundInSource = got
      .filter(col("contained_id") >= 2000000L &&
        col("container_id") === col("contained_id") - 2000000L)
      .select("contained_id").collect().map(_.getLong(0)).toSet
    assert(foundInSource === planted,
      s"missing excerpt pairs: ${planted -- foundInSource}")
    // the gap containment dedup exists for: the same pairs are invisible
    // to 3-gram Jaccard resemblance at the near-dup threshold
    val jacc = Dedup.ngramJaccardDups(withExcerpts)
    // (an excerpt of a barely-eligible 25-token source can still clear
    // the Jaccard bar — require the BULK of planted pairs to be
    // resemblance-invisible)
    val asNearDup = jacc.filter(col("doc_b") >= 2000000L &&
      col("doc_a") === col("doc_b") - 2000000L).count()
    assert(asNearDup <= planted.size / 10,
      s"only short-source outliers may clear resemblance: $asNearDup of ${planted.size}")
  }

  test("clusters falls back to star contraction when the batch budget runs out") {
    import spark.implicits._
    // diameter 15 chain, but only 2 propagation rounds allowed: plain
    // propagation cannot finish; the star fallback must
    val d = (0L to 15L).toDF("doc_id")
    val pairs = (0L until 15L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.clusters(d, pairs, maxIters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L to 15L).map(_ -> 0L).toMap)
  }
}
