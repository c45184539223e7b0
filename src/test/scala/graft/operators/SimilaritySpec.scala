package graft.operators

import graft.{SparkTestSession, Tables}
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkTestSession {

  private lazy val emb = Tables.embeddings(spark, sf)

  test("bruteForceTopK: self is rank 1 with cosine 1.0, descending order") {
    val top = Similarity.bruteForceTopK(emb, queryId = 0L, k = 10).collect()
    assert(top.length === 10)
    assert(top.head.getLong(0) === 0L)
    assert(top.head.getDouble(1) === 1.0)
    val coss = top.map(_.getDouble(1)).toSeq
    assert(coss === coss.sorted.reverse)
  }

  test("lshTopK: finds self, candidates overlap brute-force top-k") {
    val brute = Similarity.bruteForceTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    val approx = Similarity.lshTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    assert(approx.contains(0L))
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall >= 0.2, s"recall@10 = $recall — LSH candidates lost the neighborhood entirely")
  }

  test("cosineNearDups finds every planted exact duplicate at cosine 1.0") {
    val e = emb.select(col("vec_id"), col("embedding"))
    val aug = e.union(e.filter(col("vec_id") < 50)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    val dups = Similarity.cosineNearDups(aug).cache()
    val planted = dups.filter(col("vec_b") === col("vec_a") + 1000000L)
    assert(planted.count() === 50)
    assert(planted.filter(col("cos") < 0.999999).count() === 0)
  }

  test("cosineNearDups recalls NEAR (perturbed, not identical) duplicates via banding") {
    // plant near-dups: deterministic small perturbation of one component
    val perturbed = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 2000000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> IF(i = 0, CAST(x + 0.05 AS FLOAT), x))")
          .as("embedding"))
    val aug = emb.select(col("vec_id"), col("embedding")).union(perturbed)
    val dups = Similarity.cosineNearDups(aug, threshold = 0.98).cache()
    val planted = dups.filter(col("vec_b") === col("vec_a") + 2000000L)
    // banded LSH miss probability ~3% per pair at this angle; require >=45/50
    assert(planted.count() >= 45, s"only ${planted.count()}/50 perturbed near-dups recalled")
    assert(planted.filter(col("cos") < 0.98).count() === 0)
  }

  test("ivfTopK: finds self, overlaps brute-force top-k") {
    val brute = Similarity.bruteForceTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    assert(ivf.contains(0L))
    assert(ivf.size === 10)
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.2, s"IVF recall@10 = $recall")
  }

  test("kmeansCentroids: average assigned cosine is non-decreasing per Lloyd round") {
    // spherical k-means objective: cosine is scale-invariant, so the
    // plain-mean update cannot decrease the average assigned cosine
    def avgAssignedCos(iters: Int): Double = {
      val cent = Similarity.kmeansCentroids(emb, nCells = 8, iters = iters)
      emb.join(broadcast(cent))
        .select(col("vec_id"),
          VectorFunctions.cosineFast(col("embedding"), col("centroid")).as("c"))
        .groupBy(col("vec_id")).agg(max(col("c")).as("best"))
        .agg(avg(col("best"))).collect()(0).getDouble(0)
    }
    val objective = (0 to 2).map(avgAssignedCos)
    objective.sliding(2).foreach { case Seq(prev, next) =>
      assert(next >= prev - 1e-9, s"objective regressed: $objective")
    }
    assert(objective.last > objective.head, s"two rounds should tighten cells: $objective")
  }

  test("ivfTopK with k-means codebook still finds self and keeps k results") {
    val ivf = Similarity.ivfTopK(emb, 0L, 10, kmeansIters = 2).collect().map(_.getLong(0)).toSet
    assert(ivf.contains(0L))
    assert(ivf.size === 10)
  }

  test("lshTopK rejects embeddings wider than the plane width instead of truncating") {
    import spark.implicits._
    val wide = Seq((0L, Array.fill(Similarity.MaxPlaneDim + 1)(0.5f)),
                   (1L, Array.fill(Similarity.MaxPlaneDim + 1)(0.25f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception](Similarity.lshTopK(wide, 0L, 2).collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    // match the guard's RUNTIME message, not just the token "MaxPlaneDim"
    // (an AnalysisException quoting the guard expression would contain
    // that token too, and would mean the guard itself is broken)
    assert(msgs(e).exists(m => m != null && m.contains("exceeds MaxPlaneDim")),
      s"expected the raise_error guard message, got: $e")
    // and vectors at exactly the plane width still hash fine
    import spark.implicits._
    val ok = Seq((0L, Array.fill(Similarity.MaxPlaneDim)(0.5f)),
                 (1L, Array.fill(Similarity.MaxPlaneDim)(0.25f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.lshTopK(ok, 0L, 2).collect().nonEmpty)
  }

  test("persisted IVF index: probe without rebuild equals the in-query pipeline") {
    val ix = java.nio.file.Files.createTempDirectory("graft_ivf_spec")
      .resolve("ivf").toString
    Similarity.buildIvfIndex(emb, ix, nCells = 16, kmeansIters = 1)
    val q0 = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("embedding"))
    val probe = Similarity.probeIvfIndex(spark, ix, q0, k = 10, nProbe = 4)
    val got = probe.orderBy(col("cos").desc, col("vec_id")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toSeq
    val inQuery = Similarity.ivfTopK(emb, 0L, 10, kmeansIters = 1).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === inQuery,
      "persisted probe must be bit-equal to the in-query IVF pipeline")
    // the probe reads ONLY the index (plus the caller's own query-side
    // source) — no corpus scan, no k-means
    val inputs = probe.inputFiles.toSet -- q0.inputFiles.toSet
    assert(inputs.nonEmpty && inputs.forall(_.contains("graft_ivf_spec")),
      s"probe must serve from the persisted index alone: ${inputs.take(3).mkString(",")}")
    // cell pruning reaches the scan as a static partition filter
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      s"probed cells must prune postings partitions at planning time")
    // a second, different query probes the same index without rebuilding
    val q1 = emb.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("qid"), col("embedding"))
    val got1 = Similarity.probeIvfIndex(spark, ix, q1, k = 5, nProbe = 4).collect()
    assert(got1.length === 5 && got1.exists(_.getAs[Long]("vec_id") === 1L),
      "reused index must serve other queries (self found in its own cell)")
  }

  test("lshKnnAcross: a query equal to a corpus vector retrieves it at rank 1, cos 1.0") {
    // identical vectors share every band signature, so the bucket join
    // MUST surface the pair regardless of LSH recall luck — the
    // cross-modal invariant that needs no tuning to hold
    val queries = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 7000L).as("qid"), col("embedding").as("qvec"))
    val got = Similarity.lshKnnAcross(queries, emb, k = 3).collect()
      .map(r => (r.getAs[Long]("qid") - 7000L, r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toSeq
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet === (0L until 20L).toSet,
      "every query must retrieve at least its own twin")
    byQ.foreach { case (q, rs) =>
      // rank 1 must be a perfect match; the twin itself must be among
      // the returned rows at cos 1.0 (exact-duplicate corpus vectors
      // may legitimately tie ahead of it on the id tiebreak)
      assert(rs.find(_._2 == 1).get._4 === 1.0, s"query $q rank-1 not cos 1.0: $rs")
      assert(rs.exists(r => r._3 == q && r._4 === 1.0),
        s"query $q's identical corpus vector missing from top-3: $rs")
    }
  }

  test("int8TopK: self at qcos 1.0, high overlap with exact brute-force top-k") {
    val top = Similarity.int8TopK(emb, queryId = 0L, k = 10).collect()
    assert(top.length === 10)
    assert(top.head.getLong(0) === 0L && top.head.getDouble(1) === 1.0,
      "a vector's own int8 code must score exactly 1.0 (intdot == qnorm)")
    val brute = Similarity.bruteForceTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    val quant = top.map(_.getLong(0)).toSet
    val recall = (brute & quant).size.toDouble / brute.size
    assert(recall >= 0.7,
      s"recall@10 = $recall — int8 rounding of dim-64 vectors should barely move the ranking")
  }

  test("pqEncode: every vector gets exactly m in-range codes; exact copies share codes") {
    val aug = emb.select(col("vec_id"), col("embedding"))
      .union(emb.filter(col("vec_id") < 20)
        .select((col("vec_id") + 3000000L).as("vec_id"), col("embedding")))
    val cb = Similarity.pqCodebook(aug, m = 4, ksub = 8)
    assert(cb.count() === 32)
    val codes = Similarity.pqEncode(aug, cb, m = 4).cache()
    val n = aug.count()
    assert(codes.count() === n * 4)
    assert(codes.filter(col("code") < 0 || col("code") >= 8).count() === 0)
    // an exact copy must encode identically in every subspace
    val drift = codes.filter(col("vec_id") >= 3000000L)
      .select((col("vec_id") - 3000000L).as("vec_id"), col("sub"), col("code").as("code2"))
      .join(codes, Seq("vec_id", "sub"))
      .filter(col("code") =!= col("code2"))
    assert(drift.count() === 0, "exact duplicate vectors diverged in PQ codes")
  }

  test("pqTopK: deterministic across runs; planted exact copy of the query ties its ADC score") {
    val aug = emb.select(col("vec_id"), col("embedding"))
      .union(emb.filter(col("vec_id") === 0L)
        .select(lit(4000000L).as("vec_id"), col("embedding")))
    val top = Similarity.pqTopK(aug, queryId = 0L, k = 10).collect()
    assert(top.length === 10)
    val scoreOf = top.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // identical vectors share codes (previous test), so identical ADC:
    // either both copies make the top-k with equal scores, or neither does
    assert(scoreOf.contains(0L) === scoreOf.contains(4000000L))
    for (a <- scoreOf.get(0L); b <- scoreOf.get(4000000L)) assert(a === b)
    val again = Similarity.pqTopK(aug, queryId = 0L, k = 10).collect()
    assert(top.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      again.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("ivfPqTopK: deterministic; planted exact copy of the query ties or ties-out with it") {
    val aug = emb.select(col("vec_id"), col("embedding"))
      .union(emb.filter(col("vec_id") === 0L)
        .select(lit(5000000L).as("vec_id"), col("embedding")))
    val top = Similarity.ivfPqTopK(aug, queryId = 0L, k = 10).collect()
    assert(top.length === 10)
    val scoreOf = top.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // identical vectors share cell, residual, and codes -> identical ADC
    assert(scoreOf.contains(0L) === scoreOf.contains(5000000L))
    for (a <- scoreOf.get(0L); b <- scoreOf.get(5000000L)) assert(a === b)
    val again = Similarity.ivfPqTopK(aug, queryId = 0L, k = 10).collect()
    assert(top.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      again.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("ivfPqTopK only scores vectors from probed cells") {
    val top = Similarity.ivfPqTopK(emb, queryId = 0L, k = 500,
      nCells = 16, nProbe = 4).count()
    val full = emb.count()
    assert(top < full, "IVF-PQ must prune to the probed cells, not scan every vector")
  }

  test("updateIvfIndex: postings equal assigning the final corpus under the frozen codebook") {
    val ix = java.nio.file.Files.createTempDirectory("graft_upd_ix").resolve("ivf").toString
    val base = emb.filter(pmod(col("vec_id"), lit(3)) =!= 0)
    Similarity.buildIvfIndex(base, ix, nCells = 8, kmeansIters = 1)
    val adds = emb.filter(pmod(col("vec_id"), lit(3)) === 0)
    val removes = base.filter(pmod(col("vec_id"), lit(5)) === 1).select(col("vec_id"))
    Similarity.updateIvfIndex(spark, ix, adds, removes)
    val got = spark.read.parquet(s"$ix/postings")
      .select(col("vec_id"), col("centroid_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // expected: (base \ removes) ∪ adds, each assigned to its nearest
    // cell under the PERSISTED (frozen) codebook
    val removed = removes.collect().map(_.getLong(0)).toSet
    val finalCorpus = emb.filter(pmod(col("vec_id"), lit(3)) === 0 ||
      !col("vec_id").isin(removed.toSeq: _*))
    val cb = spark.read.parquet(s"$ix/codebook")
    val expected = finalCorpus
      .join(broadcast(cb))
      .withColumn("__c", graft.functions.VectorFunctions.cosineFast(col("embedding"), col("centroid")))
      .withColumn("__rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("__c").desc, col("centroid_id"))))
      .filter(col("__rk") === 1)
      .select(col("vec_id"), col("centroid_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("updateIvfIndex: a cell emptied by removes leaves no stale postings behind") {
    import spark.implicits._
    // corpus where cell membership is controllable: 8 seed-ish vectors
    val ix = java.nio.file.Files.createTempDirectory("graft_upd_empty").resolve("ivf").toString
    val sub = emb.filter(col("vec_id") < 40)
    Similarity.buildIvfIndex(sub, ix, nCells = 4, kmeansIters = 0)
    // remove EVERY vector of one cell
    val postings = spark.read.parquet(s"$ix/postings")
    val victim = postings.select(col("centroid_id").cast("long")).distinct()
      .orderBy(col("centroid_id")).collect().head.getLong(0)
    val doomed = postings.filter(col("centroid_id") === victim).select(col("vec_id"))
    val nDoomed = doomed.count()
    Similarity.updateIvfIndex(spark, ix, adds = sub.limit(0), removeIds = doomed)
    val after = spark.read.parquet(s"$ix/postings")
    assert(after.filter(col("centroid_id") === victim).count() === 0,
      "emptied cell must not serve stale postings")
    assert(after.count() === 40 - nDoomed)
  }

  test("cosineFast (codegen expression) agrees with the HOF cosine") {
    val pairs = emb.as("x").crossJoin(emb.as("y"))
      .filter(col("x.vec_id") < 5 && col("y.vec_id") < 5)
      .select(
        VectorFunctions.cosineFast(col("x.embedding"), col("y.embedding")).as("fast"),
        VectorFunctions.cosine(col("x.embedding"), col("y.embedding")).as("hof"))
      .collect()
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
        s"fast=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
  }
}
