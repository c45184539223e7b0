package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extension entry point must make the custom functions available in
  * a session built with `withExtensions` — no per-session registration
  * call. The shared test session stays untouched: a second SparkSession
  * is created over the same SparkContext (clear + restore the
  * active/default singletons around it). */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestSession {


  test("extension-built session has the custom functions as permanent SQL functions") {
    withExtendedSession { s =>
      val wkt = s.sql(
        "SELECT wkt_normalize('MULTIPOLYGON (((-73.8 40.7, -73.9 40.8)))') AS x")
        .collect()(0).getString(0)
      assert(wkt === "-73.8:40.7::-73.9:40.8")

      val cos = s.sql(
        "SELECT cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c")
        .collect()(0).getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-9)

      import s.implicits._
      val topk = Seq(("g", 1L, 1.0), ("g", 2L, 3.0), ("g", 3L, 2.0))
        .toDF("g", "id", "score")
      topk.createOrReplaceTempView("ext_topk")
      val ids = s.sql("SELECT top_k_by(score, id, 2) AS ids FROM ext_topk GROUP BY g")
        .collect()(0).getSeq[Long](0)
      assert(ids === Seq(2L, 3L))

      // the fused hash family answers pure SQL, matching the column API
      val h = s.sql("SELECT string_poly_hash('key agg row') AS h")
        .collect()(0).getLong(0)
      val hRef = s.range(1).select(
        graft.functions.TextFunctions.stringHash(
          org.apache.spark.sql.functions.lit("key agg row")))
        .collect()(0).getLong(0)
      assert(h === hRef)
      val th = s.sql("SELECT token_hashes('a b') AS t").collect()(0).getSeq[Long](0)
      assert(th.length === 2)
      val sh = s.sql("SELECT shingle_hashes(token_hashes('a b c d'), 2) AS s")
        .collect()(0).getSeq[Long](0)
      assert(sh.length === 3)
      intercept[Exception] {
        s.sql("SELECT shingle_hashes(token_hashes('a b'), length('xx')) AS s").collect()
      }
    }
  }

  test("a second extension-built session resolves the functions independently") {
    // injection happens at session BUILD time — every session built with
    // the extension gets the functions, with no registration call
    withExtendedSession { s =>
      assert(s.sql("SELECT cosine_similarity(array(0.0F, 2.0F), array(0.0F, 1.0F)) AS c")
        .collect()(0).getDouble(0) > 0.999)
    }
  }
}
