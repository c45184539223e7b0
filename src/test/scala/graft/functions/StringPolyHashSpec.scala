package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused rolling hash must equal the HOF reference VALUE-FOR-VALUE
  * on every string — the dd/tx/sp oracles replay this hash exactly, so
  * a single divergent code point is a correctness bug. */
class StringPolyHashSpec extends AnyFunSuite with SparkTestSession {

  private def check(strs: Seq[String]): Unit = {
    import spark.implicits._
    val df = strs.toDF("t")
      .withColumn("fused", TextFunctions.stringHash(col("t")))
      .withColumn("hof", TextFunctions.stringHashHof(col("t")))
    val bad = df.filter(!(col("fused") <=> col("hof")))
      .select("t", "fused", "hof").collect()
    assert(bad.isEmpty, s"divergent: ${bad.mkString(",")}")
  }

  test("ascii corpus shapes: tokens, shingles, ids, empty") {
    check(Seq("", "a", "key agg row scan", "the quick brown fox",
      "12345", "9999999", " leading", "trailing ", "a  b",
      "x" * 500, ('a' to 'z').mkString(" ")))
  }

  test("multi-byte code points: 2-, 3- and 4-byte UTF-8") {
    check(Seq("café", "über", "naïve", "日本語テキスト", "中文分词",
      "emoji 😀 mixed", "𝕊𝕦𝕡𝕡𝕝𝕖𝕞𝕖𝕟𝕥𝕒𝕣𝕪", "ß", "ćirilica ћирилица"))
  }

  test("random ascii strings, bulk differential") {
    val rnd = new scala.util.Random(11)
    check((0 until 500).map(_ =>
      (0 until rnd.nextInt(60)).map(_ => (32 + rnd.nextInt(95)).toChar).mkString))
  }

  test("tokenHashes == transform(tokens, stringHash) element-for-element") {
    import spark.implicits._
    val strs = Seq("", "a", "key agg row scan", "a  b", " lead", "trail ",
      "café 日本 😀 x", "one", "a b c d e f g")
    val df = strs.toDF("t")
      .withColumn("fused", TextFunctions.tokenHashes(col("t")))
      .withColumn("ref", transform(split(col("t"), " "),
        x => TextFunctions.stringHashHof(x)))
    val bad = df.filter(!(col("fused") <=> col("ref"))).collect()
    assert(bad.isEmpty, s"divergent: ${bad.mkString(",")}")
  }

  test("fused shingle combine == HOF slice-fold, all widths and lengths") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val arrays = (0 until 50).map(_ =>
      Seq.fill(rnd.nextInt(12))(rnd.nextLong().abs % 1000000007L))
    for (w <- Seq(2, 3, 8)) {
      val df = arrays.toDF("ths")
        .withColumn("fused", graft.operators.Dedup.shingleHashesProbe(col("ths"), w))
        .withColumn("ref", graft.operators.Dedup.shingleHashesHofProbe(col("ths"), w))
      val bad = df.filter(!(col("fused") <=> col("ref"))).collect()
      assert(bad.isEmpty, s"divergent at width=$w: ${bad.mkString(",")}")
    }
  }

  test("interpreted and codegen paths agree") {
    import spark.implicits._
    val strs = Seq("key agg row", "café 😀", "")
    val viaCodegen = strs.toDF("t")
      .select(TextFunctions.stringHash(col("t"))).collect().map(_.getLong(0)).toSeq
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = strs.toDF("t")
        .select(TextFunctions.stringHash(col("t"))).collect().map(_.getLong(0)).toSeq
      assert(interp === viaCodegen)
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }
}
