package graft

import graft.functions.{HashExprs, PolyHashing}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native hash expressions must participate in whole-stage
  * codegen: with codegen fallback disabled, a doGenCode that fails to
  * compile aborts the query instead of silently reverting to the
  * interpreted path, and the results must equal the direct JVM
  * helpers (which the DuckDB oracle parity was established against).
  */
class HashCodegenSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val texts = Seq(
    "The quick brown fox jumps over the lazy dog near the river bank today",
    "hello world",
    "",
    "   ",
    "one two three four five six seven one two three four five six seven")

  test("hash expressions run inside codegen (fallback disabled) and match the JVM helpers") {
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // repartition defeats ConvertToLocalRelation, which would fold a
      // projection over literals at optimize time (interpreted eval)
      // and never exercise the generated code
      val df = texts.toDF("t").repartition(1).select(
        col("t"),
        HashExprs.token_hashes(col("t")).as("th"),
        HashExprs.shingle_hashes(col("t")).as("sh"),
        HashExprs.minhash_sig(HashExprs.shingle_hashes(col("t"))).as("mh"),
        HashExprs.poly_hash(col("t")).as("ph"))
      val rows = df.collect()
      assert(rows.length == texts.length)
      for (r <- rows) {
        val t = r.getAs[String]("t")
        assert(r.getAs[scala.collection.Seq[Long]]("th").toList == PolyHashing.tokenHashes(t).toList, s"token_hashes($t)")
        assert(r.getAs[scala.collection.Seq[Long]]("sh").toList == PolyHashing.shingleHashes(t).toList, s"shingle_hashes($t)")
        val expectedMh = PolyHashing.shingleHashes(t) match {
          case a if a.isEmpty => null
          case a => PolyHashing.minhashSig(a).toList
        }
        val actualMh = Option(r.getAs[scala.collection.Seq[Long]]("mh")).map(_.toList).orNull
        assert(actualMh == expectedMh, s"minhash_sig($t)")
        assert(r.getAs[Long]("ph") == PolyHashing.foldCodePoints(t), s"poly_hash($t)")
      }

      // dot product, including length mismatch (shorter side wins)
      val dp = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0, 7.0)))
        .toDF("a", "b").repartition(1)
        .select(HashExprs.dot_product(col("a"), col("b")).as("d"))
        .collect()(0).getAs[Double]("d")
      assert(dp == 32.0)

      // the projection is inside a WholeStageCodegen span
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*("), "hash projection must be whole-stage-codegen'd")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("word scan expressions match the [\\p{L}\\p{N}_]+ regex, incl. non-BMP text") {
    // the manual codepoint scan replaced Pattern matching in the hot
    // path; this pins it token-identical to the regex the oracle runs
    val re = java.util.regex.Pattern.compile(graft.functions.WordScan.WordClass)
    def reTokens(t: String): List[String] = {
      val m = re.matcher(t)
      val out = scala.collection.mutable.ListBuffer.empty[String]
      while (m.find()) out += m.group()
      out.toList
    }
    val samples = texts ++ Seq(
      "模型审计 与 蒸馏检测 detects 蒸馏", // CJK
      "café naïve Ωμέγα №Ⅻ ½·⅓", // accents, Greek, Nl/No numerics
      "𝕏𝕐 math 𝕑alphanumerics", // supplementary plane
      "under_score mixed_脚本_words 123abc",
      "a,b;c.d-e f\tg\nh")
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = samples.toDF("t").repartition(1).select(
        col("t"),
        graft.functions.MarkerExprs.word_tokens(col("t")).as("wt"),
        graft.functions.MarkerExprs.word_count(col("t")).as("wc"),
        graft.functions.MarkerExprs.word_bigrams(col("t")).as("wb"))
        .collect()
      for (r <- rows) {
        val t = r.getAs[String]("t")
        val expected = reTokens(t)
        assert(r.getAs[scala.collection.Seq[String]]("wt").toList == expected, s"word_tokens($t)")
        assert(r.getAs[Int]("wc") == expected.length, s"word_count($t)")
        val expectedBi =
          if (expected.length < 2) Nil
          else expected.sliding(2).map(_.mkString(" ")).toList
        assert(r.getAs[scala.collection.Seq[String]]("wb").toList == expectedBi, s"word_bigrams($t)")
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
