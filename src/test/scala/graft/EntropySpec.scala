package graft

import graft.functions.TextEntropy
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the native entropy expression: hand-computable
  * values, the empty/degenerate cases, and a codegen-path run (the
  * expression claims a WholeStageCodegen-resident static call).
  */
class EntropySpec extends AnyFunSuite {
  import SparkTestSession._

  test("hand-computed entropies") {
    assert(TextEntropy.charEntropy("aaaa") == 0.0)
    assert(math.abs(TextEntropy.charEntropy("ab") - 1.0) < 1e-12)
    // "aabb" → p=0.5 each → 1 bit; "abcd" → 2 bits
    assert(math.abs(TextEntropy.charEntropy("aabb") - 1.0) < 1e-12)
    assert(math.abs(TextEntropy.charEntropy("abcd") - 2.0) < 1e-12)
    val (h, types, tokens) = TextEntropy.tokenStats("a b a")
    assert(types == 2 && tokens == 3)
    // p(a)=2/3, p(b)=1/3
    val expect = -(2.0 / 3 * (math.log(2.0 / 3) / math.log(2)) +
      1.0 / 3 * (math.log(1.0 / 3) / math.log(2)))
    assert(math.abs(h - expect) < 1e-12)
  }

  test("degenerate inputs") {
    assert(TextEntropy.charEntropy("") == 0.0)
    assert(TextEntropy.tokenStats("") == ((0.0, 0, 0)))
    assert(TextEntropy.tokenStats("   ") == ((0.0, 0, 0)))
    val (h1, t1, n1) = TextEntropy.tokenStats("  x  ")
    assert(h1 == 0.0 && t1 == 1 && n1 == 1)
  }

  test("expression runs inside codegen and matches the static helper") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq("the quick brown fox", "aaaa bbbb aaaa", "").toDF("text")
        .select(col("text"), graft.functions.EntropyExprs.text_entropy(col("text")).as("st"))
        .select(col("text"), col("st.char_entropy"), col("st.word_entropy"),
          col("st.n_types"), col("st.n_tokens"))
      val rows = df.collect()
      rows.foreach { r =>
        val s = r.getAs[String]("text")
        assert(math.abs(r.getAs[Double]("char_entropy") - TextEntropy.charEntropy(s)) < 1e-12)
        val (h, types, tokens) = TextEntropy.tokenStats(s)
        assert(math.abs(r.getAs[Double]("word_entropy") - h) < 1e-12)
        assert(r.getAs[Long]("n_types") == types.toLong)
        assert(r.getAs[Long]("n_tokens") == tokens.toLong)
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
