package graft

import org.scalatest.funsuite.AnyFunSuite

/** tx_gopher planted-violation pins: each fixture doc breaks exactly
  * one rule, and the battery flags exactly that rule (published
  * Gopher thresholds, Rae et al. 2021).
  */
class GopherSpec extends AnyFunSuite {
  import SparkTestSession._

  // a clean doc: 60 mid-length words incl. stopwords, no symbols
  private val clean =
    (1 to 58).map(i => s"word${i % 9}x").mkString("the and ", " ", " end")

  test("each planted violation trips exactly its own rule") {
    import spark.implicits._
    val fixtures = Seq(
      1L -> clean, // passes everything
      2L -> "too short the and", // r_words
      3L -> ("the and " + Seq.fill(58)("a").mkString(" ")), // r_wordlen (mean < 3)
      4L -> ("the and " + Seq.fill(58)("#@#").mkString(" ")), // symbol + wordlen+alpha... keep simple: heavy '#'
      5L -> clean.split(" ").map(w => s"- $w").mkString("\n"), // r_bullet (+r_words ok: same words)
      6L -> clean.split(" ").map(w => s"$w...").mkString("\n"), // r_ellipsis
      7L -> ("the and " + Seq.fill(58)("12345").mkString(" ")), // r_alpha
      8L -> (Seq.fill(60)("wordx").mkString(" ")) // r_stop (no stopwords)
    ).toDF("doc_id", "text")
    val out = operators.TextAnalysis.gopherOf(fixtures)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(out(1L).getAs[Boolean]("pass"), "the clean doc must clear the battery")
    def only(id: Long, rule: String, alsoAllowed: Set[String] = Set.empty): Unit = {
      val r = out(id)
      assert(!r.getAs[Boolean]("pass"))
      assert(!r.getAs[Boolean](rule), s"doc $id must trip $rule")
      for (c <- Seq("r_words", "r_wordlen", "r_symbol", "r_bullet",
                    "r_ellipsis", "r_alpha", "r_stop")
           if c != rule && !alsoAllowed.contains(c))
        assert(r.getAs[Boolean](c), s"doc $id unexpectedly also trips $c")
    }
    only(2L, "r_words")
    only(3L, "r_wordlen")
    // '#' spam inflates symbol ratio; '#' words also have no alpha and
    // are exactly 3 chars, so wordlen stays legal but alpha trips too
    only(4L, "r_symbol", alsoAllowed = Set("r_alpha"))
    // the bullet markers are themselves words with no alpha char, so
    // they halve alpha_frac — a real co-trip, not a fixture artifact
    only(5L, "r_bullet", alsoAllowed = Set("r_alpha"))
    // '...' suffixes also count as symbols; allow that co-trip
    only(6L, "r_ellipsis", alsoAllowed = Set("r_symbol", "r_wordlen", "r_stop"))
    only(7L, "r_alpha", alsoAllowed = Set("r_wordlen"))
    only(8L, "r_stop")
  }

  test("corpus battery: measured values are consistent with their booleans") {
    val rows = SparkEntry.queries("tx_gopher")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Boolean]("r_words") ==
        (r.getAs[Long]("n_words") >= 50 && r.getAs[Long]("n_words") <= 100000))
      assert(r.getAs[Boolean]("r_stop") == (r.getAs[Long]("stop_hits") >= 2))
      // rounded values sit within a nudge of their boolean's boundary
      if (!r.getAs[Boolean]("r_alpha"))
        assert(r.getAs[Double]("alpha_frac") < 0.8 + 1e-6)
    }
    // the battery differentiates on this corpus (some pass, some fail)
    val passes = rows.count(_.getAs[Boolean]("pass"))
    assert(passes > 0 && passes < rows.length,
      s"battery degenerate: $passes/${rows.length} pass")
  }
}
