package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native single-pass text scanner (TextScan / text_scan /
  * pred_lang / quality_score) value-for-value against the regex+HOF
  * formulation it replaced — on the real corpus and on crafted edge
  * strings (empty, whitespace shapes, CJK, punctuation-only, non-BMP
  * emoji where code-point vs UTF-16 counting diverges, mixed case).
  */
class TextScanSpec extends AnyFunSuite {
  import SparkTestSession._

  private val langStops: Seq[Seq[String]] = Seq(
    Seq("the", "and", "of", "to", "in", "is"),
    Seq("le", "la", "les", "de", "et", "un"),
    Seq("el", "la", "los", "de", "y", "en"),
    Seq("der", "die", "das", "und", "ist", "ein"))
  private val stopwords =
    Seq("the", "a", "of", "to", "and", "in", "is", "it", "that", "for")

  /** The original Column formulations, inlined verbatim. */
  private def oldPredLang: org.apache.spark.sql.Column = {
    val words = split(trim(lower(col("text"))), "\\s+")
    def hits(ws: Seq[String]) = size(filter(words, w => ws.map(w === _).reduce(_ || _)))
    val Seq(en, fr, es, de) = langStops.map(hits)
    val cjk = length(regexp_replace(col("text"), "[^一-鿿]", ""))
    when(cjk >= 10, "zh")
      .when(en >= fr && en >= es && en >= de, "en")
      .when(fr >= es && fr >= de, "fr")
      .when(es >= de, "es")
      .otherwise("de")
  }

  private def oldQuality: org.apache.spark.sql.Column = {
    val words = split(trim(lower(col("text"))), "\\s+")
    val nWords = size(words)
    val nStop = size(filter(words, w => stopwords.map(w === _).reduce(_ || _)))
    val denom = greatest(nWords, lit(1)).cast("double")
    val lenScore = least(nWords / lit(100).cast("double"), lit(1d))
    val stopRatio = nStop / denom
    val wlScore = greatest(
      lit(1d) - abs(length(regexp_replace(col("text"), "\\s+", "")) / denom - 5) / 5, lit(0d))
    val punctRatio = (length(col("text")) -
      length(regexp_replace(col("text"), "[^.,;:!?]", ""))) /
      greatest(length(col("text")), lit(1)).cast("double")
    round(lit(1e-9) + lit(0.35) * lenScore + lit(0.25) * (lit(1d) - stopRatio)
      + lit(0.2) * wlScore + lit(0.2) * (lit(1d) - least(punctRatio * 10, lit(1d))) + 1e-9, 6)
  }

  private def edgeDocs = {
    import spark.implicits._
    Seq(
      "", " ", "   ", "a", ".", "\t", "\na\tb  c\n", "the the the of to",
      "le la les de et un der die das", "的一是不了人我在有他这中大来上",
      "一二三四五六七八九十一二 mixed 的 text", "!!! ??? ;;; ,,, :::",
      "emoji 😀😀 test 😀 done", "Türkçe İstanbul DİE die",
      "The Quick BROWN fox, and THE lazy dog. Is it? To be; of course:",
      Seq.fill(200)("word").mkString(" "), "x" * 5000,
      "tabs\tandvertical\fforms\rreturns"
    ).zipWithIndex.map { case (t, i) => (10000000L + i, t) }.toDF("doc_id", "text")
  }

  private def check(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
    val rows = df
      .select(col("doc_id"),
        operators.TextAnalysis.predLangExpr.as("new_lang"), oldPredLang.as("old_lang"),
        operators.TextAnalysis.qualityExpr.as("new_q"), oldQuality.as("old_q"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[String]("new_lang") == r.getAs[String]("old_lang"),
        s"$label doc ${r.getLong(0)}: lang ${r.getAs[String]("new_lang")} != ${r.getAs[String]("old_lang")}")
      assert(r.getAs[Double]("new_q") == r.getAs[Double]("old_q"),
        s"$label doc ${r.getLong(0)}: quality ${r.getAs[Double]("new_q")} != ${r.getAs[Double]("old_q")}")
    }
  }

  test("native pred_lang/quality equal the regex+HOF forms on the corpus") {
    check(Tables.documents(spark, sf).select("doc_id", "text"), "corpus")
  }

  test("native pred_lang/quality equal the regex+HOF forms on edge strings") {
    check(edgeDocs, "edge")
  }

  test("text_scan hit columns equal the filter-lambda counts (tx_langid shape)") {
    val words = split(trim(lower(col("text"))), "\\s+")
    val oldHits = langStops.zipWithIndex.map { case (ws, i) =>
      size(filter(words, w => ws.map(w === _).reduce(_ || _))).as(s"o$i")
    }
    val sc = graft.functions.HashExprs.text_scan(col("text"), langStops)
    val rows = edgeDocs.union(Tables.documents(spark, sf).select("doc_id", "text"))
      .select(col("doc_id"), sc.as("sc"))
      .select(col("doc_id") +:
        (0 until 4).map(i => element_at(col("sc.hits"), i + 1).as(s"n$i")) :+
        col("sc.cjk").as("ncjk"): _*)
      .join(edgeDocs.union(Tables.documents(spark, sf).select("doc_id", "text"))
        .select(col("doc_id") +: oldHits :+
          length(regexp_replace(col("text"), "[^一-鿿]", "")).as("ocjk"): _*),
        Seq("doc_id"))
      .collect()
    for (r <- rows; i <- 0 until 4)
      assert(r.getAs[Int](s"n$i") == r.getAs[Int](s"o$i"), s"doc ${r.getLong(0)} set $i")
    rows.foreach(r => assert(r.getAs[Int]("ncjk") == r.getAs[Int]("ocjk")))
  }
}
