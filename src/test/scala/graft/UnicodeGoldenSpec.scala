package graft

import scala.io.Source

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference parity for the Unicode word tokenizer.
  *
  * The sf corpora are pure ASCII, so GoldenSpec cannot see the
  * difference between Python's Unicode \w and an ASCII-only \w —
  * yet the reference explicitly targets Chinese model outputs. These
  * fixtures (tools/gen_golden_unicode.py, running the actual reference
  * dli implementation over a fixed multilingual corpus) pin the
  * [\p{L}\p{N}_]+ tokenizer: CJK tokens, unsegmented CJK runs,
  * accented Latin, Greek case folding, full-width digits, and
  * apostrophe/dash splitting must all tokenize exactly as the
  * reference does.
  */
class UnicodeGoldenSpec extends AnyFunSuite {
  import SparkTestSession._

  private val Tol = 1.1e-6

  private def resource(name: String): Vector[String] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    assert(in != null, s"missing fixture golden/$name — run tools/gen_golden_unicode.py")
    val src = Source.fromInputStream(in, "UTF-8")
    try src.getLines().toVector finally src.close()
  }

  private lazy val docs = {
    import spark.implicits._
    val rows = resource("unicode_corpus.tsv").map { line =>
      val Array(id, source, text) = line.split("\t", 3)
      (id.toLong, source, text)
    }
    rows.toDF("doc_id", "source", "text")
  }

  test("dli signature matches the reference on a multilingual corpus") {
    val (header, rows) = {
      val lines = resource("unicode_dli_signature.csv")
      (lines.head.split(","), lines.tail.map(_.split(",", -1)))
    }
    val got = operators.Audit.dliSigOf(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got.size == rows.size)
    for (row <- rows) {
      val m = header.zip(row).toMap
      val r = got(m("source"))
      for (k <- header if k != "source") {
        val e = m(k).toDouble
        val a = r.getAs[Double](k)
        assert(math.abs(a - e) <= Tol, s"${m("source")}.$k: spark=$a reference=$e")
      }
    }
  }

  test("bigram distribution matches the reference on a multilingual corpus") {
    val rows = resource("unicode_dli_bigrams.csv").tail.map(_.split(",", -1))
    val got = operators.Audit.dliBigramsOf(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rank")) ->
        (r.getAs[String]("bigram"), r.getAs[Double]("p"))).toMap
    assert(got.size == rows.size,
      s"${got.size} Spark bigrams vs ${rows.size} reference bigrams")
    for (Array(source, rank, bigram, p) <- rows) {
      val (gotBigram, gotP) = got((source, rank.toLong))
      assert(gotBigram == bigram, s"$source rank $rank: spark=$gotBigram reference=$bigram")
      assert(math.abs(gotP - p.toDouble) <= Tol, s"$source/$bigram: p spark=$gotP reference=$p")
    }
  }
}
