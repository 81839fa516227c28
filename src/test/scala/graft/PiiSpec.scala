package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** tx_pii: the shared pattern expressions against planted ground
  * truth (the oracle run only proves Spark == DuckDB; this proves
  * both engines match the INTENDED redaction semantics), plus the
  * injection-channel invariants on the real corpus.
  */
class PiiSpec extends AnyFunSuite {
  import SparkTestSession._

  private def scan(texts: Seq[String]) = {
    import spark.implicits._
    texts.toDF("t2")
      .select(col("t2") +: operators.TextAnalysis.piiCols(col("t2")): _*)
      .collect()
      .map(r => r.getAs[String]("t2") ->
        (r.getAs[Long]("n_email"), r.getAs[Long]("n_url"),
          r.getAs[Long]("n_phone"), r.getAs[Long]("n_ipv4"),
          r.getAs[Boolean]("has_pii"), r.getAs[Long]("pii_chars")))
      .toMap
  }

  test("planted PII strings are counted and sized as intended") {
    val got = scan(Seq(
      "clean text with no pii at all",
      "mail a.b-c+1@host.co and x@y.io today",          // 2 emails
      "docs at https://a.b/c?q=1 and http://z.org end", // 2 urls
      "call 555-1234 or 555-0000; not 55-1234 no",      // 2 phones (55-1234 rejected)
      "host 10.0.0.1 and 192.168.255.3 up",             // 2 ipv4
      "multi u@v.ws https://w.x 555-9999 1.2.3.4"))     // one of each
    assert(got("clean text with no pii at all") === ((0L, 0L, 0L, 0L, false, 0L)))
    assert(got("mail a.b-c+1@host.co and x@y.io today")._1 === 2L)
    assert(got("docs at https://a.b/c?q=1 and http://z.org end")._2 === 2L)
    assert(got("call 555-1234 or 555-0000; not 55-1234 no")._3 === 2L)
    assert(got("host 10.0.0.1 and 192.168.255.3 up")._4 === 2L)
    val multi = got("multi u@v.ws https://w.x 555-9999 1.2.3.4")
    assert(multi === ((1L, 1L, 1L, 1L, true,
      "u@v.ws".length + "https://w.x".length + "555-9999".length + "1.2.3.4".length)))
  }

  test("pii_chars equals the length removed by sequential redaction") {
    // An email embedded in a URL: the URL pattern swallows it first,
    // so redaction must not double-count — pii_chars is defined by
    // the sequential-order semantics both engines share.
    val s = "go https://u@v.ws/p now"
    val (ne, nu, _, _, _, chars) = scan(Seq(s))(s)
    assert(ne === 1L && nu === 1L) // counts are on the ORIGINAL text
    assert(chars === "u@v.ws".length + ("https://" + "/p").length)
  }

  test("injection channel hits every pattern class on the real corpus") {
    val rows = SparkEntry.queries("tx_pii")(spark, sf).collect()
    assert(rows.length === 500)
    def tot(c: String) = rows.map(_.getAs[Long](c)).sum
    assert(tot("n_email") >= 70 && tot("n_url") >= 45 &&
      tot("n_phone") >= 38 && tot("n_ipv4") >= 29)
    // injected docs are flagged; clean docs are not
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val injected = id % 7 == 0 || id % 11 == 0 || id % 13 == 0 || id % 17 == 0
      assert(r.getAs[Boolean]("has_pii") === injected,
        s"doc $id: has_pii=${r.getAs[Boolean]("has_pii")} expected $injected")
    }
  }
}
