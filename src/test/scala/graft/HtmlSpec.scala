package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** tx_html end-to-end: the extractor recovers every corpus doc's text
  * from its synthesized page (boilerplate dropped, content kept), and
  * pipe_curate's funnel accepts raw-HTML fixtures — running the
  * curation report over extracted text yields exactly the report the
  * clean corpus produces.
  */
class HtmlSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every corpus doc round-trips: content kept, boilerplate dropped") {
    val rows = SparkEntry.queries("tx_html")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("recovered"), s"doc ${r.getAs[Long]("doc_id")} not recovered")
      assert(r.getAs[Long]("n_blocks") == 4L)
      assert(r.getAs[Long]("n_kept") == 1L,
        "exactly the content paragraph must survive the density gate")
      // the head/nav/footer boilerplate really was present and stripped
      assert(r.getAs[Long]("raw_chars") > r.getAs[Long]("kept_chars") + 200)
    }
  }

  test("pipe_curate accepts raw-HTML fixtures via the extractor") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text")
    // the raw-HTML fixture: what a crawl hands the pipeline
    val extracted = operators.TextAnalysis.htmlExtract(docs)
      .select(col("doc_id"), col("source"), col("kept_text").as("text"))
    val viaHtml = operators.TextAnalysis.curateOf(extracted).collect()
    // clean-corpus reference (extraction trims, so compare trimmed)
    val clean = operators.TextAnalysis.curateOf(
      docs.withColumn("text", trim(col("text")))).collect()
    assert(viaHtml.map(_.toString).toSeq == clean.map(_.toString).toSeq,
      "the funnel over extracted HTML must equal the clean-corpus funnel")
  }
}
