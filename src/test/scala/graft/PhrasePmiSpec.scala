package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force cross-checks for the positional phrase search
  * (ix_phrase) and PMI collocation head (tx_pmi).
  */
class PhrasePmiSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ix_phrase matches a driver-side token scan exactly") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase.split("\\s+").toSeq))
    val rows = SparkEntry.queries("ix_phrase")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val terms = r.getString(0).split(" ").toSeq
      var nDocs = 0L
      var nOcc = 0L
      docs.foreach { case (_, toks) =>
        val hits = toks.sliding(terms.length).count(_ == terms)
        if (hits > 0) { nDocs += 1; nOcc += hits }
      }
      assert(r.getAs[Long]("n_docs") == nDocs,
        s"${r.getString(0)}: n_docs ${r.getAs[Long]("n_docs")} != scan $nDocs")
      assert(r.getAs[Long]("n_occ") == nOcc,
        s"${r.getString(0)}: n_occ ${r.getAs[Long]("n_occ")} != scan $nOcc")
    }
  }

  test("tx_pmi: ranks dense, pmi non-increasing, pair floor held, formula re-derives") {
    val rows = SparkEntry.queries("tx_pmi")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length).toSeq)
    val pmis = rows.map(_.getAs[Double]("pmi"))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b }, "pmi not sorted")
    assert(rows.forall(_.getAs[Long]("c_pair") >= 5))
    // re-derive the top row's pmi from the raw counts + corpus totals
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).trim.toLowerCase.split("\\s+").toSeq)
    val n1 = docs.map(_.length).sum.toDouble
    val n2 = docs.map(d => math.max(d.length - 1, 0)).sum.toDouble
    def fold(w: String): Long =
      w.foldLeft(0L)((a, c) => (a * 31L + c.toLong) % 1000000007L)
    val uni = docs.flatten.groupBy(fold).map { case (h, ws) => h -> ws.length.toLong }
    val big = docs.flatMap(d => d.map(fold).sliding(2).filter(_.length == 2)
      .map(p => p.head * 1000000007L + p(1)))
      .groupBy(identity).map { case (bp, xs) => bp -> xs.length.toLong }
    val top = rows.head
    val (w1, w2) = (top.getAs[Long]("w1"), top.getAs[Long]("w2"))
    val cPair = big(w1 * 1000000007L + w2)
    assert(cPair == top.getAs[Long]("c_pair"))
    assert(uni(w1) == top.getAs[Long]("c1"))
    assert(uni(w2) == top.getAs[Long]("c2"))
    val expected = math.log(((cPair * n1) * n1) / ((n2 * uni(w1)) * uni(w2))) / math.log(2.0)
    assert(math.abs(top.getAs[Double]("pmi") - expected) < 1e-5,
      s"pmi ${top.getAs[Double]("pmi")} vs recomputed $expected")
  }
}
