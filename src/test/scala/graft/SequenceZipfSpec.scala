package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks for the 3-step path miner (ev_paths_topk) and the
  * Zipf-fit diagnostic (tx_zipf).
  */
class SequenceZipfSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ev_paths_topk matches a driver-side session scan") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000.0,
        r.getLong(2), r.getString(3)))
    val triples = ev.groupBy(_._1).values.flatMap { rows =>
      rows.toSeq.sortBy(r => (r._2, r._3)).sliding(3).filter(_.length == 3)
        .flatMap { s =>
          val (a, b, c) = (s(0), s(1), s(2))
          if (b._2 - a._2 <= 1800 && c._2 - b._2 <= 1800)
            Some((a._4, b._4, c._4))
          else None
        }
    }.toSeq
    val expected = triples.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val total = expected.values.sum.toDouble
    val top = expected.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(10)
    val got = SparkEntry.queries("ev_paths_topk")(spark, sf).collect()
    assert(got.length == math.min(10, expected.size))
    got.zip(top).foreach { case (r, ((a, b, c), n)) =>
      assert((r.getString(1), r.getString(2), r.getString(3)) == ((a, b, c)),
        s"rank ${r.getLong(0)} path mismatch")
      assert(r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("share") - n / total) < 1e-5)
    }
  }

  test("tx_zipf: slope negative, r2 in [0,1], one source re-derived") {
    val rows = SparkEntry.queries("tx_zipf")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ranks") > 0 && r.getAs[Long]("n_ranks") <= 200)
      assert(r.getAs[Double]("zipf_slope") < 0.0,
        "term frequency must decrease with rank")
      val r2 = r.getAs[Double]("fit_r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
    // re-derive one source's slope from a driver-side histogram
    val src = rows.head.getString(0)
    def fold(w: String): Long =
      w.foldLeft(0L)((a, c) => (a * 31L + c.toLong) % 1000000007L)
    val tf = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("source") === src)
      .select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+").map(fold))
      .groupBy(identity).map { case (h, xs) => (h, xs.length.toLong) }
    val ranked = tf.toSeq.sortBy { case (h, c) => (-c, h) }.take(200)
      .zipWithIndex.map { case ((_, c), i) =>
        (math.log(i + 1.0) / math.log(2), math.log(c.toDouble) / math.log(2)) }
    val n = ranked.length
    val sx = ranked.map(_._1).sum; val sy = ranked.map(_._2).sum
    val sxy = ranked.map(p => p._1 * p._2).sum
    val sxx = ranked.map(p => p._1 * p._1).sum
    val slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    assert(math.abs(rows.head.getAs[Double]("zipf_slope") - slope) < 1e-4,
      s"slope ${rows.head.getAs[Double]("zipf_slope")} vs recomputed $slope")
  }
}
