package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the retrieval-eval / CEP-sequence / Kneser-Ney /
  * stats-drift additions beyond their oracle hash checks: metric
  * range + cross-retriever reconciliation for ix_eval, a driver-side
  * replay of the negation semantics for ev_sequence, the
  * probabilities-sum-to-one identity for tx_ppl_kn, and slice
  * accounting for dq_stats_diff.
  */
class EvalCepKnSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ix_eval metrics are in range and reconcile with the brute-force baseline") {
    val rows = SparkEntry.queries("ix_eval")(spark, sf).collect()
    assert(rows.length == 50)
    for (r <- rows) {
      val hits = r.getAs[Long]("hits")
      val rTotal = r.getAs[Long]("r_total")
      assert(hits >= 0 && hits <= math.min(rTotal, 10))
      val mrr = r.getAs[Double]("mrr")
      assert(mrr >= 0 && mrr <= 1 + 1e-9)
      assert((mrr > 0) == (hits > 0), "mrr must be positive iff any hit landed")
      if (!r.isNullAt(r.fieldIndex("ndcg"))) {
        assert(r.getAs[Double]("ndcg") >= 0 && r.getAs[Double]("ndcg") <= 1 + 1e-9)
        assert(r.getAs[Double]("recall") >= 0 && r.getAs[Double]("recall") <= 1 + 1e-9)
        // binary relevance: perfect ndcg iff the page is all-relevant
        // up to the achievable depth
        if (hits == math.min(rTotal, 10) && hits > 0 && mrr == 1.0)
          assert(r.getAs[Double]("ndcg") >= 0.99 || hits < math.min(rTotal, 10))
      } else assert(rTotal == 0, "NULL metrics only when no relevant neighbor exists")
    }
    // hits must agree with the INDEPENDENT window-based retriever
    // (ann_topk's baseline) joined to labels
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long").as("label"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = operators.Ann.bruteTopkWith(spark, sf, 50).collect()
      .groupBy(_.getAs[Long]("query_id"))
    val evalHits = rows.map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("hits")).toMap
    for ((qid, neigh) <- brute) {
      val expected = neigh.count(n => labels(n.getAs[Long]("neighbor_id")) == labels(qid))
      assert(evalHits(qid) == expected, s"query $qid hits diverge from brute force")
    }
  }

  test("ev_sequence matches a driver-side replay of the pattern semantics") {
    val row = SparkEntry.queries("ev_sequence")(spark, sf).collect().head
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val win = 259200000000L
    var anchors = 0L; var completed = 0L; var clean = 0L; var blocked = 0L
    for ((_, evs) <- events.groupBy(_._1)) {
      val sorted = evs.sortBy(e => (e._3, e._4))
      val errBefore = sorted.scanLeft(0L)((acc, e) =>
        acc + (if (e._2 == "error") 1 else 0)).init
      val indexed = sorted.zip(errBefore)
      for (((_, "signup", t1, _), e1) <- indexed) {
        anchors += 1
        val inWin = indexed.filter { case ((_, tp, t, _), _) =>
          tp == "purchase" && t > t1 && t <= t1 + win }
        if (inWin.nonEmpty) {
          completed += 1
          val e2 = inWin.map(_._2).min
          if (e2 == e1) clean += 1 else blocked += 1
        }
      }
    }
    assert(row.getAs[Long]("n_anchors") == anchors)
    assert(row.getAs[Long]("n_completed") == completed)
    assert(row.getAs[Long]("n_clean") == clean)
    assert(row.getAs[Long]("n_blocked") == blocked)
    assert(blocked > 0, "the fixture must exercise the negation branch")
  }

  test("tx_ppl_kn: the smoothed bigram distribution sums to 1 for a seen prev") {
    import graft.functions.Hashing
    val tb = Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 0)
      .select(explode(Hashing.bigramPacks(Hashing.wordHashes(col("text")))).as("bp"))
      .groupBy("bp").agg(count(lit(1)).as("bcnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tb.nonEmpty)
    val P = Hashing.P
    val byPrev = tb.groupBy(_._1 / P)
    val np = tb.keysIterator.map(_ % P).toSeq.groupBy(identity).map { case (c, s) => c -> s.size }
    val bTotal = tb.size.toDouble
    val d = 0.75
    // the prev with the largest continuation fan-out exercises both terms
    val (p, conts) = byPrev.maxBy(_._2.size)
    val cp = conts.values.sum.toDouble
    val nf = conts.size
    val total = np.keysIterator.map { c =>
      val b = tb.getOrElse(p * P + c, 0L).toDouble
      math.max(b - d, 0) / cp + d * nf / cp * (np(c) / bTotal)
    }.sum
    assert(math.abs(total - 1.0) < 1e-9,
      s"KN mass over the continuation vocabulary must be 1, got $total")
    // and the query itself: finite positive bits, flag consistent
    val rows = SparkEntry.queries("tx_ppl_kn")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val bits = r.getAs[Double]("bits")
      assert(!bits.isNaN && !bits.isInfinite && bits > 0)
      assert(r.getAs[Boolean]("high_ppl_kn") == (bits >= 5.0))
    }
  }

  test("dq_stats_diff slice accounting reconciles and JSD is a bounded divergence") {
    val rows = SparkEntry.queries("dq_stats_diff")(spark, sf).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      assert(r.getAs[Long]("ndv_std") <= r.getAs[Long]("n_std"))
      assert(r.getAs[Long]("ndv_dlt") <= r.getAs[Long]("n_dlt"))
      if (!r.isNullAt(r.fieldIndex("jsd"))) {
        val jsd = r.getAs[Double]("jsd")
        assert(jsd >= 0 && jsd <= 1 + 1e-9, "base-2 JSD lives in [0,1]")
        assert(r.getAs[Boolean]("drifted") == (jsd > 0.02))
      }
    }
    // documents.n_chars: the two slices must partition the nonnull rows
    val doc = rows.find(_.getAs[String]("column_name") == "n_chars").get
    val total = Tables.documents(spark, sf).filter(col("n_chars").isNotNull).count()
    assert(doc.getAs[Long]("n_std") + doc.getAs[Long]("n_dlt") == total)
    // range_widened must agree with directly-computed slice extrema
    val ext = Tables.documents(spark, sf)
      .select(when(col("doc_id") % 10 < 8, 0).otherwise(1).as("sl"),
        col("n_chars").cast("long").as("v"))
      .groupBy("sl").agg(min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => r.getAs[Int]("sl") -> (r.getAs[Long]("mn"), r.getAs[Long]("mx")))
      .toMap
    val expected = ext(1)._1 < ext(0)._1 || ext(1)._2 > ext(0)._2
    assert(doc.getAs[Boolean]("range_widened") == expected)
  }
}
