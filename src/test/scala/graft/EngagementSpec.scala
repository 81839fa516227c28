package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the engagement / interpolation operators
  * (ev_active_users, q34_interpolate) independent of the oracle.
  */
class EngagementSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ev_active_users: WAU bounds DAU, first day equal, stickiness in (0,1]") {
    val rows = SparkEntry.queries("ev_active_users")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dau = r.getAs[Long]("dau")
      val wau = r.getAs[Long]("wau")
      val st = r.getAs[Double]("stickiness")
      assert(wau >= dau, s"rolling 7-day distinct $wau below daily $dau")
      assert(st > 0.0 && st <= 1.0)
      assert(r.getAs[Boolean]("wau_est_ok"), "HLL estimate outside 5% of exact")
    }
    val first = rows.minBy(_.getAs[java.sql.Timestamp]("day").getTime)
    assert(first.getAs[Long]("dau") == first.getAs[Long]("wau"),
      "first day's window contains only itself")
    // WAU can never exceed the sum of the 7 daily DAUs it covers
    val dauByDay = rows.map(r =>
      r.getAs[java.sql.Timestamp]("day").getTime / 86400000L -> r.getAs[Long]("dau")).toMap
    rows.foreach { r =>
      val d = r.getAs[java.sql.Timestamp]("day").getTime / 86400000L
      val cap = (0 to 6).flatMap(k => dauByDay.get(d - k)).sum
      assert(r.getAs[Long]("wau") <= cap)
    }
  }

  test("q34_interpolate: observed buckets keep their average, holes stay between anchors") {
    val rows = SparkEntry.queries("q34_interpolate")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.getAs[java.lang.Double]("value_li")).map(_.doubleValue),
        r.getAs[Boolean]("interpolated")))
    assert(rows.nonEmpty)
    // observed rows are never flagged; flagged rows are holes with a value
    rows.foreach { case (_, _, n, li, flag) =>
      if (flag) assert(n == 0 && li.isDefined)
      if (n > 0) assert(!flag && li.isDefined)
    }
    assert(rows.exists(_._5), "no interior hole was interpolated at this SF")
    // per type: every interpolated value lies between its two anchors
    rows.groupBy(_._1).foreach { case (_, series0) =>
      val series = series0.sortBy(_._2)
      var prev: Option[Double] = None
      var i = 0
      while (i < series.length) {
        val (_, _, n, li, flag) = series(i)
        if (n > 0) prev = li
        else if (flag) {
          val next = series.drop(i + 1).find(_._3 > 0).flatMap(_._4)
          (prev, next, li) match {
            case (Some(p), Some(q), Some(v)) =>
              assert(v >= math.min(p, q) - 1e-4 && v <= math.max(p, q) + 1e-4,
                s"interpolated $v outside anchor range [$p, $q]")
            case _ => fail("interpolated hole without both anchors")
          }
        } else assert(li.isEmpty == prev.isEmpty ||
          series.drop(i + 1).forall(_._3 == 0L),
          "unflagged hole must lack an anchor on at least one side")
        i += 1
      }
    }
  }

  test("ev_ltv: cumulative monotone per cohort, totals reconcile with raw purchases") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("ev_ltv")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cohort")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("week_offset"))
      val cums = sorted.map(_.getAs[Double]("cum_revenue"))
      assert(cums.zip(cums.tail).forall { case (a, b) => b >= a - 1e-9 })
      assert(math.abs(cums.head - sorted.head.getAs[Double]("revenue")) < 1e-9)
      sorted.foreach { r =>
        assert(math.abs(r.getAs[Double]("ltv_per_user") -
          r.getAs[Double]("cum_revenue") / r.getAs[Long]("n_users")) < 1e-3)
      }
    }
    val totalLtv = rows.map(_.getAs[Double]("revenue")).sum
    val totalRaw = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(round(col("value") * 100).cast("long"))).collect()(0).getLong(0) / 100.0
    assert(math.abs(totalLtv - totalRaw) < 0.05,
      s"triangle total $totalLtv vs raw purchases $totalRaw")
  }

  test("ev_gini matches a driver-side exact computation") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("ev_gini")(spark, sf).collect()(0)
    val cents = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(round(col("value") * 100).cast("long")).as("c"),
        first("user_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .sortBy(x => (x._2, x._1)).map(_._2)
    val n = cents.length.toLong
    val tot = cents.sum
    val wsum = cents.zipWithIndex.map { case (c, i) => (i + 1L) * c }.sum
    val gini = 2.0 * wsum / (n.toDouble * tot) - (n + 1) / n.toDouble
    assert(r.getAs[Long]("n_users") == n)
    assert(math.abs(r.getAs[Double]("gini") - gini) < 1e-5,
      s"gini ${r.getAs[Double]("gini")} vs exact $gini")
    val k = n / 10
    val topShare = cents.sorted.takeRight(k.toInt).sum.toDouble / tot
    assert(math.abs(r.getAs[Double]("top10_share") - topShare) < 1e-5)
    assert(r.getAs[Double]("gini") >= 0.0 && r.getAs[Double]("gini") < 1.0)
  }

  test("ev_attrib_markov: credits sum to 1 and an only-path channel takes all credit") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("ev_attrib_markov")(spark, sf).collect()
    assert(rows.length == 4)
    val credits = rows.flatMap(r => Option(r.getAs[java.lang.Double]("credit")).map(_.doubleValue))
    assert(credits.nonEmpty)
    assert(math.abs(credits.sum - 1.0) < 1e-4, s"credits sum to ${credits.sum}")
    rows.foreach { r =>
      val re = r.getAs[Double]("removal_effect")
      assert(re >= 0.0 && re <= 1.0)
      assert(r.getAs[Double]("removed_conv") <= r.getAs[Double]("full_conv") + 1e-9)
    }
    // planted chain: every conversion goes START -> click -> purchase, so
    // removing click kills all conversion (RE = 1) while a channel that
    // never reaches purchase (view) has RE = 0
    val q = Seq(
      ("START", "click", 0.5), ("START", "view", 0.5),
      ("click", "CONV", 1.0), ("view", "NULL", 1.0))
    def solve(qq: Seq[(String, String, Double)]): Double = {
      val states = qq.map(_._1).distinct
      var v = states.map(_ -> 0.0).toMap
      for (_ <- 1 to 60) v = states.map { st =>
        st -> qq.filter(_._1 == st).map { case (_, t, p) =>
          if (t == "CONV") p else if (t == "NULL") 0.0 else p * v.getOrElse(t, 0.0)
        }.sum
      }.toMap
      v("START")
    }
    val full = solve(q)
    assert(math.abs(full - 0.5) < 1e-12)
    val noClick = solve(q.map { case (f, t, p) => (f, if (t == "click") "NULL" else t, p) })
    assert(noClick == 0.0)
    val noView = solve(q.map { case (f, t, p) => (f, if (t == "view") "NULL" else t, p) })
    assert(math.abs(noView - full) < 1e-12, "removing a dead-end channel must not change conversion")
  }
}
