package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-independent invariants for the round's statistical
  * inference operators (q35_ttest, q36_corr, q39_assoc,
  * q40_theil_sen, dq_checksum) — planted fixtures with known
  * closed-form answers, plus structural properties the DuckDB
  * oracle replay cannot distinguish from coincidence.
  */
class InferenceSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q35_ttest: planted two-sample fixture reproduces the textbook Welch t") {
    import spark.implicits._
    // group a: 0,1,...,9 (mean 4.5, var 55/6); group b: shifted +2
    val a = (0 until 10).map(_.toDouble)
    val b = a.map(_ + 2.0)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    val s = df.groupBy("g").agg(count(lit(1)).as("n"), avg("v").as("m"),
      var_samp(col("v")).as("s2")).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val (na, ma, va) = s("a"); val (nb, mb, vb) = s("b")
    val t = (ma - mb) / math.sqrt(va / na + vb / nb)
    // identical variances, n=10: t = -2 / sqrt(2*var/10)
    val expected = -2.0 / math.sqrt(2 * (55.0 / 6) / 10)
    assert(math.abs(t - expected) < 1e-12)
    // Welch df with equal variances and equal n collapses to 2n-2
    val se2 = va / na + vb / nb
    val df_w = se2 * se2 / (math.pow(va / na, 2) / (na - 1) + math.pow(vb / nb, 2) / (nb - 1))
    assert(math.abs(df_w - 18.0) < 1e-9)
  }

  test("q35_ttest over testdata: antisymmetric in the pair and df <= n_a+n_b-2") {
    val rows = SparkEntry.queries("q35_ttest")(spark, sf).collect()
    assert(rows.length == 10) // C(5,2) event-type pairs
    rows.foreach { r =>
      val na = r.getAs[Long]("n_a"); val nb = r.getAs[Long]("n_b")
      val dfw = r.getAs[Double]("welch_df")
      assert(dfw <= na + nb - 2 + 1e-6, s"Welch df $dfw above pooled bound")
      assert(dfw >= math.min(na, nb) - 1 - 1e-6, s"Welch df $dfw below min-side bound")
      val sig = r.getAs[Boolean]("significant")
      assert(sig == (math.abs(r.getAs[Double]("t_stat")) > 1.96) ||
        math.abs(math.abs(r.getAs[Double]("t_stat")) - 1.96) < 1e-3)
    }
  }

  test("q36_corr: all correlations in [-1,1]; corr(x,x)=1 sanity") {
    val r = SparkEntry.queries("q36_corr")(spark, sf).collect()(0)
    Seq("corr_qty_price", "corr_qty_disc", "corr_qty_tax",
      "corr_price_disc", "corr_price_tax", "corr_disc_tax").foreach { c =>
      val v = r.getAs[Double](c)
      assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"$c = $v out of range")
    }
    val self = Tables.lineitem(spark, sf)
      .agg(corr(col("l_quantity"), col("l_quantity"))).collect()(0).getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
  }

  test("q39_assoc: lift/support/confidence agree with a brute-force recount") {
    val rows = SparkEntry.queries("q39_assoc")(spark, sf).collect()
    assert(rows.length == 20)
    val baskets = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = baskets.map(_._1).distinct.length.toDouble
    val itemC = baskets.groupBy(_._2).view.mapValues(_.length).toMap
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val pairC = byOrder.values.flatMap(ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j)))
      .groupBy(identity).view.mapValues(_.size).toMap
    rows.foreach { r =>
      val pa = r.getAs[Long]("part_a"); val pb = r.getAs[Long]("part_b")
      val nab = pairC((pa, pb))
      assert(nab == r.getAs[Long]("n_ab"))
      assert(itemC(pa) == r.getAs[Long]("n_a") && itemC(pb) == r.getAs[Long]("n_b"))
      val lift = nab * nOrders / (itemC(pa).toDouble * itemC(pb))
      assert(math.abs(lift - r.getAs[Double]("lift")) < 1e-4)
      assert(r.getAs[Double]("conf_a_b") <= 1 + 1e-9 && r.getAs[Double]("conf_b_a") <= 1 + 1e-9)
    }
    // ranked by lift descending
    val lifts = rows.map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (x, y) => x >= y })
  }

  test("q40_theil_sen: planted line with one gross outlier still recovers the slope") {
    import spark.implicits._
    // y = 7x + 100 over 30 days, day 15 corrupted by +1e6
    val pts = (0 until 30).map(d => (d.toLong, 7.0 * d + 100 + (if (d == 15) 1e6 else 0)))
    val daily = pts.toDF("day", "rev")
    val slopes = daily.as("a").join(daily.as("b"), col("a.day") < col("b.day"))
      .select(((col("b.rev") - col("a.rev")) / (col("b.day") - col("a.day"))).as("s"))
    val slope = slopes.agg(percentile(col("s"), lit(0.5))).collect()(0).getDouble(0)
    assert(math.abs(slope - 7.0) < 1e-9, s"Theil-Sen slope $slope != 7 despite outlier")
    val intercept = daily.select(percentile(col("rev") - lit(slope) * col("day"), lit(0.5)))
      .collect()(0).getDouble(0)
    assert(math.abs(intercept - 100.0) < 1e-9)
  }

  test("q40_theil_sen over testdata returns one finite fit row") {
    val r = SparkEntry.queries("q40_theil_sen")(spark, sf).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_weeks") > 0)
    assert(!r(0).isNullAt(r(0).fieldIndex("slope")))
  }

  test("q41_median_hist: histogram percentiles equal the sorted-array definition") {
    val rows = SparkEntry.queries("q41_median_hist")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byFlag = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val vs = byFlag(r.getString(0))
      assert(r.getAs[Long]("n") == vs.length)
      // smallest value whose cumulative count reaches ceil(p*n)
      def disc(p: Double) = vs(math.ceil(p * vs.length).toInt - 1)
      assert(r.getAs[Double]("median_qty") == disc(0.5))
      assert(r.getAs[Double]("p90_qty") == disc(0.9))
    }
  }

  test("ev_slo_burn: burn rates reconcile with a planted all-error hour") {
    import spark.implicits._
    // 24 planted hours: hour 23 is 100% errors, others clean
    val hb = (0 until 24).map(h => (h.toLong, 100L, if (h == 23) 100L else 0L))
      .toDF("h", "n", "n_err")
    def w(p: Long) = org.apache.spark.sql.expressions.Window
      .orderBy("h").rangeBetween(-p, 0)
    val burn = hb
      .withColumn("b_short", sum("n_err").over(w(5)) / (sum("n").over(w(5)).cast("double") * 0.25))
      .withColumn("b_long", sum("n_err").over(w(23)) / (sum("n").over(w(23)).cast("double") * 0.25))
      .filter(col("h") === 23).collect()(0)
    // short window: 100/600 errors -> burn (1/6)/0.25 = 2/3; long: 100/2400 -> 1/6
    assert(math.abs(burn.getAs[Double]("b_short") - 2.0 / 3) < 1e-12)
    assert(math.abs(burn.getAs[Double]("b_long") - 1.0 / 6) < 1e-12)
    val rows = SparkEntry.queries("ev_slo_burn")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_alerts") <= r.getAs[Long]("n_hours"))
      assert(r.getAs[Double]("max_burn_long") <= r.getAs[Double]("max_burn_short") + 4.0,
        "long-window burn cannot wildly exceed short on smooth data")
    }
  }

  test("tx_langid_confusion: recall shares sum to 1 per true language") {
    val rows = SparkEntry.queries("tx_langid_confusion")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val tot = rs.map(_.getAs[Double]("recall_share")).sum
      assert(math.abs(tot - 1.0) < 1e-3, s"$lang recall shares sum to $tot")
    }
    // overall accuracy must beat chance (20%) on the 5-lang corpus
    val n = rows.map(_.getAs[Long]("n")).sum.toDouble
    val correct = rows.filter(_.getAs[Boolean]("correct")).map(_.getAs[Long]("n")).sum
    assert(correct / n > 0.2, s"heuristic accuracy ${correct / n} not above chance")
  }

  test("ev_forecast_holt: impulse weights degenerate to SES at beta=0 and track a trend") {
    // replicate the weight recursion at beta = 0: must equal the SES weights
    def weights(alpha: Double, beta: Double, n: Int): Seq[Double] =
      (1 to n).map { k =>
        var l = 0.0; var b = 0.0
        for (t <- 1 to k) {
          val x = if (t == 1) 1.0 else 0.0
          val lPrev = l
          l = alpha * x + (1 - alpha) * (l + b)
          b = beta * (l - lPrev) + (1 - beta) * b
        }
        l + b
      }
    val ses = (1 to 24).map(k => 0.25 * math.pow(0.75, k - 1))
    weights(0.25, 0.0, 24).zip(ses).foreach { case (w, s) =>
      assert(math.abs(w - s) < 1e-12, s"beta=0 Holt weight $w != SES $s")
    }
    // on a pure linear ramp x_t = t, Holt's forecast must overshoot
    // SES's (the trend term anticipates growth; SES structurally lags)
    val hw = weights(0.25, 0.1, 24)
    val ramp = (1 to 24).map(_.toDouble)
    def fc(w: Seq[Double]) = w.zipWithIndex.map { case (wk, i) => wk * ramp(23 - i) }.sum
    assert(fc(hw) > fc(ses), "Holt must anticipate a linear trend beyond SES")
    val rows = SparkEntry.queries("ev_forecast_holt")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("forecast") >= 0.0))
  }

  test("ev_prop_test: planted 60/100 vs 40/100 arms give the textbook z") {
    // z = (0.6-0.4)/sqrt(0.5*0.5*(1/100+1/100)) = 0.2/sqrt(0.005)
    val expected = 0.2 / math.sqrt(0.5 * 0.5 * (1.0 / 100 + 1.0 / 100))
    assert(math.abs(expected - 2.8284271247461903) < 1e-12)
    val r = SparkEntry.queries("ev_prop_test")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("conv_a") <= row.getAs[Long]("n_a"))
    assert(row.getAs[Long]("conv_b") <= row.getAs[Long]("n_b"))
    if (!row.isNullAt(row.fieldIndex("z"))) {
      val z = row.getAs[Double]("z")
      assert(row.getAs[Boolean]("significant") == (math.abs(z) > 1.96) ||
        math.abs(math.abs(z) - 1.96) < 1e-3)
    }
  }

  test("q43_bootstrap: CI brackets the sample mean and is deterministic across runs") {
    val r1 = SparkEntry.queries("q43_bootstrap")(spark, sf).collect()(0)
    val r2 = SparkEntry.queries("q43_bootstrap")(spark, sf).collect()(0)
    assert(r1 == r2, "hash-seeded bootstrap must be run-deterministic")
    val lo = r1.getAs[Double]("ci_lo"); val hi = r1.getAs[Double]("ci_hi")
    val sm = r1.getAs[Double]("sample_mean"); val bm = r1.getAs[Double]("boot_mean")
    assert(lo <= hi)
    assert(lo <= sm && sm <= hi, s"95% CI [$lo, $hi] should bracket sample mean $sm")
    assert(lo <= bm && bm <= hi, s"95% CI [$lo, $hi] should bracket bootstrap mean $bm")
    assert(r1.getAs[Long]("n_weeks") > 0)
  }

  test("dq_checksum is partition-order invariant and detects a one-row change") {
    val base = SparkEntry.queries("dq_checksum")(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_rows"), r.getAs[Long]("checksum")))
    // recompute from a differently-partitioned scan: same checksums
    val h = graft.functions.Hashing.charFold(concat(
      col("l_orderkey").cast("string"), lit("|"), col("l_partkey").cast("string"),
      lit("|"), col("l_suppkey").cast("string"), lit("|"), col("l_returnflag"),
      lit("|"), col("l_linestatus")))
    val re = Tables.lineitem(spark, sf).repartition(7)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), (sum(h.cast("decimal(38,0)")) % 1000000007L)
        .cast("long").as("ck"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Long]("ck")))
      .sortBy(_._1)
    assert(base.sortBy(_._1).toSeq == re.toSeq)
    // perturb one key: the affected group's checksum must move
    val perturbed = Tables.lineitem(spark, sf)
      .withColumn("l_orderkey",
        when(monotonically_increasing_id() === 0, col("l_orderkey") + 1)
          .otherwise(col("l_orderkey")))
    val h2 = graft.functions.Hashing.charFold(concat(
      col("l_orderkey").cast("string"), lit("|"), col("l_partkey").cast("string"),
      lit("|"), col("l_suppkey").cast("string"), lit("|"), col("l_returnflag"),
      lit("|"), col("l_linestatus")))
    val pert = perturbed.groupBy("l_returnflag")
      .agg((sum(h2.cast("decimal(38,0)")) % 1000000007L).cast("long").as("ck"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("ck")).toMap
    val baseMap = base.map(t => t._1 -> t._3).toMap
    assert(pert.exists { case (k, v) => baseMap(k) != v },
      "single-row perturbation left every group checksum unchanged")
  }
}
