package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measured accuracy guarantee for the HLL sketch behind q9_approx
  * (DataSketches HLL at lgK = 14, ~0.8% rsd) against the exact
  * q9_distinct, at sf0.01 and sf0.1. Since round 9 the q9_approx
  * query itself emits within-4% booleans that the DuckDB oracle
  * hash-checks, so the sketch's bound is part of the correctness
  * gate; this spec keeps the MEASURED relative error visible (the
  * oracle only sees the boolean) and pins the query's booleans to
  * all-true.
  */
class ApproxErrorSpec extends AnyFunSuite {
  import SparkTestSession._

  private val maxRelErr = 0.04 // ≈ 4 × the lgK=14 sketch's ~0.8% rsd

  for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
    test(s"HLL counts are within 4×rsd of exact at ${dir.split('/').last}") {
      val exact = SparkEntry.queries("q9_distinct")(spark, dir).collect().map { r =>
        r.getString(0) -> Seq(r.getLong(1), r.getLong(3)) // n_parts, n_orders
      }.toMap
      val approx = Tables.lineitem(spark, dir)
        .groupBy("l_returnflag")
        .agg(
          hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), lit(14))).as("ap"),
          hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"), lit(14))).as("ao"))
        .collect().map(r => r.getString(0) -> Seq(r.getLong(1), r.getLong(2))).toMap
      assert(approx.keySet == exact.keySet, "group keys must match the exact query")
      val errs = for {
        (flag, app) <- approx.toSeq
        (a, e) <- app.zip(exact(flag))
      } yield {
        val rel = math.abs(a - e).toDouble / e
        assert(rel <= maxRelErr,
          f"HLL count $a for group $flag is $rel%.4f off exact $e (bound $maxRelErr)")
        rel
      }
      info(f"max relative error: ${errs.max}%.5f over ${errs.size} counts")
    }

    test(s"q9_approx reports every sketch inside the bound at ${dir.split('/').last}") {
      val rows = SparkEntry.queries("q9_approx")(spark, dir).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getBoolean(r.fieldIndex("parts_ok")), s"parts_ok false for ${r.getString(0)}")
        assert(r.getBoolean(r.fieldIndex("orders_ok")), s"orders_ok false for ${r.getString(0)}")
      }
    }
  }

  test("KLL quantile estimates land within 5 rank points of truth, merge included") {
    import graft.functions.KllAgg._
    // per-group sketches + the merged ALL sketch, graded by the TRUE
    // rank of each estimate (brute-force count ≤ est / n) — the
    // distribution-free measurement behind q26_kll's bracket booleans
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("grp"), col("l_extendedprice").as("x"))
    val perGroup = li.groupBy("grp").agg(kll_sketch_agg(col("x"), 200).as("sk"))
    val merged = perGroup.agg(kll_merge_agg(col("sk"), 200).as("sk"))
      .select(lit("ALL").as("grp"), col("sk"))
    val ests = perGroup.unionByName(merged)
      .select(col("grp"),
        kll_quantile(col("sk"), lit(0.5)).as("e50"),
        kll_quantile(col("sk"), lit(0.95)).as("e95"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
    val data = li.collect().map(r => r.getString(0) -> r.getDouble(1))
    def rankOf(grp: String, v: Double): Double = {
      val xs = if (grp == "ALL") data.map(_._2) else data.filter(_._1 == grp).map(_._2)
      xs.count(_ <= v).toDouble / xs.length
    }
    val errs = for {
      (grp, (e50, e95)) <- ests.toSeq
      (est, q) <- Seq((e50, 0.5), (e95, 0.95))
    } yield {
      val err = math.abs(rankOf(grp, est) - q)
      assert(err <= 0.05, f"KLL est for $grp@$q has rank error $err%.4f (bound 0.05)")
      err
    }
    info(f"max KLL rank error: ${errs.max}%.5f over ${errs.size} estimates (4 groups incl. merged ALL)")
    // and the registered query's bracket booleans all hold
    val rows = SparkEntry.queries("q26_kll")(spark, sf).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("p50_ok")), s"p50_ok false for ${r.getString(0)}")
      assert(r.getBoolean(r.fieldIndex("p95_ok")), s"p95_ok false for ${r.getString(0)}")
    }
  }

  test("frequency-sketch head estimates hold their deterministic bound in PURGE mode") {
    // at sf0.1 the corpus's ~27k distinct word-3-gram shingles far
    // exceed the 1024-entry counter map, so the sketch genuinely
    // purges (maxError > 0) and the lower ≤ exact ≤ upper bracket
    // (width ≤ maxError; the raw estimate over-counts by at most
    // that) is non-trivial; measure the realized relative error on
    // the stop-shingle head it serves
    val dir = "/root/testdata/sf0.1"
    val Seq(perSource, exactTop) = operators.Maintain.freqFrames(spark, dir)
    import graft.functions.FreqAgg._
    val merged = perSource.agg(freq_merge_agg(col("sk"), 1024).as("sk"))
    val maxErr = merged.select(freq_max_error(col("sk"))).head.getLong(0)
    assert(maxErr > 0, s"sketch must be past exact mode to exercise the bound, maxError=$maxErr")
    val graded = exactTop.crossJoin(merged)
      .select(col("tf"), freq_estimate(col("sk"), col("h")).as("est"),
        freq_lower_bound(col("sk"), col("h")).as("lb"),
        freq_upper_bound(col("sk"), col("h")).as("ub"))
      .collect()
    val errs = graded.map { r =>
      val (tf, est, lb, ub) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(lb <= tf && tf <= ub, s"true count $tf outside sketch bracket [$lb, $ub]")
      assert(ub - lb <= maxErr, s"bracket width ${ub - lb} exceeds maxError $maxErr")
      math.abs(est - tf).toDouble / tf
    }
    info(f"freq-sketch maxError=$maxErr; realized max rel err ${errs.max}%.5f over ${errs.length} head terms")
    val rows = SparkEntry.queries("q29_freq")(spark, dir).collect()
    assert(rows.length == 16 && rows.forall(_.getAs[Boolean]("est_ok")))
  }

  test("theta set-op estimates are measured against exact counts in ESTIMATE mode") {
    // at sf0.1 each yearly cohort exceeds the 4 k nominal entries, so
    // the sketches genuinely estimate (below that theta is exact and
    // the 5% booleans are trivially true)
    val dir = "/root/testdata/sf0.1"
    val Seq(sketches, exact) = operators.Maintain.thetaFrames(spark, dir)
    import graft.functions.ThetaAgg._
    val est = sketches.select(
      theta_estimate(col("sk96")).as("n96"),
      theta_intersect_estimate(col("sk96"), col("sk97")).as("both"),
      theta_union_estimate(col("sk96"), col("sk97")).as("either")).head
    val ex = exact.head
    val n96 = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")) === 1996)
      .select("o_custkey").distinct().count()
    assert(n96 > 4096, s"cohort must exceed nominal entries to exercise estimation, was $n96")
    val errs = Seq(
      ("sk96", est.getDouble(0), n96.toDouble),
      ("both", est.getDouble(1), ex.getAs[Long]("n_both").toDouble),
      ("either", est.getDouble(2), ex.getAs[Long]("n_either").toDouble))
      .map { case (name, e, x) =>
        val rel = math.abs(e - x) / x
        assert(rel <= 0.05, f"$name: theta estimate $e%.0f vs exact $x%.0f rel err $rel%.4f")
        rel
      }
    info(f"theta relative errors (estimate mode): max ${errs.max}%.5f")
    val rows = SparkEntry.queries("q28_theta")(spark, dir).collect()
    assert(rows.length == 4 && rows.forall(_.getAs[Boolean]("est_ok")))
  }

  test("KLL drift CDF probes land within the ±0.03 rank pin at sf0.1") {
    // sf0.1: ~9k lineitem rows per ship year — real compaction in a
    // k=200 sketch, so the measured rank error is the honest one
    // (KLL publishes ±1.65% at k=200; q30's booleans pin ±3%).
    val dir = "/root/testdata/sf0.1"
    import graft.functions.KllAgg.kll_rank
    val Seq(sketches, exact) = operators.Maintain.kllYearFrames(spark, dir)
    val errs = sketches.join(exact, "yr")
      .select(abs(kll_rank(col("sk"), col("xv").cast("double")) - col("fr")).as("err"))
      .collect().map(_.getDouble(0))
    assert(errs.nonEmpty && errs.forall(_ <= 0.03),
      s"rank error above the q30 pin: ${errs.max}")
    info(f"KLL drift-probe rank errors at sf0.1: max ${errs.max}%.5f over ${errs.length} probes")
    val rows = SparkEntry.queries("q30_kll_drift")(spark, dir).collect()
    assert(rows.nonEmpty && rows.forall(r =>
      r.getAs[Boolean]("est_ok_a") && r.getAs[Boolean]("est_ok_b")))
  }
}
