package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical analytics over the star schema — the regression /
  * dominance operators a reporting layer runs after the aggregates:
  * group-wise ordinary-least-squares trend fitting and the Pareto
  * frontier (skyline). Reference analog: the reference's per-model
  * feature aggregation (llmmap.py:70-101) stops at means/ratios;
  * these are the next statistical moves a fleet-wide audit report
  * makes over the same aggregates.
  */
object Stats {

  /** Group-wise OLS regression — price-vs-quantity trend per
    * (returnflag, linestatus): slope, intercept, R², correlation.
    * One scan, ONE hash aggregate: every regr_* aggregate is
    * declarative with a constant-size partial state (sums, sums of
    * squares, cross products), so the map side combines locally and
    * only |groups| constant-width rows reach the exchange — the plan
    * is identical to q1_pricing's and scales the same way. No
    * collect, no second pass: slope/intercept/R² all derive from the
    * same five sufficient statistics Spark merges associatively.
    * Float posture: cross-engine partial-sum order differs, so every
    * derived statistic is rounded (4 dp for price-scale values, 6 dp
    * for the [0,1]-scale R²/corr) behind the 1e-9 boundary nudge —
    * the established parity idiom.
    */
  val regression = Q(
    "q32_regression",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round(1e-9 + avg(l_quantity), 4) AS avg_qty,
      |  round(1e-9 + avg(l_extendedprice), 4) AS avg_price,
      |  round(1e-9 + regr_slope(l_extendedprice, l_quantity), 4) AS slope,
      |  round(1e-9 + regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
      |  round(1e-9 + regr_r2(l_extendedprice, l_quantity), 6) AS r2,
      |  round(1e-9 + corr(l_extendedprice, l_quantity), 6) AS corr_price_qty
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        round(lit(1e-9) + avg("l_quantity"), 4).as("avg_qty"),
        round(lit(1e-9) + avg("l_extendedprice"), 4).as("avg_price"),
        round(lit(1e-9) + expr("regr_slope(l_extendedprice, l_quantity)"), 4)
          .as("slope"),
        round(lit(1e-9) + expr("regr_intercept(l_extendedprice, l_quantity)"), 4)
          .as("intercept"),
        round(lit(1e-9) + expr("regr_r2(l_extendedprice, l_quantity)"), 6)
          .as("r2"),
        round(lit(1e-9) + corr(col("l_extendedprice"), col("l_quantity")), 6)
          .as("corr_price_qty"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Price-band width for the skyline's bucketed prefix max. Part
    * retail prices span ~[900, 2100); 100-wide bands give tens of
    * buckets at any SF (the band frame is an aggregate over DISTINCT
    * prices, so its size is bounded by the price domain, not |part|).
    */
  private val SkylineBand = 100.0

  /** Pareto frontier (skyline): the parts no other part dominates on
    * (price low, size high) — dominance = price ≤ AND size ≥ with at
    * least one strict. The classic multi-criteria shortlist operator;
    * the oracle runs the textbook quadratic NOT EXISTS, which is
    * exactly the plan that cannot survive 100 TB.
    *
    * The Spark plan is the sort-based 2-D skyline expressed without a
    * global sort: a point is dominated iff (a) some strictly cheaper
    * price reaches size ≥ its own, or (b) some same-price part has
    * size strictly greater. Both maxima come from ONE aggregate over
    * distinct prices (|prices| ≪ |part|): (b) is that aggregate's own
    * max-size column; (a) is a PREFIX max over ascending price,
    * computed two-level so no single partition ever sorts the whole
    * price domain — a rows-frame window WITHIN each fixed-width price
    * band (partitioned — parallel), plus a cross-band prefix over the
    * per-band maxima (a |bands|-row frame, broadcast back). Every
    * price in an earlier band is strictly lower than every price in a
    * later band (floor is monotone), so greatest(within-band prefix,
    * earlier-bands max) is exactly the strictly-cheaper max. The
    * verdict join back to part is on the price key — broadcastable at
    * real scale since the frame is bounded by the price domain.
    */
  val skyline = Q(
    "q33_skyline",
    """SELECT a.p_partkey, a.p_retailprice, a.p_size
      |FROM part a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part b
      |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
      |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
      |ORDER BY a.p_partkey""".stripMargin) { (spark, dir) =>
    val (lazyOut, perPrice) = skylinePlan(spark, dir)
    val out = lazyOut
      .localCheckpoint(true) // materialize before the price frame is released
    Dedup.releaseLocalCheckpoint(perPrice)
    out
  }

  /** The lazy skyline pipeline + the checkpointed price frame it
    * reads (exposed so PlanSpec can assert the shape before the
    * query materializes and releases it). Callers must release the
    * returned perPrice checkpoint once the result is materialized.
    */
  private[graft] def skylinePlan(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val p = Tables.part(spark, dir)
      .select("p_partkey", "p_retailprice", "p_size")
    // the distinct-price aggregate feeds BOTH prefix maxima; eager
    // checkpoint so the part scan + aggregation run exactly once
    // (branch-specific inferred filters otherwise defeat exchange
    // reuse and the plan scans part three times)
    val perPrice = p.groupBy("p_retailprice")
      .agg(max("p_size").as("same_mx"))
      .withColumn("bkt", floor(col("p_retailprice") / lit(SkylineBand)))
      .localCheckpoint(true)
    val wIn = Window.partitionBy("bkt").orderBy("p_retailprice")
      .rowsBetween(Window.unboundedPreceding, -1)
    val inPref = perPrice.withColumn("in_mx", max("same_mx").over(wIn))
    // cross-band prefix: |bands| rows — the only globally-ordered
    // window runs over the band aggregate, never the price frame
    val wBand = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val bandPref = perPrice.groupBy("bkt").agg(max("same_mx").as("bmx"))
      .withColumn("prev_mx", max("bmx").over(wBand))
      .select("bkt", "prev_mx")
    // p_size ≥ 1 in the schema, so MinValue sentinels never dominate
    val verdict = inPref.join(broadcast(bandPref), Seq("bkt"))
      .withColumn("strict_mx",
        greatest(
          coalesce(col("in_mx"), lit(Int.MinValue)),
          coalesce(col("prev_mx"), lit(Int.MinValue))))
      .select("p_retailprice", "same_mx", "strict_mx")
    val out = p.join(verdict, Seq("p_retailprice"))
      .filter(!(col("strict_mx") >= col("p_size") ||
        col("same_mx") > col("p_size")))
      .select("p_partkey", "p_retailprice", "p_size")
      .orderBy("p_partkey")
    (out, perPrice)
  }

  val all: Seq[Q] = Seq(regression, skyline)
}
