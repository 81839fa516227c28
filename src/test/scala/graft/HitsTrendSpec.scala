package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for gr_hits and ev_trend_test beyond their oracle hash
  * checks: a full driver-side replay of both recursions.
  */
class HitsTrendSpec extends AnyFunSuite {
  import SparkTestSession._

  test("gr_hits matches a driver-side HITS replay; scores are unit-norm by role") {
    val out = SparkEntry.queries("gr_hits")(spark, sf).collect()
    assert(out.nonEmpty)
    val hubs = out.filter(_.getAs[String]("kind") == "hub")
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("score")).toMap
    val auths = out.filter(_.getAs[String]("kind") == "authority")
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("score")).toMap
    // bipartite roles: hubs are parts, authorities offset suppliers
    assert(hubs.keySet.forall(_ < 1000000000L))
    assert(auths.keySet.forall(_ >= 1000000000L))
    // L2 norms ≈ 1 (final rounding only)
    assert(math.abs(hubs.values.map(x => x * x).sum - 1.0) < 1e-3)
    assert(math.abs(auths.values.map(x => x * x).sum - 1.0) < 1e-3)
    // replay: 5 rounds of a = Eᵀh/‖·‖, h = Ea/‖·‖
    val edges = Tables.lineitem(spark, sf)
      .select(col("l_partkey").as("p"), (col("l_suppkey") + 1000000000L).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    var h: Map[Long, Double] = edges.map(_._1).distinct.map(_ -> 1.0).toMap
    var a: Map[Long, Double] = Map.empty
    for (_ <- 1 to 5) {
      val aRaw = edges.groupBy(_._2).map { case (s, es) =>
        s -> es.iterator.map(e => h(e._1)).sum }
      val an = math.sqrt(aRaw.values.map(x => x * x).sum)
      a = aRaw.map { case (k, v) => k -> v / an }
      val hRaw = edges.groupBy(_._1).map { case (p, es) =>
        p -> es.iterator.map(e => a(e._2)).sum }
      val hn = math.sqrt(hRaw.values.map(x => x * x).sum)
      h = hRaw.map { case (k, v) => k -> v / hn }
    }
    assert(hubs.keySet == h.keySet && auths.keySet == a.keySet)
    for ((n, x) <- h) assert(math.abs(hubs(n) - x) < 1e-5, s"hub $n diverges")
    for ((n, x) <- a) assert(math.abs(auths(n) - x) < 1e-5, s"authority $n diverges")
  }

  test("ev_trend_test matches a driver-side Mann-Kendall replay") {
    val r = SparkEntry.queries("ev_trend_test")(spark, sf).collect().head
    val weekly = Tables.orders(spark, sf)
      .groupBy(floor(col("o_orderdate").cast("timestamp").cast("double") / 604800)
        .cast("long").as("week"))
      .agg(round(lit(1e-9) + sum("o_totalprice"), 2).as("rev"))
      .collect().map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1)
    val n = weekly.length
    var s = 0L
    for (i <- weekly.indices; j <- (i + 1) until n)
      s += java.lang.Double.compare(weekly(j)._2, weekly(i)._2).sign
    val tieCorr = weekly.groupBy(_._2).values.map(_.size.toLong)
      .filter(_ > 1).map(t => t * (t - 1) * (2 * t + 5)).sum
    val varS = (n.toLong * (n - 1) * (2L * n + 5) - tieCorr) / 18.0
    assert(r.getAs[Long]("n_weeks") == n)
    assert(r.getAs[Long]("s_stat") == s)
    assert(math.abs(r.getAs[Double]("var_s") - varS) < 0.51)
    if (varS > 0) {
      val z = (s - s.sign) / math.sqrt(varS)
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-3)
      val verdict =
        if (r.getAs[Double]("z") > 1.96) "increasing"
        else if (r.getAs[Double]("z") < -1.96) "decreasing" else "no_trend"
      assert(r.getAs[String]("trend") == verdict)
    }
  }
}
