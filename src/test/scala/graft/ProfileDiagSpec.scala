package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the profiler (dq_profile) and the growth/shape
  * diagnostics (tx_heaps, gr_degree_dist).
  */
class ProfileDiagSpec extends AnyFunSuite {
  import SparkTestSession._

  test("dq_profile matches driver-side stats for l_quantity") {
    val rows = SparkEntry.queries("dq_profile")(spark, sf).collect()
    assert(rows.length == 8)
    val qty = Tables.lineitem(spark, sf).select("l_quantity").collect()
      .map(_.getDouble(0))
    val r = rows.find(_.getString(0) == "l_quantity").get
    assert(r.getAs[Long]("n") == qty.length)
    assert(r.getAs[Long]("n_null") == 0)
    assert(r.getAs[Long]("n_distinct") == qty.distinct.length)
    assert(math.abs(r.getAs[Double]("min_num") - qty.min) < 1e-9)
    assert(math.abs(r.getAs[Double]("max_num") - qty.max) < 1e-9)
    val mean = qty.sum / qty.length
    assert(math.abs(r.getAs[Double]("avg_num") - mean) < 1e-3)
    val std = math.sqrt(qty.map(v => (v - mean) * (v - mean)).sum / (qty.length - 1))
    assert(math.abs(r.getAs[Double]("std_num") - std) < 1e-3)
    // strings carry only counts
    val rf = rows.find(_.getString(0) == "l_returnflag").get
    assert(rf.isNullAt(rf.fieldIndex("min_num")) && rf.isNullAt(rf.fieldIndex("avg_num")))
    assert(rf.getAs[Long]("n_distinct") == 3)
  }

  test("tx_heaps: prefixes monotone, counts match a direct distinct, saturation visible") {
    val rows = SparkEntry.queries("tx_heaps")(spark, sf).collect()
    assert(rows.nonEmpty)
    val toks = rows.map(_.getAs[Long]("n_tokens"))
    val vocab = rows.map(_.getAs[Long]("n_vocab"))
    assert(toks.zip(toks.tail).forall { case (a, b) => a <= b })
    assert(vocab.zip(vocab.tail).forall { case (a, b) => a <= b })
    // cross-check one prefix against a direct conditional distinct
    val step = rows.head.getAs[Long]("step")
    val direct = Tables.documents(spark, sf)
      .filter(col("doc_id") < step)
      .select(explode(functions.Hashing.wordHashes(col("text"))).as("h"))
      .agg(countDistinct("h").as("v"), count(lit(1)).as("t")).collect()(0)
    assert(direct.getAs[Long]("v") == rows.head.getAs[Long]("n_vocab"))
    assert(direct.getAs[Long]("t") == rows.head.getAs[Long]("n_tokens"))
  }

  test("dq_stats histograms estimate range selectivity within 5 points") {
    // the stored 8-bucket equi-width histograms must be USABLE CBO
    // inputs: estimate P(10 <= l_quantity <= 25) (cents ordinal
    // 1000..2500) and P(o_totalprice <= 50000.00) from the stats
    // alone, compare against the actual fractions
    import org.apache.spark.sql.functions.col
    val estQ = operators.DataQuality.estimateRangeSelectivity(
      spark, sf, "lineitem", "l_quantity", 1000L, 2500L)
    val li = Tables.lineitem(spark, sf)
    val actQ = li.filter(col("l_quantity") >= 10 && col("l_quantity") <= 25)
      .count().toDouble / li.count()
    info(f"l_quantity in [10,25]: est $estQ%.4f vs actual $actQ%.4f")
    assert(math.abs(estQ - actQ) <= 0.05,
      f"histogram estimate $estQ%.4f off actual $actQ%.4f by more than 5 points")
    val estP = operators.DataQuality.estimateRangeSelectivity(
      spark, sf, "orders", "o_totalprice", Long.MinValue / 2, 5000000L)
    val o = Tables.orders(spark, sf)
    val actP = o.filter(col("o_totalprice") <= 50000.0).count().toDouble / o.count()
    info(f"o_totalprice <= 50000: est $estP%.4f vs actual $actP%.4f")
    assert(math.abs(estP - actP) <= 0.05,
      f"histogram estimate $estP%.4f off actual $actP%.4f by more than 5 points")
  }

  test("gr_degree_dist: histogram sums to the node count, degrees positive") {
    val rows = SparkEntry.queries("gr_degree_dist")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("degree") >= 1))
    val totalNodes = rows.map(_.getAs[Long]("n_nodes")).sum
    val expected = operators.Graph.edgesWithDeg(spark, sf)
      .select("src").distinct().count()
    assert(totalNodes == expected,
      s"histogram covers $totalNodes nodes, graph has $expected")
  }
}
