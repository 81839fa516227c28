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
}
