package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent brute-force cross-checks for the round-9 join shapes:
  * ev_asof's union-and-carry result must equal a naive per-purchase
  * scan, and ev_range_join's banded join must equal the unbanded
  * cross filter. DuckDB parity runs via Verify; these pin the Spark
  * composition against a Spark-computed naive twin so a banding or
  * frame bug can't hide behind matching oracles.
  */
class AsofRangeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ev_asof equals the naive greatest-earlier-click join") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"), col("us").as("c_us"))
    // naive: join every purchase to ALL earlier clicks, argmax by
    // (c_us, c_id) — the quadratic formulation the operator avoids
    val naive = purchases
      .join(clicks, Seq("user_id"), "left")
      .withColumn("hit",
        when(col("c_us") < col("us"),
          struct(col("c_us"), col("c_id"))))
      .groupBy("event_id", "user_id", "us")
      .agg(max("hit").as("best"))
      .select(col("event_id"), col("user_id"),
        col("best.c_id").as("click_id"),
        (col("us") - col("best.c_us")).as("gap_us"))
    val got = operators.Events.asof.fn(spark, sf)
    assert(got.count() == naive.count())
    // null-safe full-row compare via except in both directions
    assert(got.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(got).count() == 0)
    // at least one purchase actually matched a click
    assert(got.filter(col("click_id").isNotNull).count() > 0)
  }

  test("ev_range_join equals the unbanded range filter") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"))
    val others = ev.select(col("user_id"),
      col("event_id").as("c_id"), col("us").as("c_us"))
    val naive = purchases
      .join(others, Seq("user_id"), "left")
      .withColumn("near",
        when(col("c_id") =!= col("event_id") &&
          abs(col("c_us") - col("us")) <= 600000000L, 1L).otherwise(0L))
      .groupBy("event_id", "user_id")
      .agg(sum("near").as("n_nearby"))
    val got = operators.Events.rangeJoin.fn(spark, sf)
    assert(got.count() == naive.count())
    assert(got.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(got).count() == 0)
    assert(got.agg(max("n_nearby")).head.getLong(0) > 0)
  }

  test("q13 exact percentiles bracket the data and the sketch bound holds") {
    val rows = operators.Relational.q13.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("median_price")) <=
        r.getDouble(r.fieldIndex("p95_price")))
      assert(r.getBoolean(r.fieldIndex("p50_ok")))
    }
  }

  test("q15 grouping-set rows reconcile with independently computed group-bys") {
    val rows = operators.Relational.q15.fn(spark, sf).collect()
    val byRf = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.lineitem(spark, sf).count()
    // marginal rows carry exactly one non-null key; the grand total none
    val rfRows = rows.filter(r => r.getInt(r.fieldIndex("g_rf")) == 0)
    assert(rfRows.nonEmpty && rfRows.forall(r => r.isNullAt(r.fieldIndex("l_linestatus"))))
    rfRows.foreach(r =>
      assert(r.getLong(r.fieldIndex("n")) == byRf(r.getString(0))))
    val grand = rows.filter(r =>
      r.getInt(r.fieldIndex("g_rf")) == 1 && r.getInt(r.fieldIndex("g_ls")) == 1)
    assert(grand.length == 1 && grand.head.getLong(grand.head.fieldIndex("n")) == total)
  }

  test("q16 running total ends at the customer's full sum") {
    val last = operators.Relational.q16.fn(spark, sf)
      .groupBy("o_custkey").agg(max("running_total").as("final_total"))
    val want = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(round(lit(1e-9) + sum("o_totalprice"), 2).as("full_sum"))
    val joined = last.join(want, "o_custkey")
      .filter(abs(col("final_total") - col("full_sum")) > 0.011)
    assert(joined.count() == 0, "running total must converge to the group sum")
  }

  test("q14 pivot cells reconcile with the unpivoted yearly totals") {
    val pivoted = operators.Relational.q14.fn(spark, sf).collect()
    val flat = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"), year(col("o_orderdate")).as("yr"))
      .agg(round(lit(1e-9) + sum("o_totalprice"), 2).as("rev"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(pivoted.nonEmpty)
    for (r <- pivoted; y <- 1995 to 2001) {
      val cell = r.getDouble(r.fieldIndex(s"y$y"))
      val want = flat.getOrElse((r.getString(0), y), 0d)
      assert(math.abs(cell - want) < 1e-6, s"cell (${r.getString(0)}, $y)")
    }
  }
}
