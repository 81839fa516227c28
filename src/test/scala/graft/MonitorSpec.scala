package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round's monitoring/pipeline additions
  * (ev_anomaly, dq_audit, tx_bpe_pairs, mm_segments), pinned on
  * planted fixtures independently of the DuckDB oracle — the oracle
  * proves cross-engine agreement; these prove the operators DETECT
  * what they claim to detect.
  */
class MonitorSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ev_anomaly flags a planted rate spike and nothing on the quiet series") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_anom").toString
    // two types with identical gently-varying baselines (variance > 0
    // so sd is usable); "load" gets a 10× spike in bucket 30
    val rows = for {
      tpe <- Seq("load", "ok")
      b <- 0 until 31
      n = if (tpe == "load" && b == 30) 100 else 9 + (b % 3)
      i <- 0 until n
    } yield (b.toLong * 1000 + i, b.toLong * 300 + i % 300, 1L + i % 7, tpe, 1.0, "{}")
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("ts_s"))).drop("ts_s")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("ev_anomaly")(spark, tmp).collect()
    val flagged = out.filter(_.getAs[Boolean]("anomalous"))
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket_s")))
    assert(flagged.toSeq == Seq(("load", 9000L)),
      s"expected exactly the planted spike flagged, got ${flagged.mkString(", ")}")
    // the spike's own bucket must not contaminate its baseline: the
    // trailing-only frame means the spike scores against pre-spike
    // buckets (z far above 3), and earlier buckets all stay below
    val spike = out.find(r => r.getAs[String]("event_type") == "load" &&
      r.getAs[Long]("bucket_s") == 9000L).get
    assert(spike.getAs[Double]("z") > 10.0)
  }

  test("dq_audit is all-green on the clean corpus and counts planted violations") {
    val clean = SparkEntry.queries("dq_audit")(spark, sf).collect()
    assert(clean.length == 7 && clean.forall(_.getAs[Boolean]("pass")),
      s"clean testdata must pass every check: ${clean.mkString("; ")}")

    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dq").toString
    // orders: dup orderkey (1), orphan custkey 999 (1), negative price (1)
    Seq((1L, 10L, 5.0), (1L, 10L, 6.0), (2L, 999L, 7.0), (3L, 11L, -2.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq(Tuple1(10L), Tuple1(11L)).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    // lineitem: qty 99 out of range (1), orderkey 7 orphan (1)
    Seq((1L, 5.0), (7L, 99.0)).toDF("l_orderkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    // documents: one empty text (also n_chars-inconsistent: 3 != 0)
    Seq((1L, "abc", 3L), (2L, "", 3L)).toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("dq_audit")(spark, tmp).collect()
      .map(r => (r.getAs[String]("tbl"), r.getAs[String]("chk")) ->
        r.getAs[Long]("violations")).toMap
    assert(out(("orders", "pk_unique_orderkey")) == 1)
    assert(out(("orders", "fk_custkey_customer")) == 1)
    assert(out(("orders", "nonneg_totalprice")) == 1)
    assert(out(("lineitem", "qty_range_1_50")) == 1)
    assert(out(("lineitem", "fk_orderkey_orders")) == 1)
    assert(out(("documents", "nonempty_text")) == 1)
    assert(out(("documents", "nchars_consistent")) == 1)
  }

  test("tx_bpe_pairs counts adjacent character pairs with multiplicity") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    // "aaab aaab": per word pairs aa, aa, ab → corpus aa=4, ab=2;
    // the single-char word "z" contributes nothing
    Seq((1L, "aaab aaab z", "en", "s0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("tx_bpe_pairs")(spark, tmp).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("pair"), r.getAs[Long]("cnt")))
    assert(out.toSeq == Seq((1L, "aa", 4L), (2L, "ab", 2L)), out.mkString(", "))
  }

  test("mm_segments finds planted active runs and their statistics") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_seg").toString
    Seq(
      (1L, "ab!!cde f", "en", "s0", 9L),   // runs ab, cde, f
      (2L, "   ", "en", "s0", 3L),          // all silence
      (3L, "abcdef", "en", "s0", 6L))       // one full-length run
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("mm_segments")(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_segments"), r.getAs[Long]("longest_segment"),
          r.getAs[Double]("active_share"), r.getAs[Boolean]("voiced")))).toMap
    assert(out(1L)._1 == 3 && out(1L)._2 == 3 && out(1L)._4)
    assert(math.abs(out(1L)._3 - 6.0 / 9) < 1e-4)
    assert(out(2L) == ((0L, 0L, 0.0, false)))
    assert(out(3L) == ((1L, 6L, 1.0, true)))
  }

  test("ev_forecast converges on a constant series and decays across a gap") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_fc").toString
    // constant 10 events per bucket for 40 buckets, then a 10-bucket
    // OUTAGE, then one resumed bucket — the forecast for the resumed
    // bucket must have decayed toward zero (missing buckets are zero
    // rate, not skipped rows)
    val rows = for {
      b <- (0 until 40) ++ Seq(50)
      i <- 0 until 10
    } yield (b.toLong * 100 + i, b.toLong * 300 + i % 300, 1L + i, "load", 1.0, "{}")
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("ts_s"))).drop("ts_s")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("ev_forecast")(spark, tmp).collect()
      .map(r => r.getAs[Long]("bucket_s") -> r.getAs[Double]("forecast")).toMap
    // deep in the steady state the truncated SES sits at 10·(1−0.75²⁴)
    val steady = out(39L * 300)
    assert(math.abs(steady - 10.0) < 0.05, s"steady-state forecast $steady far from 10")
    // after 10 silent buckets only weights k=11..24 see history:
    // forecast = 10·0.25·Σ_{k=11..24}0.75^{k-1} = 10·(0.75^10 − 0.75^24)
    val resumed = out(50L * 300)
    val want = 10.0 * (math.pow(0.75, 10) - math.pow(0.75, 24))
    assert(math.abs(resumed - want) < 0.01,
      s"post-gap forecast $resumed should equal the decayed $want")
  }

  test("ev_changepoint finds a planted level shift at its exact bucket") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cp").toString
    // "shift": rate 5 for buckets 0..29, rate 15 for 30..59 — the max
    // cumulative deviation from the 10-mean line lands exactly at the
    // last low bucket (29). "flat": constant 8, deviation ~0.
    val rows = for {
      (tpe, lvl) <- Seq("shift" -> ((b: Int) => if (b < 30) 5 else 15),
                        "flat" -> ((_: Int) => 8))
      b <- 0 until 60
      i <- 0 until lvl(b)
    } yield (b.toLong * 1000 + i, b.toLong * 300 + i % 300, 1L + i, tpe, 1.0, "{}")
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("ts_s"))).drop("ts_s")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("ev_changepoint")(spark, tmp).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val shift = out("shift")
    assert(shift.getAs[Long]("cp_bucket") == 29L * 300,
      s"split must land on the last low bucket, got ${shift.getAs[Long]("cp_bucket")}")
    assert(math.abs(shift.getAs[Double]("mean_before") - 5.0) < 1e-9)
    assert(math.abs(shift.getAs[Double]("mean_after") - 15.0) < 1e-9)
    assert(shift.getAs[Double]("max_dev") > 100,
      "a 3x level shift must show a large cumulative deviation")
    assert(out("flat").getAs[Double]("max_dev") < 1.0,
      "the constant series must show ~zero deviation")
  }
}
