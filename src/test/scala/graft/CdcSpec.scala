package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the CDC/snapshot family (oracle hash parity runs
  * via Verify + check.py; these assert the invariants the oracle
  * can't see — window-twin equivalence, verdict partition identities,
  * robust-gate behavior on planted anomalies).
  */
class CdcSpec extends AnyFunSuite {
  import SparkTestSession._

  test("cdc_latest equals the window-based newest-wins twin") {
    val out = SparkEntry.queries("cdc_latest")(spark, sf).collect()
    // brute-force twin: row_number over (ts desc, event_id desc)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    val twin = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("last_us"),
        col("event_id").as("last_event_id"),
        round(lit(1e-9) + col("value"), 4).as("last_value"))
      .orderBy("user_id", "event_type")
      .collect()
    assert(out.toSeq == twin.toSeq)
  }

  test("cdc_latest emits exactly one row per live (user, event_type) key") {
    val df = SparkEntry.queries("cdc_latest")(spark, sf)
    val keys = df.select("user_id", "event_type").distinct().count()
    assert(df.count() == keys)
    val liveKeys = Tables.events(spark, sf)
      .select("user_id", "event_type").distinct().count()
    assert(keys == liveKeys)
  }

  test("cdc_diff statuses reconstruct both snapshot cardinalities") {
    val docs = Tables.documents(spark, sf)
    val byStatus = SparkEntry.queries("cdc_diff")(spark, sf).collect()
      .groupBy(_.getAs[String]("status"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val nOld = docs.filter(col("doc_id") % 17 =!= 3).count()
    val nNew = docs.filter(col("doc_id") % 19 =!= 7).count()
    // old = removed + changed + unchanged; new = added + changed + unchanged
    def g(s: String): Long = byStatus.getOrElse(s, 0L)
    assert(g("removed") + g("changed") + g("unchanged") == nOld)
    assert(g("added") + g("changed") + g("unchanged") == nNew)
    assert(Seq("added", "removed", "changed").forall(g(_) > 0),
      s"fixture must exercise every status: $byStatus")
  }

  test("dd_incremental verdicts partition the delta; corpus dups dominate") {
    val docs = Tables.documents(spark, sf)
    val rows = SparkEntry.queries("dd_incremental")(spark, sf).collect()
    assert(rows.length == docs.filter(col("doc_id") % 10 >= 8).count())
    // content present in the corpus index ⇒ EVERY delta copy is
    // dup_corpus (the index wins over intra-delta first-wins)
    import spark.implicits._
    val verdicts = rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("verdict")))
      .toSeq.toDF("doc_id", "verdict")
    val withSha = docs.filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), sha2(col("text"), 256).as("sha"))
      .join(verdicts, "doc_id")
    val idxSha = docs.filter(col("doc_id") % 10 < 8)
      .select(sha2(col("text"), 256).as("sha")).distinct()
    val inIdx = withSha.join(idxSha, "sha")
    assert(inIdx.filter(col("verdict") =!= "dup_corpus").count() == 0)
    val outIdx = withSha.join(idxSha, Seq("sha"), "left_anti")
    // outside the index: exactly one 'new' per sha, rest dup_delta
    val perSha = outIdx.groupBy("sha")
      .agg(sum(when(col("verdict") === "new", 1).otherwise(0)).as("n_new"),
        count(lit(1)).as("n"))
    assert(perSha.filter(col("n_new") =!= 1).count() == 0)
  }

  test("tx_outliers: MAD gate flags a planted anomaly but not the bulk") {
    // planted corpus: 200 docs of ~typical length, 1 monster
    import spark.implicits._
    val lens = (1 to 200).map(i => ("srcX", 100L + (i % 21))) :+ (("srcX", 100000L))
    val df = lens.toDF("source", "n_chars")
    val med = df.groupBy("source").agg(percentile(col("n_chars"), lit(0.5)).as("med"))
    val mad = df.join(med, "source").groupBy("source")
      .agg(first("med").as("med"),
        round(lit(1e-9) + lit(5.18903632) *
          percentile(abs(col("n_chars") - col("med")), lit(0.5)), 4).as("thresh"))
    val flagged = df.join(mad, "source")
      .filter(abs(col("n_chars") - col("med")) > col("thresh"))
    assert(flagged.count() == 1)
    assert(flagged.head.getAs[Long]("n_chars") == 100000L)
    // and the registered query emits one row per source with sane shares
    val rows = SparkEntry.queries("tx_outliers")(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).select("source").distinct().count())
    assert(rows.forall(_.getAs[Double]("outlier_share") < 0.5))
  }

  test("cdc_scd2 versions partition time and close exactly at successors") {
    val rows = SparkEntry.queries("cdc_scd2")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byKey = rows.groupBy(r =>
      (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    for ((_, rs) <- byKey) {
      val sorted = rs.sortBy(_.getAs[Int]("version"))
      // versions are 1..n dense; exactly one open (current) version, the last
      assert(sorted.map(_.getAs[Int]("version")).toSeq == (1 to rs.length))
      assert(sorted.count(_.getAs[Boolean]("is_current")) == 1)
      assert(sorted.last.getAs[Boolean]("is_current"))
      // each closed version's valid_to == its successor's valid_from,
      // and no two adjacent versions carry the same value (suppression)
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray)) {
        assert(a.getAs[Long]("valid_to_us") == b.getAs[Long]("valid_from_us"))
        assert(a.getAs[Double]("value") != b.getAs[Double]("value"))
      }
    }
    // every live key has a history and its current value == cdc_latest
    val latest = SparkEntry.queries("cdc_latest")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        r.getAs[Double]("last_value")).toMap
    assert(byKey.keySet == latest.keySet)
    for ((k, rs) <- byKey)
      assert(rs.maxBy(_.getAs[Int]("version")).getAs[Double]("value") == latest(k))
  }

  test("cdc_scd2 collapses planted no-op runs to single versions") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // changelog: value runs 1,1,1,2,2,1 → versions (1, t0..t3), (2, t3..t5), (1, t5..)
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1.0), (2L, "2024-01-01 01:00:00", 1.0),
      (3L, "2024-01-01 02:00:00", 1.0), (4L, "2024-01-01 03:00:00", 2.0),
      (5L, "2024-01-01 04:00:00", 2.0), (6L, "2024-01-01 05:00:00", 1.0))
      .toDF("event_id", "ts_s", "value")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        lit(7L).as("user_id"), lit("set").as("event_type"), col("value"))
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    val got = ev
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"),
        round(lit(1e-9) + col("value"), 4).as("value"))
      .withColumn("prev", lag("value", 1).over(w))
      .filter(col("prev").isNull || col("value") =!= col("prev"))
      .select(row_number().over(w).as("version"), col("value"))
      .collect().map(r => (r.getAs[Int]("version"), r.getAs[Double]("value")))
    assert(got.toSeq == Seq((1, 1.0), (2, 2.0), (3, 1.0)),
      s"no-op runs must collapse to 3 versions, got ${got.toSeq}")
  }

  test("cdc_timetravel agrees with cdc_scd2's valid interval at the cutoff") {
    val tv = SparkEntry.queries("cdc_timetravel")(spark, sf)
    val hist = SparkEntry.queries("cdc_scd2")(spark, sf)
    val bounds = hist.agg(
      min("valid_from_us").as("mn"), max("valid_from_us").as("mx")).collect()(0)
    val c = (bounds.getLong(0) + bounds.getLong(1)) / 2
    val want = hist
      .filter(col("valid_from_us") <= c &&
        (col("valid_to_us").isNull || col("valid_to_us") > c))
      .select(col("user_id"), col("event_type"), col("version"),
        col("valid_from_us").as("since_us"), col("value"))
    assert(tv.count() > 0)
    assert(tv.exceptAll(want).count() == 0 && want.exceptAll(tv).count() == 0,
      "time-travel serve must equal the history's valid interval")
    // the cutoff is interior: some key must already be past version 1
    assert(tv.filter(col("version") > 1).count() > 0)
    // and strictly fewer current versions than the final state has keys
    assert(tv.count() == hist.select("user_id", "event_type").distinct()
      .join(hist.filter(col("valid_from_us") <= c)
        .select("user_id", "event_type").distinct(), Seq("user_id", "event_type"))
      .count(), "exactly one version per key born before the cutoff")
  }
}
