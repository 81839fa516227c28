package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the cube / source-similarity / image-parse additions
  * beyond their oracle hash checks: algebraic reconciliation for
  * CUBE, plan + range invariants for the tf-idf cosine, byte
  * accounting for the BMP parser.
  */
class AnalyticsExtrasSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q23_cube reconciles: grand total == sum of leaves == each marginal") {
    val rows = SparkEntry.queries("q23_cube")(spark, sf).collect()
    def n(p: org.apache.spark.sql.Row => Boolean): Long =
      rows.filter(p).map(_.getAs[Long]("n_orders")).sum
    val leaves = n(r => r.getAs[Int]("g_prio") == 0 && r.getAs[Int]("g_status") == 0)
    val margPrio = n(r => r.getAs[Int]("g_prio") == 0 && r.getAs[Int]("g_status") == 1)
    val margStatus = n(r => r.getAs[Int]("g_prio") == 1 && r.getAs[Int]("g_status") == 0)
    val grand = n(r => r.getAs[Int]("g_prio") == 1 && r.getAs[Int]("g_status") == 1)
    assert(grand > 0)
    assert(leaves == grand, "leaf cells must sum to the grand total")
    assert(margPrio == grand && margStatus == grand,
      "both marginals must sum to the grand total")
    // ONE Expand-fed aggregate, not four passes
    val p = SparkEntry.queries("q23_cube")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("Expand"), "CUBE must compile to an Expand-fed hash aggregate")
  }

  test("q24_unpivot reconciles against directly-computed component sums") {
    val rows = SparkEntry.queries("q24_unpivot")(spark, sf).collect()
    val direct = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(
        round(lit(1e-9) + sum("l_extendedprice"), 2).as("gross"),
        round(lit(1e-9) + sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("discount_amt"),
        round(lit(1e-9) + sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * col("l_tax")), 2)
          .as("tax_amt"))
      .collect()
      .flatMap(r => Seq("gross", "discount_amt", "tax_amt").map(c =>
        (r.getAs[String]("l_returnflag"), c) -> r.getAs[Double](c)))
      .toMap
    assert(rows.nonEmpty)
    for (r <- rows) {
      val k = (r.getAs[String]("l_returnflag"), r.getAs[String]("component"))
      assert(math.abs(r.getAs[Double]("total") - direct(k)) < 1e-6, s"$k diverges")
    }
  }

  test("q25_dist_rank distribution values are coherent within every nation") {
    val rows = SparkEntry.queries("q25_dist_rank")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byNation = rows.groupBy(_.getAs[Number]("c_nationkey").longValue)
    for ((_, rs) <- byNation) {
      // cume_dist reaches exactly 1 at the partition's last row; both
      // distributions live in (0,1]/[0,1]; deciles stay in 1..10
      assert(math.abs(rs.map(_.getAs[Double]("cume")).max - 1.0) < 1e-9)
      assert(rs.forall { r =>
        val pr = r.getAs[Double]("pct_rank"); pr >= 0.0 && pr <= 1.0
      })
      assert(rs.forall { r =>
        val d = r.getAs[Int]("decile"); d >= 1 && d <= 10
      })
      // revenue is non-increasing along the ranked order
      val revs = rs.sortBy(r => (r.getAs[Double]("pct_rank"), r.getAs[Long]("custkey")))
        .map(_.getAs[Double]("revenue"))
      assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ev_windowfunnel depths are monotone and bounded by the unbounded funnel") {
    val r = SparkEntry.queries("ev_windowfunnel")(spark, sf).collect().head
    val (s, c, p) = (r.getAs[Long]("n_signup"), r.getAs[Long]("n_click"),
      r.getAs[Long]("n_purchase"))
    assert(s >= c && c >= p, "stage counts must be monotone non-increasing")
    // the 48 h bound can only lose conversions vs ev_funnel's unbounded chase
    val f = SparkEntry.queries("ev_funnel")(spark, sf).collect().head
    assert(s <= f.getAs[Long]("n_signup"))
    assert(c <= f.getAs[Long]("n_click"))
    assert(p <= f.getAs[Long]("n_purchase"))
  }

  test("dd_chunks gives every exact-duplicate loser a 100% duplicated-chunk share") {
    val chunks = SparkEntry.queries("dd_chunks")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup_share")).toMap
    // exact-duplicate losers: docs sharing text with a smaller doc_id
    val losers = Tables.documents(spark, sf)
      .groupBy("text").agg(min("doc_id").as("keep"), collect_list("doc_id").as("ids"))
      .select(explode(col("ids")).as("doc_id"), col("keep"))
      .filter(col("doc_id") =!= col("keep"))
      .collect().map(_.getAs[Long]("doc_id"))
    // exact duplicates (present at the larger SFs; this SF may have
    // none) must show a 100% duplicated-chunk share
    for (d <- losers)
      assert(chunks(d) == 1.0, s"exact-dup loser $d has dup_share ${chunks(d)} != 1.0")
    // the load-bearing class: docs with PARTIAL overlap (0 < share
    // < 1) — what exact dedup misses and chunk dedup exists to catch;
    // the planted near-dup pairs guarantee these at every SF
    assert(chunks.values.exists(s => s > 0 && s < 1))
  }

  test("ev_attribution's last touch agrees with ev_asof inside the lookback") {
    val att = SparkEntry.queries("ev_attribution")(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("n_touches"), Option(r.getAs[java.lang.Long]("last_click_id")))))
      .toMap
    val asof = SparkEntry.queries("ev_asof")(spark, sf).collect()
    assert(att.nonEmpty && asof.nonEmpty)
    var checked = 0
    for (r <- asof; gap = Option(r.getAs[java.lang.Long]("gap_us")) if gap.exists(_ <= 172800000000L)) {
      // the latest-ever click fell inside the window → it IS the last touch
      val (n, last) = att(r.getAs[Long]("event_id"))
      assert(n > 0 && last.contains(r.getAs[Long]("click_id")),
        s"purchase ${r.getAs[Long]("event_id")}: asof click ${r.getAs[Long]("click_id")} vs attribution $last")
      checked += 1
    }
    assert(checked > 0, "some asof answers must fall inside the 48 h lookback")
  }

  test("ix_source_sim rides the bounded heap and emits valid cosines for all pairs") {
    val df = SparkEntry.queries("ix_source_sim")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("topk_by_score"),
      "the vocab head must go through the bounded-heap aggregate, not a sort")
    assert(!p.contains("Window"), "no window sorts anywhere in the similarity plan")
    val rows = df.collect()
    val nSources = Tables.documents(spark, sf).select("source").distinct().count()
    assert(rows.length == nSources * (nSources - 1) / 2,
      s"expected all ${nSources * (nSources - 1) / 2} unordered pairs, got ${rows.length}")
    // tf-idf weights are positive, so cosines live in (0, 1]
    assert(rows.forall { r =>
      val c = r.getAs[Double]("cosine"); c > 0d && c <= 1.000001d
    })
  }

  test("mm_image byte accounting: parsed geometry explains every payload byte") {
    val rows = SparkEntry.queries("mm_image")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val stride = r.getAs[Long]("row_stride")
      assert(stride % 4 == 0, "BMP rows must be 4-byte aligned")
      assert(stride - r.getAs[Long]("pad_bytes") == 3 * r.getAs[Long]("width"))
      assert(r.getAs[Long]("data_bytes") == stride * r.getAs[Long]("height"))
      assert(r.getAs[Long]("file_bytes") ==
        r.getAs[Long]("data_offset") + r.getAs[Long]("data_bytes"))
    }
    // dimensions actually vary across docs (the parse isn't constant)
    assert(rows.map(_.getAs[Long]("width")).distinct.length > 1)
    assert(rows.map(_.getAs[Long]("height")).distinct.length > 1)
  }

  test("ev_rfm reconciles: cells cover every purchasing user, quartiles balance") {
    val rows = SparkEntry.queries("ev_rfm")(spark, sf).collect()
    assert(rows.nonEmpty)
    val users = rows.map(_.getAs[Long]("n_users")).sum
    val direct = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(users == direct, "segment cells must partition the purchasing users")
    // scores stay on the 1..4 grid
    for (r <- rows; c <- Seq("r_score", "f_score", "m_score")) {
      val s = r.getAs[Long](c); assert(s >= 1 && s <= 4, s"$c out of range: $s")
    }
    // at least floor(q*(n-1))+1 values sit at or below the interpolated
    // quantile_cont(q) threshold (ties can only push a bucket over)
    for (c <- Seq("r_score", "f_score", "m_score"); s <- 1L to 4L) {
      val atOrBelow =
        rows.filter(r => if (c == "r_score") 5 - r.getAs[Long](c) <= s
                         else r.getAs[Long](c) <= s)
          .map(_.getAs[Long]("n_users")).sum
      assert(atOrBelow >= s * (users - 1) / 4 + 1,
        s"$c: cumulative bucket $s holds $atOrBelow of $users users")
    }
  }
}
