package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the distribution-analytics block (q20_setops,
  * q21_histogram, ma_drift_psi) and the triangle census
  * (gr_triangles), pinned independently of the DuckDB oracle.
  */
class DistributionSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q20_setops satisfies inclusion-exclusion against direct distinct counts") {
    val out = SparkEntry.queries("q20_setops")(spark, sf).collect()
      .map(r => r.getAs[String]("set_op") -> r.getAs[Long]("n_customers")).toMap
    val orders = Tables.orders(spark, sf)
    def n(y: Int): Long = orders.filter(year(col("o_orderdate")) === y)
      .select("o_custkey").distinct().count()
    assert(out("both") + out("only_1996") == n(1996))
    assert(out("both") + out("only_1997") == n(1997))
    assert(out("either") == out("both") + out("only_1996") + out("only_1997"))
  }

  test("q21_histogram shares sum to 1 and bin means stay inside bin bounds") {
    val rows = SparkEntry.queries("q21_histogram")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-5, s"shares sum to $shareSum")
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      val lo = r.getAs[Long]("lo_chars")
      val avg = r.getAs[Double]("avg_chars")
      assert(lo == bin * 64)
      assert(avg >= lo, s"bin $bin mean $avg below lo $lo")
      if (bin < 9) assert(avg < lo + 64, s"bin $bin mean $avg above hi")
    }
  }

  test("ma_drift_psi is ~non-negative and flags a planted length drift") {
    // real corpus: every per-source PSI ≥ -ε (each unsmoothed term is
    // (p−q)·ln(p/q) ≥ 0; the ε-smoothing can dip a term by at most ~ε)
    val real = SparkEntry.queries("ma_drift_psi")(spark, sf).collect()
    real.foreach(r => assert(r.getAs[Double]("psi") >= -1e-4))

    // planted corpus: src_same matches the baseline length profile,
    // src_long is pushed entirely into the cap bin → must drift
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_psi").toString
    val docs = (0 until 200).map { i =>
      val (srcName, len) =
        if (i % 2 == 0) ("src_same", 40 + (i % 5) * 64)
        else ("src_long", 1200 + (i % 7))
      (i.toLong, "x" * len, "en", srcName, len.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("ma_drift_psi")(spark, tmp).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("psi"), r.getAs[Boolean]("drifted"))).toMap
    assert(out("src_long")._2, s"src_long psi ${out("src_long")._1} not flagged")
    // both sources drift from the 50/50 blended baseline, but the
    // bimodal split makes each PSI large; the flag must fire for both
    assert(out("src_long")._1 > out("src_same")._1 * 0.1)
  }

  test("tx_outliers_sketch serves the exact gate from the sketch frame, no corpus rescan") {
    // exact columns must equal tx_outliers row for row
    val exact = SparkEntry.queries("tx_outliers")(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("median_chars"), r.getAs[Double]("mad_thresh"),
          r.getAs[Long]("n_outliers"), r.getAs[Double]("outlier_share"))).toMap
    val served = SparkEntry.queries("tx_outliers_sketch")(spark, sf).collect()
    assert(served.length == exact.size)
    served.foreach { r =>
      val s = r.getAs[String]("source")
      assert((r.getAs[Double]("median_chars"), r.getAs[Double]("mad_thresh"),
        r.getAs[Long]("n_outliers"), r.getAs[Double]("outlier_share")) == exact(s), s)
      assert(r.getAs[Boolean]("med_ok") && r.getAs[Boolean]("mad_ok")
        && r.getAs[Boolean]("share_ok"), s"sketch estimate out of bracket for $s")
    }
    // serve plan: after the build, the query reads ONLY the persisted
    // |sources|-row sketch frame — any parquet scan means the exact
    // median passes leaked back into the serve path
    operators.Distribution.outlierKllFrames(spark, sf)
    val df = SparkEntry.queries("tx_outliers_sketch")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("InMemoryTableScan"))
    val serve = if (p.contains("InMemoryRelation")) p.substring(0, p.indexOf("InMemoryRelation")) else p
    assert(!serve.split("\n").exists(_.contains("FileScan parquet")),
      "serve path must not rescan the corpus")
  }

  test("gr_triangles matches a brute-force census at sf0.001") {
    val row = SparkEntry.queries("gr_triangles")(spark, sf).collect().head
    // brute force: materialize the (small) sf0.001 edge set and count
    // triangles by adjacency-set intersection
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") >= 40)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val edges = byOrder.values.flatMap { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length; if ps(i) != ps(j))
        yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nWedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    val nTri = edges.toSeq.map { case (u, v) =>
      (adj(u) & adj(v)).size.toLong
    }.sum / 3
    assert(row.getAs[Long]("n_nodes") == adj.size)
    assert(row.getAs[Long]("n_edges") == edges.size)
    assert(row.getAs[Long]("n_wedges") == nWedges)
    assert(row.getAs[Long]("n_triangles") == nTri,
      s"expected $nTri triangles, got ${row.getAs[Long]("n_triangles")}")
    val gcc = row.getAs[Double]("gcc")
    assert(gcc >= 0.0 && gcc <= 1.0)
  }
}
