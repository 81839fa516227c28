package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution analytics — set algebra, equi-width histograms, and
  * distribution-drift scoring (PSI). These are the corpus-monitoring
  * primitives a training-data pipeline runs per ingest batch: which
  * cohorts appear/disappear between slices (set ops), what the length
  * profile looks like (histogram), and whether any source's
  * distribution has drifted from the corpus baseline (PSI — the
  * standard data-drift tripwire; reference analog: the per-model
  * feature-distribution comparisons in llmmap.py:104-146, which
  * compare point aggregates where PSI compares whole histograms).
  *
  * Scale shapes: q20 is two shuffle-distincts on a fixed-width key
  * (INTERSECT/EXCEPT compile to hash aggregates/joins on o_custkey);
  * q21/ma_drift_psi scan the corpus ONCE into a ≤ sources×10-row
  * binned aggregate and every later join is over those tiny frames
  * (the global histogram derives from the per-source one by
  * re-aggregation — the mv_incremental merge algebra, so a 100 TB
  * deployment maintains the (source, bin) table incrementally and
  * PSI reads no raw rows at all).
  */
object Distribution {

  /** Customer-cohort set algebra across two order years. The four
    * classic set operators in one result: INTERSECT / both-way EXCEPT
    * / UNION over the distinct 1996 and 1997 purchaser sets — each a
    * hash-distinct on a fixed-width key, the textbook churn/overlap
    * report (customers retained, lost, gained, total active).
    */
  val setOps = Q(
    "q20_setops",
    """WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
      |     b AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
      |SELECT 'both' AS set_op, CAST(count(*) AS BIGINT) AS n_customers
      |  FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
      |UNION ALL
      |SELECT 'either' AS set_op, CAST(count(*) AS BIGINT) AS n_customers
      |  FROM (SELECT * FROM a UNION SELECT * FROM b)
      |UNION ALL
      |SELECT 'only_1996' AS set_op, CAST(count(*) AS BIGINT) AS n_customers
      |  FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
      |UNION ALL
      |SELECT 'only_1997' AS set_op, CAST(count(*) AS BIGINT) AS n_customers
      |  FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
      |ORDER BY set_op""".stripMargin) { (spark, dir) =>
    val orders = Tables.orders(spark, dir)
    def custs(y: Int): DataFrame = orders
      .filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey"))
      .distinct()
    val a = custs(1996)
    val b = custs(1997)
    def labelled(lbl: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_customers"))
        .select(lit(lbl).as("set_op"), col("n_customers"))
    labelled("both", a.intersect(b))
      .unionByName(labelled("either", a.union(b).distinct()))
      .unionByName(labelled("only_1996", a.except(b)))
      .unionByName(labelled("only_1997", b.except(a)))
      .orderBy("set_op")
  }

  /** Histogram bin width (chars) and cap. Integer arithmetic only —
    * `n_chars div 64` reads identically in Spark and DuckDB (`//`),
    * so bin boundaries are bit-exact cross-engine at any length.
    */
  private val BinWidth = 64L
  private val MaxBin = 9L

  /** The shared bin assignment — also used by Streaming.lengthBins so
    * the incrementally-maintained streaming bin table and the batch
    * one agree by construction.
    */
  private[graft] def binCol: org.apache.spark.sql.Column =
    least(expr(s"n_chars div $BinWidth"), lit(MaxBin))

  /** Per-source binned length counts — the ONE corpus scan shared by
    * q21_histogram and ma_drift_psi (both downstream shapes are
    * re-aggregations of this ≤ sources×10-row frame).
    */
  private def sourceBins(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), binCol.as("bin"), col("n_chars"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))

  /** PSI over an already-binned (source, bin, n) table — shared by
    * ma_drift_psi and the streaming twin (which maintains the bin
    * table incrementally and computes PSI from it without ever
    * re-reading raw docs).
    */
  private[graft] def psiFromBins(sb: DataFrame): DataFrame = {
    val tot = sb.groupBy("source").agg(sum("n").as("n_src"))
    val gb = sb.groupBy("bin").agg(sum("n").as("n_all"))
    val g = gb.agg(sum("n_all").as("n_corpus"))
    val grid = tot.crossJoin(broadcast(gb))
    val p = grid
      .join(sb, Seq("source", "bin"), "left")
      .crossJoin(broadcast(g))
      .select(
        col("source"),
        (coalesce(col("n"), lit(0L)) / col("n_src").cast("double")).as("ps"),
        (col("n_all") / col("n_corpus").cast("double")).as("pa"))
    p.groupBy("source")
      .agg(round(lit(1e-9) +
        sum((col("ps") - col("pa")) *
          log((col("ps") + 1e-6) / (col("pa") + 1e-6))), 6).as("psi"))
      .select(col("source"), col("psi"), (col("psi") > 0.1).as("drifted"))
      .orderBy("source")
  }

  /** Equi-width corpus length histogram: 10 fixed 64-char bins (the
    * last open-ended), count + corpus share + mean length per bin.
    * The corpus collapses to ≤ 10 rows in one partial-aggregated
    * pass; the share denominator is a 1-row broadcast derived from
    * the same aggregate, not a second scan.
    */
  val histogram = Q(
    "q21_histogram",
    """WITH b AS (
      |  SELECT least(n_chars // 64, 9) AS bin,
      |         CAST(count(*) AS BIGINT) AS n_docs,
      |         sum(n_chars) AS chars
      |  FROM documents GROUP BY 1),
      |t AS (SELECT sum(n_docs) AS n_total FROM b)
      |SELECT bin, bin * 64 AS lo_chars, n_docs,
      |  round(1e-9 + n_docs / CAST(t.n_total AS DOUBLE), 6) AS share,
      |  round(1e-9 + chars / CAST(n_docs AS DOUBLE), 2) AS avg_chars
      |FROM b CROSS JOIN t
      |ORDER BY bin""".stripMargin) { (spark, dir) =>
    val bins = sourceBins(spark, dir)
      .groupBy("bin")
      .agg(sum("n").as("n_docs"), sum("chars").as("chars"))
    val total = bins.agg(sum("n_docs").as("n_total"))
    bins.crossJoin(broadcast(total))
      .select(
        col("bin"),
        (col("bin") * BinWidth).as("lo_chars"),
        col("n_docs"),
        round(lit(1e-9) + col("n_docs") / col("n_total").cast("double"), 6).as("share"),
        round(lit(1e-9) + col("chars") / col("n_docs").cast("double"), 2).as("avg_chars"))
      .orderBy("bin")
  }

  /** Per-source distribution drift vs the corpus baseline —
    * Population Stability Index over the 10-bin length histogram:
    * PSI = Σ_bins (p_src − p_all)·ln((p_src+ε)/(p_all+ε)), ε=1e-6
    * guarding empty bins. PSI ≥ 0.1 is the conventional "drifted"
    * tripwire. Everything after the single binned corpus scan runs
    * on ≤ sources×10-row aggregate frames (the baseline derives from
    * the per-source counts by re-aggregation; the dense source×bin
    * grid is a broadcast cross join of two tiny aggregates), and the
    * flag compares the ROUNDED score so both engines decide
    * identically.
    */
  val driftPsi = Q(
    "ma_drift_psi",
    """WITH sb AS (
      |  SELECT source, least(n_chars // 64, 9) AS bin,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM documents GROUP BY 1, 2),
      |tot AS (SELECT source, sum(n) AS n_src FROM sb GROUP BY source),
      |gb AS (SELECT bin, sum(n) AS n_all FROM sb GROUP BY bin),
      |g AS (SELECT sum(n) AS n_corpus FROM sb),
      |p AS (
      |  SELECT grid.source,
      |    COALESCE(sb.n, 0) / CAST(grid.n_src AS DOUBLE) AS ps,
      |    grid.n_all / (SELECT CAST(n_corpus AS DOUBLE) FROM g) AS pa
      |  FROM (SELECT t.source, t.n_src, b.bin, b.n_all FROM tot t CROSS JOIN gb b) grid
      |  LEFT JOIN sb ON sb.source = grid.source AND sb.bin = grid.bin),
      |psi AS (
      |  SELECT source,
      |    round(1e-9 + sum((ps - pa) * ln((ps + 1e-6) / (pa + 1e-6))), 6) AS psi
      |  FROM p GROUP BY source)
      |SELECT source, psi, psi > 0.1 AS drifted
      |FROM psi ORDER BY source""".stripMargin) { (spark, dir) =>
    psiFromBins(sourceBins(spark, dir).select("source", "bin", "n"))
  }

  /** Per-source robust outlier gate: median / MAD (median absolute
    * deviation) of document length, and the count of docs beyond the
    * modified-z 3.5 tripwire — the robust-statistics companion to
    * ma_drift_psi (PSI sees distribution shift; MAD flags individual
    * anomalies, and unlike mean/stddev is itself immune to the
    * outliers it hunts). The threshold compares against
    * round(3.5/0.6745 · MAD, 4) and the medians interpolate over
    * integer lengths, so both engines flag identical rows.
    *
    * Scale: exact grouped medians materialize each group's values —
    * the q13_percentiles trade, fine per source; at 100 TB the sketch
    * (percentile_approx, a mergeable partial aggregate) replaces both
    * median passes and q13 pins its 1% error. Three corpus passes
    * (median → MAD → flag count) over ONE 12-byte projection; the
    * ≤|sources|-row median/MAD frames broadcast back each time.
    */
  val outliers = Q(
    "tx_outliers",
    """WITH med AS (
      |  SELECT source, quantile_cont(n_chars, 0.5) AS med
      |  FROM documents GROUP BY source),
      |mad AS (
      |  SELECT d.source, any_value(m.med) AS med,
      |    round(1e-9 + 5.18903632 * quantile_cont(abs(d.n_chars - m.med), 0.5), 4) AS thresh
      |  FROM documents d JOIN med m ON d.source = m.source
      |  GROUP BY d.source)
      |SELECT d.source,
      |  round(1e-9 + any_value(t.med), 2) AS median_chars,
      |  any_value(t.thresh) AS mad_thresh,
      |  CAST(count(*) FILTER (WHERE abs(d.n_chars - t.med) > t.thresh) AS BIGINT) AS n_outliers,
      |  round(1e-9 + count(*) FILTER (WHERE abs(d.n_chars - t.med) > t.thresh)
      |    / CAST(count(*) AS DOUBLE), 6) AS outlier_share
      |FROM documents d JOIN mad t ON d.source = t.source
      |GROUP BY d.source
      |ORDER BY d.source""".stripMargin) { (spark, dir) =>
    val lens = Tables.documents(spark, dir).select("source", "n_chars")
    val med = lens.groupBy("source")
      .agg(percentile(col("n_chars"), lit(0.5)).as("med"))
    // 3.5 / 0.6745 (modified z-score cutoff over the MAD-to-sigma
    // consistency constant), folded to one literal so both engines
    // round the same product
    val mad = lens.join(broadcast(med), "source")
      .groupBy("source")
      .agg(
        first("med").as("med"),
        round(lit(1e-9) +
          lit(5.18903632) * percentile(abs(col("n_chars") - col("med")), lit(0.5)), 4)
          .as("thresh"))
    lens.join(broadcast(mad), "source")
      .groupBy("source")
      .agg(
        round(lit(1e-9) + first("med"), 2).as("median_chars"),
        first("thresh").as("mad_thresh"),
        count(when(abs(col("n_chars") - col("med")) > col("thresh"), 1)).as("n_outliers"),
        round(lit(1e-9) +
          count(when(abs(col("n_chars") - col("med")) > col("thresh"), 1)) /
            count(lit(1)).cast("double"), 6).as("outlier_share"))
      .orderBy("source")
  }

  // ═══════ sketch-served outlier gate (SURVEY's own q13/tx_outliers caveat) ═══════

  /** One-time per-source outlier-sketch build: the KLL sketch of
    * n_chars, the KLL sketch of |n_chars − median| (deviations taken
    * around the EXACT median, preserving tx_outliers' semantics), the
    * exact ±5%-rank brackets that grade both medians, and the exact
    * MAD gate results (threshold, outlier count, share) the oracle
    * recomputes. Production stores only the two constant-size
    * sketches per source and re-probes them each monitoring cycle —
    * the corpus is never rescanned at serve time (this closes
    * SURVEY's own caveat that tx_outliers' two exact median passes
    * are the piece "the mergeable sketch replaces at 100 TB").
    */
  def outlierKllFrames(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.SessionMemo.frames(spark, s"distribution.outlierKll:$dir") {
      import graft.functions.KllAgg.kll_sketch_agg
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val lens = Tables.documents(spark, dir)
        .select(col("source"), col("n_chars").cast("double").as("x"))
      val qs = typedLit(Seq(0.45, 0.5, 0.55))
      val m = lens.groupBy("source")
        .agg(kll_sketch_agg(col("x"), 200).as("sk_x"), percentile(col("x"), qs).as("mq"))
        .select(col("source"), col("sk_x"),
          col("mq").getItem(0).as("mx45"), col("mq").getItem(1).as("mx50"),
          col("mq").getItem(2).as("mx55"))
      val dev = lens.join(broadcast(m.select(col("source"), col("mx50"))), "source")
        .select(col("source"), abs(col("x") - col("mx50")).as("d"))
      val dq = dev.groupBy("source")
        .agg(kll_sketch_agg(col("d"), 200).as("sk_d"), percentile(col("d"), qs).as("dqq"))
        .select(col("source"), col("sk_d"),
          col("dqq").getItem(0).as("dv45"), col("dqq").getItem(1).as("dv50"),
          col("dqq").getItem(2).as("dv55"))
        .withColumn("thresh", round(lit(1e-9) + lit(5.18903632) * col("dv50"), 4))
      val counts = dev
        .join(broadcast(dq.select(col("source"), col("thresh"))), "source")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("d") > col("thresh"), 1)).as("n_outliers"))
      val frame = m.join(dq, "source").join(counts, "source").persist(lvl)
      frame.count() // materialize: the query times the SERVE path
      Seq(frame)
    }.head

  /** tx_outliers_sketch — the MAD gate served from the stored KLL
    * sketches: per source, the exact gate results (median, threshold,
    * outlier count/share — which the oracle recomputes) plus booleans
    * pinning each sketch estimate: est(p50 of n_chars) inside the
    * exact [p45, p55] bracket, est(p50 of deviations) inside its
    * bracket (both the q26 distribution-free ±5%-rank pin), and the
    * sketch-rank outlier share within ±0.05 of the exact share (KLL
    * k=200 publishes ±1.65% rank error). At serve time only the
    * |sources|-row sketch frame is read; the corpus passes live in
    * the build, billed under Bench's `builds` like every sketch
    * table.
    */
  val outliersSketch = Q(
    "tx_outliers_sketch",
    """WITH med AS (
      |  SELECT source, quantile_cont(n_chars, 0.5) AS med
      |  FROM documents GROUP BY source),
      |mad AS (
      |  SELECT d.source, any_value(m.med) AS med,
      |    round(1e-9 + 5.18903632 * quantile_cont(abs(d.n_chars - m.med), 0.5), 4) AS thresh
      |  FROM documents d JOIN med m ON d.source = m.source
      |  GROUP BY d.source)
      |SELECT d.source,
      |  round(1e-9 + any_value(t.med), 2) AS median_chars,
      |  any_value(t.thresh) AS mad_thresh,
      |  CAST(count(*) FILTER (WHERE abs(d.n_chars - t.med) > t.thresh) AS BIGINT) AS n_outliers,
      |  round(1e-9 + count(*) FILTER (WHERE abs(d.n_chars - t.med) > t.thresh)
      |    / CAST(count(*) AS DOUBLE), 6) AS outlier_share,
      |  CASE WHEN any_value(t.med) IS NULL THEN NULL ELSE TRUE END AS med_ok,
      |  CASE WHEN any_value(t.thresh) IS NULL THEN NULL ELSE TRUE END AS mad_ok,
      |  CASE WHEN any_value(t.thresh) IS NULL THEN NULL ELSE TRUE END AS share_ok
      |FROM documents d JOIN mad t ON d.source = t.source
      |GROUP BY d.source
      |ORDER BY d.source""".stripMargin) { (spark, dir) =>
    import graft.functions.KllAgg.{kll_quantile, kll_rank}
    val frame = outlierKllFrames(spark, dir)
    val share = col("n_outliers") / col("n_docs").cast("double")
    frame.select(
      col("source"),
      round(lit(1e-9) + col("mx50"), 2).as("median_chars"),
      col("thresh").as("mad_thresh"),
      col("n_outliers"),
      round(lit(1e-9) + share, 6).as("outlier_share"),
      (kll_quantile(col("sk_x"), lit(0.5)) >= col("mx45") &&
        kll_quantile(col("sk_x"), lit(0.5)) <= col("mx55")).as("med_ok"),
      (kll_quantile(col("sk_d"), lit(0.5)) >= col("dv45") &&
        kll_quantile(col("sk_d"), lit(0.5)) <= col("dv55")).as("mad_ok"),
      (abs((lit(1d) - kll_rank(col("sk_d"), col("thresh"))) - share) <= 0.05).as("share_ok"))
      .orderBy("source")
  }

  /** Exact percentiles from a bounded-VALUE-DOMAIN histogram — the
    * 100 TB path for exact order statistics that q13's percentile()
    * cannot take (its per-group state buffers every value; this
    * one's state is bounded by the value domain — l_quantity has 50
    * distinct values at ANY corpus size). One hash aggregate to the
    * ≤\|flags\|×\|domain\| histogram, a cumulative window over that
    * bounded frame, and the percentile is the smallest value whose
    * cumulative count reaches ⌈p·n⌉ — the discrete (lower) percentile
    * definition spelled out identically in both engines (no
    * quantile_disc semantics dependence). This is how a warehouse
    * serves exact medians over low-cardinality measures at any scale.
    */
  val medianHist = Q(
    "q41_median_hist",
    """WITH h AS (
      |  SELECT l_returnflag, l_quantity AS q, CAST(count(*) AS BIGINT) AS c
      |  FROM lineitem GROUP BY l_returnflag, l_quantity),
      |cum AS (
      |  SELECT l_returnflag, q, c,
      |    sum(c) OVER (PARTITION BY l_returnflag ORDER BY q
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(c) OVER (PARTITION BY l_returnflag) AS n
      |  FROM h)
      |SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
      |  min(CASE WHEN cum >= CAST(ceil(0.5 * n) AS BIGINT) THEN q END) AS median_qty,
      |  min(CASE WHEN cum >= CAST(ceil(0.9 * n) AS BIGINT) THEN q END) AS p90_qty
      |FROM cum GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    val h = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_quantity").as("q"))
      .agg(count(lit(1)).as("c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy("q")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("l_returnflag")
    h.withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
      .groupBy("l_returnflag")
      .agg(max("n").as("n"),
        min(when(col("cum") >= ceil(lit(0.5) * col("n")), col("q"))).as("median_qty"),
        min(when(col("cum") >= ceil(lit(0.9) * col("n")), col("q"))).as("p90_qty"))
      .orderBy("l_returnflag")
  }

  val all: Seq[Q] = Seq(setOps, histogram, driftPsi, outliers, outliersSketch,
    medianHist)
}
