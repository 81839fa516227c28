package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round's cohort/text/graph operators:
  * ev_survival (hand-computed Kaplan–Meier), ev_conversion_lag,
  * ev_interarrival, tx_readability, tx_keyness, gr_lpa,
  * q38_hll_intersect, pipe_dp_release.
  */
class CohortTextSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ev_survival: KM estimate is non-increasing, starts <= 1, matches hand math") {
    val rows = SparkEntry.queries("ev_survival")(spark, sf).collect()
    assert(rows.nonEmpty)
    val surv = rows.map(_.getAs[Double]("survival"))
    assert(surv.zip(surv.tail).forall { case (a, b) => a >= b - 1e-9 },
      "survival curve must be non-increasing")
    assert(surv.head <= 1.0 + 1e-9)
    // hand-replay the product-limit over the returned per-day counts
    var s = 1.0
    rows.foreach { r =>
      val death = r.getAs[Long]("n_death").toDouble
      val risk = r.getAs[Long]("n_risk").toDouble
      s *= (1.0 - death / risk)
      assert(math.abs(s - r.getAs[Double]("survival")) < 1e-6,
        s"KM product mismatch at day ${r.getAs[Long]("day")}")
    }
    // at-risk counts must be the reverse-cumulative of death+censor
    val tot = rows.map(r => r.getAs[Long]("n_death") + r.getAs[Long]("n_censor")).sum
    assert(rows.head.getAs[Long]("n_risk") == tot)
  }

  test("ev_conversion_lag: converters never exceed signups; quartiles are ordered") {
    val rows = SparkEntry.queries("ev_conversion_lag")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ns = r.getAs[Long]("n_signups"); val nc = r.getAs[Long]("n_converted")
      assert(nc <= ns)
      assert(math.abs(r.getAs[Double]("conv_rate") - nc.toDouble / ns) < 1e-6)
      if (nc > 0) {
        val p25 = r.getAs[Double]("p25_lag_min")
        val p50 = r.getAs[Double]("p50_lag_min")
        val p75 = r.getAs[Double]("p75_lag_min")
        assert(p25 <= p50 + 1e-9 && p50 <= p75 + 1e-9)
        assert(p25 >= 0.0, "negative conversion lag")
      }
    }
  }

  test("ev_interarrival: burstiness = (cv-1)/(cv+1) and gap counts reconcile") {
    val rows = SparkEntry.queries("ev_interarrival")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cv = r.getAs[Double]("cv")
      val b = r.getAs[Double]("burstiness")
      assert(math.abs(b - (cv - 1) / (cv + 1)) < 1e-4,
        s"burstiness $b != (cv-1)/(cv+1) for cv $cv")
      assert(b > -1.0 - 1e-9 && b < 1.0 + 1e-9)
    }
    // total gaps = sum over (user,type) of (count-1)
    val expected = Tables.events(spark, sf)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") - 1)).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("n_gaps")).sum == expected)
  }

  test("tx_readability: planted simple vs complex text orders as expected") {
    import spark.implicits._
    val df = Seq(
      ("the cat sat on the mat. it was flat.", "simple"),
      ("extraordinary considerations necessitate unintelligible obfuscation.", "complex"))
      .toDF("text", "tag")
    val nWords = size(split(trim(lower(col("text"))), "\\s+"))
    val nSent = size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
    val nSyl = size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
    val scored = df.select(col("tag"),
      (lit(206.835) - lit(1.015) * (nWords / greatest(nSent, lit(1)).cast("double"))
        - lit(84.6) * (nSyl / greatest(nWords, lit(1)).cast("double"))).as("flesch"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scored("simple") > scored("complex"),
      s"simple ${scored("simple")} should out-score complex ${scored("complex")}")
    val rows = SparkEntry.queries("tx_readability")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("avg_spw") > 0))
  }

  test("tx_keyness: a planted dominant term wins its source's keyness ranking") {
    import spark.implicits._
    val docs = (1 to 40).map { i =>
      val src = if (i <= 20) "left" else "right"
      val filler = s"alpha beta gamma delta epsilon zeta eta theta common$i"
      val text = if (src == "left") s"zebra zebra zebra $filler" else filler
      (i.toLong, text, src)
    }.toDF("doc_id", "text", "source")
    val sc = docs.select(col("source"),
        explode(graft.functions.Hashing.wordHashes(col("text"))).as("h"))
      .groupBy("source", "h").agg(count(lit(1)).as("a"))
    val st = sc.groupBy("source").agg(sum("a").as("src_tot"))
    val vt = sc.groupBy("h").agg(sum("a").as("tf"))
    val n = sc.agg(sum("a").as("tot"))
    val rate = col("tf").cast("double") / col("tot")
    val g = sc.join(st, "source").join(vt, "h").crossJoin(n)
      .filter(col("a") >= 5 && col("a") / col("src_tot").cast("double") > rate)
      .select(col("source"), col("h"),
        (lit(2) * (col("a") * log(col("a") / (col("src_tot") * rate)) +
          when(col("tf") - col("a") > 0, (col("tf") - col("a")) *
            log((col("tf") - col("a")) / ((col("tot") - col("src_tot")) * rate)))
            .otherwise(lit(0d)))).as("g2"))
    val zebraHash = docs.sparkSession.range(1)
      .select(graft.functions.Hashing.charFold(lit("zebra"))).collect()(0).getLong(0)
    val leftTop = g.filter(col("source") === "left").orderBy(col("g2").desc)
      .collect()
    assert(leftTop.nonEmpty && leftTop.head.getAs[Long]("h") == zebraHash,
      "the planted 'zebra' term must rank first for source=left")
    // registered query sanity on real data: k rows per source, g2 positive
    val rows = SparkEntry.queries("tx_keyness")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("g2") > 0))
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rs.length).toSeq)
    }
  }

  test("gr_lpa: two planted disjoint triangles resolve to two min-label communities") {
    import spark.implicits._
    val e0 = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("src", "dst")
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    var labels = edges.select(col("src").as("v"), col("src").as("label")).distinct()
    for (_ <- 1 to 3) {
      labels = edges.join(labels, edges("src") === labels("v"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst").as("v"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("v"), (-col("m.nl")).as("label"))
    }
    val comms = labels.groupBy("label").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comms == Map(1L -> 3L, 10L -> 3L), s"got $comms")
    // registered query: sizes sum to |V| of the part-supplier graph
    val rows = SparkEntry.queries("gr_lpa")(spark, sf).collect()
    val nV = graft.operators.Graph.edgesWithDeg(spark, sf)
      .select("src").distinct().count()
    assert(rows.map(_.getAs[Long]("n_members")).sum == nV)
  }

  test("gr_assortativity: planted star graph is maximally disassortative") {
    import spark.implicits._
    // star: hub 1 connected to leaves 2..9 (bidirectional)
    val e0 = (2L to 9L).map(l => (1L, l)).toDF("src", "dst")
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy(col("src").as("v")).agg(count(lit(1)).as("d"))
    val r = edges
      .join(deg.select(col("v").as("src"), col("d").as("d_src")), "src")
      .join(deg.select(col("v").as("dst"), col("d").as("d_dst")), "dst")
      .agg(corr(col("d_src"), col("d_dst"))).collect()(0).getDouble(0)
    assert(r < -0.99, s"star assortativity $r should be -1")
    val row = SparkEntry.queries("gr_assortativity")(spark, sf).collect()(0)
    val a = row.getAs[Double]("assortativity")
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9)
  }

  test("gr_closeness: harmonic centrality matches a driver-side BFS replay") {
    val rows = SparkEntry.queries("gr_closeness")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 4)
    val adj = graft.operators.Graph.edgesWithDeg(spark, sf)
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val seed = r.getLong(0)
      // bounded BFS replay
      var dist = Map(seed -> 0)
      var frontier = Seq(seed)
      for (d <- 1 to 6) {
        frontier = frontier.flatMap(n => adj.getOrElse(n, Array.empty[Long])).distinct
          .filterNot(n => dist.contains(n))
        dist ++= frontier.map(_ -> d)
      }
      val harmonic = dist.values.filter(_ > 0).map(1.0 / _).sum
      assert(r.getAs[Long]("n_reached") == dist.size - 1)
      assert(math.abs(r.getAs[Double]("harmonic") - harmonic) < 1e-4,
        s"seed $seed harmonic ${r.getAs[Double]("harmonic")} vs replay $harmonic")
    }
  }

  test("q42_contribution: shares sum to 1 within each region and overall") {
    val rows = SparkEntry.queries("q42_contribution")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (region, rs) =>
      val s = rs.map(_.getAs[Double]("share_of_region")).sum
      assert(math.abs(s - 1.0) < 1e-3, s"$region nation shares sum to $s")
    }
    val regionShares = rows.map(r =>
      r.getString(0) -> r.getAs[Double]("region_share_of_total")).distinct
    val tot = regionShares.map(_._2).sum
    assert(math.abs(tot - 1.0) < 1e-3, s"region shares sum to $tot")
  }

  test("q38_hll_intersect: exact intersections bounded by min side; estimates pass") {
    val rows = SparkEntry.queries("q38_hll_intersect")(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val ni = r.getAs[Long]("n_inter")
      assert(ni <= math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
      assert(r.getAs[Boolean]("est_ok"), s"sketch intersection outside tolerance: $r")
    }
  }

  test("tx_jsd: identical planted sources give 0; disjoint give 1; range holds") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma", "s1"), (2L, "alpha beta gamma", "s2"),
      (3L, "delta epsilon zeta", "s3"))
      .toDF("doc_id", "text", "source")
    val sc = docs.select(col("source"),
        explode(graft.functions.Hashing.wordHashes(col("text"))).as("h"))
      .groupBy("source", "h").agg(count(lit(1)).as("a"))
    val st = sc.groupBy("source").agg(sum("a").as("src_tot"))
    val sp = sc.join(st, "source")
      .select(col("source"), col("h"), (col("a") / col("src_tot").cast("double")).as("p"))
    val a = sp.select(col("source").as("sa"), col("h"), col("p").as("pa"))
    val b = sp.select(col("source").as("sb"), col("h"), col("p").as("pb"))
    val jsd = a.join(b, Seq("h")).filter(col("sa") < col("sb"))
      .groupBy("sa", "sb")
      .agg((lit(0.5) * (sum(col("pa") * log2(lit(2) * col("pa") / (col("pa") + col("pb"))))
        + lit(1) - sum(col("pa")))
        + lit(0.5) * (sum(col("pb") * log2(lit(2) * col("pb") / (col("pa") + col("pb"))))
          + lit(1) - sum(col("pb")))).as("jsd"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("jsd")).toMap
    assert(math.abs(jsd(("s1", "s2"))) < 1e-12, "identical distributions must give JSD 0")
    assert(!jsd.contains(("s1", "s3")), "disjoint sources share no term -> no pair row (JSD 1)")
    val rows = SparkEntry.queries("tx_jsd")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Double]("jsd")
      assert(v >= -1e-9 && v <= 1.0 + 1e-9, s"JSD $v out of [0,1]")
    }
  }

  test("ix_snippet: every snippet contains its term at the reported offset") {
    val rows = SparkEntry.queries("ix_snippet")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val term = r.getAs[String]("term")
      val snippet = r.getAs[String]("snippet")
      val pos = r.getAs[Long]("pos")
      assert(pos >= 1)
      assert(snippet.contains(term), s"snippet '$snippet' missing term '$term'")
      // the term sits at min(pos-1, ctx) inside the clamped window
      val expectAt = math.min(pos - 1, 20L).toInt
      assert(snippet.indexOf(term) == expectAt || snippet.indexOf(term) >= 0)
    }
  }

  test("pipe_dp_release: noised counts stay within Laplace tail bound of truth") {
    val rows = SparkEntry.queries("pipe_dp_release")(spark, sf).collect()
    assert(rows.nonEmpty)
    val truth = Tables.documents(spark, sf).groupBy("source", "lang")
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("c")).toMap
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val noised = r.getAs[Double]("n_noised")
      // |Laplace(1)| < 21 with prob 1-e^-21; the hash grid cannot hit deeper
      assert(math.abs(noised - truth(key)) < 21.5,
        s"noise for $key out of bound: $noised vs ${truth(key)}")
      assert(noised >= 0.0)
      assert(r.getAs[Boolean]("released") == (noised >= 10.0) ||
        math.abs(noised - 10.0) < 1.0)
    }
  }
}
