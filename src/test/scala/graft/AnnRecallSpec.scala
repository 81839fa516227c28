package graft

import org.scalatest.funsuite.AnyFunSuite

/** Measured recall of the approximate ANN paths against the
  * brute-force ground truth (ann_topk), pinned at TWO scale factors —
  * sf0.001 (500 vectors, nlist 22) and sf0.1 (2 000 vectors, nlist
  * 45) — so the √N coarse-quantizer sizing is a tested property, not
  * a formula.
  *
  * The scale paths trade off differently on this corpus, whose true
  * top-10 neighbors are near-orthogonal (cosines ≈ 0.2-0.47):
  *  - ann_ivf (nprobe 4 of √N cells, one Lloyd refinement over the
  *    seed centroids) recalls 0.86-0.92 — cell probing degrades
  *    gracefully when neighbors aren't tightly clustered;
  *  - ann_lsh recalls ~0.08 — sign-hyperplane collisions decay
  *    exponentially with angle, so banded LSH only surfaces
  *    genuinely close vectors. That is the right behavior for its
  *    actual job (thresholded near-duplicate candidates, dd_embed);
  *    for generic k-NN over spread-out data, IVF is the right path.
  * The floors below are tripwires well under the measured values.
  */
class AnnRecallSpec extends AnyFunSuite {
  import SparkTestSession._

  private val sfBig = "/root/testdata/sf0.1"

  private def pairs(q: String, dir: String = sf): Set[(Long, Long)] =
    SparkEntry.queries(q)(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

  private def truthOf(dir: String): Set[(Long, Long)] =
    operators.Ann.topk.fn(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

  private def ivfCurve(dir: String, nprobes: Seq[Int]): Seq[(Int, Double)] = {
    val truth = truthOf(dir)
    nprobes.map { np =>
      val got = operators.Ann.ivfTopkWith(spark, dir, np).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      np -> got.intersect(truth).size.toDouble / truth.size
    }
  }

  private def checkCurve(dir: String, label: String): Unit = {
    val nlist = operators.Ann.nlistOf(spark, dir)
    val curve = ivfCurve(dir, Seq(1, 2, 4, 8, 16, nlist))
    info(s"$label (nlist=$nlist) recall vs nprobe: " +
      curve.map { case (n, r) => f"$n->$r%.3f" }.mkString(", "))
    // probing more cells only ever ADDS candidates → recall is monotone
    curve.sliding(2).foreach { case Seq((n1, r1), (n2, r2)) =>
      assert(r2 >= r1, f"recall fell from $r1%.3f (nprobe=$n1) to $r2%.3f (nprobe=$n2)")
    }
    val byNp = curve.toMap
    assert(byNp(nlist) == 1.0, s"probing ALL $nlist cells is exhaustive search — recall must be 1")
    assert(byNp(8) >= 0.85, f"nprobe=8 recall regressed: ${byNp(8)}%.3f")
    assert(byNp(4) >= 0.8, f"nprobe=4 (the registered setting) recall regressed: ${byNp(4)}%.3f")
  }

  test("IVF recall-vs-nprobe curve is monotone and saturates (sf0.001, nlist=√N)") {
    assert(operators.Ann.nlistOf(spark, sf) == 22) // √500 rounded
    checkCurve(sf, "sf0.001")
  }

  test("IVF recall-vs-nprobe curve re-pinned at sf0.1 (4× corpus, √N cells)") {
    assert(operators.Ann.nlistOf(spark, sfBig) == 45) // √2000 rounded
    checkCurve(sfBig, "sf0.1")
  }

  test("ann_topk brute-force baseline refuses production-sized query sets") {
    // the per-query full-corpus window is the documented validation
    // baseline — the guard keeps it off production query sets
    val ex = intercept[IllegalArgumentException] {
      operators.Ann.bruteTopkWith(spark, sf, operators.Ann.MaxBruteForceQueries + 1)
    }
    assert(ex.getMessage.contains("validation baseline"))
    assert(operators.Ann.NumQueries <= operators.Ann.MaxBruteForceQueries)
  }

  test("approximate ANN recall vs brute force is measured and bounded") {
    val truth = pairs("ann_topk")
    assert(truth.nonEmpty)
    val ivf = pairs("ann_ivf").intersect(truth).size.toDouble / truth.size
    val lsh = pairs("ann_lsh").intersect(truth).size.toDouble / truth.size
    val pq = pairs("ann_pq").intersect(truth).size.toDouble / truth.size
    info(f"recall: ivf=$ivf%.3f lsh=$lsh%.3f pq=$pq%.3f")
    assert(ivf >= 0.8, s"IVF recall regressed: $ivf")
    assert(lsh > 0.0, s"LSH recall collapsed to zero: $lsh")
    assert(ivf > lsh, "on spread-out data IVF must beat sign-LSH recall")
    // PQ scans every candidate with an approximate metric (vs IVF's
    // exact metric over a candidate subset), so on this corpus it
    // sits between the two. The r6 16-codeword untrained codebook
    // measured 0.36; Lloyd iterations alone did NOT lift it (0.34 —
    // near-orthogonal subvectors give k-means little to converge to),
    // the codebook SIZE did: 256 codewords (classic 8-bit PQ) with 2
    // Lloyd iterations measures 0.70. Floor is a tripwire under that.
    assert(pq >= 0.55, s"PQ recall regressed: $pq")
    assert(pq > lsh, "ADC over all candidates must beat banded LSH recall")
  }

  test("SQ8 recall sits at the top of the compression ladder, at both pinned SFs") {
    // 8 bits PER DIMENSION (4× compression) vs PQ's 8 bits per
    // 8-dim subspace (64×): the scalar quantizer's error per
    // coordinate is ≤ step/2 ≈ range/510, so its approximate cosine
    // ranking should recover nearly all true neighbors even on this
    // near-orthogonal corpus — the ladder must order LSH < PQ < SQ8.
    for (dir <- Seq(sf, sfBig)) {
      val truth = truthOf(dir)
      val sq = pairs("ann_sq8", dir).intersect(truth).size.toDouble / truth.size
      val pq = pairs("ann_pq", dir).intersect(truth).size.toDouble / truth.size
      info(f"$dir: sq8=$sq%.3f pq=$pq%.3f")
      assert(sq >= 0.9, f"SQ8 recall regressed: $sq%.3f at $dir")
      assert(sq >= pq, "finer quantization must not recall less than PQ")
    }
  }

  test("IVFPQ recall matches IVF while candidates fit the re-rank budget") {
    val truth = pairs("ann_topk")
    val curve = Seq(1, 2, 4, 8, 16).map { np =>
      val ivf = operators.Ann.ivfTopkWith(spark, sf, np).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      val ivfpq = operators.Ann.ivfpqTopkWith(spark, sf, np, operators.Ann.NRerank).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      val maxCand = operators.Ann.ivfCandidates(spark, sf, np)
        .groupBy("query_id").count().collect().map(_.getAs[Long]("count")).max
      val rIvf = ivf.intersect(truth).size.toDouble / truth.size
      val rPq = ivfpq.intersect(truth).size.toDouble / truth.size
      (np, rIvf, rPq, maxCand)
    }
    info(s"ivf vs ivfpq recall (maxCand): " +
      curve.map { case (n, a, b, c) => f"$n->($a%.3f,$b%.3f,$c)" }.mkString(", "))
    curve.foreach { case (np, rIvf, rPq, maxCand) =>
      if (maxCand <= operators.Ann.NRerank) {
        // re-rank budget covers every probed candidate → the exact
        // re-rank reproduces IVF exactly; this is a true invariant
        assert(rPq >= rIvf,
          f"IVFPQ recall $rPq%.3f fell below IVF $rIvf%.3f at nprobe=$np with all candidates re-ranked")
      } else {
        // above the budget, ADC pruning may legitimately drop a true
        // neighbor the exact path keeps — bound the loss instead of
        // asserting an equality that isn't an invariant
        assert(rPq >= rIvf - 0.1,
          f"IVFPQ recall $rPq%.3f lost more than 0.1 vs IVF $rIvf%.3f at nprobe=$np (maxCand=$maxCand)")
      }
    }
    // the registered setting must stay useful in absolute terms
    val (_, _, rReg, _) = curve.find(_._1 == operators.Ann.NProbe).get
    assert(rReg >= 0.75, f"IVFPQ recall at the registered nprobe regressed: $rReg%.3f")
  }

  test("ann_refresh conserves every vector: base and delta counts add up") {
    import org.apache.spark.sql.functions._
    val occ = SparkEntry.queries("ann_refresh")(spark, sf).collect()
    val base = occ.map(_.getAs[Long]("n_base")).sum
    val fresh = occ.map(_.getAs[Long]("n_new")).sum
    // reconstruct the two slices with the query's own corpus definition
    val c = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("nrm", sqrt(aggregate(zip_with(col("e"), col("e"), _ * _),
        lit(0d), _ + _)))
      .filter(col("nrm") > 0d)
    val wantBase = c.filter(col("vec_id") % 10 =!= 7).count()
    val wantNew = c.filter(col("vec_id") % 10 === 7).count()
    assert(base == wantBase, s"base members lost: $base != $wantBase")
    assert(fresh == wantNew, s"delta members lost: $fresh != $wantNew")
    assert(occ.forall(r => r.getAs[Long]("n_total") ==
      r.getAs[Long]("n_base") + r.getAs[Long]("n_new")))
    assert(fresh > 0, "the delta slice must be non-empty at sf0.001")
  }

  test("ann_knn_join: valid ranks, no self-pairs, measured recall vs exact kNN") {
    val rows = SparkEntry.queries("ann_knn_join")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("vec_id") != r.getAs[Long]("neighbor_id"))
      assert(r.getAs[Long]("rank") >= 1 && r.getAs[Long]("rank") <= 3)
    }
    // per-vector ranks are dense from 1 and cosines non-increasing
    rows.groupBy(_.getAs[Long]("vec_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length))
      val cs = sorted.map(_.getAs[Double]("cosine"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b - 1e-9 })
    }
    // measured recall vs the exact in-JVM kNN join (12 probed cells
    // under the per-cell cap keep candidates linear in N — pin the
    // floor a SemDeDup-style consumer needs)
    import org.apache.spark.sql.functions._
    val vecs = operators.Ann.corpus(spark, sf)
      .select(col("vec_id"), col("e"), col("nrm")).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Double]]("e").toArray, r.getAs[Double]("nrm")))
    val exact: Map[Long, Set[Long]] = vecs.map { case (id, e, n) =>
      id -> vecs.filter(_._1 != id).map { case (id2, e2, n2) =>
        (id2, e.zip(e2).map { case (a, b) => a * b }.sum / (n * n2))
      }.sortBy { case (id2, c) => (-c, id2) }.take(3).map(_._1).toSet
    }.toMap
    val got = rows.groupBy(_.getAs[Long]("vec_id"))
      .map { case (v, rs) => v -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val hits = got.map { case (v, ns) => (ns & exact(v)).size }.sum.toDouble
    val recall = hits / (exact.size * 3)
    info(f"kNN-join recall@3 vs exact: $recall%.3f")
    assert(recall >= 0.75, f"12-probe kNN-join recall $recall%.3f below floor")
  }

  test("ann_knn_join packed map-side path equals the join+heap formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // the registered query (top_cells probe + cell_topk scorer under
    // the broadcast gate at this SF)
    val got = SparkEntry.queries("ann_knn_join")(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Long]("rank"))).toSet
    // the pre-packed formulation it replaced: heap-aggregated probe
    // over the centroid cross join + shuffled cell join + one global
    // heap over every candidate row (KnnJoinProbe=12, KnnJoinCellCap=128)
    val c = operators.Ann.corpus(spark, sf)
    val (cent, assigned) = operators.Ann.ivfIndex(spark, sf)
    val probe = operators.Ann.scoreAgainst(c, cent)
      .groupBy("vec_id")
      .agg(functions.TopKAgg.topk_by_score(col("ccos"), col("cid"), 12).as("pc"))
      .select(col("vec_id"), explode(col("pc")).as("p"))
      .select(col("vec_id"), col("p.id").as("cell"))
    val wCell = Window.partitionBy("cell").orderBy("vec_id")
    val members = assigned
      .withColumn("mrn", row_number().over(wCell))
      .filter(col("mrn") <= 128)
      .select(col("cell"), col("vec_id").as("vb"))
    val want = probe
      .join(c.select(col("vec_id"), col("e").as("qe"), col("nrm").as("qn")), Seq("vec_id"))
      .select(col("cell"), col("vec_id").as("va"), col("qe"), col("qn"))
      .join(members
        .join(c.select(col("vec_id").as("vb"), col("e").as("eb"), col("nrm").as("nb")), Seq("vb")),
        Seq("cell"))
      .filter(col("va") =!= col("vb"))
      .select(col("va"), col("vb"),
        (graft.functions.HashExprs.dot_product(col("qe"), col("eb"))
          / (col("qn") * col("nb"))).as("cos_raw"))
      .groupBy(col("va").as("vec_id"))
      .agg(functions.TopKAgg.topk_by_score(col("cos_raw"), col("vb"), 3).as("tk"))
      .select(col("vec_id"), explode(col("tk")).as("t"))
      .select(col("vec_id"), col("t.id").as("neighbor_id"),
        round(lit(1e-9) + col("t.score"), 6).as("cosine"), col("t.rank").as("rank"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Long]("rank"))).toSet
    assert(got == want,
      s"packed path diverged: only-new=${(got -- want).take(5)} only-old=${(want -- got).take(5)}")
  }
}
