package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** dd_minhash_incremental: the fuzzy twin of dd_incremental. Pins
  * (1) verdict parity with the batch dd_lsh_pairs → dd_jaccard
  * pipeline restricted to cross (corpus, delta) pairs on the composed
  * corpus, and (2) the O(|delta|) serve shape — the probe reads the
  * standing persisted index, never re-banding corpus text.
  */
class DedupIncrementalSpec extends AnyFunSuite {
  import SparkTestSession._

  private def isDelta(id: Long): Boolean = id % 10 >= 8

  test("verdicts cover the delta split exactly once") {
    val nDelta = Tables.documents(spark, sf).filter(col("doc_id") % 10 >= 8).count()
    val rows = SparkEntry.queries("dd_minhash_incremental")(spark, sf).collect()
    assert(rows.length == nDelta, "one verdict row per delta doc")
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    assert(rows.forall(r => Set("dup_near", "new")(r.getAs[String]("verdict"))))
    // a dup_near row must carry its match; jaccard below the floor ⇒ new
    rows.foreach { r =>
      if (r.getAs[String]("verdict") == "dup_near") {
        assert(!r.isNullAt(r.fieldIndex("best_corpus_id")))
        assert(r.getAs[Double]("jaccard") >= 0.5)
      } else if (!r.isNullAt(r.fieldIndex("jaccard")))
        assert(r.getAs[Double]("jaccard") < 0.5)
    }
  }

  test("dup_near verdicts equal batch dd_jaccard duplicates on the cross pairs") {
    // The batch pipeline on the COMPOSED corpus: every is_duplicate
    // pair with one side in the corpus split and one in the delta
    // split. (At this SF no band bucket approaches BucketCap, so the
    // corpus-only cap of the standing index and the composed-corpus
    // cap of the batch run keep identical buckets — the regimes only
    // diverge inside dropped degenerate buckets.)
    val batch = SparkEntry.queries("dd_jaccard")(spark, sf)
      .filter(col("is_duplicate")).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard")))
    val cross = batch.collect {
      case (a, b, j) if isDelta(a) != isDelta(b) =>
        (if (isDelta(a)) a else b, j)
    }
    val expectDup = cross.map(_._1).toSet
    assert(expectDup.nonEmpty, "fixture must contain cross-split near-dups")

    val inc = SparkEntry.queries("dd_minhash_incremental")(spark, sf).collect()
    val gotDup = inc.filter(_.getAs[String]("verdict") == "dup_near")
      .map(_.getAs[Long]("doc_id")).toSet
    assert(gotDup == expectDup,
      s"incremental dup_near set must equal batch cross-pair duplicates; " +
        s"only-incremental=${(gotDup -- expectDup).toSeq.sorted.take(5)} " +
        s"only-batch=${(expectDup -- gotDup).toSeq.sorted.take(5)}")

    // and the reported best score is the max batch cross-pair score
    val bestBatch = cross.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    inc.filter(r => expectDup(r.getAs[Long]("doc_id"))).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(math.abs(r.getAs[Double]("jaccard") - bestBatch(id)) < 1e-9,
        s"doc $id: incremental best ${r.getAs[Double]("jaccard")} vs batch ${bestBatch(id)}")
    }
  }

  test("dd_clusters_incremental equals a full dd_clusters rebuild on the delta split") {
    // full rebuild on the composed corpus: every paired doc's canonical
    val full = SparkEntry.queries("dd_clusters")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    val members = full.toSeq.groupBy(_._2).view
      .mapValues(_.map(_._1)).toMap // canonical -> component members
    val inc = SparkEntry.queries("dd_clusters_incremental")(spark, sf).collect()
    val nDelta = Tables.documents(spark, sf).filter(col("doc_id") % 10 >= 8).count()
    assert(inc.length == nDelta, "one row per delta doc, singletons included")
    var joined = 0
    inc.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val canon = r.getAs[Long]("canonical_id")
      full.get(id) match {
        case Some(expect) =>
          assert(canon == expect, s"doc $id: incremental canonical $canon vs rebuild $expect")
          val hasCorpus = members(expect).exists(m => !isDelta(m))
          assert(r.getAs[Boolean]("in_existing") == hasCorpus, s"doc $id in_existing")
          if (hasCorpus) joined += 1
        case None => // unpaired in the rebuild: must be its own singleton
          assert(canon == id && !r.getAs[Boolean]("in_existing"), s"doc $id singleton")
      }
    }
    assert(joined > 0, "fixture must contain delta docs joining existing corpus clusters")
  }

  test("serve plan probes the persisted index and scans only the delta split") {
    // force the standing build so the query plan is the serve path
    operators.Dedup.fuzzyCorpusIndex(spark, sf)
    val df = SparkEntry.queries("dd_minhash_incremental")(spark, sf)
    df.collect()
    val full = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(full.contains("InMemoryTableScan"),
      "band index and shingle store must serve from the persisted build")
    // the explain prints the cache's one-time BUILD subtree underneath
    // the InMemoryRelation — the SERVE pipeline is everything above it
    val serve =
      if (full.contains("InMemoryRelation")) full.substring(0, full.indexOf("InMemoryRelation"))
      else full
    assert(!serve.contains("% 10) < 8"),
      "corpus-side banding must come from the standing index, not be recomputed per batch")
    val deltaScans = serve.split("\n").filter(_.contains("FileScan parquet"))
    assert(deltaScans.nonEmpty && deltaScans.forall(_.contains("documents")),
      "the only file scans at serve time are the delta's own text")
  }
}
