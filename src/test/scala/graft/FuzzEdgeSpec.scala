package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-input sweep: every registered query over the pathological
  * dataset (tools.GenFuzz — empty / whitespace-only / 1-char /
  * all-duplicate / punctuation-only / CJK-only docs; zero-norm /
  * exact-duplicate / antipodal / denormal / huge-magnitude vectors).
  * This class of input has caught real divergences twice: the round-2
  * golden pass, and the round-8 sweep that found the trailing-empty
  * tokenizer split and the unnormalized-ADC fixed-point overflow.
  *
  * The spec asserts every query RUNS and pins targeted invariants;
  * full oracle parity on the same dir is the Verify + tools/check.py
  * gate (73 pass / 0 fail, recorded in BASELINE.md).
  */
class FuzzEdgeSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val fuzzDir: String = {
    val out = "target/fuzzdata-spec"
    tools.GenFuzz.generate(spark, sf, out)
    out
  }

  test("every registered query runs on the pathological dataset") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, fuzzDir).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.toString.take(160)}") }
    }
    assert(failures.isEmpty, s"queries failed on edge inputs:\n${failures.mkString("\n")}")
  }

  test("every registered query runs on COMPLETELY EMPTY tables") {
    // the degenerate class beyond fuzz: zero rows everywhere (real
    // schemas via limit(0) — tools.GenEmpty). First run of this sweep
    // caught four cross-engine deviations (grand-total rows of
    // ROLLUP/CUBE/GROUPING SETS, q26's vacuous booleans), now
    // documented in those oracles; the oracle gate for this dir is
    // Verify + tools/check.py (recorded in BASELINE.md).
    val emptyDir = "target/emptydata-spec"
    tools.GenEmpty.generate(spark, sf, emptyDir)
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, emptyDir).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.toString.take(160)}") }
    }
    assert(failures.isEmpty, s"queries failed on empty inputs:\n${failures.mkString("\n")}")
  }

  test("zero-norm vectors are excluded from every cosine surface") {
    val zeroIds = Set(80L, 81L) // GenFuzz's zero vectors
    for (q <- Seq("ann_topk", "ann_ivf", "ann_pq", "ann_ivfpq", "ann_lsh")) {
      val ids = SparkEntry.queries(q)(spark, fuzzDir).collect()
        .flatMap(r => Seq(r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      assert(ids.intersect(zeroIds).isEmpty, s"$q surfaced a zero-norm vector")
    }
    val pairs = SparkEntry.queries("dd_embed")(spark, fuzzDir).collect()
      .flatMap(r => Seq(r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(pairs.intersect(zeroIds).isEmpty, "dd_embed surfaced a zero-norm vector")
  }

  test("exact-duplicate and scaled vectors are found with cosine 1") {
    val pairs = SparkEntry.queries("dd_embed")(spark, fuzzDir).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) -> r.getAs[Double]("cosine"))
      .toMap
    // vec 82 = copy of vec 0, vec 97 = 2 × vec 0: both must pair with
    // vec 0 at cosine 1 (scale-invariance of cosine)
    assert(pairs.get((0L, 82L)).contains(1.0), s"exact dup missing: ${pairs.get((0L, 82L))}")
    assert(pairs.get((0L, 97L)).contains(1.0), s"scaled dup missing: ${pairs.get((0L, 97L))}")
    // the one-hot twins (85, 86) share every band key
    assert(pairs.get((85L, 86L)).contains(1.0), "one-hot twin pair missing")
  }

  test("the all-duplicate doc run collapses to one canonical") {
    val clusters = SparkEntry.queries("dd_exact")(spark, fuzzDir).collect()
      .map(r => r.getAs[Long]("canonical_id") -> r.getAs[Long]("n_docs")).toMap
    // 'duplicate shard common text' × 5 (docs 84-88) → one cluster
    // under the smallest doc_id
    assert(clusters.get(84L).contains(5L),
      s"all-duplicate run must be one 5-doc cluster under 84: ${clusters.get(84L)}")
    assert(!(85L to 88L).exists(clusters.contains),
      "non-canonical duplicates must not appear as cluster keys")
    // doc 97 is a byte-exact copy of doc 0 across the real/pathological
    // split → doc 0's cluster absorbs it
    assert(clusters.get(0L).exists(_ >= 2L),
      s"cross-set exact dup must canonicalize under the real doc: ${clusters.get(0L)}")
  }

  test("degenerate texts survive the gates with sane token counts") {
    val toks = SparkEntry.queries("tx_tokens")(spark, fuzzDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chars"), r.getAs[Long]("n_ws_tokens"))).toMap
    assert(toks(80L) == (0L, 1L), s"empty doc: ${toks(80L)}") // split('') = ['']
    assert(toks(94L)._2 == 1L, "500-char single word is one token")
    assert(toks(93L)._2 == 10L, "digits-only doc tokenizes by whitespace")
    // repetition: the 50×'spam' doc must be flagged, the CJK doc must not crash
    val rep = SparkEntry.queries("tx_repetition")(spark, fuzzDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("repetitive")).toMap
    assert(rep(89L), "one-word-repeated doc must be repetitive")
  }
}
