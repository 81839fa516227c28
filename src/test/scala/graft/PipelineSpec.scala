package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the second pipeline block (repetition,
  * decontamination, sampling, mixing) beyond the DuckDB hash parity
  * the driver runs: each operator's numbers are re-derived from the
  * raw table with independent DataFrame logic.
  */
class PipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  test("tx_repetition matches a direct per-doc recount for a sample of docs") {
    val out = SparkEntry.queries("tx_repetition")(spark, sf)
      .filter(col("doc_id") < 20).collect().map(r =>
        r.getAs[Long]("doc_id") -> r).toMap
    val raw = Tables.documents(spark, sf)
      .filter(col("doc_id") < 20)
      .select("doc_id", "text").collect()
    assert(raw.nonEmpty)
    for (r <- raw) {
      val id = r.getAs[Long]("doc_id")
      val words = r.getAs[String]("text").trim.toLowerCase.split("\\s+").toSeq
      val bigrams = words.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val o = out(id)
      assert(o.getAs[Long]("n_words") == words.size)
      assert(o.getAs[Long]("n_distinct") == words.distinct.size)
      val twf = words.groupBy(identity).values.map(_.size).max.toDouble / words.size
      assert(math.abs(o.getAs[Double]("top_word_frac") - twf) < 1e-5)
      val tbf = if (bigrams.isEmpty) 0d
        else bigrams.groupBy(identity).values.map(_.size).max.toDouble / bigrams.size
      assert(math.abs(o.getAs[Double]("top_bigram_frac") - tbf) < 1e-5)
    }
  }

  test("per-row repetitiveExpr equals the histogram-shaped repetition flag doc-for-doc") {
    // the streaming gate (one map-side fold per row) and the batch
    // histogram (explode + keyed aggregation) must classify
    // identically — same thresholds, same rounding
    val batch = SparkEntry.queries("tx_repetition")(spark, sf)
      .select("doc_id", "repetitive").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("repetitive")).toMap
    val row = Tables.documents(spark, sf)
      .select(col("doc_id"), operators.Pipeline.repetitiveExpr(col("text")).as("repetitive"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("repetitive")).toMap
    assert(row.keySet == batch.keySet)
    val diff = row.collect { case (id, v) if batch(id) != v => id }
    assert(diff.isEmpty, s"per-row flag disagrees with histogram flag for docs: ${diff.take(5)}")
    assert(batch.values.exists(identity), "fixture must contain repetitive docs")
  }

  test("tx_repetition flags a meaningful, non-degenerate slice of the corpus") {
    val flags = SparkEntry.queries("tx_repetition")(spark, sf)
      .groupBy("repetitive").count().collect()
      .map(r => r.getAs[Boolean]("repetitive") -> r.getAs[Long]("count")).toMap
    assert(flags.getOrElse(true, 0L) > 0, "no doc flagged repetitive")
    assert(flags.getOrElse(false, 0L) > 0, "every doc flagged repetitive")
  }

  test("tx_unigram_ppl equals a driver-side unigram LM rescore") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").trim.toLowerCase.split("\\s+").toSeq)
    val vocab = texts.flatMap(_._2).groupBy(identity).map { case (w, o) => w -> o.size }
    val n = vocab.values.sum.toDouble
    val out = SparkEntry.queries("tx_unigram_ppl")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == texts.length)
    for ((id, words) <- texts.take(25)) {
      val bits = words.map(w => -math.log(vocab(w) / n) / math.log(2)).sum / words.size
      val o = out(id)
      assert(o.getAs[Long]("n_tokens") == words.size)
      assert(math.abs(o.getAs[Double]("bits") - bits) < 1e-5, s"doc $id")
      assert(o.getAs[Boolean]("high_ppl") == (o.getAs[Double]("bits") >= 5.0))
    }
    val flags = out.values.count(_.getAs[Boolean]("high_ppl"))
    assert(flags > 0 && flags < out.size, "threshold must split the corpus")
  }

  test("pipe_decontaminate reports corpus docs against eval docs with verifiable overlap") {
    val out = SparkEntry.queries("pipe_decontaminate")(spark, sf).collect()
    assert(out.nonEmpty, "the planted near-dup structure must surface contamination")
    for (r <- out) {
      assert(r.getAs[Long]("doc_id") % 10 != 3, "eval docs must not be scanned as corpus")
      assert(r.getAs[Long]("best_eval_id") % 10 == 3, "best match must be an eval doc")
      val f = r.getAs[Double]("overlap_frac")
      assert(f >= 0.2 && f <= 1.0 + 1e-9)
      assert(r.getAs[Boolean]("contaminated") == (f >= 0.5))
    }
    // re-derive the top hit's overlap from raw shingle sets
    val top = out.maxBy(_.getAs[Double]("overlap_frac"))
    val sh = Tables.documents(spark, sf)
      .filter(col("doc_id").isin(top.getAs[Long]("doc_id"), top.getAs[Long]("best_eval_id")))
      .select(col("doc_id"), functions.Hashing.shingleHashes(col("text")).as("s"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toSet).toMap
    val doc = sh(top.getAs[Long]("doc_id"))
    val ev = sh(top.getAs[Long]("best_eval_id"))
    val frac = doc.intersect(ev).size.toDouble / doc.size
    assert(math.abs(top.getAs[Double]("overlap_frac") - frac) < 1e-5)
  }

  test("pipe_decon_bloom equals pipe_decontaminate and the bloom actually prunes") {
    val exact = SparkEntry.queries("pipe_decontaminate")(spark, sf)
    val bloom = SparkEntry.queries("pipe_decon_bloom")(spark, sf)
    assert(bloom.exceptAll(exact).count() == 0)
    assert(exact.exceptAll(bloom).count() == 0)
    // the prefilter must pass a strict subset of the corpus: no false
    // negatives is proven by the equality above; pruning power by the
    // count dropping below the corpus size
    val bytes = operators.Pipeline.evalBloom(spark, sf)
    assert(bytes.length > 64, "bloom must be a real serialized filter")
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types.BinaryType
    val lit = Literal.create(bytes, BinaryType)
    val corpus = Tables.documents(spark, sf).filter(col("doc_id") % 10 =!= 3)
      .select(col("doc_id"), functions.Hashing.shingleHashes(col("text")).as("s"))
    val kept = corpus.filter(exists(col("s"), h =>
      Bridge.column(BloomFilterMightContain(lit, Bridge.expression(h))))).count()
    val total = corpus.count()
    assert(kept < total, s"bloom prefilter must prune some docs ($kept of $total kept)")
  }

  test("pipe_sample selects exactly k docs per source, ranked by ascending fingerprint") {
    val out = SparkEntry.queries("pipe_sample")(spark, sf).collect()
    val bySource = out.groupBy(_.getAs[String]("source"))
    assert(bySource.size == 20)
    for ((_, rows) <- bySource) {
      assert(rows.length == 16)
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 16L))
      val fps = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("fp")).toSeq
      assert(fps == fps.sorted, "rank order must be ascending fingerprint order")
    }
    // rank 1 really is the per-source minimum over the whole table
    val mins = Tables.documents(spark, sf)
      .select(col("source"), functions.Hashing.charFold(col("text")).as("fp"))
      .groupBy("source").agg(min("fp").as("m")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("m")).toMap
    for ((s, rows) <- bySource)
      assert(rows.minBy(_.getAs[Long]("rank")).getAs[Long]("fp") == mins(s))
  }

  test("pipe_e2e funnel counts are exhaustive and consistent with the standalone gates") {
    val out = SparkEntry.queries("pipe_e2e")(spark, sf).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      // every corpus doc lands in exactly one funnel bucket
      val stages = Seq("n_dup_dropped", "n_lang_dropped", "n_quality_dropped",
        "n_rep_dropped", "n_contam_dropped", "n_kept").map(r.getAs[Long](_))
      assert(stages.sum == r.getAs[Long]("n_docs"), s"${r.getAs[String]("source")}")
      val shards = r.getAs[Long]("n_shards")
      assert(shards == math.ceil(r.getAs[Long]("tokens_kept") / 500.0).toLong)
    }
    // the corpus-wide totals agree with the standalone gate queries on
    // the same slice: repetition flags from tx_repetition, contaminated
    // docs from pipe_decontaminate (both filtered to the e2e corpus)
    val contamTotal = out.map(_.getAs[Long]("n_contam_dropped")).sum
    val flagged = SparkEntry.queries("pipe_decontaminate")(spark, sf)
      .filter(col("contaminated")).count()
    assert(contamTotal <= flagged,
      "e2e can only drop contaminated docs that the standalone scan also flags")
    val repTotal = out.map(_.getAs[Long]("n_rep_dropped")).sum
    val repFlagged = SparkEntry.queries("tx_repetition")(spark, sf)
      .filter(col("repetitive") && col("doc_id") % 10 =!= 3).count()
    assert(repTotal <= repFlagged)
  }

  test("tx_bigram_ppl equals a driver-side stupid-backoff rescore and exercises backoff") {
    import graft.functions.PolyHashing
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> PolyHashing.tokenHashes(r.getAs[String]("text")).toSeq)
    val train = docs.filter(_._1 % 2 == 0)
    val uni = train.flatMap(_._2).groupBy(identity).map { case (h, o) => h -> o.size.toLong }
    val big = train.flatMap(_._2.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, o) => p -> o.size.toLong }
    val n = uni.values.sum.toDouble
    val out = SparkEntry.queries("tx_bigram_ppl")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == docs.count(_._2.size >= 2), "every doc with a bigram must be scored")
    var backoffHits = 0
    for ((id, wh) <- docs.take(40) if wh.size >= 2) {
      val pairs = wh.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
      val bitsSum = pairs.map { case (p, c) =>
        val s = big.get((p, c)) match {
          case Some(bc) => bc.toDouble / uni(p)
          case None => backoffHits += 1; 0.4 * uni.getOrElse(c, 0L).toDouble.max(0.5) / n
        }
        -math.log(s) / math.log(2)
      }.sum
      val o = out(id)
      assert(o.getAs[Long]("n_bigrams") == pairs.size)
      assert(math.abs(o.getAs[Double]("bits") - bitsSum / pairs.size) < 1e-5, s"doc $id")
      assert(o.getAs[Boolean]("high_ppl2") == (o.getAs[Double]("bits") >= 5.05))
    }
    assert(backoffHits > 0,
      "the held-out split must produce unseen bigrams or the backoff path is dead code")
    val flags = out.values.count(_.getAs[Boolean]("high_ppl2"))
    assert(flags > 0 && flags < out.size, "threshold must split the corpus")
  }

  test("pipe_mix_apply draws copy counts that realize the reported weights") {
    val out = SparkEntry.queries("pipe_mix_apply")(spark, sf).collect()
    val mix = SparkEntry.queries("pipe_mix")(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.length == nDocs, "every doc must receive a copy count")
    for (r <- out) {
      val w = r.getAs[Double]("weight")
      assert(math.abs(w - mix(r.getAs[String]("source")).getAs[Double]("weight")) < 1e-12)
      val c = r.getAs[Long]("n_copies")
      val lo = math.floor(w).toLong
      assert(c == lo || c == lo + 1, s"copies must be ⌊w⌋ or ⌊w⌋+1, got $c for w=$w")
      assert(r.getAs[Boolean]("kept") == (c >= 1))
      if (w >= 1.0) assert(c >= 1, "an upsampled source must keep every doc")
    }
    // the realized per-source copy mass must track the weight: the
    // expected value of n_copies is exactly w, and the LCG uniform is
    // equidistributed, so a 4-sigma binomial band is a safe pin
    for ((src, rows) <- out.groupBy(_.getAs[String]("source"))) {
      val w = rows.head.getAs[Double]("weight")
      val frac = w - math.floor(w)
      val mean = rows.map(_.getAs[Long]("n_copies")).sum.toDouble / rows.length
      val tol = 4 * math.sqrt(frac * (1 - frac) / rows.length) + 1e-9
      assert(math.abs(mean - w) <= tol, s"$src: mean copies $mean vs weight $w (tol $tol)")
    }
    // and the sampling must actually drop something somewhere
    assert(out.exists(!_.getAs[Boolean]("kept")), "no doc was downsampled out")
    assert(out.exists(_.getAs[Long]("n_copies") >= 2), "no doc was upsampled")
  }

  test("tx_topterms equals a window-ranked vocabulary recompute") {
    import graft.functions.Hashing
    val out = SparkEntry.queries("tx_topterms")(spark, sf).collect()
    val vocab = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(Hashing.wordHashes(col("text"))).as("h"))
      .groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
      .groupBy("h").agg(sum("c").as("tf"), count(lit(1)).as("df"))
      .collect().map(r => r.getAs[Long]("h") -> r).toMap
    val expected = vocab.values.toSeq
      .sortBy(r => (-r.getAs[Long]("tf"), r.getAs[Long]("h")))
      .take(64)
    assert(out.length == math.min(64, vocab.size))
    for ((r, i) <- out.sortBy(_.getAs[Long]("rank")).zipWithIndex) {
      assert(r.getAs[Long]("rank") == i + 1)
      assert(r.getAs[Long]("h") == expected(i).getAs[Long]("h"), s"rank ${i + 1}")
      assert(r.getAs[Long]("tf") == expected(i).getAs[Long]("tf"))
      assert(r.getAs[Long]("df") == expected(i).getAs[Long]("df"))
      assert(r.getAs[Long]("df") <= r.getAs[Long]("tf"))
    }
  }

  test("pipe_mix weights level sources to the uniform token share, capped") {
    val out = SparkEntry.queries("pipe_mix")(spark, sf).collect()
    assert(out.length == 20)
    val total = out.map(_.getAs[Long]("tokens")).sum.toDouble
    val target = total / out.length
    for (r <- out) {
      val w = r.getAs[Double]("weight")
      val expect = math.min(4.0, target / r.getAs[Long]("tokens"))
      assert(math.abs(w - expect) < 1e-5)
      assert(r.getAs[Long]("expected_tokens") ==
        math.floor(r.getAs[Long]("tokens") * w + 1e-6).toLong)
    }
  }

  test("pipe_weighted_sample matches a brute-force A-ES recompute and favors long docs") {
    val out = SparkEntry.queries("pipe_weighted_sample")(spark, sf).collect()
    // brute force: recompute every doc's priority key and rank per source
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id").cast("long").as("doc_id"),
        greatest(size(split(trim(col("text")), "\\s+")).cast("long"), lit(1L)).as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def key(id: Long, w: Long): Double = {
      val u = ((id * 2654435761L) % 1000003L + 1L) / 1000004.0
      BigDecimal(math.log(u) / w).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = docs.groupBy(_._1).view.mapValues { ds =>
      ds.map { case (_, id, w) => (id, w, key(id, w)) }
        .sortBy { case (id, _, k) => (-k, id) }.take(16)
    }.toMap
    val bySource = out.groupBy(_.getAs[String]("source"))
    assert(bySource.keySet == want.keySet)
    for ((src, rows) <- bySource) {
      val got = rows.sortBy(_.getAs[Long]("rank"))
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("w"), r.getAs[Double]("key")))
      assert(got.toSeq == want(src).toSeq, s"selection mismatch for $src")
    }
    // inclusion ∝ token count: winners must be longer than average
    val avgAll = docs.map(_._3.toDouble).sum / docs.length
    val avgSel = out.map(_.getAs[Long]("w").toDouble).sum / out.length
    assert(avgSel > avgAll, s"selected mean w $avgSel not above corpus mean $avgAll")
  }

  test("pipe_split: shares near 90/5/5, content-keyed so duplicates co-locate") {
    val rows = SparkEntry.queries("pipe_split")(spark, sf).collect()
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val total = bySplit.values.sum
    val trainShare = bySplit.getOrElse("train", 0L).toDouble / total
    assert(trainShare > 0.8 && trainShare < 0.97, s"train share $trainShare far from 0.9")
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    // duplicates co-locate: every doc pair with identical TEXT must
    // get the identical split (content fingerprint, not id/rand) —
    // planted twins with DIFFERENT doc_ids across sources
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = Tables.documents(spark, sf).select("text").limit(50)
      .collect().map(_.getString(0))
    val planted = base.zipWithIndex.flatMap { case (t, i) =>
      Seq((i.toLong, t, "en", "srcA", t.length.toLong),
        (1000L + i, t, "en", "srcB", t.length.toLong))
    }.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
    val b = ((graft.functions.Hashing.charFold(col("text")) % 100) + 100) % 100
    val assigned = planted
      .select(sha2(col("text"), 256).as("sha"),
        when(b < 90, "train").when(b < 95, "val").otherwise("test").as("split"))
    val dupGroups = assigned.groupBy("sha")
      .agg(countDistinct("split").as("k"), count(lit(1)).as("n"))
    assert(dupGroups.filter(col("n") > 1).count() > 0, "twins must be planted")
    assert(dupGroups.filter(col("k") > 1).count() == 0,
      "a duplicated text was assigned to two different splits")
  }

  test("pipe_split_safe partitions the corpus with zero cluster leakage — and the naive split DOES leak") {
    val rows = SparkEntry.queries("pipe_split_safe")(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.Tables.documents(spark, sf).count(),
      "splits must partition the corpus")
    assert(rows.forall(_.getAs[Long]("n_leaky_clusters") == 0L),
      "a near-dup cluster straddles splits")
    assert(rows.map(_.getAs[Long]("n_dup_docs")).sum > 0,
      "fixture must contain near-dup clusters")
    // the operator's reason to exist, as a tested fact: keying the
    // split on raw TEXT hash (the naive pipe_split rule) splits at
    // least one near-dup cluster across train/val/test on this corpus
    val (labels, _) = operators.Dedup.connectedComponents(
      operators.Dedup.duplicateEdges(spark, sf))
    val naiveB = ((graft.functions.Hashing.charFold(col("text")) % 100) + 100) % 100
    val naive = graft.Tables.documents(spark, sf)
      .select(col("doc_id").cast("long").as("doc_id"),
        when(naiveB < 90, "train").when(naiveB < 95, "val").otherwise("test").as("split"))
      .join(labels.select(col("doc").as("doc_id"), col("label")), "doc_id")
      .groupBy("label").agg(countDistinct("split").as("ns"))
    assert(naive.filter(col("ns") > 1).count() > 0,
      "expected the text-hash split to leak on a corpus with near-dup (non-identical) clusters")
  }

  test("pipe_card reconciles with its constituent gates") {
    val card = SparkEntry.queries("pipe_card")(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(card.nonEmpty)
    // volumes: per-source doc counts match the raw corpus
    val docs = Tables.documents(spark, sf)
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    assert(card.keySet == docs.keySet)
    assert(card.forall { case (s, r) => r.getAs[Long]("n_docs") == docs(s) })
    // gopher_rate agrees with the tx_gopher battery counted per source
    val gs = SparkEntry.queries("tx_gopher")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("pass")).toMap
    val srcOf = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    for ((s, r) <- card) {
      val ids = srcOf.collect { case (id, src) if src == s => id }
      val want = ids.count(gs).toDouble / ids.size
      assert(math.abs(r.getAs[Double]("gopher_rate") - want) < 1e-4,
        s"source $s gopher_rate ${r.getAs[Double]("gopher_rate")} != $want")
    }
    // dup accounting: total duplicate docs equals the curate funnel's
    val cardDups = card.map { case (s, r) =>
      math.round(r.getAs[Double]("dup_rate") * docs(s)) }.sum
    val curateDups = SparkEntry.queries("pipe_curate")(spark, sf).collect()
      .map(_.getAs[Long]("n_dup_dropped")).sum
    assert(cardDups == curateDups,
      s"card counts $cardDups dups, the curate funnel $curateDups")
  }
}
