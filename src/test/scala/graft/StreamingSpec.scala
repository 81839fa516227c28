package graft

import java.sql.Timestamp

import graft.streaming.Streaming
import graft.streaming.Streaming.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  // Tables.events normalizes whatever physical ts form the testdata
  // generation shipped (nanos-long, NTZ micros, UTC micros) — the
  // spec must not re-encode that knowledge.
  private def eventsBatch = Tables.events(spark, sf)

  test("streaming window counts equal batch window counts") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // FileStreamSource needs a directory; stage a NORMALIZED copy of
    // the events table there so the stream schema is stable across
    // testdata generations
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    eventsBatch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = Streaming.windowCounts(stream)
      .writeStream.outputMode("append").format("memory").queryName("wc").start()
    try q.processAllAvailable() finally q.stop()
    // append mode only emits windows closed by the watermark; compare
    // those against the batch equivalent
    val got = spark.sql("SELECT window_start, event_type, n_events FROM wc")
    val want = Streaming.windowCounts(eventsBatch)
      .select("window_start", "event_type", "n_events")
    val emitted = got.count()
    assert(emitted > 0)
    assert(got.join(want, Seq("window_start", "event_type", "n_events"), "left_anti").count() == 0)
  }

  test("stateful streaming sessionize emits gap-closed sessions") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    def ev(id: Long, user: Long, minute: Long) =
      Event(id, new Timestamp(minute * 60000L), user, "click", 1.0)
    // user 1: two sessions (gap 60 min); second session stays open
    mem.addData(ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 90), ev(4, 2, 5))
    val q = Streaming.sessionize(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("sess").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.sql("SELECT * FROM sess").as[Streaming.SessionOut].collect()
    assert(out.length == 1) // only user 1's first session has closed
    assert(out.head.user_id == 1 && out.head.n_events == 2)
  }

  test("streaming exact dedup keeps first-seen doc per content hash, bounded state") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    // keep event times well above epoch 0: a row whose timestamp
    // equals the initial watermark (epoch 0) is considered late
    def doc(id: Long, minute: Long, text: String) =
      (id, new Timestamp((1000 + minute) * 60000L), text)
    val q = Streaming.dedupExact(mem.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.outputMode("append").format("memory").queryName("dd").start()
    try {
      mem.addData(doc(1, 0, "alpha beta gamma"), doc(2, 1, "delta epsilon"))
      q.processAllAvailable()
      // a later micro-batch re-sends doc 1's content: the dedup state
      // must drop it (first-seen wins across batches)
      mem.addData(doc(3, 2, "alpha beta gamma"), doc(4, 3, "zeta eta"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.sql("SELECT doc_id, text FROM dd").collect()
    assert(out.length == 3, "duplicate must be dropped")
    assert(!out.map(_.getLong(0)).contains(3L), "the LATER duplicate is the dropped one")
  }

  test("streaming curate applies the batch funnel filters plus dedup") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    def doc(id: Long, minute: Long, text: String) =
      (id, new Timestamp((1000 + minute) * 60000L), text)
    // a good English doc: long enough, few stopwords, mild punctuation
    val good = ("linear algebra methods improve sparse retrieval quality. " * 8).trim
    val lowQuality = "the the the of of to to and and in in is is it it."
    val nonEnglish = "le chat et la porte sont dans le jardin avec un ami et le vent."
    val q = Streaming.curate(mem.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.outputMode("append").format("memory").queryName("cur").start()
    try {
      mem.addData(doc(1, 0, good), doc(2, 1, lowQuality), doc(3, 2, nonEnglish))
      q.processAllAvailable()
      mem.addData(doc(4, 3, good)) // duplicate content of doc 1
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.sql("SELECT doc_id FROM cur").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L),
      s"only the first good English doc survives (got $out): low-quality and " +
        "non-English are filtered, the later duplicate is deduped")
    // the stream's verdicts are the batch expressions' verdicts
    val batch = Seq(good, lowQuality, nonEnglish).toDF("text")
      .select(graft.operators.TextAnalysis.qualityExpr.as("q"),
        graft.operators.TextAnalysis.predLangExpr.as("l"))
      .collect()
    assert(batch(0).getDouble(0) >= graft.operators.TextAnalysis.qualityFloor)
    assert(batch(1).getDouble(0) < graft.operators.TextAnalysis.qualityFloor)
    assert(batch(2).getString(1) != "en")
  }

  test("streaming fingerprint equals batch ma_fingerprint on a replayed corpus") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
    val mem = MemoryStream[(Long, String, String)]
    val q = Streaming.fingerprint(mem.toDF().toDF("doc_id", "source", "text"))
      .writeStream.outputMode("complete").format("memory").queryName("fp").start()
    try {
      // replay in three micro-batches: the final table must reflect
      // incremental state maintenance across batches, not one big agg
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT * FROM fp").collect()
      .map(r => r.getString(0) -> r).toMap
    val want = SparkEntry.queries("ma_fingerprint")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == want.keySet)
    // batch output is rounded to 6 dp; the streaming state merges
    // float sums in a different order, so compare within 2e-6
    for (src <- want.keySet; c <- graft.operators.Audit.fpCols) {
      val g = got(src).getAs[Double](c)
      val w = want(src).getAs[Double](c)
      assert(math.abs(g - w) < 2e-6, s"$src.$c: stream=$g batch=$w")
    }
  }

  test("streaming style fingerprint equals batch ma_style_fingerprint on a replayed corpus") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "text").as[(String, String)].collect()
    val mem = MemoryStream[(String, String)]
    val q = Streaming.styleFingerprint(mem.toDF().toDF("source", "text"))
      .writeStream.outputMode("complete").format("memory").queryName("sfp").start()
    try {
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT * FROM sfp").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val want = SparkEntry.queries("ma_style_fingerprint")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == want.keySet)
    // batch rounds to 4 dp; stream state merges float sums in another
    // order, so allow one ulp of the rounding grid either way
    for ((k, w) <- want)
      assert(math.abs(got(k) - w) < 2e-4, s"$k: stream=${got(k)} batch=$w")
  }

  test("streaming fuzzy decon reproduces batch pipe_decon_fuzzy per-doc best matches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val evalIdx = operators.Dedup.fuzzyEvalIndex(spark, sf)
    val corpus = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 =!= 3)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
    val mem = MemoryStream[(Long, String, String)]
    val q = Streaming.deconFuzzy(
        mem.toDF().toDF("doc_id", "source", "text"), evalIdx)
      .writeStream.outputMode("complete").format("memory").queryName("fuzzy_decon").start()
    try {
      corpus.grouped(math.max(1, corpus.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    // the stream emits suspect pairs; the batch query keeps each doc's
    // best (max jaccard, ties to the smaller eval_id)
    val got = spark.sql(
        "SELECT doc_id, source, eval_id, jaccard, contaminated FROM fuzzy_decon")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .groupBy(_._1).map { case (docId, rows) =>
        val best = rows.minBy(t => (-t._4, t._3))
        docId -> (best._2, best._3, best._4, best._5)
      }
    val want = SparkEntry.queries("pipe_decon_fuzzy")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("source"), r.getAs[Long]("best_eval_id"),
          r.getAs[Double]("jaccard"), r.getAs[Boolean]("contaminated"))).toMap
    assert(want.nonEmpty, "fixture must contain fuzzy-contaminated docs")
    assert(got == want,
      s"stream best-match set diverged: missing=${(want.keySet -- got.keySet).take(5)} " +
        s"spurious=${(got.keySet -- want.keySet).take(5)}")
  }

  test("streaming minhashIncremental matches batch dd_minhash_incremental dup verdicts") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val (idxBands, idxShing) = operators.Dedup.fuzzyCorpusIndex(spark, sf)
    // replay the delta split ("today's ingest") as the stream
    val delta = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 >= 8)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
    val mem = MemoryStream[(Long, String, String)]
    val q = Streaming.minhashIncremental(
        mem.toDF().toDF("doc_id", "source", "text"), idxBands, idxShing)
      .writeStream.outputMode("complete").format("memory").queryName("mh_inc").start()
    try {
      delta.grouped(math.max(1, delta.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    // the stream emits every verified dup pair; the batch query keeps
    // each delta doc's best (max jaccard, ties to the smaller corpus id)
    val got = spark.sql("SELECT doc_id, corpus_id, jaccard FROM mh_inc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (docId, rows) =>
        val best = rows.minBy(t => (-t._3, t._2))
        docId -> (best._2, best._3)
      }
    val want = SparkEntry.queries("dd_minhash_incremental")(spark, sf).collect()
      .filter(_.getAs[String]("verdict") == "dup_near")
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("best_corpus_id"), r.getAs[Double]("jaccard"))).toMap
    assert(want.nonEmpty, "fixture must contain cross-split near-dups")
    assert(got == want,
      s"stream dup set diverged: missing=${(want.keySet -- got.keySet).take(5)} " +
        s"spurious=${(got.keySet -- want.keySet).take(5)}")
  }

  test("streaming phashDedup reproduces batch mm_phash_pairs on an in-order replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val idx = operators.Multimodal.phashChunkIndex(spark, sf)
    val corpus = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.phashDedup(mem.toDF().toDF("doc_id", "text"), idx)
      .writeStream.outputMode("complete").format("memory").queryName("phash_dedup").start()
    try {
      corpus.grouped(math.max(1, corpus.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT doc_a, doc_b, hamming FROM phash_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = SparkEntry.queries("mm_phash_pairs")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming"))).toSet
    assert(want.nonEmpty, "fixture must contain perceptual near-dup pairs")
    assert(got == want,
      s"stream pair set diverged: missing=${(want -- got).take(5)} spurious=${(got -- want).take(5)}")
  }

  test("streaming decontaminate equals the batch overlap pairs on a replayed corpus") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // static eval index from the same slice the batch query uses
    val sh = operators.Pipeline.shingledDocs(
      graft.Tables.documents(spark, sf).select("doc_id", "source", "text"))
    val evalIdx = operators.Pipeline.evalIndexOf(sh.filter(col("doc_id") % 10 === 3))
    val corpus = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 =!= 3)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
    val mem = MemoryStream[(Long, String, String)]
    val q = Streaming.decontaminate(
        mem.toDF().toDF("doc_id", "source", "text"), evalIdx)
      .writeStream.outputMode("complete").format("memory").queryName("decon").start()
    try {
      corpus.grouped(math.max(1, corpus.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT doc_id, eval_id, frac, contaminated FROM decon").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getBoolean(3))).toMap
    val want = operators.Pipeline.overlapPairs(
        sh.filter(col("doc_id") % 10 =!= 3), evalIdx)
      .collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("eval_id")) -> r.getAs[Double]("frac")).toMap
    assert(got.keySet == want.keySet)
    assert(want.nonEmpty, "the planted near-dup structure must produce candidate pairs")
    for ((k, (f, c)) <- got) {
      assert(f == want(k), s"$k: stream=$f batch=${want(k)}")
      assert(c == (f >= operators.Pipeline.contaminatedFloor))
    }
  }

  test("streaming semantic near-dup scan equals batch dd_embed on an in-order replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val corpus = operators.Ann.corpus(spark, sf)
    val index = operators.Ann.bandedIndexOf(corpus)
    val rows = corpus.select("vec_id", "e", "nrm")
      .as[(Long, Seq[Double], Double)].collect().sortBy(_._1)
    val mem = MemoryStream[(Long, Seq[Double], Double)]
    val q = Streaming.embedDedup(
        mem.toDF().toDF("vec_id", "e", "nrm"), index,
        operators.Ann.bandPlanesFor(corpus.count()))
      .writeStream.outputMode("complete").format("memory").queryName("sem_pairs").start()
    try {
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT vec_a, vec_b, cosine FROM sem_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val want = SparkEntry.queries("dd_embed")(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        r.getAs[Double]("cosine")).toMap
    assert(want.nonEmpty, "fixture must contain near-dup pairs")
    assert(got == want,
      s"stream pair set diverged: missing=${(want.keySet -- got.keySet).take(5)} " +
        s"spurious=${(got.keySet -- want.keySet).take(5)}")
  }

  test("streaming ANN serving equals batch ann_ivf on replayed query vectors") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val corpus = operators.Ann.corpus(spark, sf)
    val cents = operators.Ann.packedCentroids(spark, sf)
    val cells = operators.Ann.cellVectors(spark, sf)
    val queries = corpus.filter(col("vec_id") < operators.Ann.NumQueries)
      .select("vec_id", "e", "nrm")
      .as[(Long, Seq[Double], Double)].collect().sortBy(_._1)
    val mem = MemoryStream[(Long, Seq[Double], Double)]
    val q = Streaming.annTopK(
        mem.toDF().toDF("vec_id", "e", "nrm"), cents, cells,
        operators.Ann.NProbe, operators.Ann.TopK)
      .writeStream.outputMode("complete").format("memory").queryName("ann_serve").start()
    try {
      queries.grouped(2).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql(
      """SELECT query_id, t.id AS neighbor_id, round(1e-9 + t.score, 6) AS cosine, t.rank AS rank
        |FROM (SELECT query_id, explode(tk) AS t FROM ann_serve)""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = SparkEntry.queries("ann_ivf")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toMap
    assert(want.nonEmpty)
    assert(got == want, "streaming serve must reproduce batch ann_ivf rank-for-rank: " +
      s"diff=${(want.toSet diff got.toSet).take(3)}")
  }

  test("staged streaming funnel reproduces batch pipe_e2e counts on a replayed corpus") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val budget = operators.TextAnalysis.shardBudget
    val t0 = Timestamp.valueOf("2025-01-01 00:00:00")
    val corpus = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 =!= 3)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().sortBy(_._1)

    // ── stage 1: canonicalize + gate classification (one streaming query)
    val mem1 = MemoryStream[(Long, String, String)]
    val q1 = Streaming.e2eClassify(
        mem1.toDF().toDF("doc_id", "source", "text").withColumn("ts", lit(t0)))
      .writeStream.outputMode("append").format("memory").queryName("e2e_cls").start()
    try {
      corpus.grouped(math.max(1, corpus.length / 4 + 1)).foreach { chunk =>
        mem1.addData(chunk.toIndexedSeq)
        q1.processAllAvailable()
      }
    } finally q1.stop()
    case class Cls(source: String, text: String, tokens: Long,
        langOk: Boolean, qualityOk: Boolean, repetitive: Boolean)
    val cls = spark.sql("SELECT * FROM e2e_cls").collect().map { r =>
      r.getAs[Long]("doc_id") -> Cls(r.getAs[String]("source"), r.getAs[String]("text"),
        r.getAs[Long]("tokens"), r.getAs[Boolean]("lang_ok"),
        r.getAs[Boolean]("quality_ok"), r.getAs[Boolean]("repetitive"))
    }.toMap
    val survivors = cls.filter { case (_, c) => c.langOk && c.qualityOk && !c.repetitive }

    // ── stage 2: decontaminate the gate survivors against the static
    // eval index (storage-connected: stage 1's sink replayed)
    val sh = operators.Pipeline.shingledDocs(
      graft.Tables.documents(spark, sf).select("doc_id", "source", "text"))
    val evalIdx = operators.Pipeline.evalIndexOf(sh.filter(col("doc_id") % 10 === 3))
    val mem2 = MemoryStream[(Long, String, String)]
    val q2 = Streaming.decontaminate(
        mem2.toDF().toDF("doc_id", "source", "text"), evalIdx)
      .writeStream.outputMode("complete").format("memory").queryName("e2e_dec").start()
    val survivorRows = survivors.toSeq.sortBy(_._1)
      .map { case (id, c) => (id, c.source, c.text) }
    try {
      survivorRows.grouped(math.max(1, survivorRows.length / 3 + 1)).foreach { chunk =>
        mem2.addData(chunk.toIndexedSeq)
        q2.processAllAvailable()
      }
    } finally q2.stop()
    val contaminated = spark.sql(
      "SELECT DISTINCT doc_id FROM e2e_dec WHERE contaminated").collect()
      .map(_.getLong(0)).toSet
    val kept = survivors.view.filterKeys(!contaminated(_)).toMap

    // ── stage 3: pack the kept docs into shards (in-order replay)
    val mem3 = MemoryStream[Streaming.DocTok]
    val q3 = Streaming.shard(mem3.toDS())
      .writeStream.outputMode("append").format("memory").queryName("e2e_shards").start()
    val keptRows = kept.toSeq.sortBy(_._1)
      .map { case (id, c) => Streaming.DocTok(id, c.source, c.tokens) }
    try {
      keptRows.grouped(math.max(1, keptRows.length / 3 + 1)).foreach { chunk =>
        mem3.addData(chunk.toIndexedSeq)
        q3.processAllAvailable()
      }
    } finally q3.stop()
    // the stream assignment must equal the batch floor-rule prefix sums
    val expectedShards = keptRows.groupBy(_.source).flatMap { case (s, ds) =>
      var pre = 0L
      ds.sortBy(_.doc_id).map { d => val sid = pre / budget; pre += d.tokens; (d.doc_id, sid) }
    }
    val gotShards = spark.sql("SELECT doc_id, shard_id FROM e2e_shards").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotShards == expectedShards.toMap, "stream shard layout diverged from the batch rule")

    // ── reassembled funnel counts must equal batch pipe_e2e row-for-row
    val bySource = corpus.groupBy(_._2).map { case (s, rows) =>
      val ids = rows.map(_._1).toSet
      val canon = cls.filter { case (id, c) => ids(id) && c.source == s }
      val surv = survivors.filter(_._2.source == s)
      val keptS = kept.filter(_._2.source == s)
      val tokensKept = keptS.values.map(_.tokens).sum
      s -> Seq(
        rows.size.toLong,
        rows.size.toLong - canon.size,
        canon.count(!_._2.langOk).toLong,
        canon.count(c => c._2.langOk && !c._2.qualityOk).toLong,
        canon.count(c => c._2.langOk && c._2.qualityOk && c._2.repetitive).toLong,
        surv.count(c => contaminated(c._1)).toLong,
        keptS.size.toLong,
        tokensKept,
        (tokensKept + budget - 1) / budget)
    }
    val batch = SparkEntry.queries("pipe_e2e")(spark, sf).collect().map { r =>
      r.getAs[String]("source") -> Seq(
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup_dropped"),
        r.getAs[Long]("n_lang_dropped"), r.getAs[Long]("n_quality_dropped"),
        r.getAs[Long]("n_rep_dropped"), r.getAs[Long]("n_contam_dropped"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("tokens_kept"), r.getAs[Long]("n_shards"))
    }.toMap
    assert(bySource.keySet == batch.keySet)
    for ((s, want) <- batch)
      assert(bySource(s) == want, s"funnel counts diverged for source $s: " +
        s"stream=${bySource(s)} batch=$want")
    assert(batch.values.exists(_(6) > 0), "fixture must keep some docs")
  }

  test("staged streaming semantic funnel reproduces batch pipe_e2e_sem counts") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val budget = operators.TextAnalysis.shardBudget
    val t0 = Timestamp.valueOf("2025-01-01 00:00:00")
    val corpus = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 =!= 3)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().sortBy(_._1)

    // ── stage 1: canonicalize + gates + the stream-static SemDeDup
    // flag against the memoized cluster assignment (the same index
    // batch pipe_e2e_sem consumes)
    val assignment = operators.Ann.embedClusterAssignment(spark, sf)
    val mem1 = MemoryStream[(Long, String, String)]
    val q1 = Streaming.e2eClassifySem(
        mem1.toDF().toDF("doc_id", "source", "text").withColumn("ts", lit(t0)),
        assignment)
      .writeStream.outputMode("append").format("memory").queryName("sem_cls").start()
    try {
      corpus.grouped(math.max(1, corpus.length / 4 + 1)).foreach { chunk =>
        mem1.addData(chunk.toIndexedSeq)
        q1.processAllAvailable()
      }
    } finally q1.stop()
    case class Cls(source: String, text: String, tokens: Long,
        langOk: Boolean, qualityOk: Boolean, repetitive: Boolean, semDup: Boolean)
    val cls = spark.sql("SELECT * FROM sem_cls").collect().map { r =>
      r.getAs[Long]("doc_id") -> Cls(r.getAs[String]("source"), r.getAs[String]("text"),
        r.getAs[Long]("tokens"), r.getAs[Boolean]("lang_ok"),
        r.getAs[Boolean]("quality_ok"), r.getAs[Boolean]("repetitive"),
        r.getAs[Boolean]("sem_dup"))
    }.toMap
    assert(cls.values.exists(_.semDup), "fixture must flag semantic near-dups")
    // gate survivors continue to decontamination (batch gate order:
    // the sem drop is accounted AFTER contamination)
    val survivors = cls.filter { case (_, c) => c.langOk && c.qualityOk && !c.repetitive }

    // ── stage 2: decontaminate the gate survivors (storage-connected)
    val sh = operators.Pipeline.shingledDocs(
      graft.Tables.documents(spark, sf).select("doc_id", "source", "text"))
    val evalIdx = operators.Pipeline.evalIndexOf(sh.filter(col("doc_id") % 10 === 3))
    val mem2 = MemoryStream[(Long, String, String)]
    val q2 = Streaming.decontaminate(
        mem2.toDF().toDF("doc_id", "source", "text"), evalIdx)
      .writeStream.outputMode("complete").format("memory").queryName("sem_dec").start()
    val survivorRows = survivors.toSeq.sortBy(_._1)
      .map { case (id, c) => (id, c.source, c.text) }
    try {
      survivorRows.grouped(math.max(1, survivorRows.length / 3 + 1)).foreach { chunk =>
        mem2.addData(chunk.toIndexedSeq)
        q2.processAllAvailable()
      }
    } finally q2.stop()
    val contaminated = spark.sql(
      "SELECT DISTINCT doc_id FROM sem_dec WHERE contaminated").collect()
      .map(_.getLong(0)).toSet
    // the sem gate fires after contamination; kept excludes both
    val kept = survivors.view
      .filterKeys(!contaminated(_))
      .filterNot { case (_, c) => c.semDup }.toMap

    // ── stage 3: pack the kept docs into shards (in-order replay)
    val mem3 = MemoryStream[Streaming.DocTok]
    val q3 = Streaming.shard(mem3.toDS())
      .writeStream.outputMode("append").format("memory").queryName("sem_shards").start()
    val keptRows = kept.toSeq.sortBy(_._1)
      .map { case (id, c) => Streaming.DocTok(id, c.source, c.tokens) }
    try {
      keptRows.grouped(math.max(1, keptRows.length / 3 + 1)).foreach { chunk =>
        mem3.addData(chunk.toIndexedSeq)
        q3.processAllAvailable()
      }
    } finally q3.stop()
    val expectedShards = keptRows.groupBy(_.source).flatMap { case (s, ds) =>
      var pre = 0L
      ds.sortBy(_.doc_id).map { d => val sid = pre / budget; pre += d.tokens; (d.doc_id, sid) }
    }
    val gotShards = spark.sql("SELECT doc_id, shard_id FROM sem_shards").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotShards == expectedShards.toMap, "stream shard layout diverged from the batch rule")

    // ── reassembled funnel counts must equal batch pipe_e2e_sem
    val bySource = corpus.groupBy(_._2).map { case (s, rows) =>
      val ids = rows.map(_._1).toSet
      val canon = cls.filter { case (id, c) => ids(id) && c.source == s }
      val surv = survivors.filter(_._2.source == s)
      val keptS = kept.filter(_._2.source == s)
      val tokensKept = keptS.values.map(_.tokens).sum
      s -> Seq(
        rows.size.toLong,
        rows.size.toLong - canon.size,
        canon.count(!_._2.langOk).toLong,
        canon.count(c => c._2.langOk && !c._2.qualityOk).toLong,
        canon.count(c => c._2.langOk && c._2.qualityOk && c._2.repetitive).toLong,
        surv.count(c => contaminated(c._1)).toLong,
        surv.count(c => !contaminated(c._1) && c._2.semDup).toLong,
        keptS.size.toLong,
        tokensKept,
        (tokensKept + budget - 1) / budget)
    }
    val batch = SparkEntry.queries("pipe_e2e_sem")(spark, sf).collect().map { r =>
      r.getAs[String]("source") -> Seq(
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup_dropped"),
        r.getAs[Long]("n_lang_dropped"), r.getAs[Long]("n_quality_dropped"),
        r.getAs[Long]("n_rep_dropped"), r.getAs[Long]("n_contam_dropped"),
        r.getAs[Long]("n_sem_dropped"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("tokens_kept"), r.getAs[Long]("n_shards"))
    }.toMap
    assert(bySource.keySet == batch.keySet)
    for ((s, want) <- batch)
      assert(bySource(s) == want, s"semantic funnel counts diverged for source $s: " +
        s"stream=${bySource(s)} batch=$want")
    assert(batch.values.exists(_(7) > 0), "fixture must keep some docs")
  }

  test("streaming shard packing equals batch pipe_shard on an in-order replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions.{col, count, max, min, size, split, sum, trim}
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("tokens"))
      .as[Streaming.DocTok].collect().sortBy(_.doc_id)
    val mem = MemoryStream[Streaming.DocTok]
    val q = Streaming.shard(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("shards").start()
    try {
      docs.grouped(math.max(1, docs.length / 4 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT * FROM shards")
      .groupBy("source", "shard_id")
      .agg(count(col("doc_id")).as("n_docs"), min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val want = SparkEntry.queries("pipe_shard")(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("shard_id")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))
      .toMap
    assert(got == want, "stream packing must reproduce the batch shard layout")
  }

  test("streaming pack assignments rebuild the batch pipe_pack manifest") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions.{col, size, split, trim}
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("tokens"))
      .as[Streaming.DocTok].collect().sortBy(_.doc_id)
    val mem = MemoryStream[Streaming.DocTok]
    val q = Streaming.pack(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("packs").start()
    try {
      docs.grouped(math.max(1, docs.length / 4 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val budget = operators.TextAnalysis.packBudget
    docs.toSeq.toDF("doc_id", "source", "tokens").createOrReplaceTempView("doc_toks")
    // rebuild the per-pack manifest from the per-doc span assignments
    val got = spark.sql(
      s"""SELECT source, pack_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(CASE WHEN pack_first = pack_id THEN 1 END) AS BIGINT) AS n_starts,
         |  CAST(sum(least((pack_id + 1) * $budget, start_tok + tokens)
         |           - greatest(pack_id * $budget, start_tok)) AS BIGINT) AS tokens_filled
         |FROM (
         |  SELECT p.source, p.doc_id, p.start_tok, p.pack_first, d.tokens,
         |    explode(sequence(p.pack_first, p.pack_last)) AS pack_id
         |  FROM packs p JOIN doc_toks d ON d.doc_id = p.doc_id)
         |GROUP BY source, pack_id""".stripMargin)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val want = SparkEntry.queries("pipe_pack")(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("pack_id")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_starts"), r.getAs[Long]("tokens_filled")))
      .toMap
    assert(want.nonEmpty)
    assert(got == want, "stream pack spans must rebuild the batch pack manifest")
  }

  test("REEF hidden-state extraction: per-partition batched forward, deterministic") {
    val docs = operators.Reef.extractHiddenStates(
      graft.Tables.documents(spark, sf).limit(40), layer = 2, dim = 16, batchSize = 8)
    val rows = docs.collect()
    assert(rows.length == 40)
    assert(rows.forall(_.getAs[Seq[Float]]("embedding").length == 16))
    assert(rows.forall(_.getAs[Int]("label") == 2))
    // deterministic: a second run yields identical embeddings
    val again = operators.Reef.extractHiddenStates(
      graft.Tables.documents(spark, sf).limit(40), layer = 2, dim = 16, batchSize = 8)
      .collect()
    val a = rows.map(r => r.getLong(0) -> r.getAs[Seq[Float]]("embedding")).toMap
    val b = again.map(r => r.getLong(0) -> r.getAs[Seq[Float]]("embedding")).toMap
    assert(a == b)
    // batch-size invariance: batching must not change per-row results
    val other = operators.Reef.extractHiddenStates(
      graft.Tables.documents(spark, sf).limit(40), layer = 2, dim = 16, batchSize = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Seq[Float]]("embedding")).toMap
    assert(a == other)
  }

  test("streaming asof reproduces batch ev_asof on an in-order replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    val all = eventsBatch
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .collect()
      .sortBy(e => (us(e.ts), if (e.event_type == "purchase") 0 else 1, e.event_id))
    val mem = MemoryStream[Event]
    val q = Streaming.asof(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("asof").start()
    try {
      // three micro-batches, cut at global ts order → per-user order holds
      for (chunk <- all.grouped((all.length + 2) / 3)) {
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT * FROM asof")
    val want = operators.Events.asof.fn(spark, sf)
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("streaming chunker reproduces batch pipe_chunk on a replayed corpus") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    val mem = MemoryStream[(Long, String, String)]
    val q = Streaming.chunks(mem.toDF().toDF("doc_id", "source", "text"))
      .writeStream.outputMode("append").format("memory").queryName("chunks").start()
    try {
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"),
        r.getAs[Int]("start_word"), r.getAs[Int]("chunk_len"),
        r.getAs[Long]("chunk_hash"))
    val got = spark.sql("SELECT * FROM chunks").collect().map(key).toSet
    val want = SparkEntry.queries("pipe_chunk")(spark, sf).collect().map(key).toSet
    assert(got.nonEmpty && got == want)
  }

  test("streaming sequenceMatch reconciles with batch ev_sequence on an in-order replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    val all = eventsBatch
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .collect()
      .sortBy(e => (us(e.ts), e.event_id))
    val mem = MemoryStream[Event]
    val q = Streaming.sequenceMatch(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("seqm").start()
    try {
      for (chunk <- all.grouped((all.length + 2) / 3)) {
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val out = spark.sql("SELECT * FROM seqm").as[Streaming.SeqMatchOut].collect()
    val batch = SparkEntry.queries("ev_sequence")(spark, sf).collect().head
    val clean = out.count(_.outcome == "clean").toLong
    val blocked = out.count(_.outcome == "blocked").toLong
    val expired = out.count(_.outcome == "expired").toLong
    // completions are FINAL the moment they happen — append-mode counts
    // must equal batch's exactly
    assert(clean == batch.getAs[Long]("n_clean"))
    assert(blocked == batch.getAs[Long]("n_blocked"))
    assert(clean + blocked == batch.getAs[Long]("n_completed"))
    assert(clean > 0 && blocked > 0, "the corpus must exercise both outcomes")
    // anchors the stream has decided ≤ anchors batch saw; the gap is
    // exactly the anchors still OPEN in state at stream end (outcome
    // not yet learnable in append mode)
    assert(clean + blocked + expired <= batch.getAs[Long]("n_anchors"))
    // a blocked match reports a positive error delta; clean reports 0
    assert(out.filter(_.outcome == "blocked").forall(_.errs_between > 0))
    assert(out.filter(_.outcome == "clean").forall(_.errs_between == 0))
    // mean clean latency equals the batch aggregate (same rounding)
    val cleanHours = out.filter(_.outcome == "clean")
      .map(o => (o.t2_us.get - o.t1_us) / 3600000000.0)
    val streamAvg = BigDecimal(1e-9 + cleanHours.sum / cleanHours.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(streamAvg - batch.getAs[Double]("avg_hours_clean")) < 2e-4,
      s"stream $streamAvg vs batch ${batch.getAs[Double]("avg_hours_clean")}")
  }

  test("streaming attribution reproduces batch ev_attribution on an in-order replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    val all = eventsBatch
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .collect()
      .sortBy(e => (us(e.ts), if (e.event_type == "purchase") 0 else 1, e.event_id))
    val mem = MemoryStream[Event]
    val q = Streaming.attribution(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("attr").start()
    try {
      for (chunk <- all.grouped((all.length + 2) / 3)) {
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row): (Long, Long, Option[Long], Option[Long], Option[Double]) =
      (r.getAs[Long]("event_id"), r.getAs[Long]("n_touches"),
        Option(r.getAs[java.lang.Long]("first_click_id")).map(_.longValue),
        Option(r.getAs[java.lang.Long]("last_click_id")).map(_.longValue),
        Option(r.getAs[java.lang.Double]("credit_each")).map(_.doubleValue))
    val got = spark.sql("SELECT * FROM attr").collect().map(key).toSet
    val want = SparkEntry.queries("ev_attribution")(spark, sf).collect().map(key).toSet
    assert(got.nonEmpty && got == want,
      s"stream ${got.size} rows vs batch ${want.size}; diff ${(got diff want).take(3)} / ${(want diff got).take(3)}")
  }

  test("streaming scd2 closes exactly batch cdc_scd2's non-current versions") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    val all = eventsBatch
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .collect()
      .sortBy(e => (us(e.ts), e.event_id))
    val mem = MemoryStream[Event]
    val q = Streaming.scd2(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("scd2").start()
    try {
      for (chunk <- all.grouped((all.length + 2) / 3)) {
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT * FROM scd2").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val batch = SparkEntry.queries("cdc_scd2")(spark, sf).collect()
    val want = batch.filter(!_.getAs[Boolean]("is_current"))
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Int]("version")) ->
        ((r.getAs[Long]("valid_from_us"), r.getAs[Long]("valid_to_us"),
          r.getAs[Double]("value")))).toMap
    assert(got.nonEmpty && got == want,
      s"closed-version sets differ: stream ${got.size} vs batch ${want.size}")
    // exactly one open version per key stays in state (not emitted)
    val liveKeys = batch.map(r =>
      (r.getAs[Long]("user_id"), r.getAs[String]("event_type"))).distinct.length
    assert(batch.length - want.size == liveKeys)
  }

  test("streaming repeated-substring scan equals batch dd_spans on a replayed corpus") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val idx = operators.Dedup.repeatedGramIndex(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.spanFlag(mem.toDF().toDF("doc_id", "text"), idx)
      .writeStream.outputMode("complete").format("memory").queryName("span_scan").start()
    try {
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT doc_id, n_grams, n_rep, max_run, span_dup FROM span_scan")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val want = SparkEntry.queries("dd_spans")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_rep"),
          r.getAs[Long]("max_run"), r.getAs[Boolean]("span_dup")))).toMap
    assert(want.values.exists(_._4), "fixture must contain a flagged doc")
    assert(got == want,
      s"stream span stats diverged; sample diff: " +
        s"${(want.toSet -- got.toSet).take(3)} vs ${(got.toSet -- want.toSet).take(3)}")
  }

  test("streaming mix application reproduces batch pipe_mix_apply row-for-row") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val weights = operators.Pipeline.mixWeights(graft.Tables.documents(spark, sf))
    val corpus = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    val mem = MemoryStream[(Long, String, String)]
    val q = Streaming.mixApply(mem.toDF().toDF("doc_id", "source", "text"), weights)
      .writeStream.outputMode("append").format("memory").queryName("mixap").start()
    try {
      corpus.grouped(math.max(1, corpus.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    def toMap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("weight"), r.getAs[Long]("n_copies"), r.getAs[Boolean]("kept")))).toMap
    val got = toMap(spark.sql("SELECT * FROM mixap").collect())
    val want = toMap(SparkEntry.queries("pipe_mix_apply")(spark, sf).collect())
    assert(got == want, s"stream assignment diverged for docs: ${
      (got.keySet | want.keySet).filter(k => got.get(k) != want.get(k)).take(5)}")
  }

  test("streaming entropy gate equals batch tx_entropy on a replayed corpus") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val corpus = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.entropyGate(mem.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("entgate").start()
    try {
      corpus.grouped(math.max(1, corpus.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    def toMap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Double]("char_entropy"),
        r.getAs[Double]("word_entropy"), r.getAs[Long]("n_types"),
        r.getAs[Long]("n_tokens"), r.getAs[Double]("ttr"),
        r.getAs[Boolean]("low_entropy"), r.getAs[Boolean]("templated")))).toMap
    val got = toMap(spark.sql("SELECT * FROM entgate").collect())
    val want = toMap(SparkEntry.queries("tx_entropy")(spark, sf).collect())
    assert(got == want, s"stream entropy verdicts diverged for docs: ${
      (got.keySet | want.keySet).filter(k => got.get(k) != want.get(k)).take(5)}")
  }

  test("streaming LM-perplexity gate equals batch tx_bigram_ppl on a replayed corpus") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val (bg, un, tot) = operators.Pipeline.bigramLmOf(graft.Tables.documents(spark, sf))
    val corpus = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.pplScore(mem.toDF().toDF("doc_id", "text"), bg, un, tot)
      .writeStream.outputMode("complete").format("memory").queryName("pplgate").start()
    try {
      corpus.grouped(math.max(1, corpus.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT doc_id, n_bigrams, bits, high_ppl2 FROM pplgate").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val want = SparkEntry.queries("tx_bigram_ppl")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_bigrams"),
        r.getAs[Double]("bits"), r.getAs[Boolean]("high_ppl2")))).toMap
    assert(got.keySet == want.keySet, "every doc with a bigram must be scored on both sides")
    assert(want.nonEmpty)
    for ((id, (nb, bits, flag)) <- got) {
      assert(nb == want(id)._1, s"doc $id n_bigrams")
      // raw c=1 rows vs the batch histogram sum in a different order:
      // equal to fp precision, identical after the round-6
      assert(math.abs(bits - want(id)._2) < 1e-9, s"doc $id bits")
      assert(flag == want(id)._3, s"doc $id flag")
    }
  }

  test("stream-stream interval join equals the batch join pair-for-pair") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-ssj").toString
    eventsBatch.write.mode("overwrite").parquet(dir)
    def side(tpe: String) = spark.readStream.schema(schema).parquet(dir)
      .filter(col("event_type") === tpe)
    val q = Streaming.intervalJoin(side("purchase"), side("click"))
      .writeStream.outputMode("append").format("memory").queryName("ssj").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.sql("SELECT p_id, user_id, c_id, gap_us FROM ssj")
    // withWatermark is a no-op in batch, so the SAME function is the twin
    val want = Streaming.intervalJoin(
      eventsBatch.filter(col("event_type") === "purchase"),
      eventsBatch.filter(col("event_type") === "click"))
    assert(got.count() == want.count())
    assert(got.count() > 0, "expected at least one in-band purchase/click pair")
    assert(got.join(want, Seq("p_id", "user_id", "c_id", "gap_us"), "left_anti").count() == 0)
    // and the pair gaps really are within the ±10-minute band
    assert(got.filter(abs(col("gap_us")) > 600L * 1000000L).count() == 0)
  }

  test("stream-stream LEFT OUTER interval join emits null-padded rows on eviction") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-ssjo").toString
    eventsBatch.write.mode("overwrite").parquet(dir)
    def side(tpe: String) = spark.readStream.schema(schema).parquet(dir)
      .filter(col("event_type") === tpe)
    val q = Streaming.intervalJoinOuter(side("purchase"), side("click"))
      .writeStream.outputMode("append").format("memory").queryName("ssjo").start()
    try {
      q.processAllAvailable()
      // outer rows emit only when the watermark PROVES no click can
      // still match — push it past every band with a far-future
      // sentinel on both sides (user -1 matches nothing real)
      val maxTs = eventsBatch.agg(max("ts")).head.getTimestamp(0)
      val far = new java.sql.Timestamp(maxTs.getTime + 86400000L)
      import spark.implicits._
      Seq((-1L, far, -1L, "purchase", 0d, "{}"), (-2L, far, -1L, "click", 0d, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT p_id, user_id, c_id, gap_us FROM ssjo WHERE user_id >= 0")
    // batch twin: the SAME function body (watermarks are no-ops in batch)
    val want = Streaming.intervalJoinOuter(
      eventsBatch.filter(col("event_type") === "purchase"),
      eventsBatch.filter(col("event_type") === "click"))
    assert(got.count() == want.count())
    val gotNull = got.filter(col("c_id").isNull).count()
    val wantNull = want.filter(col("c_id").isNull).count()
    assert(gotNull == wantNull && gotNull > 0,
      s"expected null-padded unmatched purchases: stream $gotNull vs batch $wantNull")
    assert(got.join(want, Seq("p_id", "user_id", "c_id", "gap_us"), "left_anti")
      .count() == gotNull, "matched pairs must align pair-for-pair")
    // (null keys never join; re-check matched rows only)
    assert(got.filter(col("c_id").isNotNull)
      .join(want, Seq("p_id", "user_id", "c_id", "gap_us"), "left_anti").count() == 0)
  }

  test("streamed bin table + shared PSI definition reproduce batch ma_drift_psi") {
    val docsBatch = Tables.documents(spark, sf)
    val schema = docsBatch.schema
    val dir = java.nio.file.Files.createTempDirectory("graft-psi-stream").toString
    docsBatch.write.mode("overwrite").parquet(dir)
    val q = Streaming.lengthBins(spark.readStream.schema(schema).parquet(dir))
      .writeStream.outputMode("complete").format("memory").queryName("lenbins").start()
    try q.processAllAvailable() finally q.stop()
    // psiFromBins self-joins its input three ways; the memory-sink
    // View can't be deduplicated by the analyzer, so freeze the tiny
    // maintained table into a plain local frame first (exactly what a
    // production serve path does: read the stored aggregate)
    val sink = spark.table("lenbins")
    val bins = spark.createDataFrame(
      java.util.Arrays.asList(sink.collect(): _*), sink.schema)
    val got = operators.Distribution.psiFromBins(bins).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Double]("psi"), r.getAs[Boolean]("drifted")))).toMap
    val want = SparkEntry.queries("ma_drift_psi")(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Double]("psi"), r.getAs[Boolean]("drifted")))).toMap
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("streaming latest converges to batch cdc_latest under OUT-OF-ORDER replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // deliberately shuffled arrival order: newest-wins state is a
    // commutative max, so unlike asof/shard there is no in-order
    // contract to honor — scramble by a hash of event_id
    val all = eventsBatch
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .collect()
      .sortBy(e => (e.event_id * 2654435761L) % 1000003L)
    val mem = MemoryStream[Event]
    val q = Streaming.latest(mem.toDS())
      .writeStream.outputMode("update").format("memory").queryName("latest").start()
    try {
      for (chunk <- all.grouped((all.length + 2) / 3)) {
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    // update mode appends every improvement; the per-key FINAL state
    // is the max over emissions (monotone by construction)
    val got = spark.sql("SELECT * FROM latest")
      .groupBy("user_id", "event_type")
      .agg(max(struct(col("last_us"), col("last_event_id"), col("last_value"))).as("b"))
      .select(col("user_id"), col("event_type"),
        col("b.last_us"), col("b.last_event_id"), col("b.last_value"))
    val want = SparkEntry.queries("cdc_latest")(spark, sf)
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.exceptAll(want).count() == 0, s"stream rows not in batch: " +
      got.exceptAll(want).take(3).mkString(", "))
    assert(want.exceptAll(got).count() == 0)
  }

  test("streaming sketchCounts equals the batch HLL estimates after replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val all = eventsBatch
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .collect()
    val mem = MemoryStream[Event]
    val q = Streaming.sketchCounts(mem.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("sketches").start()
    try {
      for (chunk <- all.grouped((all.length + 3) / 4)) {
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT * FROM sketches").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_users_approx")).toMap
    val want = eventsBatch
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14))).as("est"))
      .collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("est")).toMap
    assert(got == want, s"sketch estimates diverged: $got vs $want")
    // and the estimates are actually close to exact
    val exact = eventsBatch.groupBy("event_type")
      .agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    for ((t, e) <- exact)
      assert(math.abs(got(t) - e) <= e * 0.04, s"$t: est ${got(t)} vs exact $e")
  }

  test("streamed daily user sketches serve DAU and 7-day WAU like the batch build") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val all = eventsBatch
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .collect()
    val mem = MemoryStream[Event]
    val q = Streaming.dailyUsers(mem.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("du").start()
    try {
      for (chunk <- all.grouped((all.length + 3) / 4)) {
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.sql("SELECT * FROM du")
    // per-day estimates replay to the batch build's exactly
    val gotDau = streamed.collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("dau_approx")).toMap
    val wantDau = eventsBatch
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("day")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14))).as("est"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("est")).toMap
    assert(gotDau == wantDau, "streamed daily estimates diverged from batch")
    // the maintained sketches union into the rolling 7-day distinct
    // within the same tolerance the batch query pins
    val wauEst = streamed
      .select(explode(expr("sequence(day, date_add(day, 6), interval 1 day)"))
        .as("day"), col("sk"))
      .join(streamed.select("day"), Seq("day"), "left_semi")
      .groupBy("day")
      .agg(hll_sketch_estimate(
        hll_union_agg(col("sk"), allowDifferentLgConfigK = lit(false))).as("est"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("est")).toMap
    val exactWau = SparkEntry.queries("ev_active_users")(spark, sf).collect()
      .map(r => r.getAs[java.sql.Timestamp]("day").toString.take(10) ->
        r.getAs[Long]("wau")).toMap
    assert(wauEst.keySet == exactWau.keySet)
    for ((d, e) <- exactWau)
      assert(math.abs(wauEst(d) - e) <= math.max(1L, (e * 0.05).toLong),
        s"$d: union estimate ${wauEst(d)} vs exact $e")
  }

  test("streamed phrase flags replay to ix_phrase's doc and occurrence counts") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val phrases = Seq("table value", "fast scan", "agg row window")
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.phraseFlags(mem.toDF().toDF("doc_id", "text"), phrases)
      .writeStream.outputMode("append").format("memory").queryName("pf").start()
    try {
      for (chunk <- docs.grouped((docs.length + 2) / 3)) {
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val flags = spark.sql("SELECT * FROM pf")
    assert(flags.count() == docs.length)
    val batch = SparkEntry.queries("ix_phrase")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_occ"))).toMap
    phrases.zipWithIndex.foreach { case (p, i) =>
      val nDocs = flags.filter(col(s"hit_$i")).count()
      val nOcc = flags.agg(sum(s"n_occ_$i")).collect()(0).getLong(0)
      assert((nDocs, nOcc) == batch(p), s"$p: stream ($nDocs, $nOcc) vs batch ${batch(p)}")
    }
  }

  test("streamed frequency sketches bracket the exact shingle head after replay") {
    import spark.implicits._
    import graft.functions.FreqAgg._
    implicit val sc = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "text").as[(String, String)].collect()
    val mem = MemoryStream[(String, String)]
    val q = Streaming.freqSketch(mem.toDF().toDF("source", "text"))
      .writeStream.outputMode("complete").format("memory").queryName("fsk").start()
    try {
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val maintained = spark.sql("SELECT * FROM fsk")
    assert(maintained.count() == docs.map(_._1).distinct.length,
      "one maintained sketch row per source")
    // serve path: merge the maintained rows into the global head and
    // grade against the batch EXACT top-16 (a frequency sketch's
    // contents are arrival-order-dependent, so the streamed sketch
    // need not byte-equal the batch build — the deterministic bracket
    // is what any order must satisfy)
    val Seq(_, exactTop) = operators.Maintain.freqFrames(spark, sf)
    val merged = maintained.agg(
      freq_merge_agg(col("sk"), operators.Maintain.freqMapSize).as("sk"))
    val graded = exactTop.crossJoin(merged)
      .select(col("tf"),
        freq_lower_bound(col("sk"), col("h")).as("lb"),
        freq_upper_bound(col("sk"), col("h")).as("ub"))
      .collect()
    assert(graded.length == 16)
    graded.foreach { r =>
      val (tf, lb, ub) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(lb <= tf && tf <= ub,
        s"streamed sketch bracket [$lb, $ub] misses exact count $tf")
    }
  }

  test("streaming anomaly scores reproduce batch ev_anomaly row-for-row on in-order replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // the finalized (type, bucket, count) series a windowCounts stage
    // would emit, replayed per type in bucket order across 3 batches
    val series = eventsBatch
      .withColumn("bucket_s",
        (floor(col("ts").cast("double") / 300) * 300).cast("long"))
      .groupBy("event_type", "bucket_s").agg(count(lit(1)).as("n_events"))
      .as[(String, Long, Long)].collect()
      .sortBy(r => (r._2, r._1))
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streaming.anomaly(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("anom").start()
    try {
      series.grouped(math.max(1, series.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT * FROM anom").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket_s")) ->
        ((r.getAs[Long]("n_events"), Option(r.getAs[java.lang.Double]("z")).map(_.doubleValue),
          r.getAs[Boolean]("anomalous")))).toMap
    val want = SparkEntry.queries("ev_anomaly")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket_s")) ->
        ((r.getAs[Long]("n_events"), Option(r.getAs[java.lang.Double]("z")).map(_.doubleValue),
          r.getAs[Boolean]("anomalous")))).toMap
    assert(got.keySet == want.keySet, "bucket coverage diverged")
    val diffs = want.collect { case (k, w) if got(k) != w => (k, got(k), w) }
    assert(diffs.isEmpty, s"${diffs.size} rows diverged, e.g. ${diffs.take(3).mkString("; ")}")
  }

  test("streaming SES forecast reproduces batch ev_forecast row-for-row on replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val series = eventsBatch
      .withColumn("bucket_s",
        (floor(col("ts").cast("double") / 300) * 300).cast("long"))
      .groupBy("event_type", "bucket_s").agg(count(lit(1)).as("n_events"))
      .as[(String, Long, Long)].collect()
      .sortBy(r => (r._2, r._1))
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streaming.sesForecast(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("sesfc").start()
    try {
      series.grouped(math.max(1, series.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT * FROM sesfc").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket_s")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("forecast"),
          r.getAs[Double]("abs_err")))).toMap
    val want = SparkEntry.queries("ev_forecast")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket_s")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("forecast"),
          r.getAs[Double]("abs_err")))).toMap
    assert(got.keySet == want.keySet, "bucket coverage diverged")
    val diffs = want.collect { case (k, w) if got(k) != w => (k, got(k), w) }
    assert(diffs.isEmpty, s"${diffs.size} rows diverged, e.g. ${diffs.take(3).mkString("; ")}")
  }

  test("streaming CUSUM alarms promptly on a planted shift, stays silent on flat") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // the ev_changepoint fixture: 5/bucket for 30 buckets then 15, and
    // a flat-8 control
    val series = (for {
      (tpe, lvl) <- Seq("shift" -> ((b: Int) => if (b < 30) 5L else 15L),
                        "flat" -> ((_: Int) => 8L))
      b <- 0 until 60
    } yield (tpe, b.toLong * 300, lvl(b))).sortBy(_._2)
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streaming.cusum(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("cus").start()
    try {
      series.grouped(40).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.sql("SELECT * FROM cus").collect()
    val alarms = rows.filter(_.getAs[Boolean]("alarm"))
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket_s")))
    assert(alarms.forall(_._1 == "shift"), s"flat series alarmed: ${alarms.mkString(",")}")
    val first = alarms.map(_._2).min
    assert(first >= 30L * 300 && first <= 33L * 300,
      s"alarm must fire within a few buckets of the shift at 9000, got $first")
    // once alarming with a frozen baseline, the alarm LATCHES for the
    // sustained shift — every later bucket stays flagged
    assert(alarms.map(_._2).toSet == (first / 300 to 59L).map(_ * 300).toSet,
      "sustained shift must keep the alarm raised")
    // batch agreement on WHERE: ev_changepoint put the split at 29*300
    // (last low bucket); the online alarm fires just after it
    assert(first > 29L * 300)
  }

  test("streamed term profile + shared cosine serve reproduce batch ix_source_sim") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val (vocab, nd) = operators.Search.simVocab(spark, sf)
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "text").as[(String, String)].collect()
    val mem = MemoryStream[(String, String)]
    val q = Streaming.termProfile(mem.toDF().toDF("source", "text"), vocab)
      .writeStream.outputMode("complete").format("memory").queryName("tprof").start()
    try {
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    // serve path: the maintained tiny table + the SHARED weight/cosine
    // definitions (freeze the sink into a local frame — the PSI-spec
    // discipline for self-joining a memory sink)
    val sink = spark.table("tprof")
    val prof = spark.createDataFrame(
      java.util.Arrays.asList(sink.collect(): _*), sink.schema)
      .join(vocab.select("h", "df"), "h")
    val got = operators.Search.pairCosines(operators.Search.weightsOf(prof, nd))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val want = SparkEntry.queries("ix_source_sim")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == want.keySet && got.nonEmpty)
    for ((k, w) <- want)
      assert(math.abs(got(k) - w) < 2e-6, s"$k: stream ${got(k)} vs batch $w")
  }

  test("batch sessionize matches the SQL sessionization operator") {
    import spark.implicits._
    val ev = eventsBatch.select("event_id", "ts", "user_id", "event_type", "value").as[Event]
    val got = Streaming.sessionizeBatch(spark, ev)
      .groupBy("user_id").agg(max("session_id").as("n_sessions"),
        sum("n_events").as("n_events"))
    val want = operators.Events.sessionize.fn(spark, sf)
      .groupBy("user_id").agg(max("session_id").as("n_sessions"),
        sum("n_events").as("n_events"))
    assert(got.join(want, Seq("user_id", "n_sessions", "n_events"), "left_anti").count() == 0)
    assert(got.count() == want.count())
  }

  test("streamed delta assignment reproduces batch ann_refresh assignments") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val corpus = operators.Ann.corpus(spark, sf)
    val cents = operators.Ann.packedBaseCentroids(spark, sf)
    val delta = corpus.filter(col("vec_id") % operators.Ann.RefreshMod ===
        operators.Ann.RefreshRes)
      .select("vec_id", "e", "nrm")
      .as[(Long, Seq[Double], Double)].collect().sortBy(_._1)
    assert(delta.nonEmpty)
    val mem = MemoryStream[(Long, Seq[Double], Double)]
    val q = Streaming.annAssign(mem.toDF().toDF("vec_id", "e", "nrm"), cents)
      .writeStream.outputMode("append").format("memory").queryName("ann_ingest").start()
    try {
      delta.grouped(math.max(1, delta.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT vec_id, cell FROM ann_ingest").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the batch side of the same assignment (ann_refresh's dassign)
    val (cent, _) = operators.Ann.baseIvfIndex(spark, sf)
    val want = operators.Ann.argmaxCell(operators.Ann.scoreAgainst(
        corpus.filter(col("vec_id") % operators.Ann.RefreshMod ===
          operators.Ann.RefreshRes), cent))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    assert(got == want, s"ingest assignments diverged from batch: " +
      s"${(got.toSet diff want.toSet).take(5)}")
  }

  test("streamed classifier scores reproduce batch clf_score row-for-row") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text", "source").as[(Long, String, String)].collect()
    val mem = MemoryStream[(Long, String, String)]
    val q = Streaming.clfScore(mem.toDF().toDF("doc_id", "text", "source"))
      .writeStream.outputMode("append").format("memory").queryName("clfs").start()
    try {
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT * FROM clfs").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("margin"), r.getAs[Double]("score"), r.getAs[Boolean]("flagged"))).toMap
    val want = SparkEntry.queries("clf_score")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("margin"), r.getAs[Double]("score"), r.getAs[Boolean]("flagged"))).toMap
    assert(got == want, "stream replay must equal the batch inference exactly")
  }

  test("streamed tokenizer application reproduces batch tx_bpe_encode row-for-row") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val pv = operators.Tokenizer.packedVocab(spark, sf)
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text", "source").as[(Long, String, String)].collect()
    val mem = MemoryStream[(Long, String, String)]
    val q = Streaming.bpeEncode(mem.toDF().toDF("doc_id", "text", "source"), pv)
      .writeStream.outputMode("append").format("memory").queryName("bpe_enc").start()
    try {
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    def keyOf(r: org.apache.spark.sql.Row) = r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_tokens"), r.getAs[Double]("bpe_ratio"))
    val got = spark.sql("SELECT * FROM bpe_enc").collect().map(keyOf).toMap
    val want = SparkEntry.queries("tx_bpe_encode")(spark, sf).collect().map(keyOf).toMap
    assert(got == want, "stream token accounting must equal the batch encoder exactly")
  }

  test("training from the streamed vocabulary yields the identical BPE merge table") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf)
      .select("text").as[String].collect()
    val mem = MemoryStream[String]
    val q = Streaming.bpeVocab(mem.toDF().toDF("text"))
      .writeStream.outputMode("complete").format("memory").queryName("bpev").start()
    try {
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val maintained = spark.sql("SELECT * FROM bpev")
    // the maintained table IS the batch vocabulary (integer counts,
    // order-independent) …
    val batchVocab = operators.Tokenizer.vocab0(spark, sf)
    assert(maintained.join(batchVocab, Seq("word", "cnt"), "left_anti").count() == 0)
    assert(maintained.count() == batchVocab.count())
    // … so the shared merge loop over it reproduces tx_bpe_train
    val Seq(mergesFromStream, _) = operators.Tokenizer.trainLoop(spark, maintained)
    val got = mergesFromStream.collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("lhs"), r.getAs[String]("rhs"),
        r.getAs[Long]("pair_count"))).sortBy(_._1).toSeq
    val want = SparkEntry.queries("tx_bpe_train")(spark, sf).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("lhs"), r.getAs[String]("rhs"),
        r.getAs[Long]("pair_count"))).sortBy(_._1).toSeq
    assert(got == want, s"stream-trained merges diverged:\n$got\n$want")
  }

  test("streamed checksum maintenance replays to the exact batch dq_checksum") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val rows = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_linestatus")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    val mem = MemoryStream[(Long, Long, Long, String, String)]
    // two micro-batches: the running state must absorb both
    val (b1, b2) = rows.splitAt(rows.length / 2)
    mem.addData(b1.toSeq)
    mem.addData(b2.toSeq)
    val streamDf = mem.toDF().toDF(
      "l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_linestatus")
    val q = Streaming.checksumMaintain(streamDf)
      .writeStream.outputMode("complete").format("memory").queryName("cksum").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.sql("SELECT * FROM cksum").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_rows"), r.getAs[Long]("checksum")))
      .sortBy(_._1).toSeq
    val want = SparkEntry.queries("dq_checksum")(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_rows"), r.getAs[Long]("checksum")))
      .sortBy(_._1).toSeq
    assert(got == want, s"streamed checksum diverged from batch:\n$got\n$want")
  }

  /** The events corpus, DELIBERATELY disordered: each event's arrival
    * slot is its timestamp plus a deterministic per-event jitter of up
    * to `jitterUs` — bounded disorder, the production shape a
    * watermark covers (the reorder delay must exceed the jitter).
    * A far-future sentinel for a phantom user closes the replay by
    * pushing the watermark past every real event, flushing the buffer.
    */
  private def jitterShuffledEvents(jitterUs: Long): Array[Streaming.Event] = {
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    val all = eventsBatch
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Streaming.Event](org.apache.spark.sql.Encoders.product[Streaming.Event])
      .collect()
    val shuffled = all.sortBy(e =>
      (us(e.ts) + java.lang.Long.hashCode(e.event_id * 2654435761L).abs % jitterUs,
        e.event_id))
    val maxUs = all.iterator.map(e => us(e.ts)).max
    val sentinel = Streaming.Event(Long.MinValue,
      new java.sql.Timestamp(maxUs / 1000L + 3600L * 1000L), -1L, "sentinel", 0.0)
    shuffled :+ sentinel
  }

  /** Run `body` with Spark's global-watermark chain check disabled —
    * reorder's releases are below-watermark BY DESIGN and its
    * downstream machines are watermark-agnostic (see [[Streaming.reorder]]).
    */
  private def withReorderChainAllowed[A](body: => A): A = {
    val key = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("reorder→asof on a jitter-shuffled stream still equals batch ev_asof") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    withReorderChainAllowed {
    // 5-minute disorder under a 10-minute reorder delay
    val feed = jitterShuffledEvents(5L * 60 * 1000000)
    val mem = MemoryStream[Streaming.Event]
    val q = Streaming.asof(Streaming.reorder(mem.toDS()))
      .writeStream.outputMode("append").format("memory").queryName("re_asof").start()
    try {
      for (chunk <- feed.grouped((feed.length + 7) / 8)) {
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT * FROM re_asof")
    val want = operators.Events.asof.fn(spark, sf)
    assert(got.count() == want.count() && got.count() > 0,
      s"row counts diverged: stream ${got.count()} vs batch ${want.count()}")
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
    }
  }

  test("stream-stream asof: two live jitter-shuffled streams equal batch ev_asof") {
    // Unlike reorder→asof (one unioned in-order stream), BOTH sides
    // arrive as separate live streams, each disordered within the
    // watermark delay, and the operator needs no in-order contract:
    // the watermark itself proves each purchase's answer complete.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val feed = jitterShuffledEvents(5L * 60 * 1000000)
    // per-side watermarks take the MIN across sides, so BOTH streams
    // need a far-future sentinel to flush held purchases; the
    // purchase-side phantom row is filtered from the comparison below
    val sentinel = feed.last
    val purchases = feed.filter(e => e.event_type == "purchase") :+
      sentinel.copy(event_id = Long.MinValue + 1, user_id = -2L)
    val clicks = feed.filter(e => e.event_type == "click" || e.event_type == "sentinel")
    val memP = MemoryStream[Streaming.Event]
    val memC = MemoryStream[Streaming.Event]
    val q = Streaming.asofStream(memP.toDS(), memC.toDS())
      .writeStream.outputMode("append").format("memory").queryName("ss_asof").start()
    try {
      val pChunks = purchases.grouped((purchases.length + 7) / 8).toSeq
      val cChunks = clicks.grouped((clicks.length + 7) / 8).toSeq
      for (i <- 0 until math.max(pChunks.length, cChunks.length)) {
        if (i < pChunks.length) memP.addData(pChunks(i).toIndexedSeq)
        if (i < cChunks.length) memC.addData(cChunks(i).toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT * FROM ss_asof WHERE user_id >= 0")
    val want = operators.Events.asof.fn(spark, sf)
    assert(got.count() == want.count() && got.count() > 0,
      s"row counts diverged: stream ${got.count()} vs batch ${want.count()}")
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("reorder drops rows later than the watermark delay instead of mis-releasing them") {
    // A row whose ts is ALREADY below the watermark at arrival is
    // late by more than the delay. flatMapGroupsWithState does not
    // filter late input, so without reorder's own arrival-time drop
    // the row would partition as instantly ripe and be emitted AFTER
    // higher-keyed rows already released — the downstream asof/scd2
    // fail-loud checks would then kill the chain on a production
    // late tail. The contract is the built-in one: drop it.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val mem = MemoryStream[Streaming.Event]
    val q = Streaming.reorder(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("re_drop").start()
    try {
      mem.addData(Streaming.Event(1, ts(600), 7L, "click", 1.0),
        Streaming.Event(2, ts(605), 7L, "purchase", 2.0))
      q.processAllAvailable()
      // sentinel pushes the watermark to 1190 min and flushes user 7
      mem.addData(Streaming.Event(3, ts(1200), 8L, "sentinel", 0.0))
      q.processAllAvailable()
      // arrives with ts(606) << watermark: must be dropped at arrival
      mem.addData(Streaming.Event(4, ts(606), 7L, "click", 3.0))
      q.processAllAvailable()
      mem.addData(Streaming.Event(5, ts(1800), 8L, "sentinel", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.sql("SELECT event_id FROM re_drop").collect().map(_.getLong(0)).toSet
    assert(ids.contains(1L) && ids.contains(2L), s"on-time rows must flush, got $ids")
    assert(!ids.contains(4L),
      "a row older than the watermark delay must be dropped at arrival, not released out of order")
  }

  test("reorder→scd2 on a jitter-shuffled stream closes exactly batch cdc_scd2's versions") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    withReorderChainAllowed {
    val feed = jitterShuffledEvents(5L * 60 * 1000000)
    val mem = MemoryStream[Streaming.Event]
    val q = Streaming.scd2(Streaming.reorder(mem.toDS()))
      .writeStream.outputMode("append").format("memory").queryName("re_scd2").start()
    try {
      for (chunk <- feed.grouped((feed.length + 7) / 8)) {
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT * FROM re_scd2").collect()
      .filter(_.getLong(0) >= 0) // drop any sentinel-keyed rows
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val batch = SparkEntry.queries("cdc_scd2")(spark, sf).collect()
    val want = batch.filter(!_.getAs[Boolean]("is_current"))
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Int]("version")) ->
        ((r.getAs[Long]("valid_from_us"), r.getAs[Long]("valid_to_us"),
          r.getAs[Double]("value")))).toMap
    assert(got.nonEmpty && got == want,
      s"closed-version sets differ: stream ${got.size} vs batch ${want.size}")
    }
  }
}
