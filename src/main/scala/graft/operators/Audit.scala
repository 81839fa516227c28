package graft.operators

import graft.{Q, Tables}
import graft.functions.AuditDefs._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's model-audit surface, re-expressed as Spark
  * operators over the `documents` corpus (`text` = collected model
  * responses, `source` = model identity).
  *
  * Every operator is a map-side feature extraction followed by at
  * most one narrow aggregation on the low-cardinality model key;
  * pairwise model comparison happens on the aggregated table
  * (|models|² rows), so cost is independent of corpus size — the
  * layout that survives 100 TB.
  *
  * Oracle SQL is generated from the same AuditDefs constants as the
  * Spark plans. All SQL numeric literals are CAST to DOUBLE (DuckDB
  * would otherwise use DECIMAL arithmetic and drift from Spark's
  * doubles).
  */
object Audit {

  private def d(x: String): String = s"CAST($x AS DOUBLE)"

  // ═══════════════ llmmap: per-response features ═══════════════
  // Reference: llmmap.py:28-67 (_extract_response_features)

  /** Unrounded per-doc feature frame (Spark side). */
  private def docFeats(spark: SparkSession, dir: String): DataFrame =
    docFeatsOf(Tables.documents(spark, dir))

  /** The same feature extraction over ANY frame with (doc_id, source,
    * text) — one definition shared by the batch corpus queries and
    * Streaming.fingerprint, so batch and stream cannot drift.
    */
  private[graft] def docFeatsOf(docs: DataFrame): DataFrame = {
    val t = col("text")
    val lt = lower(col("text"))
    val words = split(trim(t), "\\s+")
    // Python `"".split()` is [] but Spark `split(trim(""), "\s+")` is
    // [""] — guard the word counts so an empty/whitespace-only doc
    // reports 0 words (llmmap.py:30-55 semantics), not 1.
    val emptyDoc = length(trim(t)) === 0
    val nWords = when(emptyDoc, lit(0)).otherwise(size(words))
    val tWords = greatest(nWords, lit(1)).cast("double")
    val sentences = filter(transform(split(t, "[.!?]+"), s => trim(s)), s => s =!= "")
    val nSent = greatest(size(sentences), lit(1)).cast("double")
    val tChars = greatest(length(t), lit(1)).cast("double")
    val nonWs = length(regexp_replace(t, "\\s+", ""))

    val markerCols = llmmapMarkers.map { case (cat, ms) =>
      (graft.functions.MarkerExprs.marker_total(lt, ms) / tWords).as(s"style_$cat")
    }

    docs.select(
      Seq(
        col("doc_id"),
        col("source"),
        length(t).cast("long").as("length_chars"),
        nWords.cast("long").as("length_words"),
        size(sentences).cast("long").as("length_sentences"),
        (nonWs / tWords).as("avg_word_length"),
        (nWords / nSent).as("avg_sentence_length"),
        (when(emptyDoc, lit(0)).otherwise(size(array_distinct(split(lower(trim(t)), "\\s+"))))
          / tWords).as("unique_word_ratio"),
        ((length(t) - length(regexp_replace(t, "[.,;:!?]", ""))) / tChars).as("punctuation_ratio"),
        ((length(t) - length(regexp_replace(t, "\n", ""))) / tChars).as("newline_ratio"),
        t.rlike(bulletRe).as("has_bullet_points"),
        t.rlike(numberedRe).as("has_numbered_list"),
        t.rlike(mdHeaderRe).as("has_markdown_headers"),
        t.contains("```").as("has_code_blocks"),
        refusalPrefixes.map(p => lt.startsWith(p)).reduce(_ || _).as("starts_with_refusal")
      ) ++ markerCols: _*)
  }

  /** Matching unrounded per-doc feature SQL (DuckDB side). */
  private val docFeatsSql: String = {
    val lt = "lower(text)"
    val tWords = d("greatest(len(string_split_regex(trim(text), '\\s+')), 1)")
    val sentencesLen =
      "len(list_filter(list_transform(string_split_regex(text, '[.!?]+'), s -> trim(s)), s -> s != ''))"
    val nSent = d(s"greatest($sentencesLen, 1)")
    val tChars = d("greatest(length(text), 1)")
    val markerExprs = llmmapMarkers.map { case (cat, ms) =>
      val cnt = ms.map(m => cntOccSql("lt", m)).mkString("(", " + ", ")")
      s"$cnt / t_words AS style_$cat"
    }
    val nWords = "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END"
    val nUnique = "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) END"
    s"""SELECT doc_id, source,
       |  CAST(length(text) AS BIGINT) AS length_chars,
       |  CAST($nWords AS BIGINT) AS length_words,
       |  CAST($sentencesLen AS BIGINT) AS length_sentences,
       |  length(regexp_replace(text, '\\s+', '', 'g')) / t_words AS avg_word_length,
       |  ($nWords) / $nSent AS avg_sentence_length,
       |  ($nUnique) / t_words AS unique_word_ratio,
       |  (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) / $tChars AS punctuation_ratio,
       |  (length(text) - length(replace(text, chr(10), ''))) / $tChars AS newline_ratio,
       |  regexp_matches(text, '$bulletRe') AS has_bullet_points,
       |  regexp_matches(text, '$numberedRe') AS has_numbered_list,
       |  regexp_matches(text, '$mdHeaderRe') AS has_markdown_headers,
       |  (position('```' IN text) > 0) AS has_code_blocks,
       |  ${refusalPrefixes.map(p => s"(lt LIKE ${sl(p + "%")})").mkString("(", " OR ", ")")} AS starts_with_refusal,
       |  ${markerExprs.mkString(",\n  ")}
       |FROM (SELECT *, $lt AS lt, $tWords AS t_words FROM documents)""".stripMargin
  }

  private val styleCats = llmmapMarkers.map("style_" + _._1)

  val features = Q(
    "ma_features",
    s"""SELECT doc_id, source, length_chars, length_words, length_sentences,
       |  round(1e-9 + avg_word_length, 6) AS avg_word_length,
       |  round(1e-9 + avg_sentence_length, 6) AS avg_sentence_length,
       |  round(1e-9 + unique_word_ratio, 6) AS unique_word_ratio,
       |  round(1e-9 + punctuation_ratio, 6) AS punctuation_ratio,
       |  round(1e-9 + newline_ratio, 6) AS newline_ratio,
       |  has_bullet_points, has_numbered_list, has_markdown_headers,
       |  has_code_blocks, starts_with_refusal,
       |  ${styleCats.map(c => s"round(1e-9 + $c, 6) AS $c").mkString(",\n  ")}
       |FROM ($docFeatsSql)
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val f = docFeats(spark, dir)
    f.select(
      Seq(col("doc_id"), col("source"), col("length_chars"), col("length_words"),
        col("length_sentences"),
        round(lit(1e-9) + col("avg_word_length"), 6).as("avg_word_length"),
        round(lit(1e-9) + col("avg_sentence_length"), 6).as("avg_sentence_length"),
        round(lit(1e-9) + col("unique_word_ratio"), 6).as("unique_word_ratio"),
        round(lit(1e-9) + col("punctuation_ratio"), 6).as("punctuation_ratio"),
        round(lit(1e-9) + col("newline_ratio"), 6).as("newline_ratio"),
        col("has_bullet_points"), col("has_numbered_list"), col("has_markdown_headers"),
        col("has_code_blocks"), col("starts_with_refusal")) ++
        styleCats.map(c => round(lit(1e-9) + col(c), 6).as(c)): _*)
      .orderBy("doc_id")
  }

  // ═══════════════ llmmap: per-model fingerprint vector ═══════════════
  // Reference: llmmap.py:70-101 (_compute_fingerprint_vector)

  /** Fingerprint vector column names in output order. */
  private[graft] val fpCols: Seq[String] =
    numericFeatures.map("avg_" + _) ++ boolFeatures.map("ratio_" + _) ++ styleCats

  /** The fingerprint aggregation over any per-doc feature frame — one
    * definition shared by the batch ma_fingerprint and
    * Streaming.fingerprint. Every component is an algebraic mean, so
    * on a stream Spark's agg state carries (sum, count) per source and
    * maintains the fingerprint incrementally.
    */
  private[graft] def fingerprintAgg(feats: DataFrame): DataFrame =
    feats.groupBy("source")
      .agg(
        avg(numericFeatures.head).as("avg_" + numericFeatures.head),
        numericFeatures.tail.map(c => avg(c).as("avg_" + c)) ++
          boolFeatures.map(c => avg(col(c).cast("int")).as("ratio_" + c)) ++
          styleCats.map(c => avg(c).as(c)): _*)

  /** Streaming.fingerprint's entry: features + fingerprint agg over
    * any (doc_id, source, text) frame, batch or stream.
    */
  private[graft] def fingerprintOf(docs: DataFrame): DataFrame =
    fingerprintAgg(docFeatsOf(docs))

  /** Unrounded per-model fingerprint (Spark side). */
  private def fingerprintDf(spark: SparkSession, dir: String): DataFrame =
    fingerprintAgg(docFeats(spark, dir)).cache()

  private val fingerprintSql: String = {
    val aggs =
      numericFeatures.map(c => s"avg($c) AS avg_$c") ++
        boolFeatures.map(c => s"avg(CAST($c AS INT)) AS ratio_$c") ++
        styleCats.map(c => s"avg($c) AS $c")
    s"SELECT source, ${aggs.mkString(", ")} FROM ($docFeatsSql) GROUP BY source"
  }

  val fingerprint = Q(
    "ma_fingerprint",
    s"""SELECT source, ${fpCols.map(c => s"round(1e-9 + $c, 6) AS $c").mkString(", ")}
       |FROM ($fingerprintSql)
       |ORDER BY source""".stripMargin) { (spark, dir) =>
    fingerprintDf(spark, dir)
      .select(col("source") +: fpCols.map(c => round(lit(1e-9) + col(c), 6).as(c)): _*)
      .orderBy("source")
  }

  // ═══════════════ llmmap: pairwise fingerprint compare ═══════════════
  // Reference: llmmap.py:104-146, 383-404 (normalize + cosine + verdict)

  private val rangeMap = featureRanges.toMap

  /** Normalized value of fingerprint column `c` (Spark side). */
  private def normC(c: Column, name: String): Column = rangeMap.get(name) match {
    case Some((lo, hi)) => greatest(lit(0d), least(lit(1d), (c - lit(lo)) / lit(hi - lo)))
    case None           => c
  }

  private def normSql(e: String, name: String): String = rangeMap.get(name) match {
    case Some((lo, hi)) =>
      s"greatest(${d("0")}, least(${d("1")}, ($e - ${d(lo.toString)}) / ${d((hi - lo).toString)}))"
    case None => e
  }

  val fpCompare = Q(
    "ma_fp_compare", {
      val dot = fpCols.map(c => s"${normSql(s"a.$c", c)} * ${normSql(s"b.$c", c)}").mkString(" + ")
      val na = fpCols.map(c => s"${normSql(s"a.$c", c)} * ${normSql(s"a.$c", c)}").mkString(" + ")
      val nb = fpCols.map(c => s"${normSql(s"b.$c", c)} * ${normSql(s"b.$c", c)}").mkString(" + ")
      s"""WITH fp AS ($fingerprintSql)
         |SELECT model_a, model_b,
         |  round(1e-9 + similarity, 6) AS similarity,
         |  similarity >= ${d("0.85")} AS is_derived,
         |  round(1e-9 + least(abs(similarity - ${d("0.85")}) / ${d("0.15")}, ${d("1")}), 6) AS confidence
         |FROM (
         |  SELECT a.source AS model_a, b.source AS model_b,
         |    CASE WHEN sqrt($na) * sqrt($nb) = 0 THEN ${d("0")}
         |      ELSE ($dot) / (sqrt($na) * sqrt($nb)) END AS similarity
         |  FROM fp a JOIN fp b ON a.source < b.source
         |)
         |ORDER BY model_a, model_b""".stripMargin
    }) { (spark, dir) =>
    val fp = fingerprintDf(spark, dir)
    val a = fp.select(col("source").as("model_a") +: fpCols.map(c => col(c).as(s"a_$c")): _*)
    val b = fp.select(col("source").as("model_b") +: fpCols.map(c => col(c).as(s"b_$c")): _*)
    val dot = fpCols.map(c => normC(col(s"a_$c"), c) * normC(col(s"b_$c"), c)).reduce(_ + _)
    val na = sqrt(fpCols.map(c => { val n = normC(col(s"a_$c"), c); n * n }).reduce(_ + _))
    val nb = sqrt(fpCols.map(c => { val n = normC(col(s"b_$c"), c); n * n }).reduce(_ + _))
    val sim = when(na * nb === 0d, 0d).otherwise(dot / (na * nb))
    a.join(b, col("model_a") < col("model_b"))
      .select(col("model_a"), col("model_b"), sim.as("similarity"))
      .select(
        col("model_a"), col("model_b"),
        round(lit(1e-9) + col("similarity"), 6).as("similarity"),
        (col("similarity") >= 0.85).as("is_derived"),
        round(lit(1e-9) + least(abs(col("similarity") - 0.85) / 0.15, lit(1d)), 6).as("confidence"))
      .orderBy("model_a", "model_b")
  }

  // ═══════════════ DLI: behavior signature ═══════════════
  // Reference: dli.py:60-113 (_extract_behavior_signature)

  /** Unrounded per-model DLI signature (Spark side). */
  private def dliSigDf(spark: SparkSession, dir: String): DataFrame =
    dliSigOf(Tables.documents(spark, dir)).cache()

  /** Signature over any frame with (source, text) — reused by the
    * multilingual golden spec on an inline corpus.
    */
  private[graft] def dliSigOf(docs: DataFrame): DataFrame = {
    val lt = lower(col("text"))
    val perDoc = docs.select(
      col("source"),
      anySubC(lt, dliRefusalPhrases).cast("int").as("refusal"),
      // same empty-doc guard as docFeats: Python len("".split()) == 0
      when(length(trim(col("text"))) === 0, lit(0))
        .otherwise(size(split(trim(col("text")), "\\s+"))).cast("double").as("n_split_words"),
      graft.functions.MarkerExprs.word_count(lt).as("n_re_words"),
      col("text").rlike(mdHeaderRe).cast("int").as("has_md"),
      col("text").rlike(bulletRe).cast("int").as("has_list"),
      col("text").contains("```").cast("int").as("has_code"),
      graft.functions.MarkerExprs.marker_total(lt, dliHedging).as("hedge_cnt"),
      graft.functions.MarkerExprs.marker_total(lt, dliCertainty).as("cert_cnt"))
    val base = perDoc.groupBy("source").agg(
      avg("refusal").as("refusal_rate"),
      avg("n_split_words").as("avg_length"),
      avg("has_md").as("markdown_rate"),
      avg("has_list").as("list_rate"),
      avg("has_code").as("code_block_rate"),
      sum("hedge_cnt").as("hedge_total"),
      sum("cert_cnt").as("cert_total"),
      sum("n_re_words").as("word_total"))
    val vocab = docs
      .select(col("source"),
        explode(graft.functions.MarkerExprs.word_tokens(lower(col("text")))).as("w"))
      .groupBy("source")
      .agg(countDistinct("w").as("n_vocab"))
    base.join(vocab, Seq("source"))
      .select(
        col("source"),
        col("refusal_rate"),
        col("avg_length"),
        (col("n_vocab") / greatest(col("word_total"), lit(1)).cast("double")).as("vocab_diversity"),
        col("markdown_rate"), col("list_rate"), col("code_block_rate"),
        (col("hedge_total") / greatest(col("word_total"), lit(1)).cast("double")).as("hedging_rate"),
        (col("cert_total") / greatest(col("word_total"), lit(1)).cast("double")).as("certainty_rate"))
  }

  private val dliSigSql: String = {
    val lt = "lower(text)"
    val hedge = dliHedging.map(m => cntOccSql("lt", m)).mkString("(", " + ", ")")
    val cert = dliCertainty.map(m => cntOccSql("lt", m)).mkString("(", " + ", ")")
    s"""SELECT base.source, refusal_rate, avg_length,
       |  n_vocab / ${d("greatest(word_total, 1)")} AS vocab_diversity,
       |  markdown_rate, list_rate, code_block_rate,
       |  hedge_total / ${d("greatest(word_total, 1)")} AS hedging_rate,
       |  cert_total / ${d("greatest(word_total, 1)")} AS certainty_rate
       |FROM (
       |  SELECT source,
       |    avg(CAST(${anySubSql("lt", dliRefusalPhrases)} AS INT)) AS refusal_rate,
       |    avg(${d("CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END")}) AS avg_length,
       |    avg(CAST(regexp_matches(text, '$mdHeaderRe') AS INT)) AS markdown_rate,
       |    avg(CAST(regexp_matches(text, '$bulletRe') AS INT)) AS list_rate,
       |    avg(CAST((position('```' IN text) > 0) AS INT)) AS code_block_rate,
       |    CAST(sum($hedge) AS DOUBLE) AS hedge_total,
       |    CAST(sum($cert) AS DOUBLE) AS cert_total,
       |    CAST(sum(len(regexp_extract_all(lt, '${graft.functions.WordScan.WordClass}'))) AS BIGINT) AS word_total
       |  FROM (SELECT source, text, $lt AS lt FROM documents)
       |  GROUP BY source
       |) base
       |JOIN (
       |  SELECT source, count(DISTINCT w) AS n_vocab
       |  FROM (SELECT source, unnest(regexp_extract_all(lower(text), '${graft.functions.WordScan.WordClass}')) AS w FROM documents)
       |  GROUP BY source
       |) v ON base.source = v.source""".stripMargin
  }

  val dliSignature = Q(
    "ma_dli_signature",
    s"""SELECT source,
       |  ${dliFeatureNames.map(c => s"round(1e-9 + $c, 6) AS $c").mkString(",\n  ")}
       |FROM ($dliSigSql)
       |ORDER BY source""".stripMargin) { (spark, dir) =>
    dliSigDf(spark, dir)
      .select(col("source") +: dliFeatureNames.map(c => round(lit(1e-9) + col(c), 6).as(c)): _*)
      .orderBy("source")
  }

  // ═══════════════ DLI: bigram distribution (top-100) ═══════════════
  // Reference: dli.py:27-33, 65-73

  /** Unrounded per-model top-100 bigram distribution (Spark side).
    * Bigrams are formed by the native WordBigramsExpr in the scan
    * stage (one map pass) — the composable alternatives either
    * shuffle+sort every word in the corpus through a per-doc lead()
    * window, or (transform-with-index lambda) re-inline the
    * regexp_extract_all into every element access.
    *
    * Top-100 ties break by FIRST OCCURRENCE (smallest doc_id, then
    * position), matching Python's insertion-ordered Counter
    * .most_common (dli.py:66-73): sorted() is stable, so equal counts
    * keep the order bigrams were first seen scanning responses in
    * doc order. Encoded as one ordinal doc_id·2²⁰ + pos (docs are
    * response texts, far under 2²⁰ words).
    */
  private def dliBigramDf(spark: SparkSession, dir: String): DataFrame =
    dliBigramsOf(Tables.documents(spark, dir))

  /** Top-100 bigram distribution over any frame with
    * (doc_id, source, text) — reused by the multilingual golden spec.
    */
  private[graft] def dliBigramsOf(docs: DataFrame): DataFrame = {
    // (source, bigram) counts with the first-occurrence ordinal;
    // cached because the bounded top-100 selection reads it twice
    // (select + join-back). Fixed-width + short strings — safe for
    // the columnar cache.
    val counts = docs
      .select(col("doc_id"), col("source"),
        posexplode(graft.functions.MarkerExprs.word_bigrams(lower(col("text")))))
      .withColumn("ord", col("doc_id") * lit(1048576L) + col("pos"))
      .withColumn("bigram", col("col"))
      .groupBy("source", "bigram")
      .agg(count(lit(1)).as("cnt"), min("ord").as("first_ord"))
      .cache()
    // Top-100 per source via the bounded-heap aggregate: a row_number
    // window would sort a source's ENTIRE bigram vocabulary in one
    // partition. score = cnt with id = first_ord reproduces the
    // (cnt DESC, first occurrence ASC) order exactly — the heap
    // prefers the smaller id on score ties, and first_ord is unique
    // per bigram (one bigram starts at each word position).
    val top = counts.groupBy("source")
      .agg(graft.functions.TopKAgg.topk_by_score(
        col("cnt").cast("double"), col("first_ord"), 100).as("tk"))
      .select(col("source"), explode(col("tk")).as("t"))
      .select(col("source"), col("t.id").as("first_ord"), col("t.rank").as("rank"))
    counts.join(top, Seq("source", "first_ord"))
      .withColumn("p", col("cnt") / sum("cnt").over(Window.partitionBy("source")).cast("double"))
      .select("source", "bigram", "cnt", "rank", "p")
      .cache()
  }

  private val dliBigramSql: String =
    s"""SELECT source, bigram, cnt, rank,
       |  cnt / CAST(sum(cnt) OVER (PARTITION BY source) AS DOUBLE) AS p
       |FROM (
       |  SELECT source, bigram, cnt,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY cnt DESC, first_ord) AS BIGINT) AS rank
       |  FROM (
       |    SELECT source, bigram, CAST(count(*) AS BIGINT) AS cnt,
       |      min(doc_id * 1048576 + g) AS first_ord
       |    FROM (
       |      SELECT doc_id, source, w[g] || ' ' || w[g + 1] AS bigram, g
       |      FROM (
       |        SELECT doc_id, source, w, unnest(generate_series(1, len(w) - 1)) AS g
       |        FROM (SELECT doc_id, source, regexp_extract_all(lower(text), '${graft.functions.WordScan.WordClass}') AS w FROM documents)
       |      )
       |    )
       |    GROUP BY source, bigram
       |  )
       |) WHERE rank <= 100""".stripMargin

  val dliBigrams = Q(
    "ma_dli_bigrams",
    s"""SELECT source, bigram, cnt, rank, round(1e-9 + p, 6) AS p
       |FROM ($dliBigramSql)
       |ORDER BY source, rank""".stripMargin) { (spark, dir) =>
    dliBigramDf(spark, dir)
      .select(col("source"), col("bigram"), col("cnt"), col("rank"), round(lit(1e-9) + col("p"), 6).as("p"))
      .orderBy("source", "rank")
  }

  // ═══════════════ DLI: pairwise compare (JS divergence + blend) ═══════════════
  // Reference: dli.py:36-57 (_js_divergence), 116-140 (_compute_behavior_similarity)

  val dliCompare = Q(
    "ma_dli_compare", {
      val dot = dliFeatureNames.map(c => s"a.$c * b.$c").mkString(" + ")
      val na = dliFeatureNames.map(c => s"a.$c * a.$c").mkString(" + ")
      val nb = dliFeatureNames.map(c => s"b.$c * b.$c").mkString(" + ")
      s"""WITH dist AS ($dliBigramSql),
         |sig AS ($dliSigSql),
         |pairs AS (
         |  SELECT a.source AS model_a, b.source AS model_b
         |  FROM (SELECT DISTINCT source FROM documents) a
         |  JOIN (SELECT DISTINCT source FROM documents) b ON a.source < b.source
         |),
         |termp AS (
         |  SELECT p.model_a, p.model_b,
         |    sum(da.p * ln(da.p / ((da.p + coalesce(db.p, ${d("0")})) / 2))) AS kl_pm
         |  FROM pairs p
         |  JOIN dist da ON da.source = p.model_a
         |  LEFT JOIN dist db ON db.source = p.model_b AND db.bigram = da.bigram
         |  GROUP BY p.model_a, p.model_b
         |),
         |termq AS (
         |  SELECT p.model_a, p.model_b,
         |    sum(db.p * ln(db.p / ((db.p + coalesce(da.p, ${d("0")})) / 2))) AS kl_qm
         |  FROM pairs p
         |  JOIN dist db ON db.source = p.model_b
         |  LEFT JOIN dist da ON da.source = p.model_a AND da.bigram = db.bigram
         |  GROUP BY p.model_a, p.model_b
         |),
         |feat AS (
         |  SELECT a.source AS model_a, b.source AS model_b,
         |    CASE WHEN sqrt($na) * sqrt($nb) = 0 THEN ${d("0")}
         |      ELSE ($dot) / (sqrt($na) * sqrt($nb)) END AS feat_cos
         |  FROM sig a JOIN sig b ON a.source < b.source
         |)
         |SELECT model_a, model_b,
         |  round(1e-9 + js, 6) AS js_divergence,
         |  round(1e-9 + bigram_sim, 6) AS bigram_sim,
         |  round(1e-9 + feat_cos, 6) AS feature_cos,
         |  round(1e-9 + similarity, 6) AS similarity,
         |  similarity >= ${d("0.80")} AS is_derived,
         |  round(1e-9 + least(abs(similarity - ${d("0.80")}) / ${d("0.2")}, ${d("1")}), 6) AS confidence
         |FROM (
         |  SELECT model_a, model_b, js, bigram_sim, feat_cos,
         |    bigram_sim * ${d("0.4")} + feat_cos * ${d("0.6")} AS similarity
         |  FROM (
         |    SELECT t1.model_a, t1.model_b,
         |      (t1.kl_pm + t2.kl_qm) / 2 AS js,
         |      1 - least(((t1.kl_pm + t2.kl_qm) / 2) / ln(2), ${d("1")}) AS bigram_sim,
         |      f.feat_cos
         |    FROM termp t1
         |    JOIN termq t2 ON t1.model_a = t2.model_a AND t1.model_b = t2.model_b
         |    JOIN feat f ON t1.model_a = f.model_a AND t1.model_b = f.model_b
         |  )
         |)
         |ORDER BY model_a, model_b""".stripMargin
    }) { (spark, dir) =>
    val dist = dliBigramDf(spark, dir).select("source", "bigram", "p")
    val sources = dist.select("source").distinct()
    val pairs = sources.select(col("source").as("model_a"))
      .join(sources.select(col("source").as("model_b")), col("model_a") < col("model_b"))

    def klTerm(fromA: Boolean): DataFrame = {
      val (mainSrc, otherSrc) = if (fromA) ("model_a", "model_b") else ("model_b", "model_a")
      val main = dist.select(col("source").as("ms"), col("bigram"), col("p").as("pm"))
      val other = dist.select(col("source").as("os"), col("bigram").as("ob"), col("p").as("po"))
      pairs
        .join(main, col(mainSrc) === col("ms"))
        .join(other, col(otherSrc) === col("os") && col("bigram") === col("ob"), "left")
        .groupBy("model_a", "model_b")
        .agg(sum(col("pm") * log(col("pm") / ((col("pm") + coalesce(col("po"), lit(0d))) / 2)))
          .as(if (fromA) "kl_pm" else "kl_qm"))
    }

    val js = klTerm(fromA = true).join(klTerm(fromA = false), Seq("model_a", "model_b"))
      .select(col("model_a"), col("model_b"), ((col("kl_pm") + col("kl_qm")) / 2).as("js"))

    val sig = dliSigDf(spark, dir)
    val a = sig.select(col("source").as("model_a") +: dliFeatureNames.map(c => col(c).as(s"a_$c")): _*)
    val b = sig.select(col("source").as("model_b") +: dliFeatureNames.map(c => col(c).as(s"b_$c")): _*)
    val dot = dliFeatureNames.map(c => col(s"a_$c") * col(s"b_$c")).reduce(_ + _)
    val na = sqrt(dliFeatureNames.map(c => col(s"a_$c") * col(s"a_$c")).reduce(_ + _))
    val nb = sqrt(dliFeatureNames.map(c => col(s"b_$c") * col(s"b_$c")).reduce(_ + _))
    val feat = a.join(b, col("model_a") < col("model_b"))
      .select(col("model_a"), col("model_b"),
        when(na * nb === 0d, 0d).otherwise(dot / (na * nb)).as("feat_cos"))

    js.join(feat, Seq("model_a", "model_b"))
      .withColumn("bigram_sim", lit(1d) - least(col("js") / log(lit(2d)), lit(1d)))
      .withColumn("similarity", col("bigram_sim") * 0.4 + col("feat_cos") * 0.6)
      .select(
        col("model_a"), col("model_b"),
        round(lit(1e-9) + col("js"), 6).as("js_divergence"),
        round(lit(1e-9) + col("bigram_sim"), 6).as("bigram_sim"),
        round(lit(1e-9) + col("feat_cos"), 6).as("feature_cos"),
        round(lit(1e-9) + col("similarity"), 6).as("similarity"),
        (col("similarity") >= 0.80).as("is_derived"),
        round(lit(1e-9) + least(abs(col("similarity") - 0.80) / 0.2, lit(1d)), 6).as("confidence"))
      .orderBy("model_a", "model_b")
  }

  val all: Seq[Q] = Seq(features, fingerprint, fpCompare, dliSignature, dliBigrams, dliCompare)
}
