package graft.operators

import graft.{Q, Tables}
import graft.functions.Hashing
import org.apache.spark.sql.functions._

/** Text-analysis family for training-data pipelines: token counting,
  * quality scoring, language identification, document fingerprinting.
  * All map-only column expressions — linear scale-out, no shuffle
  * beyond the output sort.
  */
object TextAnalysis {

  private def d(x: String): String = s"CAST($x AS DOUBLE)"

  /** BPE-ish pre-tokenizer: word runs | digit runs | single symbols. */
  private val bpeRe = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"

  val tokens = Q(
    "tx_tokens",
    s"""SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_ws_tokens,
       |  CAST(len(regexp_extract_all(text, '$bpeRe')) AS BIGINT) AS n_bpe_tokens
       |FROM documents
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(bpeRe), lit(0))).cast("long").as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  private val stopwords = Seq("the", "a", "of", "to", "and", "in", "is", "it", "that", "for")

  /** Quality score: length target + non-stopword share + word-length
    * shape + punctuation sanity, each in [0,1], fixed weights.
    */
  val quality = Q(
    "tx_quality", {
      val words = "string_split_regex(trim(lower(text)), '\\s+')"
      val sw = stopwords.map(s => s"'$s'").mkString("(", ", ", ")")
      s"""SELECT doc_id,
         |  round(1e-9 + len_score + 1e-9, 6) AS len_score,
         |  round(1e-9 + stop_ratio + 1e-9, 6) AS stop_ratio,
         |  round(1e-9 + wl_score + 1e-9, 6) AS wl_score,
         |  round(1e-9 + ${d("0.35")} * len_score + ${d("0.25")} * (1 - stop_ratio)
         |    + ${d("0.2")} * wl_score + ${d("0.2")} * (1 - least(punct_ratio * 10, ${d("1")})) + 1e-9, 6) AS quality
         |FROM (
         |  SELECT doc_id,
         |    least(n_words / ${d("100")}, ${d("1")}) AS len_score,
         |    n_stop / ${d("greatest(n_words, 1)")} AS stop_ratio,
         |    greatest(1 - abs(length(regexp_replace(text, '\\s+', '', 'g'))
         |      / ${d("greatest(n_words, 1)")} - 5) / 5, ${d("0")}) AS wl_score,
         |    (length(text) - length(regexp_replace(text, '[^.,;:!?]', '', 'g')))
         |      / ${d("greatest(length(text), 1)")} AS punct_ratio
         |  FROM (
         |    SELECT doc_id, text,
         |      len($words) AS n_words,
         |      len(list_filter($words, w -> w IN $sw)) AS n_stop
         |    FROM documents
         |  )
         |)
         |ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    val words = split(trim(lower(col("text"))), "\\s+")
    val nWords = size(words)
    val nStop = size(filter(words, w => stopwords.map(w === _).reduce(_ || _)))
    val denom = greatest(nWords, lit(1)).cast("double")
    val lenScore = least(nWords / lit(100).cast("double"), lit(1d))
    val stopRatio = nStop / denom
    val wlScore = greatest(
      lit(1d) - abs(length(regexp_replace(col("text"), "\\s+", "")) / denom - 5) / 5, lit(0d))
    val punctRatio = (length(col("text")) -
      length(regexp_replace(col("text"), "[^.,;:!?]", ""))) /
      greatest(length(col("text")), lit(1)).cast("double")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      round(lit(1e-9) + lenScore + 1e-9, 6).as("len_score"),
      round(lit(1e-9) + stopRatio + 1e-9, 6).as("stop_ratio"),
      round(lit(1e-9) + wlScore + 1e-9, 6).as("wl_score"),
      round(lit(1e-9) + lit(0.35) * lenScore + lit(0.25) * (lit(1d) - stopRatio)
        + lit(0.2) * wlScore + lit(0.2) * (lit(1d) - least(punctRatio * 10, lit(1d))) + 1e-9, 6)
        .as("quality"))
      .orderBy("doc_id")
  }

  /** Stopword/charset language-ID heuristic (en/fr/es/de/zh). */
  private val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un"),
    "es" -> Seq("el", "la", "los", "de", "y", "en"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"))

  val langid = Q(
    "tx_langid", {
      val words = "string_split_regex(trim(lower(text)), '\\s+')"
      val hitExprs = langStops.map { case (l, ws) =>
        val set = ws.map(w => s"'$w'").mkString("(", ", ", ")")
        s"CAST(len(list_filter($words, w -> w IN $set)) AS BIGINT) AS ${l}_hits"
      }
      s"""SELECT doc_id, en_hits, fr_hits, es_hits, de_hits, cjk_chars,
         |  CASE WHEN cjk_chars >= 10 THEN 'zh'
         |    WHEN en_hits >= fr_hits AND en_hits >= es_hits AND en_hits >= de_hits THEN 'en'
         |    WHEN fr_hits >= es_hits AND fr_hits >= de_hits THEN 'fr'
         |    WHEN es_hits >= de_hits THEN 'es'
         |    ELSE 'de' END AS pred_lang
         |FROM (
         |  SELECT doc_id, ${hitExprs.mkString(",\n  ")},
         |    CAST(length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS BIGINT) AS cjk_chars
         |  FROM documents
         |)
         |ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    // ONE native scan per doc (text_scan) replaces four interpreted
    // array-filter lambdas + a regexp_replace pass — the hit counts
    // and CJK counter are the same values field-by-field (see
    // TextScan); the two-projection shape keeps CollapseProject from
    // re-duplicating the scan per output column.
    val sc = graft.functions.HashExprs.text_scan(col("text"), langStops.map(_._2))
    val hitCols = langStops.zipWithIndex.map { case ((l, _), i) =>
      element_at(col("sc.hits"), i + 1).cast("long").as(s"${l}_hits")
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), sc.as("sc"))
      .select(col("doc_id") +: hitCols :+ col("sc.cjk").cast("long").as("cjk_chars"): _*)
      .withColumn("pred_lang",
        when(col("cjk_chars") >= 10, "zh")
          .when(col("en_hits") >= col("fr_hits") && col("en_hits") >= col("es_hits")
            && col("en_hits") >= col("de_hits"), "en")
          .when(col("fr_hits") >= col("es_hits") && col("fr_hits") >= col("de_hits"), "fr")
          .when(col("es_hits") >= col("de_hits"), "es")
          .otherwise("de"))
      .orderBy("doc_id")
  }

  // ═══════════════ trained language ID (fastText-LID shape) ═══════════════

  /** Feature buckets / weight scale for the trained language ID —
    * hashed bag-of-words into LidD buckets, integer weights scaled by
    * LidScale so scores stay BIGINT-exact cross-engine.
    */
  private val LidD = 256
  private val LidScale = 1048576L
  private[graft] val lidLangs = Seq("de", "en", "es", "fr", "zh")

  /** The tx_langid decision as a scalar SQL CASE over precomputed hit
    * columns (en_hits…de_hits, cjk_chars) — shared by the tx_langid_clf
    * oracle's label CTEs.
    */
  private val heurCaseSql: String =
    """CASE WHEN cjk_chars >= 10 THEN 'zh'
      |    WHEN en_hits >= fr_hits AND en_hits >= es_hits AND en_hits >= de_hits THEN 'en'
      |    WHEN fr_hits >= es_hits AND fr_hits >= de_hits THEN 'fr'
      |    WHEN es_hits >= de_hits THEN 'es'
      |    ELSE 'de' END""".stripMargin

  private def heurHitsSql(rel: String): String = {
    val words = "string_split_regex(trim(lower(text)), '\\s+')"
    val langHits = langStops.map { case (l, ws) =>
      val set = ws.map(w => s"'$w'").mkString("(", ", ", ")")
      s"len(list_filter($words, w -> w IN $set)) AS ${l}_hits"
    }.mkString(",\n      ")
    s"""SELECT *,
       |      $langHits,
       |      length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk_chars
       |    FROM $rel""".stripMargin
  }

  /** tx_langid_clf over any (doc_id, text) frame — the registered
    * query runs it on the corpus; LangidClfSpec runs it on a planted
    * multilingual fixture to pin out-of-sample accuracy.
    */
  private[graft] def langidClfOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Distillation labels: the tx_langid heuristic on the TRAIN split
    // (doc_id % 10 < 8 — the engine's base/delta convention), computed
    // inline so the seed pass stays map-only (no label join against
    // the exploded token relation).
    val seedCnt = docs.filter(col("doc_id") % 10 < 8)
      .select(predLangExpr.as("lang"),
        explode(Hashing.wordHashes(col("text"))).as("h"))
      .groupBy(col("lang"), (col("h") % LidD).as("j"))
      .agg(count(lit(1)).as("c"))
    val tot = seedCnt.groupBy("lang").agg(sum("c").as("tot"))
    // Dense D×L integer weight matrix (Laplace-smoothed class-
    // conditional bucket frequencies, floor-scaled — pure BIGINT
    // arithmetic, so the argmax is bit-exact on any engine).
    val grid = lidLangs.toDF("lang")
      .crossJoin(spark.range(LidD).select(col("id").as("j")))
    val w = grid
      .join(seedCnt, Seq("lang", "j"), "left")
      .join(tot, Seq("lang"), "left")
      .select(col("lang"), col("j"),
        expr(s"((coalesce(c, 0L) + 1L) * $LidScale) div (coalesce(tot, 0L) + $LidD)").as("w"))
    // one wide row per bucket → the whole model is LidD rows, broadcast
    val wCols = lidLangs.map(l => max(when(col("lang") === l, col("w"))).as(s"w_$l"))
    val ww = w.groupBy("j").agg(wCols.head, wCols.tail: _*)
    val tok = docs.select(col("doc_id"),
      explode(Hashing.wordHashes(col("text"))).as("h"))
      .select(col("doc_id"), (col("h") % LidD).as("j"))
    val sc = tok.join(broadcast(ww), Seq("j"))
      .groupBy("doc_id")
      .agg(lidLangs.map(l => sum(col(s"w_$l")).as(s"s_$l")).head,
        lidLangs.map(l => sum(col(s"w_$l")).as(s"s_$l")).tail: _*)
    val lab = docs.select(col("doc_id"), predLangExpr.as("heur_lang"))
    val f0 = lab.join(sc, Seq("doc_id"), "left")
      .select(col("doc_id") +: col("heur_lang") +:
        lidLangs.map(l => coalesce(col(s"s_$l"), lit(0L)).as(s"s_$l")): _*)
    val Seq(sde, sen, ses, sfr, szh) = lidLangs.map(l => col(s"s_$l"))
    val pred = when(sde >= sen && sde >= ses && sde >= sfr && sde >= szh, "de")
      .when(sen >= ses && sen >= sfr && sen >= szh, "en")
      .when(ses >= sfr && ses >= szh, "es")
      .when(sfr >= szh, "fr")
      .otherwise("zh")
    f0.withColumn("pred_lang", pred)
      .withColumn("agree", col("pred_lang") === col("heur_lang"))
  }

  /** tx_langid_clf — TRAINED multi-class language ID (the fastText-LID
    * architecture: hashed bag-of-words → per-class linear weights →
    * argmax; Joulin et al. 2017), distilling the tx_langid heuristic
    * the way Classifier.train distills the tx_quality gate. Weights
    * are Laplace-smoothed class-conditional bucket frequencies from
    * the train split's heuristic labels, floor-scaled to integers, so
    * the per-class scores — and therefore the argmax — are BIGINT-
    * exact and the oracle hash-checks a trained-model inference
    * end-to-end.
    *
    * Scale shape: the seed pass is map-only (labels computed inline,
    * never joined against the exploded tokens) feeding a ≤ L·D-row
    * aggregate; the model is a LidD-row broadcast; inference is one
    * partial-aggregated shuffle keyed by doc_id. At 100 TB the weight
    * table is trained once and broadcast — the same serve plan.
    * Out-of-sample accuracy (and where it beats the heuristic it was
    * distilled from) is pinned on a planted multilingual fixture in
    * LangidClfSpec.
    */
  /** The trained-LID CTE chain ending in `preds` (doc_id, heur_lang,
    * per-language scores, pred_lang) — shared by the tx_langid_clf
    * oracle and pipe_curate_clf's funnel oracle.
    */
  private[graft] lazy val langidClfCtesSql: String = {
    val wh = Hashing.wordHashesSql("text")
    val caseSql =
      s"""CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |    WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |    WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |    WHEN s_fr >= s_zh THEN 'fr'
         |    ELSE 'zh' END""".stripMargin
    s"""seedtok AS (
       |  SELECT lang, unnest($wh) % $LidD AS j FROM (
       |    SELECT text, $heurCaseSql AS lang
       |    FROM (${heurHitsSql("documents WHERE doc_id % 10 < 8")}))),
       |seedcnt AS (
       |  SELECT lang, j, CAST(count(*) AS BIGINT) AS c FROM seedtok GROUP BY lang, j),
       |tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tot FROM seedcnt GROUP BY lang),
       |grid AS (
       |  SELECT l.lang, r.j
       |  FROM (SELECT unnest([${lidLangs.map(l => s"'$l'").mkString(", ")}]) AS lang) l
       |  CROSS JOIN (SELECT unnest(range($LidD)) AS j) r),
       |w AS (
       |  SELECT g.lang, g.j,
       |    ((COALESCE(s.c, 0) + 1) * $LidScale) // (COALESCE(t.tot, 0) + $LidD) AS w
       |  FROM grid g
       |  LEFT JOIN seedcnt s ON s.lang = g.lang AND s.j = g.j
       |  LEFT JOIN tot t ON t.lang = g.lang),
       |ww AS (
       |  SELECT j, ${lidLangs.map(l => s"max(CASE WHEN lang = '$l' THEN w END) AS w_$l").mkString(",\n    ")}
       |  FROM w GROUP BY j),
       |tok AS (SELECT doc_id, unnest($wh) % $LidD AS j FROM documents),
       |sc AS (
       |  SELECT doc_id, ${lidLangs.map(l => s"CAST(sum(w_$l) AS BIGINT) AS s_$l").mkString(",\n    ")}
       |  FROM tok JOIN ww USING (j) GROUP BY doc_id),
       |lab AS (
       |  SELECT doc_id, $heurCaseSql AS heur_lang
       |  FROM (${heurHitsSql("documents")})),
       |f0 AS (
       |  SELECT lab.doc_id, lab.heur_lang,
       |    ${lidLangs.map(l => s"COALESCE(sc.s_$l, 0) AS s_$l").mkString(",\n    ")}
       |  FROM lab LEFT JOIN sc ON sc.doc_id = lab.doc_id),
       |preds AS (
       |  SELECT *, $caseSql AS pred_lang
       |  FROM f0)""".stripMargin
  }

  val langidClf = Q(
    "tx_langid_clf",
    s"""WITH $langidClfCtesSql
       |SELECT doc_id, heur_lang, s_de, s_en, s_es, s_fr, s_zh, pred_lang,
       |  pred_lang = heur_lang AS agree
       |FROM preds
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    langidClfOf(Tables.documents(spark, dir)).orderBy("doc_id")
  }

  // ═══════════════ HTML boilerplate extraction gate ═══════════════

  /** Block-keep thresholds: a block survives when its tag-stripped
    * text is ≥ HtmlMinBlockChars AND its text density (text chars /
    * (text + tag chars)) is ≥ 0.7 — compared CROSS-MULTIPLIED in
    * integers (10·text ≥ 7·(text+tags)) so the gate is division-free
    * and bit-exact on any engine. Link-heavy navigation and footer
    * blocks fall far below the floor; body paragraphs sit near 1.
    */
  private val HtmlMinBlockChars = 25

  /** The synthesized page around each doc's text — the storage-side
    * twin of Multimodal's WAV/BMP synthesis: a real crawl front end
    * receives raw HTML; here the corpus text is wrapped in the
    * boilerplate (head/title/style, a link-only nav, a link-heavy
    * copyright footer) the extractor must strip back out.
    */
  private[graft] def htmlPageSql(textExpr: String): String =
    "concat('<html><head><title>Doc ', CAST(doc_id AS STRING), " +
      "'</title><style>p{margin:0}</style></head><body>" +
      "<div class=nav><a href=/>Home</a> <a href=/about>About</a></div><p>', " +
      s"$textExpr, " +
      "'</p><div class=footer><a href=/tos>Terms</a> <a href=/privacy>Privacy</a> " +
      "Copyright 2026 Example Corp. All rights reserved.</div></body></html>')"

  /** Engine-parameterized extraction fragments (DuckDB regexp_replace
    * needs the explicit 'g' flag; Spark is global by default).
    */
  private def htmlStrip(b: String, duck: Boolean): String =
    if (duck) s"regexp_replace($b, '<[^>]*>', '', 'g')"
    else s"regexp_replace($b, '<[^>]*>', '')"

  private def htmlKeepPred(duck: Boolean): String = {
    val t = s"length(trim(${htmlStrip("b", duck)}))"
    s"b -> $t >= $HtmlMinBlockChars AND 10 * $t >= " +
      s"7 * ($t + length(b) - length(${htmlStrip("b", duck)}))"
  }

  /** The kept-text expression over a bound `blocks` array column.
    * Coalesced to '' on BOTH engines: DuckDB's array_to_string returns
    * NULL for an empty list where Spark's array_join returns '', and
    * the coalesce also pins the NULL-text row to '' identically.
    */
  private def htmlKeptTextSql(duck: Boolean): String =
    if (duck)
      s"COALESCE(array_to_string(list_transform(list_filter(blocks, ${htmlKeepPred(duck = true)}), " +
        s"b -> trim(${htmlStrip("b", duck = true)})), ' '), '')"
    else
      s"coalesce(array_join(transform(filter(blocks, ${htmlKeepPred(duck = false)}), " +
        s"b -> trim(${htmlStrip("b", duck = false)})), ' '), '')"

  /** Spark-side extraction over any (doc_id, text[, …]) frame: wrap in
    * the synthesized page, strip <style> payloads, split into blocks
    * at block-level closers, keep high-density blocks, join their
    * stripped text. All array HOFs over one projection — map-only.
    * Returns the input columns plus html/blocks/kept_text.
    */
  private[graft] def htmlExtract(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs
      .withColumn("html", expr(htmlPageSql("text")))
      .withColumn("nostyle", expr("regexp_replace(html, '<style>[^<]*</style>', '')"))
      .withColumn("blocks", expr("split(nostyle, '</p>|</div>')"))
      .withColumn("kept_text", expr(htmlKeptTextSql(duck = false)))

  /** tx_html — boilerplate/text extraction: the gate a crawl-fed
    * pipeline runs before any quality scoring (tag stripping + a
    * text-density block filter in the Boilerpipe/trafilatura family,
    * reduced to regex + array HOFs so it stays map-only and engine-
    * exact). The round-trip flag pins end-to-end honesty: the text
    * recovered from the synthesized page must equal the original doc
    * text (true for every corpus doc; data-dependent on pathological
    * inputs, identically on both engines). HtmlSpec feeds raw-HTML
    * fixtures through the extractor into pipe_curate's funnel.
    */
  val html = Q(
    "tx_html", {
      val fold = Hashing.charFoldSql("kept_text")
      s"""SELECT doc_id,
         |  CAST(len(blocks) AS BIGINT) AS n_blocks,
         |  CAST(len(list_filter(blocks, ${htmlKeepPred(duck = true)})) AS BIGINT) AS n_kept,
         |  CAST(length(html) AS BIGINT) AS raw_chars,
         |  CAST(length(regexp_replace(nostyle, '<[^>]*>', '', 'g')) AS BIGINT) AS text_chars,
         |  CAST(length(kept_text) AS BIGINT) AS kept_chars,
         |  $fold AS kept_fp,
         |  kept_text = trim(text) AS recovered
         |FROM (
         |  SELECT doc_id, text, html, nostyle, blocks,
         |    ${htmlKeptTextSql(duck = true)} AS kept_text
         |  FROM (
         |    SELECT doc_id, text, html, nostyle,
         |      string_split_regex(nostyle, '</p>|</div>') AS blocks
         |    FROM (
         |      SELECT doc_id, text, html,
         |        regexp_replace(html, '<style>[^<]*</style>', '') AS nostyle
         |      FROM (SELECT doc_id, text, ${htmlPageSql("text")} AS html FROM documents))))
         |ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    htmlExtract(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(
        col("doc_id"),
        size(col("blocks")).cast("long").as("n_blocks"),
        expr(s"size(filter(blocks, ${htmlKeepPred(duck = false)}))").cast("long").as("n_kept"),
        length(col("html")).cast("long").as("raw_chars"),
        length(expr(htmlStrip("nostyle", duck = false))).cast("long").as("text_chars"),
        length(col("kept_text")).cast("long").as("kept_chars"),
        Hashing.charFold(col("kept_text")).as("kept_fp"),
        (col("kept_text") === trim(col("text"))).as("recovered"))
      .orderBy("doc_id")
  }

  /** Whole-document rolling polynomial fingerprint (content hash that
    * any engine can reproduce — unlike murmur/xxhash).
    */
  val fingerprint = Q(
    "tx_fingerprint",
    s"""SELECT doc_id, ${Hashing.charFoldSql("text")} AS fp
       |FROM documents
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"), Hashing.charFold(col("text")).as("fp"))
      .orderBy("doc_id")
  }

  // ═══════════════ curation pipeline ═══════════════

  /** Rounded quality score of col("text") — the single definition
    * shared by tx_quality, pipe_curate, and Streaming.curate, so the
    * batch funnel and the streaming filter can never disagree on what
    * "good" means.
    */
  /** Quality score of col("text") — the identical arithmetic the
    * regex/HOF formulation computed (and the oracle still spells out),
    * collapsed into ONE native scan of the text: the old stack paid
    * three full regexp_replace passes plus an interpreted array-filter
    * lambda per word, which checksum-mode runs adjudicated twice as
    * this family's dominant full-value cost (TextScan.quality documents
    * the operand-for-operand equivalence; QualityLangSpec pins it
    * against the original expression on the corpus + edge fixtures).
    */
  private[graft] def qualityExpr: org.apache.spark.sql.Column =
    graft.functions.HashExprs.quality_score(col("text"), Seq(stopwords))

  /** Predicted language of col("text") — self-contained form of the
    * tx_langid decision, shared with the streaming curation filter.
    * One native scan (TextScan.predLang) replaying the exact stop-hit
    * counts, CJK counter and CASE chain of the HOF formulation.
    */
  private[graft] def predLangExpr: org.apache.spark.sql.Column =
    graft.functions.HashExprs.pred_lang(col("text"), langStops.map(_._2))

  private[graft] val qualityFloor = 0.55

  /** End-to-end corpus curation funnel — the composite shape a
    * training-data pipeline actually runs: exact dedup (sha-256 keyed,
    * min-doc_id canonical), then language filter (keep 'en'), then
    * quality filter (keep >= 0.55), reported as per-source stage
    * counts plus the kept-docs quality mean.
    *
    * Scale shape: the enrichment (quality, language, hash) is map-only;
    * dedup shuffles (sha, doc_id) pairs — 40 bytes/doc, never the
    * text — and the canonical join is sha-keyed; the funnel report is
    * a map-side-combinable aggregation on source. No full-text
    * shuffle anywhere, so the plan survives a 100 TB corpus.
    */
  /** The enriched-docs CTE body shared by the pipe_curate oracle and
    * the pipe_e2e oracle: per-doc (doc_id, source, sha, quality,
    * pred_lang, tokens) computed from relation `rel` — the SQL twin
    * of the map-only enrichment stage (qualityExpr/predLangExpr +
    * whitespace token count).
    */
  private[graft] def enrichedSqlFrom(rel: String): String = {
    val words = "string_split_regex(trim(lower(text)), '\\s+')"
    val sw = stopwords.map(s => s"'$s'").mkString("(", ", ", ")")
    val langHits = langStops.map { case (l, ws) =>
      val set = ws.map(w => s"'$w'").mkString("(", ", ", ")")
      s"len(list_filter($words, w -> w IN $set)) AS ${l}_hits"
    }.mkString(",\n      ")
    s"""SELECT doc_id, source, sha256(text) AS sha,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tokens,
       |    round(1e-9 + ${d("0.35")} * least(n_words / ${d("100")}, ${d("1")})
       |      + ${d("0.25")} * (1 - n_stop / ${d("greatest(n_words, 1)")})
       |      + ${d("0.2")} * greatest(1 - abs(length(regexp_replace(text, '\\s+', '', 'g'))
       |          / ${d("greatest(n_words, 1)")} - 5) / 5, ${d("0")})
       |      + ${d("0.2")} * (1 - least((length(text) - length(regexp_replace(text, '[^.,;:!?]', '', 'g')))
       |          / ${d("greatest(length(text), 1)")} * 10, ${d("1")})) + 1e-9, 6) AS quality,
       |    CASE WHEN cjk_chars >= 10 THEN 'zh'
       |      WHEN en_hits >= fr_hits AND en_hits >= es_hits AND en_hits >= de_hits THEN 'en'
       |      WHEN fr_hits >= es_hits AND fr_hits >= de_hits THEN 'fr'
       |      WHEN es_hits >= de_hits THEN 'es'
       |      ELSE 'de' END AS pred_lang
       |  FROM (
       |    SELECT doc_id, source, text,
       |      len($words) AS n_words,
       |      len(list_filter($words, w -> w IN $sw)) AS n_stop,
       |      length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk_chars,
       |      $langHits
       |    FROM $rel
       |  )""".stripMargin
  }

  val curate = Q(
    "pipe_curate", {
      s"""WITH enriched AS (
         |  ${enrichedSqlFrom("documents")}
         |),
         |canon AS (SELECT sha, min(doc_id) AS canonical_id FROM enriched GROUP BY sha)
         |SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(*) FILTER (WHERE doc_id != canonical_id) AS BIGINT) AS n_dup_dropped,
         |  CAST(count(*) FILTER (WHERE doc_id = canonical_id AND pred_lang != 'en') AS BIGINT) AS n_lang_dropped,
         |  CAST(count(*) FILTER (WHERE doc_id = canonical_id AND pred_lang = 'en'
         |    AND quality < ${d("0.55")}) AS BIGINT) AS n_quality_dropped,
         |  CAST(count(*) FILTER (WHERE doc_id = canonical_id AND pred_lang = 'en'
         |    AND quality >= ${d("0.55")}) AS BIGINT) AS n_kept,
         |  round(1e-9 + avg(quality) FILTER (WHERE doc_id = canonical_id AND pred_lang = 'en'
         |    AND quality >= ${d("0.55")}) + 1e-9, 6) AS avg_quality_kept
         |FROM enriched JOIN canon USING (sha)
         |GROUP BY source
         |ORDER BY source""".stripMargin
    }) { (spark, dir) =>
    curateOf(Tables.documents(spark, dir))
  }

  /** The pipe_curate funnel over any (doc_id, source, text) frame —
    * the registered query runs it on the corpus; HtmlSpec runs it on
    * raw-HTML fixtures routed through the tx_html extractor.
    */
  private[graft] def curateOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    curateFunnel(docs
      .select(col("doc_id"), col("source"), sha2(col("text"), 256).as("sha"),
        qualityExpr.as("quality"), predLangExpr.as("pred_lang")))

  /** The funnel aggregation over an enriched (doc_id, source, sha,
    * quality, pred_lang) frame — shared by the heuristic-gated
    * pipe_curate and the trained-gate pipe_curate_clf.
    */
  private def curateFunnel(enriched: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // canonical per content hash: 40-byte (sha, doc_id) shuffle, never
    // the text; joined back sha-keyed (same partitioning, AQE reuses)
    val canon = enriched.groupBy("sha").agg(min("doc_id").as("canonical_id"))
    val isCanon = col("doc_id") === col("canonical_id")
    val kept = isCanon && col("pred_lang") === "en" && col("quality") >= qualityFloor
    enriched.join(canon, "sha")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(!isCanon, 1)).as("n_dup_dropped"),
        count(when(isCanon && col("pred_lang") =!= "en", 1)).as("n_lang_dropped"),
        count(when(isCanon && col("pred_lang") === "en" && col("quality") < qualityFloor, 1))
          .as("n_quality_dropped"),
        count(when(kept, 1)).as("n_kept"),
        round(lit(1e-9) + avg(when(kept, col("quality"))) + 1e-9, 6).as("avg_quality_kept"))
      .orderBy("source")
  }

  /** pipe_curate_clf — the curation funnel with the TRAINED language
    * gate: identical dedup/quality stages, but the language drop is
    * tx_langid_clf's model prediction instead of the stopword
    * heuristic — the production upgrade a pipeline makes once the
    * distilled LID beats its teacher out of distribution (pinned in
    * LangidClfSpec). Registered alongside pipe_curate so the two
    * gates stay directly comparable per round; the extra cost over
    * the heuristic funnel is one doc_id-keyed join of the ≤ LidD-row-
    * model scores — the seed pass and broadcast model are shared
    * shapes with tx_langid_clf.
    */
  val curateClf = Q(
    "pipe_curate_clf",
    s"""WITH $langidClfCtesSql,
       |enr AS (
       |  SELECT e.doc_id, e.source, e.sha, e.quality, p.pred_lang
       |  FROM (
       |  ${enrichedSqlFrom("documents")}
       |  ) e JOIN preds p ON p.doc_id = e.doc_id),
       |canon AS (SELECT sha, min(doc_id) AS canonical_id FROM enr GROUP BY sha)
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(*) FILTER (WHERE doc_id != canonical_id) AS BIGINT) AS n_dup_dropped,
       |  CAST(count(*) FILTER (WHERE doc_id = canonical_id AND pred_lang != 'en') AS BIGINT) AS n_lang_dropped,
       |  CAST(count(*) FILTER (WHERE doc_id = canonical_id AND pred_lang = 'en'
       |    AND quality < ${d("0.55")}) AS BIGINT) AS n_quality_dropped,
       |  CAST(count(*) FILTER (WHERE doc_id = canonical_id AND pred_lang = 'en'
       |    AND quality >= ${d("0.55")}) AS BIGINT) AS n_kept,
       |  round(1e-9 + avg(quality) FILTER (WHERE doc_id = canonical_id AND pred_lang = 'en'
       |    AND quality >= ${d("0.55")}) + 1e-9, 6) AS avg_quality_kept
       |FROM enr JOIN canon USING (sha)
       |GROUP BY source
       |ORDER BY source""".stripMargin) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val enriched = docs
      .select(col("doc_id"), col("source"), sha2(col("text"), 256).as("sha"),
        qualityExpr.as("quality"))
      .join(langidClfOf(docs).select(col("doc_id"), col("pred_lang")), "doc_id")
      .select("doc_id", "source", "sha", "quality", "pred_lang")
    curateFunnel(enriched)
  }

  // ═══════════════ training-shard packing ═══════════════

  /** Docs per source packed into fixed token-budget training shards:
    * shard_id = floor(exclusive-prefix-token-sum / budget) in doc_id
    * order — the deterministic "cut the corpus into ~B-token files"
    * step at the end of a curation pipeline. The prefix sum uses the
    * ScalePrim two-pass shape, so no task ever sorts a whole source
    * (the naive window formulation would — the exact probe_idx
    * scale-killer the round-2 audit flagged).
    */
  private[graft] val shardBudget = 500L

  /** The funnel's whitespace token count of `text` — shared by
    * pipe_shard, the e2e funnels and the shard writer so "tokens"
    * can never drift between the planner and the files on disk.
    */
  private[graft] def tokenCountExpr: org.apache.spark.sql.Column =
    size(split(trim(col("text")), "\\s+")).cast("long")

  val shard = Q(
    "pipe_shard",
    s"""SELECT source, CAST(floor(pre / ${d(shardBudget.toString)}) AS BIGINT) AS shard_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(tokens) AS BIGINT) AS tokens_total,
       |  CAST(min(doc_id) AS BIGINT) AS first_doc,
       |  CAST(max(doc_id) AS BIGINT) AS last_doc
       |FROM (
       |  SELECT doc_id, source, tokens,
       |    coalesce(sum(tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
       |  FROM (
       |    SELECT doc_id, source,
       |      len(string_split_regex(trim(text), '\\s+')) AS tokens
       |    FROM documents
       |  )
       |)
       |GROUP BY source, shard_id
       |ORDER BY source, shard_id""".stripMargin) { (spark, dir) =>
    val docsTok = Tables.documents(spark, dir).select(
      col("doc_id"), col("source"), tokenCountExpr.as("tokens"))
    ScalePrim.exclusivePrefixSum(docsTok, "source", "doc_id", col("tokens"))
      .withColumn("shard_id", floor(col("prefix") / lit(shardBudget).cast("double")).cast("long"))
      .groupBy("source", "shard_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("tokens").as("tokens_total"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("source", "shard_id")
  }

  // ═══════════════ corpus-wide heavy hitters ═══════════════

  private val topTermsK = 64

  /** The corpus vocabulary head: the 64 most frequent token hashes
    * with term frequency AND document frequency — the stopword /
    * IDF-head discovery pass a corpus analysis runs before tuning
    * quality heuristics (and the exact answer the q9_approx-style
    * sketches approximate).
    *
    * Scale shape: tokens collapse to (doc_id, h) → count in the scan
    * stage (the same Zipf-proof pre-aggregation as tx_unigram_ppl —
    * df needs it anyway), the vocab aggregation is evenly keyed by
    * hash, and the global top-64 rides the bounded-heap aggregate:
    * every partition carries at most k entries and merges map-side,
    * so the single-group final step sees partitions·k rows, not the
    * vocabulary. The df join back is a broadcast of the 64 winners
    * streamed map-side over the vocab frame — the vocabulary itself
    * is never sorted, collected, or shuffled to one task.
    */
  val topterms = Q(
    "tx_topterms", {
      val whSql = Hashing.wordHashesSql("text")
      s"""WITH wh AS (SELECT doc_id, unnest($whSql) AS h FROM documents),
         |dc AS (SELECT doc_id, h, CAST(count(*) AS BIGINT) AS c FROM wh GROUP BY doc_id, h),
         |v AS (SELECT h, CAST(sum(c) AS BIGINT) AS tf, CAST(count(*) AS BIGINT) AS df
         |  FROM dc GROUP BY h),
         |r AS (SELECT h, tf, df,
         |    CAST(row_number() OVER (ORDER BY tf DESC, h) AS BIGINT) AS rank FROM v)
         |SELECT rank, h, tf, df FROM r WHERE rank <= $topTermsK
         |ORDER BY rank""".stripMargin
    }) { (spark, dir) =>
    val vocab = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Hashing.wordHashes(col("text"))).as("h"))
      .groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
      .groupBy("h").agg(sum("c").as("tf"), count(lit(1)).as("df"))
    // score = tf; the heap keeps the highest tf and breaks ties
    // toward the smaller hash, reproducing ORDER BY tf DESC, h.
    val top = vocab
      .agg(graft.functions.TopKAgg.topk_by_score(
        col("tf").cast("double"), col("h"), topTermsK).as("tk"))
      .select(explode(col("tk")).as("t"))
      .select(col("t.rank").as("rank"), col("t.id").as("h"))
    vocab.join(broadcast(top), "h")
      .select(col("rank"), col("h"), col("tf"), col("df"))
      .orderBy("rank")
  }

  // ═══════════════ PII scrub scan ═══════════════

  /** PII detection patterns — a deliberately conservative regex subset
    * (character classes, bounded repetition, `\b`) that Java regex and
    * RE2 interpret identically, so the DuckDB oracle reproduces every
    * match. Reference analog: the toolkit's style-marker scan
    * (style.py:241-302) is the same shape — per-text pattern-hit
    * counting — applied here to the redaction patterns a corpus-prep
    * pipeline runs before training.
    */
  private[graft] val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "url"   -> "https?://[^\\s]+",
    "phone" -> "\\b[0-9]{3}-[0-9]{4}\\b",
    "ipv4"  -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b")

  /** The synthetic corpus is a clean word bag, so — like the mm_*
    * family synthesizing RIFF payloads — the scan runs on a PII
    * channel injected deterministically from doc_id, identically in
    * Spark and the oracle. Every pattern gets real matches at every
    * SF (1/7 of docs carry an email, 1/11 a URL, 1/13 a phone, 1/17
    * an IPv4), so a regex-semantics divergence between the engines
    * cannot hide behind all-zero counts.
    */
  private[graft] def piiTextExpr(doc: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = concat(
    doc,
    when(id % 7 === 0,
      concat(lit(" contact user"), id.cast("string"), lit("@example.com now")))
      .otherwise(""),
    when(id % 11 === 0,
      concat(lit(" see https://example.org/d/"), id.cast("string"), lit(" ok")))
      .otherwise(""),
    when(id % 13 === 0,
      concat(lit(" call 555-"), (lit(1000) + id % 9000).cast("string"), lit(" now")))
      .otherwise(""),
    when(id % 17 === 0,
      concat(lit(" host 10.0."), (id % 256).cast("string"), lit("."),
        ((id * 7) % 256).cast("string"), lit(" up")))
      .otherwise(""))

  // single physical line: this snippet is interpolated into an outer
  // stripMargin template, where a line-leading `||` would be eaten
  private def piiTextSql: String = Seq(
    "text",
    "CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END",
    "CASE WHEN doc_id % 11 = 0 THEN ' see https://example.org/d/' || CAST(doc_id AS VARCHAR) || ' ok' ELSE '' END",
    "CASE WHEN doc_id % 13 = 0 THEN ' call 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR) || ' now' ELSE '' END",
    "CASE WHEN doc_id % 17 = 0 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || ' up' ELSE '' END"
  ).mkString(" || ")

  /** Per-pattern match counts + redaction size over col `t` — shared
    * by the batch query and Streaming.piiScan so stream and batch can
    * never disagree on what counts as PII. Redaction is sequential in
    * pattern order (email, url, phone, ipv4) in BOTH engines, so
    * pii_chars is well-defined even if a later pattern could overlap
    * an earlier match.
    */
  private[graft] def piiCols(t: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] = {
    val matches = piiPatterns.map { case (_, re) =>
      size(regexp_extract_all(t, lit(re), lit(0))).cast("long")
    }
    val counts = piiPatterns.zip(matches).map { case ((n, _), m) => m.as(s"n_$n") }
    val redacted = piiPatterns.foldLeft(t) { case (c, (_, re)) => regexp_replace(c, re, "") }
    counts ++ Seq(
      (matches.reduce(_ + _) > 0).as("has_pii"),
      (length(t) - length(redacted)).cast("long").as("pii_chars"))
  }

  /** PII scrub scan — the pre-training redaction pass every corpus
    * pipeline runs: per-doc counts of email / URL / phone / IPv4
    * matches, a has_pii keep/route flag, and the byte volume a
    * redaction would remove. Pure map-only column expressions (one
    * projection, no shuffle beyond the output sort) — linear
    * scale-out at 100 TB like the rest of the tx_* family.
    */
  val pii = Q(
    "tx_pii", {
      val countsSql = piiPatterns.map { case (n, re) =>
        s"CAST(len(regexp_extract_all(t2, '$re')) AS BIGINT) AS n_$n"
      }.mkString(",\n  ")
      val redactedSql = piiPatterns.foldLeft("t2") { case (c, (_, re)) =>
        s"regexp_replace($c, '$re', '', 'g')"
      }
      val total = piiPatterns.map { case (n, _) => s"n_$n" }.mkString(" + ")
      s"""SELECT doc_id, $countsSql,
         |  ($total) > 0 AS has_pii,
         |  CAST(length(t2) - length($redactedSql) AS BIGINT) AS pii_chars
         |FROM (
         |  SELECT doc_id,
         |    $piiTextSql AS t2
         |  FROM documents
         |)
         |ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"), piiTextExpr(col("text"), col("doc_id")).as("t2"))
      .select(col("doc_id") +: piiCols(col("t2")): _*)
      .orderBy("doc_id")
  }

  /** Shannon-entropy gibberish/boilerplate gate: per-doc character
    * entropy, whitespace-token entropy, type-token ratio, and the two
    * curation flags a mix designer filters on (low_entropy = repeated
    * filler, templated = low lexical diversity). The SQL formulation
    * explodes text into a corpus-sized (doc_id, char) shuffle — the
    * oracle does exactly that; the engine instead computes all four
    * stats in ONE native map-side expression (TextEntropyExpr, one
    * tight-loop pass per doc inside WholeStageCodegen), so the only
    * shuffle is the output sort. Flags compare the ROUNDED values, so
    * both engines decide on identical 4/6-dp inputs.
    */
  val entropy = Q(
    "tx_entropy",
    """WITH chars AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '')) AS ch, length(text) AS n
      |  FROM documents
      |),
      |chist AS (SELECT doc_id, ch, count(*) AS c, any_value(n) AS n FROM chars GROUP BY doc_id, ch),
      |ce AS (SELECT doc_id,
      |    round(1e-9 - sum((c / CAST(n AS DOUBLE)) * log2(c / CAST(n AS DOUBLE))), 4) AS char_entropy
      |  FROM chist GROUP BY doc_id),
      |words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |wf AS (SELECT doc_id, w, count(*) AS c FROM words WHERE w <> '' GROUP BY doc_id, w),
      |tot AS (SELECT doc_id, sum(c) AS n, count(*) AS types FROM wf GROUP BY doc_id),
      |we AS (SELECT wf.doc_id,
      |    round(1e-9 - sum((c / CAST(n AS DOUBLE)) * log2(c / CAST(n AS DOUBLE))), 4) AS word_entropy,
      |    CAST(any_value(types) AS BIGINT) AS n_types,
      |    CAST(any_value(n) AS BIGINT) AS n_tokens,
      |    round(1e-9 + any_value(types) / CAST(any_value(n) AS DOUBLE), 6) AS ttr
      |  FROM wf JOIN tot ON wf.doc_id = tot.doc_id GROUP BY wf.doc_id)
      |SELECT d.doc_id,
      |  coalesce(ce.char_entropy, 0) AS char_entropy,
      |  coalesce(we.word_entropy, 0) AS word_entropy,
      |  coalesce(we.n_types, 0) AS n_types,
      |  coalesce(we.n_tokens, 0) AS n_tokens,
      |  coalesce(we.ttr, 0) AS ttr,
      |  coalesce(we.word_entropy, 0) < 4.0 AS low_entropy,
      |  coalesce(we.ttr, 0) < 0.4 AS templated
      |FROM documents d
      |LEFT JOIN ce ON d.doc_id = ce.doc_id
      |LEFT JOIN we ON d.doc_id = we.doc_id
      |ORDER BY d.doc_id""".stripMargin) { (spark, dir) =>
    entropyEnrich(Tables.documents(spark, dir).select("doc_id", "text"))
      .drop("text")
      .orderBy("doc_id")
  }

  /** The tx_entropy projection as a reusable map-only enrichment —
    * ONE shared definition, so the streaming gate
    * (Streaming.entropyGate) and the batch query can never disagree
    * on a verdict. Adds the stat + flag columns to any frame with a
    * `text` column.
    */
  def entropyEnrich(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df
      .withColumn("st", graft.functions.EntropyExprs.text_entropy(col("text")))
      .withColumn("char_entropy", round(lit(1e-9) + col("st.char_entropy"), 4))
      .withColumn("word_entropy", round(lit(1e-9) + col("st.word_entropy"), 4))
      .withColumn("n_types", col("st.n_types"))
      .withColumn("n_tokens", col("st.n_tokens"))
      .withColumn("ttr", round(lit(1e-9) +
        col("st.n_types") / greatest(col("st.n_tokens"), lit(1L)).cast("double"), 6))
      .withColumn("low_entropy", col("word_entropy") < 4.0)
      .withColumn("templated", col("ttr") < 0.4)
      .drop("st")

  // ═══════════════ sequence packing ═══════════════

  private[graft] val packBudget = 512L

  /** Sequence packing — the concat-and-chunk layout LM pretraining
    * feeds the trainer: per source, documents concatenate in doc_id
    * order and split into fixed 512-token sequences ("packs"),
    * documents crossing pack boundaries wherever they fall. Output is
    * the per-pack manifest: how many docs touch the pack, how many
    * begin in it, and its filled token count (== budget except each
    * source's final pack) — what a data loader needs to seek, and
    * what attention-mask construction needs to know about document
    * boundaries per sequence.
    *
    * Scale shape: token offsets come from ScalePrim.exclusivePrefixSum
    * (the pipe_shard machinery — broadcast offsets with both documented
    * escalations past driver reach); the doc→packs explode emits
    * ceil(tokens/budget)+1 rows per doc, so the exploded relation is
    * bounded by corpus_tokens/budget + n_docs BY CONSTRUCTION — no
    * unbounded sequence() grid (the q27_gapfill fuzz lesson). All
    * boundary arithmetic is integer div on both engines.
    */
  val pack = Q(
    "pipe_pack",
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tokens
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, source, tokens,
       |    coalesce(sum(tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
       |  FROM t),
       |s AS (
       |  SELECT source, doc_id, tokens, st,
       |    CAST(st // $packBudget AS BIGINT) AS pf,
       |    CAST((st + tokens - 1) // $packBudget AS BIGINT) AS pl
       |  FROM p),
       |x AS (
       |  SELECT source, doc_id, tokens, st, pf,
       |    unnest(range(pf, pl + 1)) AS pack_id
       |  FROM s)
       |SELECT source, CAST(pack_id AS BIGINT) AS pack_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(*) FILTER (WHERE pf = pack_id) AS BIGINT) AS n_starts,
       |  CAST(sum(least((pack_id + 1) * $packBudget, st + tokens)
       |           - greatest(pack_id * $packBudget, st)) AS BIGINT) AS tokens_filled
       |FROM x
       |GROUP BY source, pack_id
       |ORDER BY source, pack_id""".stripMargin) { (spark, dir) =>
    val docsTok = Tables.documents(spark, dir).select(
      col("doc_id"), col("source"), tokenCountExpr.as("tokens"))
    ScalePrim.exclusivePrefixSum(docsTok, "source", "doc_id", col("tokens"))
      .withColumn("st", col("prefix"))
      .withColumn("pf", expr(s"st div $packBudget"))
      .withColumn("pl", expr(s"(st + tokens - 1) div $packBudget"))
      .select(col("source"), col("doc_id"), col("tokens"), col("st"), col("pf"),
        explode(sequence(col("pf"), col("pl"))).as("pack_id"))
      .groupBy("source", "pack_id")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("pf") === col("pack_id"), 1)).as("n_starts"),
        sum(least((col("pack_id") + 1) * packBudget, col("st") + col("tokens"))
          - greatest(col("pack_id") * packBudget, col("st"))).as("tokens_filled"))
      .orderBy("source", "pack_id")
  }

  // ═══════════════ corpus vocabulary statistics ═══════════════

  /** Per-source vocabulary composition: token volume, distinct types,
    * hapax legomena (frequency-1 types), type-token ratio and hapax
    * share — the corpus-level lexical-diversity profile (tx_entropy's
    * ttr is per-document; these numbers only exist at corpus altitude
    * — a source of near-identical boilerplate shows a collapsing
    * corpus TTR long before per-doc stats move).
    *
    * Scale shape: tokens collapse to (source, h) → count in the scan
    * stage (the engine's standard Zipf discipline — a stopword costs
    * one counter per map task, never a shuffled row per instance);
    * the per-source rollup then runs on |sources|·|vocab| rows.
    */
  val vocab = Q(
    "tx_vocab", {
      val whSql = Hashing.wordHashesSql("text")
      s"""WITH wh AS (SELECT doc_id, source, unnest($whSql) AS h FROM documents),
         |c AS (SELECT source, h, CAST(count(*) AS BIGINT) AS cnt
         |      FROM wh GROUP BY source, h)
         |SELECT source,
         |  CAST(sum(cnt) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS n_types,
         |  CAST(count(*) FILTER (WHERE cnt = 1) AS BIGINT) AS n_hapax,
         |  round(1e-9 + count(*) / CAST(sum(cnt) AS DOUBLE), 6) AS ttr,
         |  round(1e-9 + count(*) FILTER (WHERE cnt = 1) / CAST(count(*) AS DOUBLE), 6)
         |    AS hapax_share
         |FROM c
         |GROUP BY source
         |ORDER BY source""".stripMargin
    }) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("source"), explode(Hashing.wordHashes(col("text"))).as("h"))
      .groupBy("source", "h")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("source")
      .agg(
        sum("cnt").as("n_tokens"),
        count(lit(1)).as("n_types"),
        count(when(col("cnt") === 1, 1)).as("n_hapax"),
        round(lit(1e-9) + count(lit(1)) / sum("cnt").cast("double"), 6).as("ttr"),
        round(lit(1e-9) + count(when(col("cnt") === 1, 1)) / count(lit(1)).cast("double"), 6)
          .as("hapax_share"))
      .orderBy("source")
  }

  /** BPE tokenizer-training inner loop: corpus-wide adjacent
    * CHARACTER-pair frequencies within words (with multiplicity — the
    * statistic each BPE merge step maximizes), top-32 merge
    * candidates. A tokenizer trained on the corpus it will feed is
    * standard LLM practice; this is the distributed form of its
    * hottest computation (one merge round; subsequent rounds re-run
    * it over the re-segmented corpus).
    *
    * Scale shape: pure map-side pair synthesis — each doc's words
    * fold to their pair list via nested array HOFs inside the scan
    * stage, ONE explode feeds a map-side-combined count keyed by the
    * 2-char pair. The key space is bounded by |alphabet|² regardless
    * of corpus size, so the aggregated frame (and the single ordered
    * rank pass over it) is constant-sized — the one case where a
    * global sort needs no bounded-heap escape hatch.
    */
  val bpePairs = Q(
    "tx_bpe_pairs",
    """WITH p AS (
      |  SELECT unnest(flatten(list_transform(
      |      list_filter(string_split_regex(lower(trim(text)), '\s+'), w -> length(w) >= 2),
      |      w -> list_transform(range(1, length(w)), i -> substring(w, i, 2))))) AS pair
      |  FROM documents),
      |c AS (SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM p GROUP BY pair),
      |r AS (SELECT pair, cnt,
      |    CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rank FROM c)
      |SELECT rank, pair, cnt FROM r WHERE rank <= 32
      |ORDER BY rank""".stripMargin) { (spark, dir) =>
    val pairs = Tables.documents(spark, dir)
      .select(explode(flatten(transform(
        filter(split(lower(trim(col("text"))), "\\s+"), w => length(w) >= 2),
        w => transform(sequence(lit(1), length(w) - 1),
          i => w.substr(i, lit(2)))))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("pair"))
    pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 32)
      .select("rank", "pair", "cnt")
      .orderBy("rank")
  }

  /** Gopher-style hard quality rules (Rae et al. 2021, published
    * thresholds): unlike tx_quality's weighted score, each rule is a
    * hard boolean gate and a doc must clear ALL of them. Map-only —
    * one projection over the corpus, no shuffle at any scale; every
    * ratio is a quotient of identically-computed integers so the
    * boundary comparisons agree bit-exactly cross-engine.
    */
  val gopher = Q(
    "tx_gopher", {
      val words = "string_split_regex(trim(text), '\\s+')"
      val lwords = "string_split_regex(trim(lower(text)), '\\s+')"
      val sw = stopwords.map(s => s"'$s'").mkString("(", ", ", ")")
      s"""SELECT doc_id, n_words,
         |  round(1e-9 + mean_wl + 1e-9, 4) AS mean_word_len,
         |  round(1e-9 + symbol_ratio + 1e-9, 6) AS symbol_ratio,
         |  round(1e-9 + bullet_frac + 1e-9, 6) AS bullet_frac,
         |  round(1e-9 + ellipsis_frac + 1e-9, 6) AS ellipsis_frac,
         |  round(1e-9 + alpha_frac + 1e-9, 6) AS alpha_frac,
         |  stop_hits,
         |  n_words BETWEEN 50 AND 100000 AS r_words,
         |  mean_wl >= 3 AND mean_wl <= 10 AS r_wordlen,
         |  symbol_ratio <= 0.1 AS r_symbol,
         |  bullet_frac <= 0.9 AS r_bullet,
         |  ellipsis_frac <= 0.3 AS r_ellipsis,
         |  alpha_frac >= 0.8 AS r_alpha,
         |  stop_hits >= 2 AS r_stop,
         |  (n_words BETWEEN 50 AND 100000) AND mean_wl >= 3 AND mean_wl <= 10
         |    AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
         |    AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
         |    AND stop_hits >= 2 AS pass
         |FROM (
         |  SELECT doc_id,
         |    CAST(len($words) AS BIGINT) AS n_words,
         |    length(regexp_replace(text, '\\s+', '', 'g'))
         |      / ${d(s"greatest(len($words), 1)")} AS mean_wl,
         |    ((length(text) - length(replace(text, '#', '')))
         |      + (length(text) - length(replace(text, '...', ''))) // 3)
         |      / ${d(s"greatest(len($words), 1)")} AS symbol_ratio,
         |    len(list_filter(string_split(text, chr(10)), l ->
         |      starts_with(ltrim(l), '-') OR starts_with(ltrim(l), '*')
         |      OR starts_with(ltrim(l), '•')))
         |      / ${d("greatest(len(string_split(text, chr(10))), 1)")} AS bullet_frac,
         |    len(list_filter(string_split(text, chr(10)), l ->
         |      ends_with(rtrim(l), '...')))
         |      / ${d("greatest(len(string_split(text, chr(10))), 1)")} AS ellipsis_frac,
         |    len(list_filter($words, w -> regexp_matches(w, '[a-zA-Z]')))
         |      / ${d(s"greatest(len($words), 1)")} AS alpha_frac,
         |    CAST(len(list_filter($lwords, w -> w IN $sw)) AS BIGINT) AS stop_hits
         |  FROM documents
         |)
         |ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    gopherOf(Tables.documents(spark, dir)).orderBy("doc_id")
  }

  /** The tx_gopher rule battery over any (doc_id, text) frame —
    * exposed so specs can drive planted per-rule violations.
    */
  def gopherOf(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val words = split(trim(col("text")), "\\s+")
    val lwords = split(trim(lower(col("text"))), "\\s+")
    val lines = split(col("text"), "\n")
    val nWordsD = greatest(size(words), lit(1)).cast("double")
    val nLinesD = greatest(size(lines), lit(1)).cast("double")
    val meanWl = length(regexp_replace(col("text"), "\\s+", "")) / nWordsD
    val symbolRatio =
      ((length(col("text")) - length(regexp_replace(col("text"), "#", ""))) +
        ((length(col("text")) - length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3))
        .cast("double") / nWordsD
    val bulletFrac = size(filter(lines, l =>
      ltrim(l).startsWith("-") || ltrim(l).startsWith("*") || ltrim(l).startsWith("•")))
      .cast("double") / nLinesD
    val ellipsisFrac = size(filter(lines, l => rtrim(l).endsWith("...")))
      .cast("double") / nLinesD
    val alphaFrac = size(filter(words, _.rlike("[a-zA-Z]"))).cast("double") / nWordsD
    val stopHits = size(filter(lwords, w => stopwords.map(w === _).reduce(_ || _)))
      .cast("long")
    docs
      .select(col("doc_id"), size(words).cast("long").as("n_words"),
        meanWl.as("mean_wl"), symbolRatio.as("symbol_ratio"),
        bulletFrac.as("bullet_frac"), ellipsisFrac.as("ellipsis_frac"),
        alphaFrac.as("alpha_frac"), stopHits.as("stop_hits"))
      .select(
        col("doc_id"), col("n_words"),
        round(lit(1e-9) + col("mean_wl") + 1e-9, 4).as("mean_word_len"),
        round(lit(1e-9) + col("symbol_ratio") + 1e-9, 6).as("symbol_ratio"),
        round(lit(1e-9) + col("bullet_frac") + 1e-9, 6).as("bullet_frac"),
        round(lit(1e-9) + col("ellipsis_frac") + 1e-9, 6).as("ellipsis_frac"),
        round(lit(1e-9) + col("alpha_frac") + 1e-9, 6).as("alpha_frac"),
        col("stop_hits"),
        col("n_words").between(50, 100000).as("r_words"),
        (col("mean_wl") >= 3 && col("mean_wl") <= 10).as("r_wordlen"),
        (col("symbol_ratio") <= 0.1).as("r_symbol"),
        (col("bullet_frac") <= 0.9).as("r_bullet"),
        (col("ellipsis_frac") <= 0.3).as("r_ellipsis"),
        (col("alpha_frac") >= 0.8).as("r_alpha"),
        (col("stop_hits") >= 2).as("r_stop"),
        (col("n_words").between(50, 100000) &&
          col("mean_wl") >= 3 && col("mean_wl") <= 10 &&
          col("symbol_ratio") <= 0.1 && col("bullet_frac") <= 0.9 &&
          col("ellipsis_frac") <= 0.3 && col("alpha_frac") >= 0.8 &&
          col("stop_hits") >= 2).as("pass"))
  }

  /** pipe_card — the dataset card a corpus release ships: one row per
    * source with volume (docs, whitespace tokens), exact-dup rate
    * (global sha canonicalization — a doc duplicated ACROSS sources
    * counts against the copier), language share, and the two quality
    * gates' pass rates (the weighted tx_quality score vs the hard
    * tx_gopher battery — publishing both shows how much the gates
    * disagree). Everything is a rate the downstream consumer uses to
    * weigh the source in a mix.
    *
    * Scale shape: two map-only corpus scans (the curate enrichment
    * and the gopher battery) joined doc_id-keyed, the sha canon agg
    * shuffles 40-byte rows, and the final agg is |sources| rows. No
    * text ever exchanges.
    */
  val card = Q(
    "pipe_card", {
      val gopherSql = gopher.oracle.get.replaceAll("\nORDER BY doc_id$", "")
      s"""WITH enriched AS (
         |  ${enrichedSqlFrom("documents")}
         |),
         |canon AS (SELECT sha, min(doc_id) AS canonical_id FROM enriched GROUP BY sha),
         |g AS ($gopherSql)
         |SELECT e.source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(g.n_words) AS BIGINT) AS n_tokens,
         |  round(1e-9 + avg(g.n_words) + 1e-9, 4) AS avg_tokens,
         |  round(1e-9 + avg(CASE WHEN e.doc_id != canon.canonical_id THEN 1.0 ELSE 0.0 END) + 1e-9, 6) AS dup_rate,
         |  round(1e-9 + avg(CASE WHEN e.pred_lang = 'en' THEN 1.0 ELSE 0.0 END) + 1e-9, 6) AS en_share,
         |  round(1e-9 + avg(CASE WHEN e.quality >= ${d("0.55")} THEN 1.0 ELSE 0.0 END) + 1e-9, 6) AS quality_rate,
         |  round(1e-9 + avg(CASE WHEN g.pass THEN 1.0 ELSE 0.0 END) + 1e-9, 6) AS gopher_rate
         |FROM enriched e
         |JOIN canon USING (sha)
         |JOIN g ON g.doc_id = e.doc_id
         |GROUP BY e.source
         |ORDER BY e.source""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val enriched = docs.select(col("doc_id"), col("source"),
      sha2(col("text"), 256).as("sha"),
      qualityExpr.as("quality"), predLangExpr.as("pred_lang"))
    val canon = enriched.groupBy("sha").agg(min("doc_id").as("canonical_id"))
    val g = gopherOf(docs).select(col("doc_id"), col("n_words"), col("pass"))
    enriched.join(canon, "sha")
      .join(g, "doc_id")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_words").as("n_tokens"),
        round(lit(1e-9) + avg("n_words") + 1e-9, 4).as("avg_tokens"),
        round(lit(1e-9) + avg(when(col("doc_id") =!= col("canonical_id"), 1.0).otherwise(0.0)) + 1e-9, 6)
          .as("dup_rate"),
        round(lit(1e-9) + avg(when(col("pred_lang") === "en", 1.0).otherwise(0.0)) + 1e-9, 6)
          .as("en_share"),
        round(lit(1e-9) + avg(when(col("quality") >= qualityFloor, 1.0).otherwise(0.0)) + 1e-9, 6)
          .as("quality_rate"),
        round(lit(1e-9) + avg(when(col("pass"), 1.0).otherwise(0.0)) + 1e-9, 6)
          .as("gopher_rate"))
      .orderBy("source")
  }

  private val PmiMinPair = 5
  private val PmiTopK = 50

  /** PMI collocation mining — the top word pairs that co-occur
    * adjacently far more than chance: pmi = log2(P(ab)/(P(a)·P(b))).
    * The collocation head is what a corpus linguist (or a tokenizer-
    * merge audit) reads first; the min-pair-count floor kills PMI's
    * rare-pair bias before any join runs.
    *
    * Scale shape: the scan emits invertible bigram PACKS that
    * collapse to (doc, pack) → count before anything global (the
    * tx_bigram_ppl Zipf-proofing), the ≥[[PmiMinPair]] filter runs on
    * the |bigrams|-row aggregate BEFORE the two unigram joins (probe
    * side shrinks to the frequent pairs), both totals are 1-row
    * broadcasts, both unigram sides join the SAME vocab frame, and
    * the head is the bounded-heap top-k aggregate — no global sort,
    * no LM-table broadcast hint (100 TB vocab exceeds the driver).
    * PMI is computed with identical left-associated double
    * arithmetic in both engines and rounded 6 dp; ranking uses the
    * ROUNDED value + pack tiebreak so the top-k SET is engine-exact.
    */
  val pmi = Q(
    "tx_pmi", {
      val whSql = Hashing.wordHashesSql("text")
      val bpSql = Hashing.bigramPacksSql("wh")
      val P = Hashing.P
      s"""WITH wh AS (SELECT doc_id, $whSql AS wh FROM documents),
         |bpr AS (SELECT doc_id, unnest($bpSql) AS bp FROM wh),
         |dc AS (SELECT doc_id, bp, CAST(count(*) AS BIGINT) AS c FROM bpr GROUP BY doc_id, bp),
         |b AS (SELECT bp, CAST(sum(c) AS BIGINT) AS c_pair FROM dc GROUP BY bp),
         |n2 AS (SELECT CAST(sum(c_pair) AS DOUBLE) AS n2 FROM b),
         |uh AS (SELECT doc_id, unnest(wh) AS h FROM wh),
         |udc AS (SELECT doc_id, h, CAST(count(*) AS BIGINT) AS c FROM uh GROUP BY doc_id, h),
         |u AS (SELECT h, CAST(sum(c) AS BIGINT) AS cu FROM udc GROUP BY h),
         |n1 AS (SELECT CAST(sum(cu) AS DOUBLE) AS n1 FROM u),
         |s AS (SELECT b.bp, b.bp // $P AS w1, b.bp % $P AS w2, b.c_pair,
         |    u1.cu AS c1, u2.cu AS c2,
         |    round(1e-9 + log2(((CAST(b.c_pair AS DOUBLE) * n1) * n1) /
         |      ((n2 * CAST(u1.cu AS DOUBLE)) * CAST(u2.cu AS DOUBLE))), 6) AS pmi
         |  FROM b JOIN u u1 ON b.bp // $P = u1.h
         |         JOIN u u2 ON b.bp % $P = u2.h
         |         CROSS JOIN n1 CROSS JOIN n2
         |  WHERE b.c_pair >= $PmiMinPair),
         |r AS (SELECT *, CAST(row_number() OVER (ORDER BY pmi DESC, bp) AS BIGINT) AS rank FROM s)
         |SELECT rank, w1, w2, c_pair, c1, c2, pmi FROM r WHERE rank <= $PmiTopK
         |ORDER BY rank""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val b = docs
      .select(col("doc_id"),
        explode(Hashing.bigramPacks(Hashing.wordHashes(col("text")))).as("bp"))
      .groupBy("doc_id", "bp").agg(count(lit(1)).as("c"))
      .groupBy("bp").agg(sum("c").as("c_pair"))
    val n2 = b.agg(sum("c_pair").cast("double").as("n2"))
    val u = docs
      .select(col("doc_id"), explode(Hashing.wordHashes(col("text"))).as("h"))
      .groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
      .groupBy("h").agg(sum("c").as("cu"))
    val n1 = u.agg(sum("cu").cast("double").as("n1"))
    val P = Hashing.P
    val scored = b.filter(col("c_pair") >= PmiMinPair)
      .join(u.select(expr(s"h AS h1"), col("cu").as("c1")),
        expr(s"bp div $P") === col("h1"))
      .join(u.select(expr(s"h AS h2"), col("cu").as("c2")),
        expr(s"bp % $P") === col("h2"))
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .select(col("bp"), expr(s"bp div $P").as("w1"), expr(s"bp % $P").as("w2"),
        col("c_pair"), col("c1"), col("c2"),
        round(lit(1e-9) + log2(
          ((col("c_pair").cast("double") * col("n1")) * col("n1")) /
            ((col("n2") * col("c1").cast("double")) * col("c2").cast("double"))),
          6).as("pmi"))
    val top = scored
      .agg(graft.functions.TopKAgg.topk_by_score(
        col("pmi"), col("bp"), PmiTopK).as("tk"))
      .select(explode(col("tk")).as("t"))
      .select(col("t.rank").as("rank"), col("t.id").as("bp"))
    scored.join(broadcast(top), "bp")
      .select(col("rank"), col("w1"), col("w2"), col("c_pair"),
        col("c1"), col("c2"), col("pmi"))
      .orderBy("rank")
  }

  private val ZipfRanks = 200

  /** Zipf-law fit per source — the corpus-health diagnostic behind
    * every "does this source look like natural language" check: OLS
    * slope of log2(tf) on log2(rank) over the top [[ZipfRanks]] of
    * each source's term histogram (natural text sits near −1; a
    * templated or synthetic source flattens or cliffs). Composes the
    * engine's own primitives: the Zipf-proofed vocab build
    * (doc-level counts first, so one hot doc cannot skew a reducer),
    * per-source ranking via a window over the AGGREGATED vocab frame
    * (≪ corpus), and the q32 regression aggregate over ≤200 rows per
    * source. Rank ties break on the hash so both engines rank
    * identically.
    */
  val zipf = Q(
    "tx_zipf", {
      val whSql = Hashing.wordHashesSql("text")
      s"""WITH wh AS (SELECT doc_id, source, unnest($whSql) AS h FROM documents),
         |dc AS (SELECT doc_id, source, h, CAST(count(*) AS BIGINT) AS c
         |  FROM wh GROUP BY doc_id, source, h),
         |v AS (SELECT source, h, CAST(sum(c) AS BIGINT) AS tf FROM dc GROUP BY source, h),
         |r AS (SELECT source, h, tf, CAST(row_number() OVER (
         |    PARTITION BY source ORDER BY tf DESC, h) AS BIGINT) AS rank FROM v),
         |f AS (SELECT source, rank, tf FROM r WHERE rank <= $ZipfRanks)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_ranks,
         |  round(1e-9 + regr_slope(log2(CAST(tf AS DOUBLE)), log2(CAST(rank AS DOUBLE))), 6)
         |    AS zipf_slope,
         |  round(1e-9 + regr_r2(log2(CAST(tf AS DOUBLE)), log2(CAST(rank AS DOUBLE))), 6)
         |    AS fit_r2
         |FROM f GROUP BY source
         |ORDER BY source""".stripMargin
    }) { (spark, dir) =>
    val v = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(Hashing.wordHashes(col("text"))).as("h"))
      .groupBy("doc_id", "source", "h").agg(count(lit(1)).as("c"))
      .groupBy("source", "h").agg(sum("c").as("tf"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("tf").desc, col("h"))
    v.withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= ZipfRanks)
      .groupBy("source")
      .agg(count(lit(1)).as("n_ranks"),
        round(lit(1e-9) +
          expr("regr_slope(log2(CAST(tf AS DOUBLE)), log2(CAST(rank AS DOUBLE)))"),
          6).as("zipf_slope"),
        round(lit(1e-9) +
          expr("regr_r2(log2(CAST(tf AS DOUBLE)), log2(CAST(rank AS DOUBLE)))"),
          6).as("fit_r2"))
      .orderBy("source")
  }

  private val HeapsSteps = Seq(25L, 100L, 400L, 1600L, 6400L, 25600L, 102400L)

  /** Heaps-law vocabulary growth — tx_zipf's companion diagnostic:
    * distinct-term count V as a function of corpus token count N at
    * geometric doc-id prefixes, with the fitted exponent β of
    * V = K·N^β (natural language sits near 0.4–0.6; a
    * template-generated source saturates early and β collapses).
    *
    * The scalable algorithm is the FIRST-OCCURRENCE histogram: the
    * naive plan runs one distinct count per prefix (a 7-way
    * multi-distinct Expand over every token — the exact blowup the
    * q9_approx note documents). Instead ONE vocab aggregation
    * records each hash's first doc id; every prefix's vocab is then
    * a conditional count over the |vocab|-row frame, and every
    * prefix's token total a conditional sum over the |docs|-row
    * frame — the corpus is tokenized once, shuffled once. The β fit
    * is the q32 regression aggregate over ≤7 log-log points,
    * broadcast back onto the per-step rows.
    */
  val heaps = Q(
    "tx_heaps", {
      val whSql = Hashing.wordHashesSql("text")
      val steps = HeapsSteps.mkString("[", ", ", "]")
      s"""WITH wh AS (SELECT doc_id, unnest($whSql) AS h FROM documents),
         |f AS (SELECT h, min(doc_id) AS fst FROM wh GROUP BY h),
         |dtok AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM wh GROUP BY doc_id),
         |steps AS (SELECT unnest($steps) AS step),
         |per AS (SELECT s.step,
         |    (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM dtok
         |      WHERE doc_id < s.step) AS n_tokens,
         |    (SELECT CAST(count(*) AS BIGINT) FROM f WHERE fst < s.step) AS n_vocab
         |  FROM steps s),
         |pf AS (SELECT * FROM per WHERE n_vocab > 0),
         |fit AS (SELECT
         |    round(1e-9 + regr_slope(log2(CAST(n_vocab AS DOUBLE)),
         |      log2(CAST(n_tokens AS DOUBLE))), 6) AS heaps_beta,
         |    round(1e-9 + regr_r2(log2(CAST(n_vocab AS DOUBLE)),
         |      log2(CAST(n_tokens AS DOUBLE))), 6) AS fit_r2
         |  FROM pf)
         |SELECT step, n_tokens, n_vocab, heaps_beta, fit_r2
         |FROM pf CROSS JOIN fit
         |ORDER BY step""".stripMargin
    }) { (spark, dir) =>
    val s = spark
    import s.implicits._
    val wh = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Hashing.wordHashes(col("text"))).as("h"))
    val f = wh.groupBy("h").agg(min("doc_id").as("fst"))
    val dtok = wh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val steps = HeapsSteps.toDF("step")
    val vocabPer = f.join(broadcast(steps), col("fst") < col("step"))
      .groupBy("step").agg(count(lit(1)).as("n_vocab"))
    val tokPer = dtok.join(broadcast(steps), col("doc_id") < col("step"))
      .groupBy("step").agg(sum("n").as("n_tokens"))
    val per = vocabPer.join(tokPer, Seq("step"))
      .filter(col("n_vocab") > 0)
    val fit = per.agg(
      round(lit(1e-9) + expr(
        "regr_slope(log2(CAST(n_vocab AS DOUBLE)), log2(CAST(n_tokens AS DOUBLE)))"),
        6).as("heaps_beta"),
      round(lit(1e-9) + expr(
        "regr_r2(log2(CAST(n_vocab AS DOUBLE)), log2(CAST(n_tokens AS DOUBLE)))"),
        6).as("fit_r2"))
    per.crossJoin(broadcast(fit))
      .select(col("step"), col("n_tokens"), col("n_vocab"),
        col("heaps_beta"), col("fit_r2"))
      .orderBy("step")
  }

  /** Per-source readability profile — Flesch reading-ease on the
    * standard proxies: words = whitespace tokens (the tx_quality
    * split), sentences = runs of [.!?] floored at 1 (the word-bag
    * corpus often has none — then the doc is one long "sentence" and
    * the score is honestly low), syllables = vowel-letter runs (the
    * textbook approximation, no per-word floor — documented, same
    * formula both engines). Everything is a per-doc map-side regex
    * count feeding ONE |sources|-row hash aggregate: no joins, no
    * windows, no second scan — the cheapest possible shape, linear
    * and embarrassingly parallel at any corpus size.
    */
  val readability = Q(
    "tx_readability", {
      val words = "string_split_regex(trim(lower(text)), '\\s+')"
      s"""SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  round(1e-9 + avg(n_words), 4) AS avg_words,
         |  round(1e-9 + avg(wps), 4) AS avg_wps,
         |  round(1e-9 + avg(spw), 6) AS avg_spw,
         |  round(1e-9 + avg(206.835 - 1.015 * wps - 84.6 * spw), 4) AS avg_flesch
         |FROM (
         |  SELECT source, n_words,
         |    n_words / ${d("greatest(n_sent, 1)")} AS wps,
         |    n_syl / ${d("greatest(n_words, 1)")} AS spw
         |  FROM (
         |    SELECT source,
         |      len($words) AS n_words,
         |      len(regexp_extract_all(text, '[.!?]+')) AS n_sent,
         |      len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syl
         |    FROM documents))
         |GROUP BY source ORDER BY source""".stripMargin
    }) { (spark, dir) =>
    val nWords = size(split(trim(lower(col("text"))), "\\s+"))
    val nSent = size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
    val nSyl = size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
    val wps = nWords / greatest(nSent, lit(1)).cast("double")
    val spw = nSyl / greatest(nWords, lit(1)).cast("double")
    Tables.documents(spark, dir)
      .select(col("source"), nWords.as("n_words"), wps.as("wps"), spw.as("spw"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(lit(1e-9) + avg("n_words"), 4).as("avg_words"),
        round(lit(1e-9) + avg("wps"), 4).as("avg_wps"),
        round(lit(1e-9) + avg("spw"), 6).as("avg_spw"),
        round(lit(1e-9) + avg(lit(206.835) - lit(1.015) * col("wps") -
          lit(84.6) * col("spw")), 4).as("avg_flesch"))
      .orderBy("source")
  }

  /** Keyness: the terms that distinguish each source from the rest of
    * the corpus by Dunning's log-likelihood ratio G² — the corpus-
    * linguistics statistic behind "what is this slice about", used to
    * audit a mix's per-source vocabulary drift. Overuse-only (the
    * source's rate must exceed the corpus rate) with a min-count
    * floor of 5; terms ride as the tx_topterms word hashes. G² is
    * rounded to 6 dp BEFORE ranking so both engines rank the
    * identical key (raw ln tails differ in the last ulp), ties break
    * toward the smaller hash. Shape: the (source, term) count frame
    * aggregates once; per-term corpus totals come from a second
    * aggregate of THAT frame (never the token stream) joined back on
    * the term key; winners come from the bounded-heap top-k aggregate
    * — k rows per source per partition cross the exchange, the
    * vocabulary is never globally sorted (the row_number window lives
    * only in the oracle) — and the final detail join broadcasts the
    * |sources|·10 winner keys.
    */
  val keyness = Q(
    "tx_keyness", {
      val whSql = Hashing.wordHashesSql("text")
      s"""WITH tok AS (SELECT source, unnest($whSql) AS h FROM documents),
         |sc AS (SELECT source, h, CAST(count(*) AS BIGINT) AS a FROM tok GROUP BY source, h),
         |st AS (SELECT source, CAST(sum(a) AS BIGINT) AS src_tot FROM sc GROUP BY source),
         |vt AS (SELECT h, CAST(sum(a) AS BIGINT) AS tf FROM sc GROUP BY h),
         |n AS (SELECT CAST(sum(a) AS BIGINT) AS tot FROM sc),
         |g AS (
         |  SELECT sc.source, sc.h, sc.a, vt.tf - sc.a AS b,
         |    round(1e-9 + 2 * (sc.a * ln(sc.a / (st.src_tot * (${d("vt.tf")} / n.tot)))
         |      + CASE WHEN vt.tf - sc.a > 0
         |        THEN (vt.tf - sc.a) * ln((vt.tf - sc.a) /
         |          ((n.tot - st.src_tot) * (${d("vt.tf")} / n.tot)))
         |        ELSE 0 END), 6) AS g2
         |  FROM sc JOIN st USING (source) JOIN vt USING (h) CROSS JOIN n
         |  WHERE sc.a >= 5
         |    AND sc.a / ${d("st.src_tot")} > ${d("vt.tf")} / n.tot),
         |r AS (SELECT source, h, a, b, g2,
         |  CAST(row_number() OVER (PARTITION BY source ORDER BY g2 DESC, h) AS BIGINT) AS rank
         |  FROM g)
         |SELECT source, rank, h, a AS n_src, b AS n_rest, g2
         |FROM r WHERE rank <= 10 ORDER BY source, rank""".stripMargin
    }) { (spark, dir) =>
    // the (source, term) count frame feeds FOUR consumers (itself,
    // the per-source totals, the per-term totals, the corpus total) —
    // checkpoint it once so the corpus tokenize+explode runs exactly
    // once; everything downstream is vocabulary-scale
    val sc = Tables.documents(spark, dir)
      .select(col("source"), explode(Hashing.wordHashes(col("text"))).as("h"))
      .groupBy("source", "h").agg(count(lit(1)).as("a"))
      .localCheckpoint(true)
    val st = sc.groupBy("source").agg(sum("a").as("src_tot"))
    val vt = sc.groupBy("h").agg(sum("a").as("tf"))
    val n = sc.agg(sum("a").as("tot"))
    val rate = col("tf").cast("double") / col("tot")
    val b = col("tf") - col("a")
    val g = sc.join(st, "source").join(vt, "h").crossJoin(broadcast(n))
      .filter(col("a") >= 5 &&
        col("a") / col("src_tot").cast("double") > rate)
      .select(col("source"), col("h"), col("a"), b.as("b"),
        round(lit(1e-9) + lit(2) * (col("a") * log(col("a") / (col("src_tot") * rate)) +
          when(b > 0, b * log(b / ((col("tot") - col("src_tot")) * rate)))
            .otherwise(lit(0d))), 6).as("g2"))
    // score = g2 (already rounded): heap keeps the highest, ties
    // break toward the smaller hash — ORDER BY g2 DESC, h.
    val top = g.groupBy("source")
      .agg(graft.functions.TopKAgg.topk_by_score(col("g2"), col("h"), 10).as("tk"))
      .select(col("source"), explode(col("tk")).as("t"))
      .select(col("source"), col("t.rank").as("rank"), col("t.id").as("h"))
    val out = g.join(broadcast(top), Seq("source", "h"))
      .select(col("source"), col("rank"), col("h"),
        col("a").as("n_src"), col("b").as("n_rest"), col("g2"))
      .orderBy("source", "rank")
      .localCheckpoint(true)
    graft.operators.Dedup.releaseLocalCheckpoint(sc)
    out
  }

  /** Pairwise Jensen–Shannon divergence between source unigram
    * distributions — the information-theoretic "how different are
    * these corpus slices" measure a mix designer reads next to
    * ix_source_sim's cosine (JSD is a bounded metric on the full
    * distributions; cosine sees only shared mass). Only the SHARED
    * vocabulary needs the pair join: terms private to one side
    * contribute p·log2(2p/p) = p, so their total is 1 − Σ_shared p —
    * algebra, not an outer join. Shape: corpus tokenizes once into
    * the checkpointed (source, term) counts; probabilities are a
    * |sources|-row join back; the pair join runs on the vocabulary-
    * scale prob frame keyed on the term hash and collapses straight
    * into one |pairs|-row aggregate.
    */
  val jsd = Q(
    "tx_jsd", {
      val whSql = Hashing.wordHashesSql("text")
      s"""WITH tok AS (SELECT source, unnest($whSql) AS h FROM documents),
         |sc AS (SELECT source, h, CAST(count(*) AS BIGINT) AS a FROM tok GROUP BY source, h),
         |st AS (SELECT source, CAST(sum(a) AS BIGINT) AS src_tot FROM sc GROUP BY source),
         |sp AS (SELECT sc.source, sc.h, sc.a / ${d("st.src_tot")} AS p
         |  FROM sc JOIN st USING (source))
         |SELECT a.source AS source_a, b.source AS source_b,
         |  CAST(count(*) AS BIGINT) AS n_common,
         |  round(1e-9
         |    + 0.5 * (sum(a.p * log2(2 * a.p / (a.p + b.p))) + 1 - sum(a.p))
         |    + 0.5 * (sum(b.p * log2(2 * b.p / (a.p + b.p))) + 1 - sum(b.p)), 6) AS jsd
         |FROM sp a JOIN sp b ON a.h = b.h AND a.source < b.source
         |GROUP BY a.source, b.source
         |ORDER BY source_a, source_b""".stripMargin
    }) { (spark, dir) =>
    val sc = Tables.documents(spark, dir)
      .select(col("source"), explode(Hashing.wordHashes(col("text"))).as("h"))
      .groupBy("source", "h").agg(count(lit(1)).as("a"))
      .localCheckpoint(true)
    val st = sc.groupBy("source").agg(sum("a").as("src_tot"))
    val sp = sc.join(st, "source")
      .select(col("source"), col("h"),
        (col("a") / col("src_tot").cast("double")).as("p"))
    val a = sp.select(col("source").as("source_a"), col("h"), col("p").as("pa"))
    val b = sp.select(col("source").as("source_b"), col("h"), col("p").as("pb"))
    val out = a.join(b, Seq("h"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(
        count(lit(1)).as("n_common"),
        round(lit(1e-9)
          + lit(0.5) * (sum(col("pa") * log2(lit(2) * col("pa") / (col("pa") + col("pb"))))
            + lit(1) - sum(col("pa")))
          + lit(0.5) * (sum(col("pb") * log2(lit(2) * col("pb") / (col("pa") + col("pb"))))
            + lit(1) - sum(col("pb"))), 6).as("jsd"))
      .orderBy("source_a", "source_b")
      .localCheckpoint(true)
    graft.operators.Dedup.releaseLocalCheckpoint(sc)
    out
  }

  /** Language-ID confusion matrix against the corpus ground-truth
    * lang column — the model-eval artifact that sits between
    * tx_langid (heuristic) and production: per (true, predicted)
    * cell the count, the per-true-language recall share, and the
    * diagonal flag. ONE map-only prediction pass (the shared
    * heuristic expression) into a ≤\|langs\|²-row aggregate; the
    * recall window runs on that bounded matrix frame only.
    */
  val langidConfusion = Q(
    "tx_langid_confusion",
    s"""WITH pred AS (
       |  SELECT lang AS true_lang, $heurCaseSql AS pred_lang
       |  FROM (${heurHitsSql("documents")})),
       |m AS (SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
       |  FROM pred GROUP BY true_lang, pred_lang)
       |SELECT true_lang, pred_lang, n,
       |  round(1e-9 + n / CAST(sum(n) OVER (PARTITION BY true_lang) AS DOUBLE), 6)
       |    AS recall_share,
       |  true_lang = pred_lang AS correct
       |FROM m ORDER BY true_lang, pred_lang""".stripMargin) { (spark, dir) =>
    val w = org.apache.spark.sql.expressions.Window.partitionBy("true_lang")
    Tables.documents(spark, dir)
      .select(col("lang").as("true_lang"), predLangExpr.as("pred_lang"))
      .groupBy("true_lang", "pred_lang").agg(count(lit(1)).as("n"))
      .select(col("true_lang"), col("pred_lang"), col("n"),
        round(lit(1e-9) + col("n") / sum("n").over(w).cast("double"), 6)
          .as("recall_share"),
        (col("true_lang") === col("pred_lang")).as("correct"))
      .orderBy("true_lang", "pred_lang")
  }

  val all: Seq[Q] = Seq(tokens, quality, langid, langidClf, html, fingerprint, curate, curateClf, shard, topterms, pii,
    entropy, pack, vocab, bpePairs, gopher, card, pmi, zipf, heaps,
    readability, keyness, jsd, langidConfusion)
}
