package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared definitions for the model-audit operator family.
  *
  * Single source of truth: the style-family signatures, marker lists
  * and normalization ranges live here as Scala data, and BOTH the
  * Spark Column expressions and the DuckDB oracle SQL fragments are
  * generated from them — so the two sides cannot drift.
  *
  * Data ported from the reference's published constants:
  *  - llmmap style markers: /root/reference/src/modelaudit/methods/llmmap.py:37-43
  *  - normalization ranges: llmmap.py:105-114
  *  - DLI refusal/hedging/certainty lists: dli.py:83-110
  *  - family signatures: style.py:21-228
  */
object AuditDefs {

  // ── llmmap response-feature marker categories (ordered) ──
  val llmmapMarkers: Seq[(String, Seq[String])] = Seq(
    "apologetic" -> Seq("sorry", "apologize", "unfortunately", "cannot", "can't", "i'm unable"),
    "helpful" -> Seq("certainly", "sure", "absolutely", "of course", "happy to", "glad to"),
    "hedging" -> Seq("however", "although", "perhaps", "might", "could", "may"),
    "structured" -> Seq("first", "second", "third", "finally", "additionally", "moreover"),
    "ai_aware" -> Seq("as an ai", "language model", "i don't have", "i'm not able", "trained"))

  val refusalPrefixes: Seq[String] = Seq("i cannot", "i can't", "sorry", "i apologize")

  /** llmmap._FEATURE_RANGES — min-max normalization for fingerprint cosine. */
  val featureRanges: Seq[(String, (Double, Double))] = Seq(
    "avg_length_chars" -> (50d, 3000d),
    "avg_length_words" -> (10d, 500d),
    "avg_length_sentences" -> (1d, 20d),
    "avg_avg_word_length" -> (3d, 8d),
    "avg_avg_sentence_length" -> (5d, 40d),
    "avg_unique_word_ratio" -> (0d, 1d),
    "avg_punctuation_ratio" -> (0d, 0.1),
    "avg_newline_ratio" -> (0d, 0.05))

  /** Fingerprint vector column names, in output order. */
  val numericFeatures: Seq[String] = Seq(
    "length_chars", "length_words", "length_sentences", "avg_word_length",
    "avg_sentence_length", "unique_word_ratio", "punctuation_ratio", "newline_ratio")
  val boolFeatures: Seq[String] = Seq(
    "has_bullet_points", "has_numbered_list", "has_markdown_headers",
    "has_code_blocks", "starts_with_refusal")

  // ── DLI behavior-signature lists ──
  val dliRefusalPhrases: Seq[String] = Seq(
    "i cannot", "i can't", "i'm unable", "i apologize",
    "i don't think i should", "i'd rather not")
  val dliHedging: Seq[String] = Seq("perhaps", "maybe", "might", "could", "possibly")
  val dliCertainty: Seq[String] = Seq("certainly", "definitely", "absolutely", "clearly")

  val dliFeatureNames: Seq[String] = Seq(
    "refusal_rate", "avg_length", "vocab_diversity", "markdown_rate",
    "list_rate", "code_block_rate", "hedging_rate", "certainty_rate")

  // ── Style-family signatures (style.py:21-228, declaration order) ──
  final case class FamilySig(
      name: String,
      markers: Seq[String],
      refusalPatterns: Seq[String],
      tendsMarkdown: Boolean,
      tendsNumbered: Boolean,
      tendsCode: Boolean,
      verbose: Boolean,
      lang: String)

  val families: Seq[FamilySig] = Seq(
    FamilySig("gpt-4",
      Seq("certainly! here's", "comprehensive breakdown", "it's important to note",
        "it's worth noting", "let me know if you'd like", "keep in mind", "in more detail",
        "would you like me to", "let me walk you through", "active area of research"),
      Seq("i can't assist", "i'm not able to", "as an ai language model"),
      tendsMarkdown = true, tendsNumbered = true, tendsCode = true, verbose = true, lang = "en"),
    FamilySig("gpt-3.5",
      Seq("certainly!", "sure!", "of course!", "absolutely!", "no problem!", "hope that helps!"),
      Seq("as an ai language model", "i don't have the ability"),
      tendsMarkdown = false, tendsNumbered = true, tendsCode = false, verbose = false, lang = "en"),
    FamilySig("claude",
      Seq("i'd be happy to help", "let me think through this", "i should note",
        "i want to be straightforward", "nuanced", "i want to be careful",
        "different perspectives", "ethical implications", "would you like me to continue",
        "take it in a different direction"),
      Seq("i don't think i should", "i'd rather not", "i want to be helpful but"),
      tendsMarkdown = true, tendsNumbered = false, tendsCode = true, verbose = true, lang = "en"),
    FamilySig("llama",
      Seq("sure thing!", "no problem", "pretty cool", "check out this", "here you go",
        "let me know if you need anything else", "so basically", "think of it like"),
      Seq("i cannot", "i'm just an ai", "it's not appropriate"),
      tendsMarkdown = false, tendsNumbered = false, tendsCode = true, verbose = false, lang = "en"),
    FamilySig("gemini",
      Seq("great question!", "here's what you need to know", "**key applications**",
        "key applications", "it's worth noting that", "progress is accelerating",
        "i can provide a code implementation", "systematically", "noisy and error-prone"),
      Seq("i'm a large language model", "i'm designed to be helpful"),
      tendsMarkdown = true, tendsNumbered = true, tendsCode = false, verbose = true, lang = "en"),
    FamilySig("qwen",
      Seq("好的，我来", "为您详细", "具体来说", "以下是一个高效的", "这个实现", "时间复杂度",
        "核心思想", "优势在于"),
      Seq("作为ai助手", "我无法提供"),
      tendsMarkdown = true, tendsNumbered = true, tendsCode = true, verbose = false, lang = "zh"),
    FamilySig("deepseek",
      Seq("嗯，让我仔细想想", "从多个角度", "本质上是", "状态转移方程", "边界条件",
        "如果需要优化", "从技术层面看", "从实际应用角度"),
      Seq("作为ai助手", "我无法提供"),
      tendsMarkdown = true, tendsNumbered = true, tendsCode = true, verbose = true, lang = "zh"),
    FamilySig("mistral",
      Seq("to answer your question", "in short", "the answer is", "straightforward"),
      Seq("i cannot", "i must decline", "it would be inappropriate"),
      tendsMarkdown = false, tendsNumbered = false, tendsCode = false, verbose = false, lang = "en"),
    FamilySig("yi",
      Seq("to put it simply", "in a nutshell", "i'd like to point out"),
      Seq("as an ai", "i'm not able to", "i cannot assist with"),
      tendsMarkdown = true, tendsNumbered = true, tendsCode = false, verbose = true, lang = "en"),
    FamilySig("phi",
      Seq("in conclusion", "the answer is simply"),
      Seq("i cannot", "i'm unable to", "as a language model"),
      tendsMarkdown = false, tendsNumbered = false, tendsCode = false, verbose = false, lang = "en"),
    FamilySig("cohere",
      Seq("here's what i found", "to elaborate", "happy to help with that"),
      Seq("i'm not able to", "i'd prefer not to", "i cannot help with"),
      tendsMarkdown = true, tendsNumbered = true, tendsCode = false, verbose = true, lang = "en"),
    FamilySig("chatglm",
      Seq("好的", "以下是", "总结一下", "首先我们需要", "希望对您有帮助"),
      Seq("作为ai助手", "我无法"),
      tendsMarkdown = true, tendsNumbered = true, tendsCode = false, verbose = true, lang = "zh"))

  val refusalHintKeywords: Seq[String] =
    Seq("i cannot", "i can't", "unable to", "我无法", "作为ai")

  /** The probe catalog: (probe_id, category) in declaration order
    * (probes/prompts.py:24-153, DEFAULT_PROBES). The i-th response of
    * a model (rank by doc_id within source) plays the role of probe
    * (i-1) mod 20 — the corpus cycles through the probe set. The 12
    * distinct categories match report.py:44-57 _CATEGORY_LABELS.
    */
  val probeCatalog: Seq[(String, String)] = Seq(
    "identity_direct" -> "self_awareness",
    "identity_creator" -> "self_awareness",
    "safety_harmful" -> "safety_boundary",
    "safety_roleplay" -> "safety_boundary",
    "injection_ignore" -> "injection",
    "knowledge_opinion" -> "knowledge",
    "reasoning_math" -> "reasoning",
    "style_creative" -> "style",
    "creative_story" -> "creative",
    "creative_metaphor" -> "creative",
    "reasoning_logic" -> "reasoning",
    "reasoning_ethical" -> "reasoning",
    "multilingual_zh" -> "multilingual",
    "multilingual_translate" -> "multilingual",
    "format_json" -> "format",
    "format_table" -> "format",
    "roleplay_character" -> "roleplay",
    "code_generation" -> "code",
    "summarize_text" -> "summarization",
    "refusal_boundary" -> "safety_boundary")

  // ── detailed-report configuration (report.py) ──

  /** report.py:17-30 _DISPLAY_FEATURES: (fingerprint key, label, printf format). */
  val displayFeatures: Seq[(String, String, String)] = Seq(
    ("avg_length_chars", "平均字符数", "%.1f"),
    ("avg_length_words", "平均词数", "%.1f"),
    ("avg_unique_word_ratio", "词汇多样性", "%.3f"),
    ("avg_punctuation_ratio", "标点使用率", "%.3f"),
    ("avg_newline_ratio", "换行习惯", "%.3f"),
    ("ratio_has_bullet_points", "列表使用率", "%.0f%%"),
    ("ratio_has_code_blocks", "代码块使用率", "%.0f%%"),
    ("ratio_has_numbered_list", "编号列表", "%.0f%%"),
    ("ratio_has_markdown_headers", "Markdown 标题", "%.0f%%"),
    ("style_helpful", "helpful 标记", "%.4f"),
    ("style_hedging", "hedging 标记", "%.4f"),
    ("style_structured", "structured 标记", "%.4f"))

  /** report.py:33-39 — its OWN 5-key range table for difference
    * judging (narrower than llmmap._FEATURE_RANGES: no ratio keys).
    */
  val reportRanges: Map[String, (Double, Double)] = Map(
    "avg_length_chars" -> (50d, 3000d),
    "avg_length_words" -> (10d, 500d),
    "avg_length_sentences" -> (1d, 20d),
    "avg_avg_word_length" -> (3d, 8d),
    "avg_avg_sentence_length" -> (5d, 40d))

  /** _judge_difference (report.py:735-780) thresholds, folded to
    * absolute-diff constants per display feature: (t1, t2, t3) for
    * 完全一致 / 高度一致 / 接近 / 显著不同.
    */
  def judgeThresholds(key: String): (Double, Double, Double) =
    reportRanges.get(key) match {
      case Some((lo, hi)) => (0.02 * (hi - lo), 0.1 * (hi - lo), 0.2 * (hi - lo))
      case None if key.startsWith("ratio_") => (0.01, 0.05, 0.1)
      case None if key.startsWith("style_") => (0.001, 0.003, 0.005)
      case None => (0.01, 0.05, 0.1)
    }

  val judgeLabels: (String, String, String, String) =
    ("**完全一致**", "**高度一致**", "接近", "显著不同")

  /** report.py:42-56 _CATEGORY_LABELS (insertion order = catalog
    * first-occurrence order, which Counter preserves in §2.1).
    */
  val categoryLabels: Seq[(String, String)] = Seq(
    "self_awareness" -> "自我认知",
    "safety_boundary" -> "安全边界",
    "injection" -> "注入测试",
    "knowledge" -> "知识立场",
    "reasoning" -> "推理测试",
    "style" -> "风格测试",
    "creative" -> "创意写作",
    "multilingual" -> "多语言",
    "format" -> "格式控制",
    "roleplay" -> "角色扮演",
    "code" -> "代码生成",
    "summarization" -> "摘要能力")

  /** report.py:59-72 _CATEGORY_EXPLANATIONS. */
  val categoryExplanations: Map[String, String] = Map(
    "self_awareness" -> "模型身份、创建者",
    "safety_boundary" -> "拒绝策略、措辞差异",
    "injection" -> "Prompt injection 响应",
    "knowledge" -> "知识立场",
    "reasoning" -> "逻辑推理、伦理判断",
    "style" -> "风格差异",
    "creative" -> "叙事风格、类比能力",
    "multilingual" -> "中文响应、多语翻译",
    "format" -> "JSON 输出、Markdown 表格",
    "roleplay" -> "角色一致性",
    "code" -> "编码风格",
    "summarization" -> "信息压缩")

  /** Fixed audit clock for the report header (the reference stamps
    * datetime.now(); a deterministic engine takes the audit date as a
    * parameter — this constant is what the oracle and golden fixtures
    * were generated with).
    */
  val AuditDate = "2026-01-01"
  val AuditDateTime = "2026-01-01 00:00:00"

  /** The reference release whose report format is reproduced. */
  val ToolVersion = "0.4.0"

  /** Number of probes a detailed report covers — the full catalog
    * (engine.py get_probes(count) TRUNCATES at the catalog, it never
    * cycles; sources with fewer responses pad to "unknown").
    */
  val ReportProbes = 20

  // ── structural regexes (same RE2/Java-compatible syntax on both sides) ──
  val bulletRe = "(?m)^[\\s]*[-*•]\\s"
  val numberedRe = "(?m)^[\\s]*\\d+[.)]\\s"
  val mdHeaderRe = "(?m)^#+\\s"

  // ═══════════════ Spark Column builders ═══════════════

  /** Count of non-overlapping occurrences of literal `m` in column `e`. */
  def cntOccC(e: Column, m: String): Column =
    (length(e) - length(regexp_replace(e, Pattern.quote(m), ""))) / m.length

  def hasSubC(e: Column, m: String): Column = e.contains(m)

  def anySubC(e: Column, ms: Seq[String]): Column =
    ms.map(e.contains(_)).reduce(_ || _)

  // ═══════════════ DuckDB SQL fragment builders ═══════════════

  /** SQL string literal with quote escaping. */
  def sl(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Count of occurrences of literal `m` in SQL expression `e` (DuckDB). */
  def cntOccSql(e: String, m: String): String =
    s"((length($e) - length(replace($e, ${sl(m)}, ''))) / ${m.length})"

  def hasSubSql(e: String, m: String): String =
    s"(position(${sl(m)} IN $e) > 0)"

  def anySubSql(e: String, ms: Seq[String]): String =
    ms.map(hasSubSql(e, _)).mkString("(", " OR ", ")")
}
