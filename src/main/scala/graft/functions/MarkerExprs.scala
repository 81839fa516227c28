package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass marker scanning.
  *
  * The reference counts style markers with `text.count(m)` /
  * `m in text` over fixed marker lists. The composable-Column
  * formulation ((length - length(replace))·n per marker, or one
  * `contains` per marker) is oracle-parity-friendly but builds an
  * expression tree of ~30 string-replace passes per doc per list —
  * and the style query's 12-family tree is large enough that CATALYST
  * ANALYSIS TIME dominates small inputs (ma_benchmark_detect spends
  * seconds compiling, not scanning). These expressions collapse each
  * marker list into one codegen'd call; the DuckDB oracle keeps the
  * replace/position chains, and the counts are integer-identical
  * (non-overlapping left-to-right, same as str.count / replace-all).
  */
object MarkerScan {

  /** Σ over markers of non-overlapping occurrence count (str.count). */
  def countTotal(text: String, markers: Array[String]): Long = {
    var total = 0L
    var j = 0
    while (j < markers.length) {
      val m = markers(j)
      if (m.length > 0) {
        var idx = text.indexOf(m)
        while (idx >= 0) {
          total += 1
          idx = text.indexOf(m, idx + m.length)
        }
      }
      j += 1
    }
    total
  }

  /** How many of the markers appear at least once. */
  def containsCount(text: String, markers: Array[String]): Int = {
    var c = 0
    var j = 0
    while (j < markers.length) {
      if (text.contains(markers(j))) c += 1
      j += 1
    }
    c
  }
}

/** Long total of non-overlapping occurrences of all markers. */
case class MarkerTotalExpr(child: Expression, markers: Seq[String]) extends UnaryExpression {
  @transient private lazy val arr: Array[String] = markers.toArray
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(MarkerScan.countTotal(input.asInstanceOf[UTF8String].toString, arr))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markers", arr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MarkerScan.countTotal($c.toString(), $ref);")
  }
  override protected def withNewChildInternal(c: Expression): MarkerTotalExpr = copy(child = c)
  override def prettyName: String = "marker_total"
}

/** Int count of markers present at least once. */
case class ContainsCountExpr(child: Expression, markers: Seq[String]) extends UnaryExpression {
  @transient private lazy val arr: Array[String] = markers.toArray
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(MarkerScan.containsCount(input.asInstanceOf[UTF8String].toString, arr))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markers", arr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MarkerScan.containsCount($c.toString(), $ref);")
  }
  override protected def withNewChildInternal(c: Expression): ContainsCountExpr = copy(child = c)
  override def prettyName: String = "contains_count"
}

object WordScan {
  /** Unicode word class, matching the reference's Python
    * `re.findall(r"\w+", ...)` on real text: letters (any script —
    * CJK, Greek, accented Latin), Unicode digits, underscore. The
    * explicit `[\p{L}\p{N}_]` class is used instead of `(?U)\w`
    * because it means the same thing in Java regex AND DuckDB's RE2
    * (where `(?U)` means "ungreedy", and bare `\w` is ASCII-only) —
    * the oracle must tokenize identically. Known residual divergence
    * from Python `\w`: characters that are alphanumeric only via
    * Other_Alphabetic (e.g. Indic vowel signs) and a few exotic
    * numerics; no practical corpus text hits it.
    */
  val WordClass = "[\\p{L}\\p{N}_]+"

  /** [\p{L}\p{N}_] membership, spelled with the same Character.getType
    * categories Java regex itself resolves \p{L} and \p{N} to — the
    * manual scan below is token-identical to matching WordClass, minus
    * the Pattern machinery. The ASCII fast path covers the bulk of
    * real corpora; only non-ASCII pays the category lookup.
    */
  @inline private def isWordCp(cp: Int): Boolean =
    if (cp < 128)
      (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') ||
      (cp >= 'A' && cp <= 'Z') || cp == '_'
    else Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    }

  /** Maximal runs of word codepoints — findall(WordClass), one pass. */
  def wordTokens(text: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    while (i < n) {
      val cp = text.codePointAt(i)
      if (isWordCp(cp)) {
        val start = i
        i += Character.charCount(cp)
        var run = true
        while (run && i < n) {
          val c2 = text.codePointAt(i)
          if (isWordCp(c2)) i += Character.charCount(c2) else run = false
        }
        out += text.substring(start, i)
      } else i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Number of word tokens, without materializing them. */
  def wordCount(text: String): Int = {
    var count = 0
    val n = text.length
    var i = 0
    var inWord = false
    while (i < n) {
      val cp = text.codePointAt(i)
      if (isWordCp(cp)) {
        if (!inWord) { count += 1; inWord = true }
      } else inWord = false
      i += Character.charCount(cp)
    }
    count
  }

  def wordTokensUtf8(text: String): Array[UTF8String] =
    wordTokens(text).map(UTF8String.fromString)

  /** Adjacent word pairs "w1 w2" of the word tokens, in order. */
  def wordBigrams(text: String): Array[UTF8String] = {
    val words = wordTokens(text)
    if (words.length < 2) Array.empty
    else Array.tabulate(words.length - 1)(i =>
      UTF8String.fromString(words(i) + " " + words(i + 1)))
  }
}

/** array<string> of adjacent word bigrams — one map-side pass.
  * The composable alternative (explode words, lead() window, concat)
  * shuffles and sorts EVERY word in the corpus by doc just to pair
  * neighbors; this keeps bigram formation inside the scan stage.
  */
case class WordBigramsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType,
      containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      WordScan.wordBigrams(input.asInstanceOf[UTF8String].toString)
        .asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"(Object[]) graft.functions.WordScan.wordBigrams($c.toString()));")
  override protected def withNewChildInternal(c: Expression): WordBigramsExpr = copy(c)
  override def prettyName: String = "word_bigrams"
}

/** array<string> of the WordClass tokens — the scan-stage form of
  * regexp_extract_all(text, WordClass), token-identical but without
  * per-row Pattern matching (the dli vocab explode is a full-corpus
  * tokenization; the regex version dominated its stage).
  */
case class WordTokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType,
      containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      WordScan.wordTokensUtf8(input.asInstanceOf[UTF8String].toString)
        .asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"(Object[]) graft.functions.WordScan.wordTokensUtf8($c.toString()));")
  override protected def withNewChildInternal(c: Expression): WordTokensExpr = copy(c)
  override def prettyName: String = "word_tokens"
}

/** Int count of WordClass tokens — size(regexp_extract_all(...))
  * without building the token array at all.
  */
case class WordCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(WordScan.wordCount(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordScan.wordCount($c.toString());")
  override protected def withNewChildInternal(c: Expression): WordCountExpr = copy(c)
  override def prettyName: String = "word_count"
}

object MarkerExprs {
  def marker_total(c: Column, markers: Seq[String]): Column =
    Bridge.column(MarkerTotalExpr(Bridge.expression(c), markers))
  def contains_count(c: Column, markers: Seq[String]): Column =
    Bridge.column(ContainsCountExpr(Bridge.expression(c), markers))
  def word_bigrams(c: Column): Column =
    Bridge.column(WordBigramsExpr(Bridge.expression(c)))
  def word_tokens(c: Column): Column =
    Bridge.column(WordTokensExpr(Bridge.expression(c)))
  def word_count(c: Column): Column =
    Bridge.column(WordCountExpr(Bridge.expression(c)))
}
