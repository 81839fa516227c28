package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon-entropy text statistics as ONE native map-side expression.
  *
  * Character/token entropy is a standard gibberish-and-boilerplate
  * gate in corpus curation (low char entropy = repeated filler, low
  * token entropy / type-token ratio = template spam). The natural SQL
  * formulation explodes the text into characters and shuffles a
  * corpus-text-sized (doc_id, char) stream into two keyed
  * aggregations — the exact shape this engine bans (no text in keyed
  * shuffles; at 100 TB the explode shuffle IS the corpus). One pass
  * over the string in a tight JVM loop instead, emitted from
  * WholeStageCodegen via a static call (same discipline as
  * PolyHashing — see the codegen note in HashExprs.scala).
  *
  * Both entropies are plain Shannon bits: H = -Σ p·log2(p) over the
  * character (resp. whitespace-token) frequency distribution.
  * Summation order differs from the oracle's GROUP BY plan; the
  * ~1e-15 float drift is absorbed by the caller's round(1e-9+x, 4)
  * convention like every other blended score in the engine.
  */
object TextEntropy {
  private val Ln2 = math.log(2.0)

  private def entropyOfCounts(counts: Iterator[Int], n: Int): Double = {
    if (n == 0) return 0.0
    var h = 0.0
    while (counts.hasNext) {
      val c = counts.next()
      if (c > 0) {
        val p = c.toDouble / n
        h -= p * (math.log(p) / Ln2)
      }
    }
    h
  }

  /** char entropy over EVERY character (spaces included — the oracle
    * twin is unnest(string_split_regex(text, ''))), measured in UTF-16
    * code units; the corpus is ASCII so code unit == character ==
    * DuckDB's grapheme here.
    */
  def charEntropy(s: String): Double = {
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Character, Array[Int]] = null
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 128) ascii(c) += 1
      else {
        if (other == null) other = new java.util.HashMap
        val slot = other.computeIfAbsent(c, _ => new Array[Int](1))
        slot(0) += 1
      }
      i += 1
    }
    import scala.jdk.CollectionConverters._
    val counts = ascii.iterator ++
      (if (other == null) Iterator.empty else other.values.asScala.iterator.map(_(0)))
    entropyOfCounts(counts, s.length)
  }

  /** All four token-level stats in one pass: (word entropy, distinct
    * token types, total tokens). Tokens are maximal runs of
    * non-space characters — the exact twin of the oracle's
    * string_split(text, ' ') with empties dropped.
    */
  def tokenStats(s: String): (Double, Int, Int) = {
    val freq = new java.util.HashMap[String, Array[Int]]()
    var n = 0
    var i = 0
    while (i < s.length) {
      while (i < s.length && s.charAt(i) == ' ') i += 1
      if (i < s.length) {
        val start = i
        while (i < s.length && s.charAt(i) != ' ') i += 1
        val slot = freq.computeIfAbsent(s.substring(start, i), _ => new Array[Int](1))
        slot(0) += 1
        n += 1
      }
    }
    import scala.jdk.CollectionConverters._
    val h = entropyOfCounts(freq.values.asScala.iterator.map(_(0)), n)
    (h, freq.size, n)
  }

  /** Static entry point the generated code calls: one InternalRow of
    * struct<char_entropy, word_entropy, n_types, n_tokens>.
    */
  def stats(text: UTF8String): InternalRow = {
    val s = text.toString
    val (wh, types, tokens) = tokenStats(s)
    new GenericInternalRow(Array[Any](charEntropy(s), wh, types.toLong, tokens.toLong))
  }

  val schema: StructType = StructType(Seq(
    StructField("char_entropy", DoubleType, nullable = false),
    StructField("word_entropy", DoubleType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))
}

/** struct<char_entropy,word_entropy,n_types,n_tokens> of a text. */
case class TextEntropyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextEntropy.schema
  override def nullSafeEval(input: Any): Any =
    TextEntropy.stats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextEntropy.stats($c);")
  override protected def withNewChildInternal(c: Expression): TextEntropyExpr = copy(c)
  override def prettyName: String = "text_entropy"
}

object EntropyExprs {
  def text_entropy(c: Column): Column = Bridge.column(TextEntropyExpr(Bridge.expression(c)))
}
