package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernels for the tokenizer-training (BPE) and linear-classifier
  * operators. Same discipline as PolyHashing: each method is a tight
  * JVM loop whose arithmetic/semantics are the EXACT mirror of the
  * generated DuckDB oracle SQL (Tokenizer.bpeCteSql / Classifier), and
  * each expression below emits a single static call so the generated
  * code stays inside WholeStageCodegen.
  */
object BpeKernels {

  /** Split a string into per-code-point strings — DuckDB
    * string_split(s, '') semantics: one element per Unicode code
    * point (combining marks separate, astral chars whole), and the
    * empty string yields [""] (one empty element), NOT [].
    */
  def codePointSplit(s: String): Array[UTF8String] = {
    if (s.isEmpty) return Array(UTF8String.EMPTY_UTF8)
    val out = Array.newBuilder[UTF8String]
    var i = 0
    while (i < s.length) {
      val n = Character.charCount(s.codePointAt(i))
      out += UTF8String.fromString(s.substring(i, i + n))
      i += n
    }
    out.result()
  }

  private val HexDigits = "0123456789ABCDEF".toCharArray

  /** Split a string into per-BYTE symbols of its UTF-8 encoding, each
    * rendered as a 2-digit uppercase hex string — the byte-level BPE
    * alphabet (GPT-2 family: any UTF-8 input survives tokenization
    * because the base alphabet is the 256 bytes, not code points).
    * Hex-string symbols keep concat/compare semantics identical in
    * both engines; the oracle derives the same list via
    * hex(encode(word)). The empty string yields [""] (one empty
    * element), mirroring codePointSplit.
    */
  def byteSplit(s: UTF8String): Array[UTF8String] = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return Array(UTF8String.EMPTY_UTF8)
    val out = new Array[UTF8String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i) = UTF8String.fromString(
        new String(Array(HexDigits(b >> 4), HexDigits(b & 0xf))))
      i += 1
    }
    out
  }

  /** One BPE merge application: replace adjacent (l, r) symbol pairs
    * with l+r, greedy left-to-right, non-overlapping (a merged symbol
    * never participates as the LEFT side of another merge in the same
    * pass). The exact fold the oracle runs via list_reduce with a
    * list accumulator whose last element is the pending symbol.
    */
  def bpeApply(syms: ArrayData, l: UTF8String, r: UTF8String): GenericArrayData = {
    val n = syms.numElements()
    val merged = UTF8String.concat(l, r)
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val s = syms.getUTF8String(i)
      if (!out.isEmpty && out.get(out.size - 1).equals(l) && s.equals(r)) {
        out.set(out.size - 1, merged)
      } else {
        out.add(s)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Hashed-feature linear-model margin: Σ over token hashes of
    * w(h mod d), where the weight table is the fixed Lehmer spread
    * w(j) = ((j+1)·WA) mod P − (P−1)/2 — integer arithmetic only, so
    * the sum is order-independent and bit-exact on both engines. A
    * production deployment swaps the formula for element_at(weights,
    * j+1) with a broadcast trained-weight array; the plan shape
    * (map-only scan, no shuffle) is identical.
    */
  val WA = 5055373559L // 48271 * 104729 (MINSTD multiplier × the 10k-th prime)
  val Half = 500000003L // (P − 1) / 2

  def linearMargin(wh: ArrayData, d: Int): Long = {
    val n = wh.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      s += ((wh.getLong(i) % d + 1L) * WA) % Hashing.P - Half
      i += 1
    }
    s
  }
}

private object BpeGen {
  val K = "graft.functions.BpeKernels"
  val GAD = "org.apache.spark.sql.catalyst.util.GenericArrayData"
}

/** array<string> of per-code-point strings ('' → ['']). */
case class CodePointSplitExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      BpeKernels.codePointSplit(input.asInstanceOf[UTF8String].toString)
        .asInstanceOf[Array[AnyRef]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new ${BpeGen.GAD}(${BpeGen.K}.codePointSplit($c.toString()));")
  override protected def withNewChildInternal(c: Expression): CodePointSplitExpr = copy(c)
  override def prettyName: String = "codepoint_split"
}

/** array<string> of 2-hex-digit per-UTF-8-byte strings ('' → ['']). */
case class ByteSplitExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      BpeKernels.byteSplit(input.asInstanceOf[UTF8String])
        .asInstanceOf[Array[AnyRef]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new ${BpeGen.GAD}(${BpeGen.K}.byteSplit($c));")
  override protected def withNewChildInternal(c: Expression): ByteSplitExpr = copy(c)
  override def prettyName: String = "byte_split"
}

/** One greedy BPE merge pass of pair (l, r) over a symbol array. */
case class BpeApplyExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(syms: Any, l: Any, r: Any): Any =
    BpeKernels.bpeApply(syms.asInstanceOf[ArrayData],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, l, r) =>
      s"${ev.value} = ${BpeGen.K}.bpeApply($s, $l, $r);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BpeApplyExpr = copy(f, s, t)
  override def prettyName: String = "bpe_apply"
}

/** Hashed linear-model margin over a token-hash array (long). */
case class LinearMarginExpr(child: Expression, d: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(BpeKernels.linearMargin(input.asInstanceOf[ArrayData], d))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${BpeGen.K}.linearMargin($c, $d);")
  override protected def withNewChildInternal(c: Expression): LinearMarginExpr =
    copy(child = c)
  override def prettyName: String = "linear_margin"
}

object BpeExprs {
  def codepoint_split(c: Column): Column =
    Bridge.column(CodePointSplitExpr(Bridge.expression(c)))
  def byte_split(c: Column): Column =
    Bridge.column(ByteSplitExpr(Bridge.expression(c)))
  def bpe_apply(syms: Column, l: Column, r: Column): Column =
    Bridge.column(BpeApplyExpr(
      Bridge.expression(syms), Bridge.expression(l), Bridge.expression(r)))
  def linear_margin(wh: Column, d: Int): Column =
    Bridge.column(LinearMarginExpr(Bridge.expression(wh), d))
}
