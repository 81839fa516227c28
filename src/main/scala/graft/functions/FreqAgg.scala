package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.frequencies.LongsSketch

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Frequent-items sketches (DataSketches LongsSketch) — the HEAVY-
  * HITTER member of the sketch family: HLL answers "how many
  * distinct" (q9/q19), KLL "what quantile" (q26), Theta "how many in
  * A∩B" (q28), and the frequencies sketch answers "which items
  * dominate and with what weight" in constant memory — the corpus
  * vocabulary head (tx_topterms' exact answer) served WITHOUT a
  * vocabulary-sized aggregation. Misra-Gries/Space-Saving style: a
  * capped counter map with periodic purge; the deterministic (not
  * probabilistic) guarantee is exact ≥ estimate ≥ exact − maxError
  * with maxError ≤ streamWeight · 3.5/maxMapSize (the published
  * bound), and sketches MERGE — per-shard sketches union into any
  * coarser rollup without rescanning rows, exactly the q19 algebra.
  */
case class FreqSketchAgg(
    item: Expression,
    weight: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] {

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buf: LongsSketch, input: InternalRow): LongsSketch = {
    val v = item.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null)
      buf.update(v.asInstanceOf[Long], w.asInstanceOf[Long])
    buf
  }

  override def merge(buf: LongsSketch, other: LongsSketch): LongsSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: LongsSketch): Any = buf.toByteArray

  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(item, weight)
  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): FreqSketchAgg =
    copy(item = cs(0), weight = cs(1))
  override def prettyName: String = "freq_sketch_agg"
}

/** Binary-union of stored frequency sketches — the rollup serve path
  * (per-shard sketch rows → one merged sketch; rows never rescanned).
  */
case class FreqMergeAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] {

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buf: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(LongsSketch.getInstance(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: LongsSketch, other: LongsSketch): LongsSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: LongsSketch): Any = buf.toByteArray
  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): FreqMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): FreqMergeAgg =
    copy(child = cs(0))
  override def prettyName: String = "freq_merge_agg"
}

private object FreqOps {
  def sk(bytes: Any): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
}

/** Estimated weight of one item in a stored frequency sketch. */
case class FreqEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(b: Any, item: Any): Any =
    FreqOps.sk(b).getEstimate(item.asInstanceOf[Long])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FreqEstimate =
    copy(left = l, right = r)
  override def prettyName: String = "freq_estimate"
}

/** Guaranteed lower bound on an item's true frequency. */
case class FreqLowerBound(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(b: Any, item: Any): Any =
    FreqOps.sk(b).getLowerBound(item.asInstanceOf[Long])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FreqLowerBound =
    copy(left = l, right = r)
  override def prettyName: String = "freq_lower_bound"
}

/** Guaranteed upper bound on an item's true frequency. */
case class FreqUpperBound(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(b: Any, item: Any): Any =
    FreqOps.sk(b).getUpperBound(item.asInstanceOf[Long])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FreqUpperBound =
    copy(left = l, right = r)
  override def prettyName: String = "freq_upper_bound"
}

/** The sketch's a-priori error bound: upper − lower ≤ maxError for
  * every item. Zero while the counter map has never purged.
  */
case class FreqMaxError(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(b: Any): Any = FreqOps.sk(b).getMaximumError
  override protected def withNewChildInternal(c: Expression): FreqMaxError = copy(c)
  override def prettyName: String = "freq_max_error"
}

object FreqAgg {
  def freq_sketch_agg(item: Column, weight: Column, maxMapSize: Int): Column =
    Bridge.column(FreqSketchAgg(
      Bridge.expression(item), Bridge.expression(weight), maxMapSize).toAggregateExpression())
  def freq_merge_agg(sk: Column, maxMapSize: Int): Column =
    Bridge.column(FreqMergeAgg(Bridge.expression(sk), maxMapSize).toAggregateExpression())
  def freq_estimate(sk: Column, item: Column): Column =
    Bridge.column(FreqEstimate(Bridge.expression(sk), Bridge.expression(item)))
  def freq_lower_bound(sk: Column, item: Column): Column =
    Bridge.column(FreqLowerBound(Bridge.expression(sk), Bridge.expression(item)))
  def freq_upper_bound(sk: Column, item: Column): Column =
    Bridge.column(FreqUpperBound(Bridge.expression(sk), Bridge.expression(item)))
  def freq_max_error(sk: Column): Column =
    Bridge.column(FreqMaxError(Bridge.expression(sk)))
}
