package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Theta sketches (DataSketches) — the SET-OPERATION member of the
  * sketch family: HLL answers "how many distinct" (q9/q19), KLL
  * answers "what quantile" (q26), Theta answers "how many distinct
  * in A∩B / A∖B / A∪B" WITHOUT co-shuffling the two sides — the
  * estimate composes from two stored constant-size sketches. That is
  * the 100 TB cohort-overlap story: per-cohort sketches build in the
  * cohorts' own scans (map-side partial via Union buffers), and any
  * pairwise overlap question afterwards is a driver-sized scalar op.
  * Default builder = 4096 nominal entries → exact below 4 k distinct,
  * ~1.6% RSE above (the published bound); q28_theta pins estimates
  * within 5% of exact, oracle-hash-checked.
  */
case class ThetaSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = cs(0))
  override def prettyName: String = "theta_sketch_agg"
}

private object ThetaOps {
  def sk(bytes: Any): org.apache.datasketches.theta.Sketch =
    Sketches.heapifyCompactSketch(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
}

/** Estimate of a stored theta sketch's distinct count. */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(b: Any): Any = ThetaOps.sk(b).getEstimate
  override protected def withNewChildInternal(c: Expression): ThetaEstimate = copy(c)
  override def prettyName: String = "theta_estimate"
}

/** Distinct-count estimate of A ∩ B from two stored sketches. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildIntersection()
      .intersect(ThetaOps.sk(a), ThetaOps.sk(b)).getEstimate
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaIntersectEstimate =
    copy(left = l, right = r)
  override def prettyName: String = "theta_intersect_estimate"
}

/** Distinct-count estimate of A ∖ B from two stored sketches. */
case class ThetaAnotBEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildANotB()
      .aNotB(ThetaOps.sk(a), ThetaOps.sk(b)).getEstimate
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaAnotBEstimate =
    copy(left = l, right = r)
  override def prettyName: String = "theta_anotb_estimate"
}

/** Distinct-count estimate of A ∪ B from two stored sketches. */
case class ThetaUnionEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val u = SetOperation.builder().buildUnion()
    u.union(ThetaOps.sk(a)); u.union(ThetaOps.sk(b))
    u.getResult.getEstimate
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaUnionEstimate =
    copy(left = l, right = r)
  override def prettyName: String = "theta_union_estimate"
}

object ThetaAgg {
  def theta_sketch_agg(x: Column): Column =
    Bridge.column(ThetaSketchAgg(Bridge.expression(x)).toAggregateExpression())
  def theta_estimate(sk: Column): Column =
    Bridge.column(ThetaEstimate(Bridge.expression(sk)))
  def theta_intersect_estimate(a: Column, b: Column): Column =
    Bridge.column(ThetaIntersectEstimate(Bridge.expression(a), Bridge.expression(b)))
  def theta_anotb_estimate(a: Column, b: Column): Column =
    Bridge.column(ThetaAnotBEstimate(Bridge.expression(a), Bridge.expression(b)))
  def theta_union_estimate(a: Column, b: Column): Column =
    Bridge.column(ThetaUnionEstimate(Bridge.expression(a), Bridge.expression(b)))
}
