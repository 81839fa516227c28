package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: collects the k highest-scoring (score,
  * id) pairs per group in a fixed-size heap.
  *
  * This is the 100 TB shape for per-query nearest-neighbor search:
  * a window row_number() materializes and sorts EVERY candidate score
  * per group, while this aggregate carries at most k entries per
  * partition and merges map-side — shuffle traffic is O(groups·k)
  * instead of O(candidates).
  *
  * Ties: higher score wins; equal scores prefer the smaller id
  * (matches ORDER BY score DESC, id).
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.fromLessThan[(Double, Long)] { (a, b) =>
      a._1 < b._1 || (a._1 == b._1 && a._2 > b._2) // "worst first" ordering
    }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](ord)

  private def add(buf: java.util.TreeSet[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.size < k) buf.add(e)
    else if (ord.lt(buf.first(), e)) { buf.pollFirst(); buf.add(e) }
  }

  override def update(
      buf: java.util.TreeSet[(Double, Long)], input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      add(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[(Double, Long)],
      other: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    // best-first output: (id, score, rank) structs
    val arr = buf.descendingIterator()
    val out = new Array[Any](buf.size)
    var r = 0
    while (arr.hasNext) {
      val (s, i) = arr.next()
      out(r) = InternalRow(i, s, (r + 1).toLong)
      r += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (s, i) = it.next(); out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.add((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false),
      StructField("rank", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def withNewMutableAggBufferOffset(o: Int): TopKByScore = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = cs(0), idExpr = cs(1))
  override def prettyName: String = "topk_by_score"
}

object TopKAgg {
  /** Column API: topk_by_score(score, id, k) → array<struct<id,score,rank>>. */
  def topk_by_score(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())
}
