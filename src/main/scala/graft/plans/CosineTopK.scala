package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Whole-operator cosine top-k as a custom plan — the (c) route from
  * the design guide: LogicalPlan node + SparkStrategy + physical
  * operator, for semantics Spark's built-ins express only as
  * cross-join + window-sort.
  *
  * Left child: queries (query_id bigint, qe array<double>, qn double)
  * — must be small (it is executeCollect'ed and broadcast).
  * Right child: corpus (vec_id bigint, e array<double>, nrm double).
  * Output: (query_id, neighbor_id, cosine, rank), best-first,
  * ties broken by smaller vec_id.
  *
  * Scale shape: one pass over the corpus per partition maintaining a
  * k-bounded heap per query; partial heaps (|queries|·k entries per
  * partition) are merged on the driver-free reduce side. No shuffle
  * of scores, no sort of candidates.
  */
case class CosineTopK(
    queries: LogicalPlan,
    corpus: LogicalPlan,
    k: Int,
    // constructor field so copy() during plan transforms preserves the
    // expression IDs the analyzer resolved against
    override val output: Seq[Attribute] = CosineTopK.newOutput())
  extends BinaryNode {

  override def left: LogicalPlan = queries
  override def right: LogicalPlan = corpus

  // the node generates its output attributes (they don't come from
  // the children), which CheckAnalysis must be told about
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  // the physical operator reads every child column positionally, so
  // ColumnPruning must not strip or reorder them — declare them all
  // as referenced
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(queries.output ++ corpus.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): CosineTopK =
    copy(queries = newLeft, corpus = newRight)
}

object CosineTopK {
  def newOutput(): Seq[Attribute] = Seq(
    AttributeReference("query_id", LongType, nullable = false)(),
    AttributeReference("neighbor_id", LongType, nullable = false)(),
    AttributeReference("cosine", DoubleType, nullable = false)(),
    AttributeReference("rank", LongType, nullable = false)())
}

case class CosineTopKExec(
    queries: SparkPlan,
    corpus: SparkPlan,
    k: Int,
    override val output: Seq[Attribute])
  extends BinaryExecNode {

  override def left: SparkPlan = queries
  override def right: SparkPlan = corpus

  // worst entry first: lowest score, then HIGHEST id (so replacing the
  // head prefers keeping smaller ids on score ties)
  private type Entry = (Double, Long)
  private def ord: Ordering[Entry] =
    Ordering.fromLessThan[Entry]((a, b) => a._1 < b._1 || (a._1 == b._1 && a._2 > b._2))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val qRows: Array[(Long, Array[Double], Double)] =
      queries.executeCollect().map { r =>
        (r.getLong(0), r.getArray(1).toDoubleArray(), r.getDouble(2))
      }
    // the query side is gathered to the driver and broadcast (the
    // documented small-side contract, same as a broadcast hash join's
    // build side). Fail loudly if someone points a corpus-sized
    // relation at it instead of silently stressing driver memory.
    require(qRows.length <= 100000,
      s"CosineTopKExec query side has ${qRows.length} rows; it is " +
        "broadcast to every task and must stay small (<= 100k). " +
        "Swap the sides, or use the LSH/IVF operators for large query sets.")
    val bc = sparkContext.broadcast(qRows)
    val outputAttrs = output

    val partial: RDD[(Long, Array[Entry])] = corpus.execute().mapPartitions { it =>
      val qs = bc.value
      val heaps = qs.map(q => q._1 -> new java.util.TreeSet[Entry](ord)).toMap
      it.foreach { row =>
        val vid = row.getLong(0)
        val e = row.getArray(1).toDoubleArray()
        val nrm = row.getDouble(2)
        var qi = 0
        while (qi < qs.length) {
          val (qid, qe, qn) = qs(qi)
          if (vid != qid) {
            var s = 0d
            var i = 0
            val n = math.min(e.length, qe.length)
            while (i < n) { s += qe(i) * e(i); i += 1 }
            val cos = s / (qn * nrm)
            val h = heaps(qid)
            val entry = (cos, vid)
            if (h.size < kLocal) h.add(entry)
            else if (ord.lt(h.first(), entry)) { h.pollFirst(); h.add(entry) }
          }
          qi += 1
        }
      }
      heaps.iterator.map { case (qid, h) =>
        (qid, h.toArray(Array.empty[AnyRef]).map(_.asInstanceOf[Entry]))
      }
    }

    partial
      .reduceByKey { (a, b) =>
        val h = new java.util.TreeSet[Entry](ord)
        (a ++ b).foreach { e =>
          if (h.size < kLocal) h.add(e)
          else if (ord.lt(h.first(), e)) { h.pollFirst(); h.add(e) }
        }
        h.toArray(Array.empty[AnyRef]).map(_.asInstanceOf[Entry])
      }
      .mapPartitions { it =>
        val proj = UnsafeProjection.create(outputAttrs.map(_.dataType).toArray)
        it.flatMap { case (qid, entries) =>
          entries.sortBy(e => (-e._1, e._2)).zipWithIndex.map { case ((cos, vid), r) =>
            proj(InternalRow(qid, vid, cos, (r + 1).toLong)).copy()
          }
        }
      }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): CosineTopKExec =
    copy(queries = newLeft, corpus = newRight)
}

/** Planner strategy mapping the logical node to its physical form. */
object CosineTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: CosineTopK =>
      CosineTopKExec(planLater(n.queries), planLater(n.corpus), n.k, n.output) :: Nil
    case _ => Nil
  }
}
