package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for ann_mips (augmented-space MIPS) and gr_ppr (personalized
  * PageRank) beyond their oracle hash checks: exact-score and recall
  * reconciliation against driver-side brute force, and a full
  * driver-side replay of the PPR recursion.
  */
class MipsPprSpec extends AnyFunSuite {
  import SparkTestSession._

  private def embeddings: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  test("ann_mips scores are exact weighted products and IVF recall clears the floor") {
    val rows = SparkEntry.queries("ann_mips")(spark, sf).collect()
    assert(rows.nonEmpty)
    val vecs = embeddings
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def weight(id: Long): Double = 1.0 + (id % 7) / 4.0
    for (r <- rows) {
      val nid = r.getAs[Long]("neighbor_id")
      val expected = weight(nid) * dot(vecs(r.getAs[Long]("query_id")), vecs(nid))
      assert(math.abs(r.getAs[Double]("score") - expected) < 1e-4,
        s"returned score must be the exact popularity-weighted inner product")
    }
    // per-query ranking is by score desc
    for ((_, rs) <- rows.groupBy(_.getAs[Long]("query_id"))) {
      val scores = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("score")).toSeq
      assert(scores.sliding(2).forall(w => w.size < 2 || w(0) >= w(1) - 1e-9))
    }
    // recall@10 vs driver-side brute-force weighted MIPS (corpus is
    // small at this SF): the IVF probe path measured 0.84@4 at sf0.01
    // — the floor pins it (the norm-augmentation LSH alternative
    // measured 0.10 and is rejected in the ann_mips docstring)
    val nonZero = vecs.filter { case (_, v) => dot(v, v) > 0 }
    val queryIds = rows.map(_.getAs[Long]("query_id")).distinct.toSeq
    assert(queryIds.nonEmpty)
    val recalls = queryIds.map { q =>
      val truth = nonZero.toSeq.filter(_._1 != q)
        .map { case (id, v) => (weight(id) * dot(nonZero(q), v), id) }
        .sortBy { case (d, id) => (-d, id) }.take(10).map(_._2).toSet
      val got = rows.filter(_.getAs[Long]("query_id") == q)
        .map(_.getAs[Long]("neighbor_id")).toSet
      (got intersect truth).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean MIPS recall@10 $mean below the pinned floor")
    // MIPS must be genuinely distinct from cosine on the weighted corpus:
    // at least one query's top-10 differs from the cosine top-10
    val distinctFromCosine = queryIds.exists { q =>
      val cosTruth = nonZero.toSeq.filter(_._1 != q)
        .map { case (id, v) => (dot(nonZero(q), v), id) }
        .sortBy { case (d, id) => (-d, id) }.take(10).map(_._2).toSet
      val mipsTruth = nonZero.toSeq.filter(_._1 != q)
        .map { case (id, v) => (weight(id) * dot(nonZero(q), v), id) }
        .sortBy { case (d, id) => (-d, id) }.take(10).map(_._2).toSet
      cosTruth != mipsTruth
    }
    assert(distinctFromCosine, "weighted MIPS truth must differ from cosine truth")
  }

  test("gr_ppr matches a driver-side replay and conserves unit mass") {
    val out = SparkEntry.queries("gr_ppr")(spark, sf).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
    assert(out.nonEmpty)
    // replay: same bidirectional distinct edge set, 6 damped rounds
    val e0 = Tables.lineitem(spark, sf)
      .select(col("l_partkey").as("src"), (col("l_suppkey") + 1000000000L).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = e0 ++ e0.map { case (s, d) => (d, s) }
    val outdeg = edges.groupBy(_._1).map { case (n, es) => n -> es.size }
    val nodes = outdeg.keySet
    val seeds = nodes.toSeq.sorted.take(4).toSet
    var rank: Map[Long, Double] =
      nodes.iterator.map(n => n -> (if (seeds(n)) 0.25 else 0.0)).toMap
    for (_ <- 1 to 6) {
      val flow = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.iterator.map { case (s, _) => rank(s) / outdeg(s) }.sum }
      rank = nodes.iterator.map(n =>
        n -> ((if (seeds(n)) 0.0375 else 0.0) + 0.85 * flow.getOrElse(n, 0.0))).toMap
    }
    assert(out.keySet == nodes)
    for ((n, r) <- rank)
      assert(math.abs(out(n) - r) < 1e-5, s"node $n diverges from the replay")
    // unit mass: Σr' = 0.15 + 0.85·Σr with Σr0 = 1 → every round sums to 1
    assert(math.abs(out.values.sum - 1.0) < 1e-3)
    // seed ranks dominate: restart mass anchors at the seed set
    val med = out.values.toSeq.sorted.apply(out.size / 2)
    assert(seeds.forall(s => out(s) > med),
      "every seed must rank above the median node")
  }
}
