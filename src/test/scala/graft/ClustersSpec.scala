package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Convergence-shape tests for the distributed connected-components
  * loop behind dd_clusters: pointer jumping must converge in
  * O(log n) rounds even on a deep chain (where one-hop min-label
  * propagation would need n rounds and silently time out at the old
  * 50-round cap), and hitting the round cap while labels still change
  * must fail loudly, never emit partial components.
  */
class ClustersSpec extends AnyFunSuite {
  import SparkTestSession._

  private def chainEdges(n: Int) = {
    import spark.implicits._
    val pairs = (0L until n - 1L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
  }

  test("a 200-node chain converges in O(log n) rounds, all labels = component min") {
    val (labels, rounds) = operators.Dedup.connectedComponents(chainEdges(200))
    assert(rounds <= 12, s"pointer jumping should need ~log2(200)≈8 rounds, took $rounds")
    val rows = labels.collect()
    assert(rows.length == 200)
    assert(rows.forall(_.getLong(1) == 0L), "every chain member must resolve to doc 0")
  }

  test("disjoint components each get their own min label") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L))
      .toDF("doc_a", "doc_b")
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
    val (labels, _) = operators.Dedup.connectedComponents(edges)
    val m = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(m(_) == 1L))
    assert(Seq(10L, 11L).forall(m(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(m(_) == 20L))
  }

  test("hitting the round cap while still changing fails loudly") {
    val e = intercept[IllegalStateException] {
      operators.Dedup.connectedComponents(chainEdges(64), maxRounds = 2)
    }
    assert(e.getMessage.contains("rounds"))
  }

  test("km_silhouette: bounded scores, full coverage, counts match km_profile") {
    val sil = SparkEntry.queries("km_silhouette")(spark, sf).collect()
    assert(sil.nonEmpty)
    for (r <- sil) {
      val (a, m) = (r.getAs[Double]("avg_sil"), r.getAs[Double]("min_sil"))
      assert(a >= -1.0 - 1e-6 && a <= 1.0 + 1e-6)
      assert(m <= a + 1e-9, "min silhouette cannot exceed the mean")
    }
    val prof = SparkEntry.queries("km_profile")(spark, sf).collect()
      .map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("n_members")).toMap
    assert(sil.map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("n_members")).toMap
      == prof, "silhouette must see exactly the profile's membership")
  }
}
