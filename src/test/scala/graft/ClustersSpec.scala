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

  test("planted random graphs: labels equal in-JVM union-find components") {
    import spark.implicits._
    // deterministic pseudo-random edge sets of three densities; the
    // two-phase star loop must agree with union-find on every node
    for ((n, m, seed) <- Seq((50, 30, 1L), (300, 300, 2L), (400, 1200, 3L))) {
      val rnd = new scala.util.Random(seed)
      val pairs = (0 until m).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // component minimum per member (roots union toward the min but
      // path order can leave a non-min root — take min over members)
      val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .groupBy(v => find(v.toInt)).values
        .flatMap(vs => { val mn = vs.min; vs.map(_ -> mn) }).toMap
      val df = pairs.toDF("doc_a", "doc_b")
      val edges = df.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .union(df.select(col("doc_b").as("u"), col("doc_a").as("v")))
      val (labels, rounds) = operators.Dedup.connectedComponents(edges)
      info(s"n=$n m=${pairs.size}: $rounds rounds")
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == members, s"seed=$seed diverged: ${(got.toSet -- members.toSet).take(5)}")
    }
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
