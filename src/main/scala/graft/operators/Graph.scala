package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed link analysis — PageRank over the part↔supplier
  * co-purchase graph (parts and suppliers as nodes, one undirected
  * edge per distinct (part, supplier) lineitem pairing; supplier ids
  * offset by 1e9 into a disjoint node-id range). Link-analysis rank
  * is the classic crawl-corpus quality weight a training-data
  * pipeline attaches to web documents; here it runs on the star
  * schema's natural bipartite graph so the oracle can replay it.
  *
  * Iteration shape is textbook distributed PageRank: ranks live as a
  * |V|-row frame keyed by node; each of the 10 fixed iterations is
  * one shuffle join (contributions = rank/outdeg routed along edges)
  * plus one keyed aggregation — edge data (fixed-width longs, never
  * text) is built ONCE, persisted, and reused by every iteration
  * (SessionMemo; the bench bills it as a one-time build). Because
  * edges are bidirectional every node has outdegree ≥ 1 — no
  * dangling-mass term — and in-degree ≥ 1, so the node set is stable
  * across iterations and the damped update
  * r' = 0.15 + 0.85·Σ r/outdeg is deterministic. Only the FINAL ranks
  * are rounded (6 dp); float drift from differing partial-sum orders
  * stays ~1e-13, far under the rounding nudge. At 100 TB each
  * iteration's frame would also be checkpointed to truncate lineage;
  * at 10 fixed iterations the composed plan is fine as-is.
  */
object Graph {

  private val SuppOffset = 1000000000L
  private val Damping = 0.85
  private val Iters = 10

  /** One-time edge build: bidirectional distinct (part, supplier)
    * edges joined with outdegree, persisted via SessionMemo.
    */
  def edgesWithDeg(spark: SparkSession, dir: String): DataFrame =
    graft.SessionMemo.frames(spark, s"graph.edges:$dir") {
      val e0 = Tables.lineitem(spark, dir)
        .select(col("l_partkey").as("src"),
          (col("l_suppkey") + SuppOffset).as("dst"))
        .distinct()
      val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val e2 = edges.join(deg, "src")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e2.count() // materialize eagerly: queries time the iterations
      Seq(e2)
    }.head

  /** The oracle unrolls the same 10 damped iterations as chained
    * CTEs (standard SQL recursive CTEs forbid aggregation in the
    * recursive member, so the fixed iteration count is spelled out).
    */
  private def oracleSql: String = {
    val iters = (1 to Iters).map { i =>
      s"""r$i AS (SELECT e2.dst AS node,
         |  CAST(0.15 AS DOUBLE) + CAST($Damping AS DOUBLE) * sum(r.rank / e2.outdeg) AS rank
         |  FROM e2 JOIN r${i - 1} r ON e2.src = r.node GROUP BY e2.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT DISTINCT l_partkey AS src, l_suppkey + $SuppOffset AS dst FROM lineitem
       |),
       |edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
       |e2 AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d ON e.src = d.src),
       |r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) AS rank FROM deg),
       |$iters
       |SELECT node, round(1e-9 + rank, 6) AS rank
       |FROM r$Iters
       |ORDER BY node""".stripMargin
  }

  val pagerank = Q("gr_pagerank", oracleSql) { (spark, dir) =>
    val e2 = edgesWithDeg(spark, dir)
    var ranks: DataFrame = e2.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1.0).as("rank"))
    for (_ <- 1 to Iters) {
      // name-based USING join sidesteps self-join column ambiguity
      // (every iteration's ranks frame descends from e2 itself)
      ranks = e2.join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy("dst")
        .agg((lit(0.15) + lit(Damping) * sum(col("rank") / col("outdeg"))).as("rank"))
        .select(col("dst").as("node"), col("rank"))
    }
    ranks.select(col("node"), round(lit(1e-9) + col("rank"), 6).as("rank"))
      .orderBy("node")
  }

  val all: Seq[Q] = Seq(pagerank)
}
