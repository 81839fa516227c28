package graft

import org.apache.spark.sql.execution.SimpleMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: these encode the scale properties the
  * operators are designed around (pushdown, pruning, broadcast,
  * bounded shuffles, no global sorts for top-k, cache reuse) so a
  * refactor that silently degrades the plan fails the suite.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.explainString(SimpleMode)

  test("q6 pushes filters into the parquet scan and prunes columns") {
    val p = plan("q6_filter_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate"))
    assert(!p.contains("l_orderkey"), "scan must not read unused columns")
  }

  test("q3 broadcasts dimensions and uses TakeOrderedAndProject for top-k") {
    val p = plan("q3_topk")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"), "top-k must not be a global sort")
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"))
  }

  test("q5 six-way join plans with broadcast joins and a single agg shuffle") {
    val p = plan("q5_multijoin")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4)
    assert(!p.contains("SortMergeJoin"), "dimension joins must not shuffle both sides")
    val aggExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(aggExchanges <= 1, s"expected at most the aggregation shuffle, got $aggExchanges")
  }

  test("ma_fingerprint is partial-aggregated (map-side combine)") {
    val p = plan("ma_fingerprint")
    assert(p.contains("partial_avg") || p.contains("partial_"),
      "fingerprint aggregation must have a partial (map-side) phase")
  }

  test("dd_lsh_pairs reuses the cached minhash signatures on both join sides") {
    val p = plan("dd_lsh_pairs")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      "self-join sides must read the cached signature table, not recompute hashing")
  }

  test("ann_lsh joins on the bucket key, not a full cross product") {
    val p = plan("ann_lsh")
    assert(p.contains("bucket"), "bucketed ANN must join on the bucket column")
    assert(!p.contains("CartesianProduct"))
  }
}
