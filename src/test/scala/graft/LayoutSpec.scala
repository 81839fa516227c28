package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** The partition-pruned layout must actually PRUNE: the claim is that
  * `ship_year = 1996` becomes a planning-time partition filter that
  * shrinks the scanned file set, not a row filter evaluated over the
  * whole table.
  */
class LayoutSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q18 reads the year-partitioned layout with a partition filter") {
    val table = operators.Layout.ensureLineitemByYear(spark, sf)
    val df = spark.table(table)
      .filter(org.apache.spark.sql.functions.col("ship_year") === 1996)
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a file scan over the partitioned table")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.map(_.name).exists(_ == "ship_year")),
      s"ship_year missing from partitionFilters: ${scan.partitionFilters}")
    val allParts = spark.table(table)
      .select("ship_year").distinct().count()
    assert(allParts >= 7, s"expected ≥7 year partitions, got $allParts")
    // the pruned scan's file index holds strictly fewer files than an
    // unfiltered scan of the same table (the catalog hands the scan an
    // already-pruned index, so compare against a full-scan twin)
    val prunedFiles = scan.relation.location.listFiles(Nil, Nil).map(_.files.size).sum
    val fullScan = spark.table(table).queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    val totalFiles = fullScan.relation.location.listFiles(Nil, Nil).map(_.files.size).sum
    assert(prunedFiles < totalFiles,
      s"partition pruning read $prunedFiles of $totalFiles files")
  }

  test("q22 prunes partitions DYNAMICALLY from the joined dim side") {
    // no static partition predicate exists anywhere in q22_dpp — the
    // only way its scan can carry a ship_year partition filter is the
    // planner's dynamic-pruning subquery built from the filtered
    // orders side
    val df = SparkEntry.queries("q22_dpp")(spark, sf)
    // AQE wraps the tree, so inspect the final-plan string (the
    // PlanSpec discipline): the fact scan must carry a dynamic
    // pruning expression in its PartitionFilters
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains(s"graft_li_byyear_${Tables.tableTag(sf)}"),
      s"no scan of the partitioned fact:\n$p")
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning expression in the plan:\n$p")
    // and the join semantics are right: only 1996/1997 survive
    val years = df.collect().map(_.getAs[Int]("ship_year")).toSet
    assert(years == Set(1996, 1997), s"expected {1996,1997}, got $years")
  }

  test("q18 matches the flat-table row filter") {
    import org.apache.spark.sql.functions._
    val pruned = SparkEntry.queries("q18_partition_prune")(spark, sf).collect()
    val flat = Tables.lineitem(spark, sf)
      .filter(year(col("l_shipdate")) === 1996)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_items"),
        round(lit(1e-9) + sum("l_quantity"), 2).as("sum_qty"),
        round(lit(1e-9) + sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("l_returnflag").collect()
    assert(pruned.toSeq == flat.toSeq)
  }
}
