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

  test("q44_zorder_read lists only the candidate strip of the z-layout") {
    val df = operators.Layout.zorderStrip(spark, sf)
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a file scan over the z-partitioned table")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.map(_.name).exists(_ == "zbucket")),
      s"zbucket missing from partitionFilters: ${scan.partitionFilters}")
    // the catalog hands the scan an already-pruned file index — the
    // strip touches at most 8 of the 64 z buckets (one px strip)
    val prunedDirs = scan.relation.location.listFiles(Nil, Nil).size
    assert(prunedDirs <= 8, s"strip read $prunedDirs partitions, expected <= 8")
    val table = operators.Layout.ensureLineitemZorder(spark, sf)
    val totalDirs = spark.table(table).queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head.relation.location.listFiles(Nil, Nil).size
    assert(prunedDirs < totalDirs,
      s"no file skipping: strip listed $prunedDirs of $totalDirs partitions")
    // the row predicate reaches the surviving parquet scans
    assert(scan.metadata.get("PushedFilters").exists(_.contains("EqualTo(l_partkey")),
      s"point predicate not pushed: ${scan.metadata.get("PushedFilters")}")
    // and the strip really is a superset of the key's rows
    import org.apache.spark.sql.functions._
    val viaStrip = SparkEntry.queries("q44_zorder_read")(spark, sf).collect()
    val flat = Tables.lineitem(spark, sf).filter(col("l_partkey") === 100)
      .groupBy("l_suppkey")
      .agg(
        count(lit(1)).as("n_items"),
        round(lit(1e-9) + sum("l_quantity"), 2).as("sum_qty"),
        round(lit(1e-9) + sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("l_suppkey").collect()
    assert(viaStrip.nonEmpty, "probe key must exist at every SF")
    assert(viaStrip.toSeq == flat.toSeq)
  }

  test("q31_zorder buckets are tight rectangles: point filters touch one strip") {
    val rows = SparkEntry.queries("q31_zorder")(spark, sf).collect()
    assert(rows.length > 8, s"expected a populated z-grid, got ${rows.length} buckets")
    // every bucket covers a small share of the (part, supp) rectangle —
    // the whole point of interleaving vs a one-dimensional sort
    val shares = rows.map(_.getAs[Double]("area_share"))
    assert(shares.forall(_ <= 0.25), s"a bucket spans ${shares.max} of the space")
    val avg = shares.sum / shares.length
    assert(avg <= 4.0 / 64,
      f"avg bucket area $avg%.4f exceeds 4x the ideal 1/64 cell")
    // a point filter on EITHER key touches only one grid strip (~8 of
    // 64 buckets), not all of them — that's the two-sided skipping win
    val (minP, maxP) = (rows.map(_.getAs[Long]("min_p")).min, rows.map(_.getAs[Long]("max_p")).max)
    val probeP = (minP + maxP) / 2
    val touchedP = rows.count(r => r.getAs[Long]("min_p") <= probeP && probeP <= r.getAs[Long]("max_p"))
    assert(touchedP <= 16, s"partkey point filter touches $touchedP of ${rows.length} buckets")
    val (minS, maxS) = (rows.map(_.getAs[Long]("min_s")).min, rows.map(_.getAs[Long]("max_s")).max)
    val probeS = (minS + maxS) / 2
    val touchedS = rows.count(r => r.getAs[Long]("min_s") <= probeS && probeS <= r.getAs[Long]("max_s"))
    assert(touchedS <= 16, s"suppkey point filter touches $touchedS of ${rows.length} buckets")
  }

  test("the physically z-written layout has tight per-file stats on BOTH keys") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    val b = li.agg(
      min("l_partkey").as("minp"), max("l_partkey").as("maxp"),
      min("l_suppkey").as("mins"), max("l_suppkey").as("maxs"))
    val g = li.select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
      .crossJoin(broadcast(b))
      .withColumn("px", expr(s"((p - minp) * 65536) div (maxp - minp + 1)"))
      .withColumn("sx", expr(s"((s - mins) * 65536) div (maxs - mins + 1)"))
      .withColumn("z", operators.Layout.zValue(col("px"), col("sx")))
    val out = java.nio.file.Files.createTempDirectory("zorder").toString
    // the production layout job: range-partition on z, sort within
    g.select("p", "s", "z").repartitionByRange(16, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(out)
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("p").as("minp"), max("p").as("maxp"),
        min("s").as("mins"), max("s").as("maxs"))
      .collect()
    assert(perFile.length > 4)
    val Seq(gp, gs) = Seq(("minp", "maxp"), ("mins", "maxs")).map { case (lo, hi) =>
      (perFile.map(_.getAs[Long](lo)).min, perFile.map(_.getAs[Long](hi)).max)
    }
    // each file's rectangle area stays well under the full rectangle —
    // min/max footer stats would prune it for most filters on either key
    val gArea = (gp._2 - gp._1 + 1).toDouble * (gs._2 - gs._1 + 1)
    val avgArea = perFile.map(r =>
      (r.getAs[Long]("maxp") - r.getAs[Long]("minp") + 1).toDouble *
        (r.getAs[Long]("maxs") - r.getAs[Long]("mins") + 1)).sum / perFile.length
    assert(avgArea <= gArea / 4,
      f"avg file covers ${avgArea / gArea}%.3f of the key space — no skipping value")
  }
}
