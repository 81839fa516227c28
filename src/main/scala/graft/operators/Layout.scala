package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-pruned data layout — the third production layout tool
  * next to bucketing (ScaleJoins.writeBucketed) and indexes (Ann):
  * a fact table written hive-partitioned by a low-cardinality derived
  * key, so time-sliced queries read ONLY the matching directories.
  * At 100 TB this is the difference between scanning a year (~1/7 of
  * the corpus) and scanning everything — pruning happens at planning
  * time from directory names, before a single parquet footer of an
  * excluded partition is opened.
  *
  * Mechanics mirror writeBucketed: a managed table (re)written when
  * the build inputs change, memoized per JVM so recurring queries
  * time the pruned READ, not the one-time layout job. LayoutSpec
  * asserts the plan prunes: the scan's partitionFilters are non-empty
  * and the selected file set shrinks vs. the full table.
  */
object Layout {

  /** What each partitioned table was last built from. */
  private val partitionedBuilt =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  /** Write `df` as a managed parquet table partitioned by `key`,
    * dropping any previous incarnation (including a stale warehouse
    * directory a fresh in-memory catalog has never heard of).
    */
  def writePartitioned(df: DataFrame, table: String, key: String): Unit = {
    val spark = df.sparkSession
    require(!table.contains("."),
      s"writePartitioned expects an unqualified default-database table name, got '$table'")
    val loc =
      if (spark.catalog.tableExists(table))
        new org.apache.hadoop.fs.Path(spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
          .location)
      else
        new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), table)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").partitionBy(key).saveAsTable(table)
  }

  /** Idempotent layout build (the ensureBucketed twin). */
  def ensurePartitioned(
      spark: SparkSession, df: => DataFrame, table: String, key: String,
      dir: String): Unit = {
    val want = (dir, key)
    if (!partitionedBuilt.get(table).contains(want) || !spark.catalog.tableExists(table)) {
      writePartitioned(df, table, key)
      partitionedBuilt(table) = want
    }
  }

  /** The one-time layout build for [[partitionPrune]]: lineitem's
    * pruned-projection written partitioned by ship year (7 partitions
    * here; day or month granularity at production volume). Table name
    * is keyed by the data dir (Tables.tableTag) so concurrent or
    * alternating scale factors never share a warehouse path; returns
    * the table name for the read side.
    */
  def ensureLineitemByYear(spark: SparkSession, dir: String): String = {
    val table = s"graft_li_byyear_${Tables.tableTag(dir)}"
    ensurePartitioned(spark, Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), year(col("l_shipdate")).as("ship_year")),
      table, "ship_year", dir)
    table
  }

  /** Registered query exercising the pruned path end-to-end: the 1996
    * pricing summary read from the year-partitioned layout. The
    * planner turns `ship_year = 1996` into a partition filter — only
    * the 1996 directory is listed and scanned (plan-asserted in
    * LayoutSpec); the oracle computes the same numbers from the flat
    * table with a row filter.
    */
  val partitionPrune = Q(
    "q18_partition_prune",
    """SELECT l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  round(1e-9 + sum(l_quantity), 2) AS sum_qty,
      |  round(1e-9 + sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |WHERE year(l_shipdate) = 1996
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    val table = ensureLineitemByYear(spark, dir)
    spark.table(table)
      .filter(col("ship_year") === 1996)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_items"),
        round(lit(1e-9) + sum("l_quantity"), 2).as("sum_qty"),
        round(lit(1e-9) + sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("l_returnflag")
  }

  /** Dynamic partition pruning — the RUNTIME sibling of q18's static
    * prune: the year-partitioned fact is semi-joined to orders
    * filtered by a date range, and the planner inserts a dynamic
    * pruning subquery on `ship_year` (no static partition predicate
    * exists anywhere in the query). At execution the filtered dim
    * side's distinct years are computed first and only the matching
    * fact directories are scanned — at 100 TB this is how a
    * "join-to-the-date-dim" query avoids reading the whole fact even
    * though the fact itself carries no filter. LayoutSpec asserts the
    * scan's partition filters contain the dynamic pruning expression.
    *
    * The oracle states the identical semantics over the flat tables:
    * lineitem rows whose ship year appears among the filtered orders'
    * years.
    */
  val dppJoin = Q(
    "q22_dpp",
    """SELECT year(l_shipdate) AS ship_year,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  round(1e-9 + sum(l_quantity), 2) AS sum_qty,
      |  round(1e-9 + sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |WHERE year(l_shipdate) IN (
      |  SELECT DISTINCT year(o_orderdate) FROM orders
      |  WHERE o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31')
      |GROUP BY 1
      |ORDER BY ship_year""".stripMargin) { (spark, dir) =>
    val table = ensureLineitemByYear(spark, dir)
    // distinct BEFORE the join: the semi-join build side and the DPP
    // subquery both see ≤|years| rows instead of every filtered order
    // (measured 7.9 → ~2 s at sf10 — broadcasting 2.8 M un-distinct
    // year rows was pure waste)
    val dimYears = Tables.orders(spark, dir)
      .filter(col("o_orderdate").between("1996-01-01", "1997-12-31"))
      .select(year(col("o_orderdate")).as("yr"))
      .distinct()
    // broadcast hint is justified by the policy (SF-independent side
    // only): distinct YEARS are calendar-bounded regardless of corpus
    // size. Without it the static planner sort-merges, shuffling the
    // whole pruned fact (17 M rows at sf10) against a ≤7-row build.
    spark.table(table)
      .join(broadcast(dimYears), col("ship_year") === col("yr"), "left_semi")
      .groupBy("ship_year")
      .agg(
        count(lit(1)).as("n_items"),
        round(lit(1e-9) + sum("l_quantity"), 2).as("sum_qty"),
        round(lit(1e-9) + sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("ship_year")
  }

  val all: Seq[Q] = Seq(partitionPrune, dppJoin)
}
