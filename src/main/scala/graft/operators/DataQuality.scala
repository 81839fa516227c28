package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the Deequ/dbt-tests shape):
  * a suite of named checks over the warehouse tables — primary-key
  * uniqueness, value compliance, consistency between a stored column
  * and its definition, and referential integrity — each reported as
  * (table, check, row count, violation count, pass).
  *
  * Scale shape: every SCAN check on a table fuses into ONE
  * conditional-aggregation pass (sum(CASE WHEN violated)) — adding a
  * check adds a column to the aggregate, not a scan; the 1-row agg
  * result fans out to check rows via stack() on the driver-sized
  * frame. Referential checks are LEFT ANTI joins carrying only the
  * key column on both sides (AQE free to broadcast the distinct
  * parent keys or shuffle past broadcast reach — no hint, the
  * tx_unigram_ppl posture, since at 100 TB a parent table can exceed
  * the driver). Reference analog: the toolkit validates its input
  * response sets before fingerprinting (engine.py:107-163 rejects
  * malformed/empty corpora); this is that gate at warehouse scale.
  */
object DataQuality {

  private def fkViolations(child: DataFrame, key: String, parent: DataFrame, pkey: String): DataFrame =
    child.select(col(key)).join(
      parent.select(col(pkey)).distinct(),
      col(key) === col(pkey), "left_anti")
      .agg(count(lit(1)).as("violations"))

  val audit = Q(
    "dq_audit",
    """SELECT tbl, chk, n_rows, violations, violations = 0 AS pass FROM (
      |  SELECT 'documents' AS tbl, 'nchars_consistent' AS chk,
      |    CAST(count(*) AS BIGINT) AS n_rows,
      |    CAST(sum(CASE WHEN n_chars IS NULL OR text IS NULL
      |      OR n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT) AS violations
      |  FROM documents
      |  UNION ALL
      |  SELECT 'documents', 'nonempty_text', CAST(count(*) AS BIGINT),
      |    CAST(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM documents
      |  UNION ALL
      |  SELECT 'lineitem', 'fk_orderkey_orders',
      |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
      |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      |      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |  UNION ALL
      |  SELECT 'lineitem', 'qty_range_1_50', CAST(count(*) AS BIGINT),
      |    CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50
      |      THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'orders', 'fk_custkey_customer',
      |    (SELECT CAST(count(*) AS BIGINT) FROM orders),
      |    (SELECT CAST(count(*) AS BIGINT) FROM orders o
      |      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |  UNION ALL
      |  SELECT 'orders', 'nonneg_totalprice', CAST(count(*) AS BIGINT),
      |    CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'orders', 'pk_unique_orderkey', CAST(count(*) AS BIGINT),
      |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
      |  FROM orders
      |)
      |ORDER BY tbl, chk""".stripMargin) { (spark, dir) =>
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val docs = Tables.documents(spark, dir)

    def viol(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))

    // one conditional-aggregation scan per table, fanned out to
    // (chk, violations) rows by stack() on the 1-row result
    val docChecks = docs.agg(
      count(lit(1)).as("n_rows"),
      viol(col("n_chars").isNull || col("text").isNull ||
        col("n_chars") =!= length(col("text"))).as("v_nchars"),
      viol(col("text").isNull || length(col("text")) === 0).as("v_empty"))
      .selectExpr("'documents' AS tbl", "n_rows",
        "stack(2, 'nchars_consistent', v_nchars, 'nonempty_text', v_empty) AS (chk, violations)")
    val liScan = li.agg(
      count(lit(1)).as("n_rows"),
      viol(col("l_quantity").isNull || col("l_quantity") < 1 || col("l_quantity") > 50)
        .as("v_qty"))
      .selectExpr("'lineitem' AS tbl", "n_rows",
        "stack(1, 'qty_range_1_50', v_qty) AS (chk, violations)")
    val oScan = orders.agg(
      count(lit(1)).as("n_rows"),
      viol(col("o_totalprice").isNull || col("o_totalprice") <= 0).as("v_price"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_pk"))
      .selectExpr("'orders' AS tbl", "n_rows",
        "stack(2, 'nonneg_totalprice', v_price, 'pk_unique_orderkey', v_pk) AS (chk, violations)")
    // referential integrity: key-only anti joins; the table's row
    // count rides in from its scan-check aggregate (1-row cross join)
    val liFk = fkViolations(li, "l_orderkey", orders, "o_orderkey")
      .crossJoin(liScan.select(col("n_rows")).limit(1))
      .select(lit("lineitem").as("tbl"), col("n_rows"),
        lit("fk_orderkey_orders").as("chk"), col("violations"))
    val oFk = fkViolations(orders, "o_custkey", customer, "c_custkey")
      .crossJoin(oScan.select(col("n_rows")).limit(1))
      .select(lit("orders").as("tbl"), col("n_rows"),
        lit("fk_custkey_customer").as("chk"), col("violations"))

    docChecks.unionByName(liScan).unionByName(oScan)
      .unionByName(liFk).unionByName(oFk)
      .select(col("tbl"), col("chk"), col("n_rows"), col("violations"),
        (col("violations") === 0).as("pass"))
      .orderBy("tbl", "chk")
  }

  /** Profiled lineitem columns: (name, kind) with kind deciding which
    * numeric summary applies (num → min/max/avg/std, ts → epoch
    * min/max, str → counts only).
    */
  private val ProfCols = Seq(
    ("l_orderkey", "num"), ("l_quantity", "num"), ("l_extendedprice", "num"),
    ("l_discount", "num"), ("l_tax", "num"), ("l_returnflag", "str"),
    ("l_linestatus", "str"), ("l_shipdate", "ts"))

  /** Column profiler — dq_audit's descriptive sibling (the Deequ
    * ColumnProfiler / dbt-docs stats shape): per column of lineitem,
    * row/null/exact-distinct counts plus the numeric five-number
    * summary where the type admits one. The whole profile is ONE
    * aggregation pass: the eight count(DISTINCT) columns plan as a
    * single Expand (8× narrow (gid, value) pairs into one shuffle —
    * the standard multi-distinct plan; cost is 8 narrow copies of
    * the scan, NOT 8 scans), every other metric rides the same
    * aggregate, and the 1-row result fans out to per-column rows
    * map-side. Adding a profiled column adds Expand width, never a
    * pass. At 100 TB the exact distincts are the expensive honesty —
    * a production profiler swaps them for the stored HLL sketches
    * (q19 machinery) column-for-column.
    */
  val profile = Q(
    "dq_profile", {
      def one(c: String, kind: String): String = {
        val stats = kind match {
          case "num" =>
            s"""round(1e-9 + min($c), 4) AS min_num,
               |  round(1e-9 + max($c), 4) AS max_num,
               |  round(1e-9 + avg($c), 4) AS avg_num,
               |  round(1e-9 + stddev($c), 4) AS std_num""".stripMargin
          case "ts" =>
            s"""round(1e-9 + epoch(min($c)), 4) AS min_num,
               |  round(1e-9 + epoch(max($c)), 4) AS max_num,
               |  CAST(NULL AS DOUBLE) AS avg_num,
               |  CAST(NULL AS DOUBLE) AS std_num""".stripMargin
          case _ =>
            s"""CAST(NULL AS DOUBLE) AS min_num,
               |  CAST(NULL AS DOUBLE) AS max_num,
               |  CAST(NULL AS DOUBLE) AS avg_num,
               |  CAST(NULL AS DOUBLE) AS std_num""".stripMargin
        }
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  $stats
           |FROM lineitem""".stripMargin
      }
      ProfCols.map { case (c, k) => one(c, k) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    }) { (spark, dir) =>
    val t = Tables.lineitem(spark, dir)
    val aggs: Seq[Column] = count(lit(1)).as("n") +: ProfCols.flatMap { case (c, k) =>
      val base = Seq(
        count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"dist_$c"))
      val stats = k match {
        case "num" => Seq(
          round(lit(1e-9) + min(col(c)), 4).as(s"min_$c"),
          round(lit(1e-9) + max(col(c)), 4).as(s"max_$c"),
          round(lit(1e-9) + avg(col(c)), 4).as(s"avg_$c"),
          round(lit(1e-9) + stddev(col(c)), 4).as(s"std_$c"))
        case "ts" => Seq(
          round(lit(1e-9) + min(col(c)).cast("timestamp").cast("double"), 4)
            .as(s"min_$c"),
          round(lit(1e-9) + max(col(c)).cast("timestamp").cast("double"), 4)
            .as(s"max_$c"))
        case _ => Nil
      }
      base ++ stats
    }
    val one = t.agg(aggs.head, aggs.tail: _*)
    val nullD = lit(null).cast("double")
    val rows = ProfCols.map { case (c, k) =>
      val (mn, mx) =
        if (k == "str") (nullD, nullD) else (col(s"min_$c"), col(s"max_$c"))
      val (av, sd) =
        if (k == "num") (col(s"avg_$c"), col(s"std_$c")) else (nullD, nullD)
      struct(
        lit(c).as("col_name"), col("n"),
        (col("n") - col(s"nn_$c")).as("n_null"),
        col(s"dist_$c").as("n_distinct"),
        mn.as("min_num"), mx.as("max_num"), av.as("avg_num"), sd.as("std_num"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
      .orderBy("col_name")
  }

  /** Order-independent table checksum — the replication/migration
    * reconciliation primitive: two systems each fold every row to a
    * canonical key-column string, hash it, and SUM the hashes per
    * slice; equal (n_rows, checksum) pairs certify the copy without
    * moving a row. The canonical string uses integer/flag columns
    * only (floats and timestamps render differently across engines —
    * a real deployment pins a canonical decimal rendering; the
    * integer subset keeps the oracle exact). Shape: ONE map-side-
    * combined hash aggregate to |groups| rows — commutative sums make
    * the checksum partition-order-proof, which is the whole point.
    * The running sum rides DECIMAL(38,0) (Spark) / HUGEINT (DuckDB)
    * so it cannot overflow before the final mod at any row count.
    */
  val checksum = Q(
    "dq_checksum", {
      val h = graft.functions.Hashing.charFoldSql(
        "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_partkey AS VARCHAR) || '|' || " +
          "CAST(l_suppkey AS VARCHAR) || '|' || l_returnflag || '|' || l_linestatus")
      s"""SELECT l_returnflag,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum($h) % 1000000007 AS BIGINT) AS checksum
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    }) { (spark, dir) =>
    // concat (NOT concat_ws): a NULL column must null the whole row
    // string exactly as SQL || does, so both engines skip it in sum
    val h = graft.functions.Hashing.charFold(concat(
      col("l_orderkey").cast("string"), lit("|"), col("l_partkey").cast("string"),
      lit("|"), col("l_suppkey").cast("string"), lit("|"), col("l_returnflag"),
      lit("|"), col("l_linestatus")))
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        (sum(h.cast("decimal(38,0)")) % 1000000007L).cast("long").as("checksum"))
      .orderBy("l_returnflag")
  }

  val all: Seq[Q] = Seq(audit, profile, checksum)
}
