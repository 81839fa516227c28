package graft.tools

import org.apache.spark.sql.SparkSession

/** Build-time tool: the DEGENERATE dataset — every table present with
  * its real schema and ZERO rows (derived via limit(0) from a real
  * scale-factor dir, never synthesized, so schemas cannot drift).
  * The empty-input class is the one neither the SF series nor the
  * pathological fuzz tables cover, and it found four real
  * cross-engine deviations on first run: Spark emits no grand-total
  * row from ROLLUP/CUBE/GROUPING SETS over an empty table where
  * standard SQL (and DuckDB) emit one with count 0, and q26's ALL
  * row carries NULL (not TRUE) bracket booleans over an empty corpus
  * — all four now documented in the oracles themselves.
  * FuzzEdgeSpec runs the full registry on this dir; graft.Verify +
  * tools/check.py on the same dir is the oracle gate.
  */
object GenEmpty {

  val Tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def generate(spark: SparkSession, fromDir: String, outDir: String): Unit =
    Tables.foreach { t =>
      spark.read.parquet(s"$fromDir/$t.parquet")
        .limit(0)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }

  def main(args: Array[String]): Unit = {
    val Array(fromDir, outDir) = args.take(2)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    generate(spark, fromDir, outDir)
    spark.stop()
  }
}
