package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** All registered operators, in SURVEY §2 order. */
  def registry: Seq[Q] =
    operators.Relational.all ++
      operators.Events.all ++
      operators.Audit.all ++
      operators.Style.all ++
      operators.Report.all ++
      operators.ReportFull.all ++
      operators.Dedup.all ++
      operators.ScaleJoins.all ++
      operators.Layout.all ++
      operators.Graph.all ++
      operators.Distribution.all ++
      operators.Cdc.all ++
      operators.DataQuality.all ++
      operators.Maintain.all ++
      operators.Ann.all ++
      operators.Cluster.all ++
      operators.TextAnalysis.all ++
      operators.Tokenizer.all ++
      operators.Classifier.all ++
      operators.Search.all ++
      operators.Pipeline.all ++
      operators.Reef.all ++
      operators.Multimodal.all ++
      operators.BenchmarkEval.all ++
      operators.Stats.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full audit verdict — llmmap fingerprint compare + DLI
    * behavior-signature compare + majority vote — per model pair.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.Style.audit.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
