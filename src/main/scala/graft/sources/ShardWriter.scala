package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The missing last step of the corpus-prep story: pipe_shard decides
  * the (source, shard_id) layout, THIS writes it — a partitioned
  * parquet corpus a training job can read shard-by-shard. Reference
  * analog: the toolkit persists derived artifacts to a content-keyed
  * store (model-audit cache.py:1-108); here the artifact is the
  * sharded corpus itself and the key is the directory layout.
  *
  * Layout: `outDir/source=<s>/shard_id=<k>/part-….parquet`, exactly
  * the hive-partitioned shape `spark.read.parquet(outDir)` restores.
  * The layout is DETERMINISTIC: shard assignment is the pipe_shard
  * floor rule (token prefix sums in doc_id order — ScalePrim, so no
  * task sorts a whole source), each (source, shard_id) is written by
  * exactly one task (repartition on the partition keys), rows are
  * sorted by doc_id within the file, and `maxRecordsPerFile` splits
  * deterministically AFTER that sort. Same inputs → byte-identical
  * file tree (modulo parquet footer timestamps).
  *
  * Scale notes: the doc→shard assignment is computed on an id-only
  * projection (the two text-carrying exchanges are the assignment
  * join and the final repartition — both unavoidable for a write
  * that must co-locate a shard's text in one task; a production
  * corpus bucketed by doc_id would make the first one shuffle-free).
  * Shards are token-budget-bounded by construction, so the per-task
  * write is bounded no matter the corpus size; maxRecordsPerFile is
  * the defensive valve under that.
  */
object ShardWriter {

  /** Per-DOC shard assignment — the same floor rule pipe_shard
    * aggregates: shard_id = floor(exclusive-prefix-token-sum /
    * budget) per source in doc_id order. Returns (doc_id, source,
    * tokens, shard_id); exchanges carry ids and counts only.
    */
  def assignments(docs: DataFrame,
      budget: Long = graft.operators.TextAnalysis.shardBudget): DataFrame = {
    val docsTok = docs.select(
      col("doc_id"), col("source"),
      graft.operators.TextAnalysis.tokenCountExpr.as("tokens"))
    graft.operators.ScalePrim
      .exclusivePrefixSum(docsTok, "source", "doc_id", col("tokens"))
      .withColumn("shard_id",
        floor(col("prefix") / lit(budget).cast("double")).cast("long"))
      .select("doc_id", "source", "tokens", "shard_id")
  }

  /** Write `docs` (doc_id, source, text) as the partitioned shard
    * layout under `outDir`. Returns the per-doc assignment frame the
    * layout was derived from (for callers that want to persist the
    * manifest next to the data).
    */
  def writeShards(docs: DataFrame, outDir: String,
      budget: Long = graft.operators.TextAnalysis.shardBudget,
      maxRecordsPerFile: Long = 1L << 20): DataFrame = {
    val assign = assignments(docs, budget)
    docs.select(col("doc_id"), col("source"), col("text"))
      .join(assign.select("doc_id", "tokens", "shard_id"), Seq("doc_id"))
      .repartition(col("source"), col("shard_id"))
      .sortWithinPartitions("doc_id")
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("source", "shard_id")
      .parquet(outDir)
    assign
  }

  /** Read a shard layout back; partition columns restored with the
    * writer's types (partition inference would narrow shard_id to
    * int).
    */
  def readShards(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
      .withColumn("shard_id", col("shard_id").cast("long"))
}
