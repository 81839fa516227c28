package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed fingerprint store — the engine-side analog of the
  * reference's FingerprintCache (cache.py): keyed by
  * (model, method, provider), with created_at TTL filtering.
  *
  * Layout: one parquet dataset partitioned by method — lookups for a
  * single method prune to one partition directory, and a model-level
  * lookup is a pushed-down equality filter. At fleet scale this is
  * the natural "fingerprint lake" layout: appends are new files, TTL
  * expiry is a partition-pruned filter, compaction is a rewrite.
  */
object FingerprintStore {

  /** Append fingerprint rows (any schema + model/method/provider
    * columns); stamps created_at_s.
    */
  def put(df: DataFrame, path: String, nowEpochS: Long): Unit =
    df.withColumn("created_at_s", lit(nowEpochS))
      .write.mode(SaveMode.Append)
      .partitionBy("method")
      .parquet(path)

  /** Load live fingerprints for a method (TTL in seconds, 0 = no
    * expiry), newest per (model, provider).
    */
  def get(
      spark: SparkSession,
      path: String,
      method: String,
      nowEpochS: Long,
      ttlS: Long = 0L): DataFrame = {
    val all = spark.read.parquet(path)
      .filter(col("method") === method)
    val live =
      if (ttlS > 0) all.filter(col("created_at_s") >= nowEpochS - ttlS) else all
    // newest wins per key — same semantics as the reference cache's
    // overwrite-on-put, expressed as a max-timestamp semi-join (no
    // window over the full store)
    val latest = live.groupBy("model", "provider")
      .agg(max("created_at_s").as("created_at_s"))
    live.join(latest, Seq("model", "provider", "created_at_s"))
  }

  /** Overwrite-writes below read lazily from `path`; writing the same
    * location would delete the source mid-read and lose the store.
    * Paths are fully qualified against the filesystem before the
    * comparison, so spelling variants of one directory ("file:/x" vs
    * "/x", relative vs absolute) can't slip past the guard.
    */
  private def requireDistinct(
      spark: SparkSession, path: String, outPath: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    def qualified(p: String): Path = {
      val hp = new Path(p)
      hp.getFileSystem(conf).makeQualified(hp)
    }
    require(qualified(outPath) != qualified(path),
      s"outPath must differ from path ($path): an in-place overwrite would " +
        "delete the store while it is being read")
  }

  /** Drop expired entries by rewriting live partitions (compaction). */
  def expire(spark: SparkSession, path: String, method: String,
      nowEpochS: Long, ttlS: Long, outPath: String): Long = {
    requireDistinct(spark, path, outPath)
    val live = get(spark, path, method, nowEpochS, ttlS)
    val n = live.count()
    live.write.mode(SaveMode.Overwrite).partitionBy("method").parquet(outPath)
    n
  }

  /** Catalog of stored entries — cache.py:63-89 list_entries analog:
    * one row per (model, method, provider) with newest/oldest stamps
    * and the version count. Metadata-only aggregation over the
    * partition-pruned scan; no fingerprint payload columns are read.
    */
  def listEntries(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy("model", "method", "provider")
      .agg(
        count(lit(1)).as("n_versions"),
        max("created_at_s").as("newest_created_at_s"),
        min("created_at_s").as("oldest_created_at_s"))
      .orderBy("method", "model", "provider")

  /** Remove entries — cache.py:91-101 clear analog, scoped to one
    * method (partition delete shape) or the whole store. On an object
    * store the per-method form maps to dropping one partition
    * directory; here it rewrites the surviving partitions to outPath
    * and returns how many rows were removed.
    */
  def clear(spark: SparkSession, path: String, outPath: String,
      method: Option[String] = None): Long = {
    requireDistinct(spark, path, outPath)
    val all = spark.read.parquet(path)
    val total = all.count()
    method match {
      case Some(m) =>
        // null-safe: rows with a null method are KEPT, not dropped
        val kept = all.filter(!(col("method") <=> m))
        val n = kept.count()
        kept.write.mode(SaveMode.Overwrite).partitionBy("method").parquet(outPath)
        total - n
      case None =>
        // full clear: write one empty non-partitioned file (a
        // zero-row partitioned write emits no data files at all and
        // the schema would be lost) so reads of outPath still resolve
        all.limit(0).repartition(1).write.mode(SaveMode.Overwrite).parquet(outPath)
        total
    }
  }
}
