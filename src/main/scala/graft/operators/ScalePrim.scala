package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale primitives for per-group ORDERED computations (ranks,
  * running sums) that the naive window formulation funnels through
  * one task per group — the single surviving 100×-scale killer class
  * the round-2 audit found (probe_idx). The two-pass shape here is
  * the general cure; Style.detectedDf and pipe_shard both use it.
  */
object ScalePrim {

  /** Exclusive prefix sum of `value` within each `part` group in
    * `ord` order, appended as column `prefix` — order-equivalent to
    *
    *   sum(value) OVER (PARTITION BY part ORDER BY ord
    *                    ROWS UNBOUNDED PRECEDING EXCLUDING CURRENT)
    *
    * but no task ever sorts more than one `ord`-range bucket:
    * pass 1 aggregates per-(part, bucket) sums (map-side combinable)
    * and prefix-sums that small frame; pass 2 joins the broadcast
    * offsets back and finishes with a bounded in-bucket running sum.
    *
    * `ord` must be numeric and unique within a group. `bucketSize`
    * trades in-bucket window width against offsets-frame size; pick
    * ≈ sqrt(rows per group) so both passes stay balanced.
    *
    * The offsets frame carries rows/bucketSize entries. Up to
    * `maxBroadcastOffsetRows` it is broadcast (one map-side join, no
    * shuffle of the big side); beyond that — a corpus so large even
    * the per-bucket summary exceeds driver/executor broadcast reach —
    * the join escalates to a shuffle join on (part, __bkt), which
    * shuffles the big side once but never collects the offsets. The
    * switch is decided by COUNTING the offsets frame (it is cached
    * first, so the data scan behind it still runs exactly once); both
    * paths are exercised in ScalePrimSpec.
    */
  def exclusivePrefixSum(
      df: DataFrame, part: String, ord: String, value: Column,
      bucketSize: Long = 256L,
      maxBroadcastOffsetRows: Long = 4L << 20): DataFrame = {
    val bucketed = df
      .withColumn("__v", value.cast("long"))
      .withColumn("__bkt", floor(col(ord) / bucketSize))
    val wOff = Window.partitionBy(part).orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col(part), col("__bkt"))
      .agg(sum("__v").as("__bsum"))
      .withColumn("__off", coalesce(sum("__bsum").over(wOff), lit(0L)))
      .select(col(part), col("__bkt"), col("__off"))
      .cache()
    val joined =
      if (offsets.count() <= maxBroadcastOffsetRows)
        bucketed.join(broadcast(offsets), Seq(part, "__bkt"))
      else
        bucketed.join(offsets, Seq(part, "__bkt"))
    val wIn = Window.partitionBy(col(part), col("__bkt")).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, -1)
    joined
      .withColumn("prefix", col("__off") + coalesce(sum("__v").over(wIn), lit(0L)))
      .drop("__v", "__bkt", "__off")
  }
}
