package graft

import graft.operators.ScalePrim
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-pass exclusive prefix sum must agree with the naive
  * single-window formulation on every row — including order keys that
  * straddle bucket boundaries, groups smaller than one bucket, and
  * sparse/non-contiguous keys.
  */
class ScalePrimSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("exclusivePrefixSum equals the naive per-group window") {
    // deterministic pseudo-random rows: sparse ids across 3 groups,
    // bucketSize 4 so most groups span several buckets
    val rows = (0 until 200).map { i =>
      val id = i * 3 + (i % 7)           // strictly increasing, sparse
      val grp = s"g${i % 3}"
      val v = (i * 31 % 13).toLong
      (grp, id.toLong, v)
    }
    val df = rows.toDF("part", "ord", "v").repartition(8)

    val got = ScalePrim.exclusivePrefixSum(df, "part", "ord", col("v"), bucketSize = 4L)
      .select("part", "ord", "prefix")
    val w = Window.partitionBy("part").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("prefix", coalesce(sum("v").over(w), lit(0L)))
      .select("part", "ord", "prefix")

    val diff = got.as("a").join(want.as("b"), Seq("part", "ord"))
      .filter(col("a.prefix") =!= col("b.prefix"))
    assert(diff.count() == 0, "two-pass prefix sum diverged from the naive window")
    assert(got.count() == rows.length)
  }

  test("shuffle-join offsets fallback matches the broadcast path exactly") {
    val rows = (0 until 200).map { i =>
      (s"g${i % 3}", (i * 3 + (i % 7)).toLong, (i * 31 % 13).toLong)
    }
    val df = rows.toDF("part", "ord", "v").repartition(8)
    val viaBroadcast = ScalePrim.exclusivePrefixSum(df, "part", "ord", col("v"), bucketSize = 4L)
    // maxBroadcastOffsetRows = 0 forces the beyond-broadcast-reach path
    val viaShuffle = ScalePrim.exclusivePrefixSum(
      df, "part", "ord", col("v"), bucketSize = 4L, maxBroadcastOffsetRows = 0L)

    // the escalated path must carry NO broadcast hint (AQE may still
    // pick a broadcast join for tiny test data — the guarantee under
    // test is that we stopped FORCING a driver-side collect)
    assert(!viaShuffle.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "fallback path must not hint a broadcast of the offsets frame")
    assert(viaBroadcast.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "default path should broadcast the small offsets frame")

    val diff = viaShuffle.as("a").join(viaBroadcast.as("b"), Seq("part", "ord"))
      .filter(col("a.prefix") =!= col("b.prefix"))
    assert(diff.count() == 0, "shuffle fallback diverged from the broadcast path")
    assert(viaShuffle.count() == rows.length)
  }

  test("recursive offsets (buckets-of-buckets) match the naive window exactly") {
    val rows = (0 until 500).map { i =>
      (s"g${i % 2}", (i * 3 + (i % 7)).toLong, (i * 17 % 11).toLong)
    }
    val df = rows.toDF("part", "ord", "v").repartition(8)
    // maxWindowRows = 0 forces recursion at EVERY level until the
    // summary stops shrinking — the deepest exercise of the shape
    val got = ScalePrim.exclusivePrefixSum(
      df, "part", "ord", col("v"), bucketSize = 4L, maxWindowRows = 0L)
      .select("part", "ord", "prefix")
    val w = Window.partitionBy("part").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("prefix", coalesce(sum("v").over(w), lit(0L)))
      .select("part", "ord", "prefix")
    val diff = got.as("a").join(want.as("b"), Seq("part", "ord"))
      .filter(col("a.prefix") =!= col("b.prefix"))
    assert(diff.count() == 0, "recursive two-pass prefix sum diverged from the naive window")
    assert(got.count() == rows.length)
  }

  test("pipe_shard plans no per-source single-partition window") {
    val p = SparkEntry.queries("pipe_shard")(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!p.matches("(?s).*windowspecdefinition\\(source#\\d+, doc_id#.*"),
      "the shard prefix sum must not funnel a whole source through one window partition")
  }
}
