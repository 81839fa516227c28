package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The degenerate-bucket guard behind dd_lsh_pairs, dd_simhash_pairs
  * and dd_embed: a planted oversized bucket must be dropped entirely
  * (its members generate no candidate pairs from that bucket), while
  * buckets at or under the cap are untouched.
  */
class BucketCapSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("dropOversizedBuckets drops a planted degenerate bucket, keeps capped ones") {
    val cap = 10
    // bucket (0, 77): cap+1 members (degenerate); (0, 88): exactly cap;
    // (1, 77): 2 members — same key as the degenerate one, other band.
    val rows =
      (0 to cap).map(i => (i.toLong, 0, 77L)) ++
        (100 until (100 + cap)).map(i => (i.toLong, 0, 88L)) ++
        Seq((200L, 1, 77L), (201L, 1, 77L))
    val df = rows.toDF("doc_id", "band", "key")
    val capped = operators.Dedup.dropOversizedBuckets(df, Seq("band", "key"), cap)
    val kept = capped.select("band", "key").distinct().as[(Int, Long)].collect().toSet
    assert(kept == Set((0, 88L), (1, 77L)), "only the degenerate bucket is dropped")
    assert(capped.count() == cap + 2)
  }

  test("a planted degenerate band bucket produces no candidate pairs") {
    val cap = 5
    val banded = (0 until 50).map(i => (i.toLong, 0, 42L)).toDF("doc_id", "band", "key")
    val capped = operators.Dedup.dropOversizedBuckets(banded, Seq("band", "key"), cap)
    val a = capped.select(col("band"), col("key"), col("doc_id").as("doc_a"))
    val b = capped.select(col("band"), col("key"), col("doc_id").as("doc_b"))
    val pairs = a.join(b, Seq("band", "key")).filter(col("doc_a") < col("doc_b"))
    assert(pairs.count() == 0, "50-member bucket at cap 5 must contribute zero pairs")
  }
}
