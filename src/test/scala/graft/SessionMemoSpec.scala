package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The per-session build memo: same session + key → same frames (no
  * rebuild), eviction releases and forgets, and keys are scoped per
  * (session, key) so two dirs never collide.
  */
class SessionMemoSpec extends AnyFunSuite {
  import SparkTestSession._

  test("frames are built once per key, rebuilt after evict, keyed per key") {
    var builds = 0
    def build() = SessionMemo.frames(spark, "memo-spec-a") {
      builds += 1
      val f = spark.range(10).withColumn("x", col("id") * 2).persist()
      f.count()
      Seq(f)
    }
    val first = build()
    val second = build()
    assert(builds == 1, "second access must serve the memo, not rebuild")
    assert(second.head eq first.head, "must be the SAME frame reference")
    var otherBuilds = 0
    SessionMemo.frames(spark, "memo-spec-b") { otherBuilds += 1; Seq.empty }
    assert(otherBuilds == 1 && builds == 1, "keys must not collide")
    SessionMemo.evict(spark)
    assert(first.head.storageLevel.useMemory == false,
      "evict must unpersist the memoized frames")
    build()
    assert(builds == 2, "after evict the next access rebuilds")
    assert(SessionMemo.frames(spark, "memo-spec-a")(fail("must not rebuild")).nonEmpty)
    SessionMemo.evict(spark) // leave no state for other suites
  }
}
