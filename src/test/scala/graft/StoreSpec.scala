package graft

import graft.sources.FingerprintStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StoreSpec extends AnyFunSuite {
  import SparkTestSession._

  test("fingerprint store: put/get round-trip, TTL expiry, newest-wins") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString + "/fp"
    val fp1 = Seq(("m1", "llmmap", "openai", 0.91), ("m2", "llmmap", "openai", 0.85))
      .toDF("model", "method", "provider", "sim")
    val fp2 = Seq(("m1", "llmmap", "openai", 0.95)) // newer m1
      .toDF("model", "method", "provider", "sim")
    val fpDli = Seq(("m1", "dli", "openai", 0.70))
      .toDF("model", "method", "provider", "sim")

    FingerprintStore.put(fp1, dir, nowEpochS = 1000L)
    FingerprintStore.put(fp2, dir, nowEpochS = 2000L)
    FingerprintStore.put(fpDli, dir, nowEpochS = 1000L)

    // method partition pruning + newest-wins
    val got = FingerprintStore.get(spark, dir, "llmmap", nowEpochS = 2500L)
    assert(got.count() == 2)
    val m1 = got.filter($"model" === "m1").collect()(0)
    assert(m1.getAs[Double]("sim") == 0.95)

    // TTL drops the old m2 row entirely
    val live = FingerprintStore.get(spark, dir, "llmmap", nowEpochS = 2500L, ttlS = 1000L)
    assert(live.count() == 1 && live.collect()(0).getAs[String]("model") == "m1")

    // method isolation
    assert(FingerprintStore.get(spark, dir, "dli", 2500L).count() == 1)

    // partition pruning shows in the plan
    val plan = FingerprintStore.get(spark, dir, "llmmap", 2500L)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("PartitionFilters: [isnotnull(method"))
  }

  test("end-to-end: persist ma_fingerprint output and read it back") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store2").toString + "/fp"
    val fp = operators.Audit.fingerprint.fn(spark, sf)
      .withColumn("model", col("source"))
      .withColumn("method", lit("llmmap"))
      .withColumn("provider", lit("spark"))
    FingerprintStore.put(fp, dir, nowEpochS = 42L)
    val back = FingerprintStore.get(spark, dir, "llmmap", nowEpochS = 50L)
    assert(back.count() == fp.count())
    assert(back.columns.contains("avg_length_chars"))
  }
}
