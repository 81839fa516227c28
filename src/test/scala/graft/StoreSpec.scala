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

  test("fingerprint store: list_entries catalogs versions per key") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-store-ls").toString + "/fp"
    FingerprintStore.put(Seq(("m1", "llmmap", "openai", 0.9)).toDF("model", "method", "provider", "sim"), dir, 1000L)
    FingerprintStore.put(Seq(("m1", "llmmap", "openai", 0.95)).toDF("model", "method", "provider", "sim"), dir, 2000L)
    FingerprintStore.put(Seq(("m2", "dli", "custom", 0.7)).toDF("model", "method", "provider", "sim"), dir, 1500L)

    val entries = FingerprintStore.listEntries(spark, dir).collect()
    assert(entries.length == 2)
    val m1 = entries.find(_.getAs[String]("model") == "m1").get
    assert(m1.getAs[Long]("n_versions") == 2)
    assert(m1.getAs[Long]("newest_created_at_s") == 2000L)
    assert(m1.getAs[Long]("oldest_created_at_s") == 1000L)
    val m2 = entries.find(_.getAs[String]("model") == "m2").get
    assert(m2.getAs[String]("method") == "dli" && m2.getAs[String]("provider") == "custom")
  }

  test("fingerprint store: clear by method and full clear") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-store-clr").toString
    val dir = base + "/fp"
    FingerprintStore.put(Seq(("m1", "llmmap", "openai", 0.9), ("m2", "llmmap", "openai", 0.8))
      .toDF("model", "method", "provider", "sim"), dir, 1000L)
    FingerprintStore.put(Seq(("m1", "dli", "openai", 0.7))
      .toDF("model", "method", "provider", "sim"), dir, 1000L)

    // clear one method: its rows are gone, the other method survives
    val out1 = base + "/after-method-clear"
    assert(FingerprintStore.clear(spark, dir, out1, Some("llmmap")) == 2L)
    assert(FingerprintStore.get(spark, out1, "dli", 2000L).count() == 1)
    assert(spark.read.parquet(out1).filter($"method" === "llmmap").count() == 0)

    // full clear: empty store, schema still readable
    val out2 = base + "/after-full-clear"
    assert(FingerprintStore.clear(spark, dir, out2, None) == 3L)
    assert(spark.read.parquet(out2).count() == 0)

    // in-place clear/expire is refused (it would delete the source
    // mid-read), including a path-equivalent spelling
    intercept[IllegalArgumentException] {
      FingerprintStore.clear(spark, dir, dir, Some("llmmap"))
    }
    intercept[IllegalArgumentException] {
      FingerprintStore.clear(spark, dir, base + "/./fp", None)
    }
    intercept[IllegalArgumentException] {
      FingerprintStore.expire(spark, dir, "llmmap", 2000L, 10L, dir)
    }
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
