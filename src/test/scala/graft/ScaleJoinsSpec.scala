package graft

import graft.operators.ScaleJoins
import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleJoinsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bucketed lineitem-orders join is shuffle-free and matches the plain join") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, sf)
      val ord = Tables.orders(spark, sf)
      ScaleJoins.writeBucketed(li, "li_b", "l_orderkey", 8)
      ScaleJoins.writeBucketed(
        ord.withColumnRenamed("o_orderkey", "l_orderkey"), "ord_b", "l_orderkey", 8)
      val joined = ScaleJoins.bucketedJoin(spark, "li_b", "ord_b", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join must not shuffle either side:\n" + plan.take(2000))

      val expected = li.join(
        ord.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("ensureBucketed builds once per (dir, key, buckets) and rebuilds on change") {
    import spark.implicits._
    var built = 0
    def src = { built += 1; (1L to 100L).toDF("k").withColumn("v", col("k") * 2) }
    try {
      ScaleJoins.ensureBucketed(spark, src, "memo_b", "k", 4, "dirA")
      assert(built == 1)
      // memo hit: the by-name frame must not even be constructed
      ScaleJoins.ensureBucketed(spark, src, "memo_b", "k", 4, "dirA")
      assert(built == 1, "second identical call must be a no-op")
      assert(spark.table("memo_b").count() == 100)
      // any input change invalidates the layout
      ScaleJoins.ensureBucketed(spark, src, "memo_b", "k", 4, "dirB")
      assert(built == 2, "a different source dir must rebuild")
      // a vanished table rebuilds even on a memo hit
      spark.sql("DROP TABLE memo_b")
      ScaleJoins.ensureBucketed(spark, src, "memo_b", "k", 4, "dirB")
      assert(built == 3, "a dropped table must rebuild despite the memo")
    } finally spark.sql("DROP TABLE IF EXISTS memo_b")
  }

  test("salted join spreads a hot key and matches the plain join") {
    import spark.implicits._
    // skewed fact: one hot key with most of the rows
    val fact = (Seq.fill(5000)(1L) ++ (2L to 100L)).toDF("k")
      .withColumn("v", monotonically_increasing_id())
    val dim = (1L to 100L).toDF("k").withColumn("name", concat(lit("n"), col("k")))

    val salted = ScaleJoins.saltedJoin(fact, dim, "k", salt = 8)
    val plain = fact.join(dim, "k")
    assert(salted.count() == plain.count())
    assert(salted.agg(sum("v")).collect()(0).getLong(0) ==
      plain.agg(sum("v")).collect()(0).getLong(0))

    // the join really runs on (k, __salt)
    val plan = ScaleJoins.saltedJoin(fact, dim, "k", 8)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"))
  }
}
