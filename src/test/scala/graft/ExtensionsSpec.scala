package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface checks for the native expressions. The full
  * withExtensions path can't be exercised here without tearing down
  * the suite-shared SparkContext, so this applies GraftExtensions to
  * a bare SparkSessionExtensions (registration must not throw) and
  * drives the same expressions through SQL via the runtime
  * registration hook on the shared session.
  */
class ExtensionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("GraftExtensions applies cleanly to a SparkSessionExtensions") {
    new GraftExtensions()(new SparkSessionExtensions)
  }

  test("native expressions work through the SQL surface") {
    graft.functions.HashExprs.register(spark)
    val r1 = spark.sql("SELECT poly_hash('abc') AS h").collect()(0).getLong(0)
    assert(r1 == ((97L * 31 + 98) * 31 + 99) % 1000000007L)

    val r2 = spark.sql(
      "SELECT size(minhash_sig(shingle_hashes('a b c d'))) AS k").collect()(0).getInt(0)
    assert(r2 == graft.functions.Hashing.NumPerms)

    val r3 = spark.sql(
      "SELECT size(token_hashes('a b c')) AS n").collect()(0).getInt(0)
    assert(r3 == 3)

    val r4 = spark.sql(
      "SELECT word_bigrams('one two three') AS b").collect()(0).getSeq[String](0)
    assert(r4.toList == List("one two", "two three"))
  }

  test("non-literal marker/k arguments raise a usable analysis error") {
    graft.functions.HashExprs.register(spark)
    import spark.implicits._
    Seq(("hello", "he")).toDF("t", "m").createOrReplaceTempView("mt")
    // a COLUMN where a string literal is required
    val e1 = intercept[Exception] {
      spark.sql("SELECT contains_count(t, m) FROM mt").collect()
    }
    assert(e1.getMessage.contains("string literals"), s"got: ${e1.getMessage}")
    // a foldable expression is accepted (constant-folded to a literal)
    val ok = spark.sql("SELECT marker_total(t, 'l' || 'l') AS n FROM mt")
      .collect()(0).getLong(0)
    assert(ok == 1L)
    // non-literal k for topk_by_score
    val e2 = intercept[Exception] {
      spark.sql("SELECT topk_by_score(1.0, 1L, CAST(t AS INT)) FROM mt").collect()
    }
    assert(e2.getMessage.contains("integer literal"), s"got: ${e2.getMessage}")
  }

  test("bounded top-k aggregate through the Column API") {
    import spark.implicits._
    val df = Seq((1, 0.5, 10L), (1, 0.9, 11L), (1, 0.7, 12L), (2, 0.1, 20L))
      .toDF("g", "s", "i")
    val rows = df.groupBy("g")
      .agg(graft.functions.TopKAgg.topk_by_score(
        org.apache.spark.sql.functions.col("s"),
        org.apache.spark.sql.functions.col("i"), 2).as("tk"))
      .orderBy("g")
      .collect()
    assert(rows(0).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)) == Seq(11L, 12L))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)) == Seq(20L))
  }
}
