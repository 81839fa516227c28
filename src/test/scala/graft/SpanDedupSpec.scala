package graft

import org.scalatest.funsuite.AnyFunSuite

/** dd_spans (repeated-substring dedup) on a planted corpus where every
  * expected value is hand-computable: cross-doc shared spans of
  * varying length, an in-doc repeated phrase, a doc shorter than the
  * gram width, and a shared span too short to trip the flag.
  *
  * SpanK = 8, SpanRunMin = 4: a flag requires a duplicated substring
  * of ≥ 8 + 4 − 1 = 11 words.
  */
class SpanDedupSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-spans").toString
    def ws(prefix: String, n: Int): Seq[String] = (0 until n).map(i => s"$prefix$i")
    val w = ws("w", 20) // doc 0's words
    val phrase = ws("ph", 12) // doc 3's internally repeated phrase
    val docs = Seq(
      0L -> w, // 20 words
      1L -> (ws("x", 10) ++ w.slice(5, 20)), // shares w5..w19 (15 words) with doc 0
      2L -> ws("u", 30), // fully unique
      3L -> (ws("a", 5) ++ phrase ++ ws("b", 5) ++ phrase), // in-doc repeat
      4L -> ws("t", 5), // shorter than SpanK
      5L -> (ws("v", 5) ++ w.slice(5, 15)) // shares w5..w14 (10 words): run 3 < 4
    ).map { case (id, words) =>
      val text = words.mkString(" ")
      (id, text, "en", "s0", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("planted spans produce exact gram counts, run lengths, and flags") {
    val got = SparkEntry.queries("dd_spans")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_rep"),
          r.getAs[Long]("max_run"), r.getAs[Boolean]("span_dup"))))
      .toMap
    // doc 0: 13 grams; w5..w19 overlap with doc 1 → grams at pos 5..12
    // (run 8); the doc-5 overlap's 3 grams are a subset of those.
    assert(got(0L) == ((13L, 8L, 8L, true)), s"doc 0: ${got(0L)}")
    // doc 1: 25 words → 18 grams; shared grams at pos 10..17 (run 8).
    assert(got(1L) == ((18L, 8L, 8L, true)), s"doc 1: ${got(1L)}")
    // doc 2: unique: 23 grams, nothing repeated.
    assert(got(2L) == ((23L, 0L, 0L, false)), s"doc 2: ${got(2L)}")
    // doc 3: 34 words → 27 grams; each phrase occurrence contributes
    // 12−8+1 = 5 repeated grams → two runs of 5.
    assert(got(3L) == ((27L, 10L, 5L, true)), s"doc 3: ${got(3L)}")
    // doc 4: 5 words < SpanK → no grams at all.
    assert(got(4L) == ((0L, 0L, 0L, false)), s"doc 4: ${got(4L)}")
    // doc 5: 15 words → 8 grams; the 10-word shared span yields
    // 10−8+1 = 3 repeated grams — under SpanRunMin, so NOT flagged.
    assert(got(5L) == ((8L, 3L, 3L, false)), s"doc 5: ${got(5L)}")
  }

  test("no pairwise surface: the plan is linear in corpus size (no joins keyed on text)") {
    val plan = SparkEntry.queries("dd_spans")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("cartesian"), "span dedup must never go pairwise")
  }

  test("native span_grams equals the HOF fold on the real corpus and edge docs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val k = operators.Dedup.SpanK
    val B = functions.Hashing.B
    val P = functions.Hashing.P
    val edge = Seq(
      "", " ", "\t\n", "one", // below the gram width
      (0 until k).map(i => s"w$i").mkString(" "), // exactly one gram
      "a a a a a a a a a a a a", // repeated token
      "一 二 三 四 五 六 七 八 九 十").zipWithIndex
      .map { case (t, i) => (90000000L + i, t) }.toDF("doc_id", "text")
    val rows = edge.union(
      Tables.documents(spark, SparkTestSession.sf).select("doc_id", "text"))
    val wh = functions.Hashing.wordHashes(col("text")).as("wh")
    val hof = expr(s"""CASE WHEN size(wh) >= $k
                       |  THEN transform(sequence(0, size(wh) - $k),
                       |         i -> aggregate(slice(wh, i + 1, $k),
                       |                CAST(0 AS BIGINT), (a, x) -> (a * $B + x) % $P))
                       |  ELSE CAST(array() AS array<bigint>) END""".stripMargin)
    val diff = rows.select(col("doc_id"), wh)
      .select(col("doc_id"),
        functions.HashExprs.span_grams(col("wh"), k).as("native"), hof.as("old"))
      .filter(not(col("native") <=> col("old")))
      .count()
    assert(diff == 0L, s"native span_grams diverges from the HOF fold on $diff docs")
  }
}
