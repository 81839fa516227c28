package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** mm_phash_pairs on planted near-identical BMPs: four docs whose
  * ids are congruent mod 65, so their synthesized bitmaps share the
  * same width×height geometry and differ only in pixel content —
  * an exact copy (Hamming 0), a one-pixel edit (Hamming ≤ 2, the
  * perceptual-tolerance case a byte-exact hash can never pair), and
  * an unrelated texture that must NOT pair.
  */
class PhashPairsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val base = "the quick brown fox jumps over the lazy dog near a riverbank at dawn"
  private val near = base.updated(2, 'z') // one raster pixel changed in place
  private val far = "zzzz aaaa zzzz aaaa zzzz aaaa zzzz aaaa zzzz aaaa zzzz aaaa zzzzz"

  private lazy val pairs = {
    import spark.implicits._
    val docs = Seq(
      (2L, base), (67L, near), (132L, far), (197L, base))
      .toDF("doc_id", "text")
    operators.Multimodal.phashPairsOf(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Long]("hamming"))
      .toMap
  }

  test("an exact pixel copy pairs at Hamming 0") {
    assert(pairs.get((2L, 197L)).contains(0L))
  }

  test("a one-pixel edit still pairs (the perceptual tolerance)") {
    assert(pairs.contains((2L, 67L)), s"near-identical BMPs must pair; got $pairs")
    val h = pairs((2L, 67L))
    assert(h > 0 && h <= 2, s"edit must cost 1-2 gradient bits, got $h")
    // and the copy pairs with the edited doc at the same distance
    assert(pairs.get((67L, 197L)).contains(h))
  }

  test("an unrelated texture of the same geometry does not pair") {
    assert(!pairs.keySet.exists { case (a, b) => a == 132L || b == 132L },
      s"far texture must not pair: $pairs")
  }

  test("mm_phash_incremental dup verdicts equal batch cross pairs on the corpus") {
    def isDelta(id: Long) = id % 10 >= 8
    val batch = SparkEntry.queries("mm_phash_pairs")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
    val cross = batch.collect {
      case (a, b, h) if isDelta(a) != isDelta(b) => (if (isDelta(a)) a else b) -> h
    }
    val bestBatch = cross.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val inc = SparkEntry.queries("mm_phash_incremental")(spark, sf).collect()
    val dup = inc.filter(_.getAs[String]("verdict") == "dup_image")
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("hamming")).toMap
    assert(dup.keySet == bestBatch.keySet,
      s"only-inc=${(dup.keySet -- bestBatch.keySet).take(5)} " +
        s"only-batch=${(bestBatch.keySet -- dup.keySet).take(5)}")
    dup.foreach { case (id, h) => assert(h == bestBatch(id), s"doc $id best hamming") }
    assert(dup.nonEmpty, "fixture must contain cross-split image dups")
  }
}
