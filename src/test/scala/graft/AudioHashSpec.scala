package graft

import org.scalatest.funsuite.AnyFunSuite

/** mm_audio_hash perceptual pins: near-identical audio (a few sample
  * codes changed in ONE frame) stays within a small Hamming distance,
  * while unrelated audio does not collapse to the same fingerprint.
  */
class AudioHashSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fp(rows: Array[org.apache.spark.sql.Row]): Map[Long, Long] =
    rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fingerprint")).toMap

  test("a one-frame edit flips at most 2 fingerprint bits; bigger edits move it") {
    import spark.implicits._
    // 160 chars → 10 chars per frame; ramped energies so every delta
    // bit is decisively set
    val base = (0 until 160).map(i => ('a' + (i / 10) % 20).toChar).mkString
    // near-dup: bump 3 chars inside frame 5 only — affects e5, so at
    // most bits 4 and 5 (the deltas into and out of frame 5) can flip
    val near = base.updated(52, 'z').updated(53, 'z').updated(54, 'z')
    // far: reverse ramp — every energy delta changes sign
    val far = base.reverse
    val docs = Seq(1L -> base, 2L -> near, 3L -> far).toDF("doc_id", "text")
    val m = fp(operators.Multimodal.audioHashOf(docs).collect())
    val hammingNear = java.lang.Long.bitCount(m(1L) ^ m(2L))
    val hammingFar = java.lang.Long.bitCount(m(1L) ^ m(3L))
    assert(hammingNear <= 2, s"one-frame edit moved $hammingNear bits")
    assert(hammingFar >= 8, s"reversed audio only $hammingFar bits away")
  }

  test("corpus fingerprints: bits live on the 15-bit grid and differentiate") {
    val rows = SparkEntry.queries("mm_audio_hash")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val f = r.getAs[Long]("fingerprint")
      assert(f >= 0 && f < (1L << 15), s"fingerprint $f off the 15-bit grid")
      assert(r.getAs[Long]("n_rising") == java.lang.Long.bitCount(f))
      assert(r.getAs[Long]("data_bytes") >= 0)
    }
    assert(rows.map(_.getAs[Long]("fingerprint")).distinct.length > 10,
      "fingerprints must differentiate the corpus")
  }
}
