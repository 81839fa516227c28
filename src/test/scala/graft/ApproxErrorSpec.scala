package graft

import org.scalatest.funsuite.AnyFunSuite

/** Measured accuracy guarantee for the one rows-only entry: q9_approx
  * (HyperLogLog++ at rsd = 0.01) against the exact q9_distinct, at
  * sf0.01 and sf0.1. The sketch has no DuckDB twin, so its gate is
  * this pinned relative-error bound instead of a hash compare: every
  * approximate count must sit within 4 standard deviations of the
  * exact count (rsd 0.01 → 4% — the measured errors are far inside
  * it; the 4σ margin just keeps the tripwire deterministic-ish for a
  * fixed dataset, where the realized error is a constant).
  */
class ApproxErrorSpec extends AnyFunSuite {
  import SparkTestSession._

  private val maxRelErr = 0.04 // 4 × the configured rsd of 0.01

  private def counts(q: String, dir: String): Map[String, Seq[Long]] =
    SparkEntry.queries(q)(spark, dir).collect().map { r =>
      r.getString(0) -> (1 until r.length).map(r.getLong(_)).toSeq
    }.toMap

  for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
    test(s"q9_approx HLL counts are within 4×rsd of q9_distinct at ${dir.split('/').last}") {
      val exact = counts("q9_distinct", dir)
      val approx = counts("q9_approx", dir)
      assert(approx.keySet == exact.keySet, "group keys must match the exact query")
      val errs = for {
        (flag, app) <- approx.toSeq
        // q9_approx sketches l_partkey and l_orderkey (cols 1 and 3 of
        // the exact query's n_parts, n_supps, n_orders)
        (a, e) <- app.zip(Seq(exact(flag)(0), exact(flag)(2)))
      } yield {
        val rel = math.abs(a - e).toDouble / e
        assert(rel <= maxRelErr,
          f"HLL count $a for group $flag is $rel%.4f off exact $e (bound $maxRelErr)")
        rel
      }
      info(f"max relative error: ${errs.max}%.5f over ${errs.size} counts")
    }
  }
}
