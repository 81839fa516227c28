package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the k-anonymity release gate (pipe_kanon). */
class KanonSpec extends AnyFunSuite {
  import SparkTestSession._

  test("pipe_kanon: level-0 classes hold k, generalization conserves members") {
    val rows = SparkEntry.queries("pipe_kanon")(spark, sf).collect()
    assert(rows.nonEmpty)
    val (l0, l1) = rows.partition(_.getAs[Int]("level") == 0)
    l0.foreach { r =>
      assert(r.getAs[Long]("class_size") >= 10)
      assert(!r.getAs[Boolean]("violates"))
      assert(r.getString(1) != "ANY")
    }
    l1.foreach { r =>
      assert(r.getString(1) == "ANY", "generalized classes must be merged segments")
      assert(r.getAs[Boolean]("violates") == (r.getAs[Long]("class_size") < 10))
    }
    // conservation: every customer lands in exactly one reported class
    val total = rows.map(_.getAs[Long]("class_size")).sum
    assert(total == Tables.customer(spark, sf).count(),
      s"classes cover $total customers, table differs")
    // the raw grouping actually had violations to generalize at this SF
    assert(l1.nonEmpty, "fixture must exercise the generalization step")
  }
}
