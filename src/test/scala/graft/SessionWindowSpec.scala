package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the native-session_window operator: equivalence with the
  * lag-chain sessionizer, and the exact boundary semantics the oracle
  * encodes (session intervals are CLOSED — an event landing EXACTLY
  * gap after its predecessor still extends the session, the same
  * diff > gap split rule ev_sessionize uses).
  */
class SessionWindowSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ev_session_window reproduces ev_sessionize's sessions exactly") {
    val sw = SparkEntry.queries("ev_session_window")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("start_us") / 1000000L))).toMap
    val lag = SparkEntry.queries("ev_sessionize")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("start_s")))).toMap
    assert(sw.keySet == lag.keySet)
    for ((k, (n, ss)) <- lag) {
      assert(sw(k)._1 == n, s"session $k event count")
      assert(sw(k)._2 == ss, s"session $k start second")
    }
  }

  test("an event exactly one gap later still EXTENDS the session (closed intervals)") {
    import spark.implicits._
    val t0 = 1700000000000L // ms
    val ev = Seq(
      (1L, new Timestamp(t0), 7L, "click", 1.0),
      (2L, new Timestamp(t0 + 1800000L), 7L, "click", 1.0), // exactly 30 min later
      (3L, new Timestamp(t0 + 1800000L + 1800001L), 7L, "click", 1.0)) // 1ms past
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val sessions = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .collect().map(_.getAs[Long]("n")).sorted.toSeq
    assert(sessions == Seq(1L, 2L),
      s"boundary event must merge, 1ms-past event must split: $sessions")
  }
}
