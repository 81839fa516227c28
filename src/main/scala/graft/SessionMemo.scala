package graft

import java.util.concurrent.ConcurrentHashMap

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session memo for one-time built, persisted artifacts (the IVF
  * index, the PQ codebook + codes, the verified near-dup pair sets):
  * the production separation between an index/layout BUILD job and
  * the many queries served from it.
  *
  * Keyed by the SparkSession reference itself (ConcurrentHashMap uses
  * equals, which SparkSession does not override → identity), so two
  * sessions can never collide the way an identity-hash key could; and
  * each session registers a listener that evicts its entries and
  * unpersists their frames when the application ends, so a stopped
  * session cannot serve dead DataFrames and the persisted blocks do
  * not leak for the JVM lifetime.
  */
object SessionMemo {

  private val store =
    new ConcurrentHashMap[SparkSession, TrieMap[String, Seq[DataFrame]]]()

  /** The frames memoized under `key` for this session, building (and
    * the caller persisting + materializing) them on first use.
    */
  def frames(spark: SparkSession, key: String)(build: => Seq[DataFrame]): Seq[DataFrame] = {
    val m = store.computeIfAbsent(spark, { s =>
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit = evict(s)
      })
      TrieMap.empty[String, Seq[DataFrame]]
    })
    m.getOrElseUpdate(key, build)
  }

  /** Drop every entry of a session and release its persisted frames. */
  def evict(spark: SparkSession): Unit =
    Option(store.remove(spark)).foreach { m =>
      m.values.flatten.foreach { df =>
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () } // session already torn down
      }
    }
}
