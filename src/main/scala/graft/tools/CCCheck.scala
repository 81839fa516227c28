package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: node-set preservation of the CC loop on the
  * real phash rep graph.
  */
object CCCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = graft.operators.Multimodal.phashRepEdges(spark, sfDir).head
      .select(col("rep_a").as("u"), col("rep_b").as("v"))
    edges.count()
    val nNodes = edges.select("u").distinct().count()
    val nNodesV = edges.select("v").distinct().count()
    val selfLoops = edges.filter(col("u") === col("v")).count()
    val asym = edges.select(col("u"), col("v"))
      .except(edges.select(col("v").as("u"), col("u").as("v"))).count()
    println(s"[cccheck] edges=${edges.count()} distinct_u=$nNodes distinct_v=$nNodesV selfloops=$selfLoops asym=$asym")
    val (labels, rounds) = graft.operators.Dedup.connectedComponents(edges)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    println(s"[cccheck] rounds=$rounds labels=${got.size}")
    // brute-force union-find on the driver
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = es.flatMap(p => Seq(p._1, p._2)).distinct
    val idx = nodes.zipWithIndex.toMap
    val parent = Array.tabulate(nodes.length)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(idx(a)), find(idx(b)))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = nodes.groupBy(v => find(idx(v))).values
      .flatMap(vs => { val mn = vs.min; vs.map(_ -> mn) }).toMap
    println(s"[cccheck] expected nodes=${members.size}")
    val missing = members.keySet -- got.keySet
    val wrong = got.collect { case (k, v) if members.get(k).exists(_ != v) => (k, v, members(k)) }
    println(s"[cccheck] missing=${missing.size} sample=${missing.take(5)}")
    println(s"[cccheck] wrong=${wrong.size} sample=${wrong.take(5)}")
    spark.stop()
  }
}
