package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: time the CC primitive on the real contracted
  * graphs (phash reps, dedup edges, embed edges) and print rounds.
  */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id + 1) AS s").collect()
    def t(name: String)(edges: org.apache.spark.sql.DataFrame): Unit = {
      // warm the edge build outside the timed region
      edges.count()
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val (labels, rounds) = graft.operators.Dedup.connectedComponents(edges)
        val n = labels.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[ccprobe] $name run$i: $dt%.2f s, $rounds rounds, $n labels")
        graft.operators.Dedup.releaseLocalCheckpoint(labels)
      }
    }
    t("phash_reps") {
      // symmetrize like the real caller (the CC contract)
      val cross = graft.operators.Multimodal.phashRepEdges(spark, sfDir).head
      cross.select(col("rep_a").as("u"), col("rep_b").as("v"))
        .union(cross.select(col("rep_b").as("u"), col("rep_a").as("v")))
    }
    t("dedup_edges")(graft.operators.Dedup.duplicateEdges(spark, sfDir))
    t("embed_edges")(graft.operators.Ann.embedEdges(spark, sfDir))
    val chain = {
      import spark.implicits._
      val pairs = (0L until 299L).map(i => (i, i + 1)).toDF("a", "b")
      pairs.select(col("a").as("u"), col("b").as("v"))
        .union(pairs.select(col("b").as("u"), col("a").as("v")))
    }
    t("chain300")(chain)
    spark.stop()
  }
}
