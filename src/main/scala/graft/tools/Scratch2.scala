package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe (build tool, not library surface). */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/repo/testdata-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val out = graft.SparkEntry.queries("mm_phash_clusters")(spark, dir)
    println("ROWS=" + out.count())
    println("SECS=" + (System.nanoTime() - t0) / 1e9)
    spark.stop()
  }
}
