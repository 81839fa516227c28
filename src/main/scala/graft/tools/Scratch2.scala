package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe (build tool, not library surface). */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/repo/testdata-sf10")
    val name = args.lift(1).getOrElse("q39_assoc")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    try {
      val out = graft.SparkEntry.queries(name)(spark, dir)
      println("ROWS=" + out.count())
    } catch { case e: Throwable =>
      println("FAIL=" + String.valueOf(e.getMessage).take(400).replace('\n',' '))
    }
    println("SECS=" + (System.nanoTime() - t0) / 1e9)
    spark.stop()
  }
}
