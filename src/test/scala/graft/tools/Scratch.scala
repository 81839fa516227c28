package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway debug driver: run one registered query with a full stack
  * trace on failure. `runMain graft.tools.Scratch <sfDir> <query>`.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.show(20, truncate = false)
    } catch {
      case e: Throwable => e.printStackTrace()
    }
    spark.stop()
  }
}
