package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.tools.Explain <sfDir> <query> [mode]`
  * prints the query's explain output (default mode "formatted") —
  * the .explain-and-iterate loop as a command.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val mode = args.lift(2).getOrElse("formatted")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir).explain(mode)
    spark.stop()
  }
}
