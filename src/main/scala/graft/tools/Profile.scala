package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query phase profiler (guide §1: measure first): splits a
  * query's wall time into CONSTRUCT (building the DataFrame — any
  * eager checkpoints/collects inside the operator run here), PLAN
  * (analysis + optimization + physical planning of the final frame),
  * EXEC1 (first count — includes codegen compilation), and EXEC2 (a
  * second count — steady-state execution). A query whose cost is in
  * PLAN needs a smaller expression tree, not a better shuffle plan;
  * one whose cost is in CONSTRUCT hides eager work; EXEC2 is the
  * part the optimization guide's shuffle/join levers act on.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.Profile q1 q2 ..."
  */
object Profile {
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
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    def t[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    println(f"${"query"}%-28s ${"construct"}%9s ${"plan"}%9s ${"exec1"}%9s ${"exec2"}%9s ${"total"}%9s ${"serve"}%9s")
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"$name: unknown query")
        case Some(fn) =>
          spark.sparkContext.setJobGroup(name, name)
          val (df, tc) = t(fn(spark, sfDir))
          val (_, tp) = t(df.queryExecution.executedPlan)
          val (_, t1) = t(df.count())
          val (_, t2) = t(df.count())
          // second full invocation: memoized builds and shared caches
          // are warm, so this is the bench's steady serve cost
          val (_, ts) = t { val d2 = fn(spark, sfDir); d2.count() }
          println(f"$name%-28s $tc%9.2f $tp%9.2f $t1%9.2f $t2%9.2f ${tc + tp + t1}%9.2f $ts%9.2f")
          spark.sparkContext.clearJobGroup()
      }
    }
    spark.stop()
  }
}
