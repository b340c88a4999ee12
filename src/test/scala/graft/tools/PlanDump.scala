package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print a gate query's executed simple plan (dev tool,
  * not part of the query surface). `Test/runMain graft.tools.PlanDump
  * <queryName> [sfDir]`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    println("==PLANDUMP-BEGIN==")
    println(df.queryExecution.executedPlan.toString)
    println("==PLANDUMP-END==")
  }
}
