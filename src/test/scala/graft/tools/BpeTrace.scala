package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: run the incremental BPE trainer with per-round tracing
  * (affected words + wall seconds) — the BENCH_NOTES cost-table
  * source. `SPARK_GRAFT_BPE_TRACE=1 Test/runMain graft.tools.BpeTrace
  * [sfDir] [rounds]`. */
object BpeTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val (_, learned) = graft.queries.BpeTrain.train(spark, sfDir, rounds)
    println(f"[bpe-trace] TOTAL rounds=${learned.size} secs=${(System.nanoTime() - t0) / 1e9}%.2f")
  }
}
