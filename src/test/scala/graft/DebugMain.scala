package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer (dev tool): runs the named
  * `SparkEntry.queries` entries against an SF dir with the bench
  * session settings and prints per-run wall times.
  *
  * Usage: runMain graft.DebugMain <sfDir> <query>[,query...] [nRuns]
  */
object DebugMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("d02_minhash_jaccard_pairs"))
    val nRuns = args.lift(2).map(_.toInt).getOrElse(2)
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
    // opt-in experiment knobs, e.g. SPARK_GRAFT_CONF="spark.sql.join.preferSortMergeJoin=false"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      var run = 0
      while (run < nRuns) {
        val t0 = System.nanoTime()
        // noop sink, matching graft.Bench: count() would let Catalyst
        // prune the projections being measured
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[debug] $name run$run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
        run += 1
      }
    }
    spark.stop()
  }
}
