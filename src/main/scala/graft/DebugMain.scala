package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling entry (not part of the driver contract). */
object DebugMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d03 = time("d03 candidates") {
      queries.Dedup.defs("d03_lsh_candidates")(spark, sfDir).count()
    }
    println(s"[debug] candidate pairs: $d03")
    val d02 = time("d02 full") {
      queries.Dedup.defs("d02_minhash_jaccard_pairs")(spark, sfDir).count()
    }
    println(s"[debug] verified pairs: $d02")
    spark.stop()
  }
}
