package graft.tools

import org.apache.spark.sql.functions._

/** Decompose the sweep-based r01 at sf10. */
object PerfLab4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/data/sf10")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("perflab4")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import PerfLab.time
    import graft.operators.NeighborAgg

    val W = 60000000L
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
    val types = Seq("click", "error", "purchase", "scroll", "view")

    val probes1 = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("__a_id"), col("us").as("__a_us"),
        explode(array(
          struct(lit(0).as("__tag"), (col("us") - W - 1).as("__pos")),
          struct(lit(1).as("__tag"), col("us").as("__pos")),
          struct(lit(2).as("__tag"), (col("us") + W).as("__pos"))))
          .as("__p"))
      .select(col("__a_id"), col("__a_us"),
        col("__p.__tag").as("__tag"), col("__p.__pos").as("__pos"))

    time("pass1_sweep_only") {
      NeighborAgg.sweepEval(ev.select(col("event_type"), col("us")),
        "event_type", "us", types, probes1, "__pos", withSums = true)
        .groupBy().agg(count(lit(1)).as("n"))
    }

    time("pass1_sweep_nosums") {
      NeighborAgg.sweepEval(ev.select(col("event_type"), col("us")),
        "event_type", "us", types, probes1, "__pos", withSums = false)
        .groupBy().agg(count(lit(1)).as("n"))
    }

    val probes2 = ev.select(col("event_id").as("__p_id"),
      col("event_type").as("__p_type"),
      explode(array(
        struct(lit(0).as("__tag"), (col("us") - W - 1).as("__pos")),
        struct(lit(2).as("__tag"), (col("us") + W).as("__pos"))))
        .as("__p"))
      .select(col("__p_id"), col("__p_type"),
        col("__p.__tag").as("__tag"), col("__p.__pos").as("__pos"))

    time("pass2_sweep_only") {
      NeighborAgg.sweepEval(
        ev.filter(col("event_type") === "error").select(col("event_type"), col("us")),
        "event_type", "us", Seq("error"), probes2, "__pos", withSums = false)
        .groupBy().agg(count(lit(1)).as("n"))
    }

    time("full_neighborStats") {
      NeighborAgg.neighborStats(ev, "event_id", "event_type", "us", "error", W)
    }

    spark.stop()
  }
}
