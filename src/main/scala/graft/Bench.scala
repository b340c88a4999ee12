package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Queries are forced through the noop sink — a bare count() would let
  * Catalyst prune the projections being measured (window/aggregate
  * columns the count doesn't need).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // local[32] wants scan splits ≈ cores: the map side of every
      // exchange runs in the scan stage, and the default 128 MB
      // splits give a 200 MB file only 2 map tasks (measured: a05's
      // 10 M-row shuffle write serialized on 2 of 32 cores, +0.3 s).
      // 16 MB ≈ 13 splits for that file; sub-16 MB files (all of
      // sf0.1) stay single-split so the driver's headline bench is
      // unchanged. On a real cluster this maps to the same rule of
      // thumb: size splits so every core of every executor has work.
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      // measured path = the engine's default session: functions + the
      // TopKRewrite optimizer rule registered via extensions
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/session (codegen, parquet footer reads) outside the
    // measured section.
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())

    // SPARK_GRAFT_SKIP: comma-separated names excluded from this run
    // (used for queries whose CONTRACT is quadratic — d05 all-pairs —
    // at SFs where that's hours). Skips are reported, never silent.
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).getOrElse(Set.empty[String])
    // SPARK_GRAFT_ONLY: comma-separated allowlist for targeted scale
    // measurements (e.g. re-timing one query at sf10) — empty = all.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).filter(_.nonEmpty)
    // SPARK_GRAFT_WARM=1: run each query twice, report the second
    // (steady-state) time — separates per-query data work from one-off
    // scan-cache/JIT effects when analyzing data-bound SFs. Default
    // (driver runs) stays single-shot.
    val warm = sys.env.get("SPARK_GRAFT_WARM").contains("1")
    // s06's operating mode is build-once/search-many: charge the index
    // BUILD to its own metric here (a forced fresh build into the
    // keyed dir), so the s06 query line below measures SEARCH over the
    // persisted index — the per-query cost a user actually pays.
    // Both lines count toward the total: the session did both.
    val s06Build: Seq[(String, Double)] =
      if (skip("s06_ivf_index_search") || !only.forall(_("s06_ivf_index_search"))) Nil
      else {
        val t0 = System.nanoTime()
        graft.operators.IvfIndex.build(spark, sfDir,
          graft.operators.IvfIndex.indexDirFor(sfDir))
        Seq("s06_ivf_index_build" -> (System.nanoTime() - t0) / 1e9)
      }
    val timed = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_(name)) }
      .filterNot { case (name, _) => skip(name) }
      .map { case (name, fn) =>
        def once(): Double = {
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
          (System.nanoTime() - t0) / 1e9
        }
        val first = once()
        name -> (if (warm) once() else first)
      }
    val results = (s06Build ++ timed).sortBy(_._1)
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val skipped = skip.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Baseline comparison column: scripts/bench_duck.py records the
    // DuckDB oracle-side per-query seconds for an SF dir into
    // DUCK_<sfname>.json (committed); embed it verbatim so the round
    // artifact carries BOTH engines' numbers, not just ours. (DuckDB
    // is a driver-side python tool — the library itself has no such
    // dependency, so the record rides in as data.)
    val duck = {
      val f = new java.io.File(s"DUCK_${new java.io.File(sfDir).getName}.json")
      if (f.exists) {
        val s = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim
        if (s.startsWith("{")) s""","duckdb":$s""" else ""
      } else ""
    }
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"skipped":$skipped,"sf":"$sfDir"$duck}""")
    spark.stop()
  }
}
