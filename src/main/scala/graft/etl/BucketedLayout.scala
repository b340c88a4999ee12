package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Co-located bucketed layout for the fact⋈fact join family.
  *
  * The lineitem⋈orders joins (h07/h08/h09/h11/h14/h15/h20/h21/h22 …)
  * shuffle BOTH fact tables on every run when the input is plain
  * parquet — at 100 TB that exchange is the dominant cost and the only
  * part of the plan with a real scale-safe alternative: write the
  * facts ONCE bucketed by the join key (`CLUSTERED BY (orderkey) INTO
  * n BUCKETS`, one file per bucket, sorted), and every orderkey
  * equi-join — and every `groupBy(l_orderkey)` partial aggregate —
  * runs exchange-free because the scan itself reports the hash
  * partitioning. This is the standard warehouse layout trade: one
  * extra write of each fact at ingest, zero shuffles of them per
  * query afterwards.
  *
  * Mechanics (Spark specifics):
  *   - bucketing only exists through the catalog, so the layout
  *     registers `graft_bkt_<key>_<table>` EXTERNAL tables; data lives
  *     under a deterministic per-corpus dir (mtime-keyed like
  *     [[graft.operators.IvfIndex.indexDirFor]]), so a regenerated
  *     corpus re-buckets while an unchanged one re-uses bytes.
  *   - the InMemoryCatalog forgets tables at JVM exit; `ensure`
  *     re-registers the DDL over the existing files (bucket ids ride
  *     in the file names), so only the FIRST session pays the write.
  *   - `repartition(n, key)` before the bucketed write aligns write
  *     tasks with buckets (Spark's bucket hash = Murmur3 = shuffle
  *     hash) → exactly one file per bucket, which is also what lets
  *     the scan report the files as sorted.
  *
  * Opt-in via spark conf `graft.layout.bucketed=true` (or env
  * `SPARK_GRAFT_BUCKETED=1`): [[graft.Tables.load]] then serves
  * lineitem/orders from the bucketed tables and every query runs
  * unchanged — same single code path, different physical layout,
  * which is precisely the promise of declaring plans over a catalog.
  */
object BucketedLayout {

  /** fact table → bucket/sort key. `events` buckets by `user_id`: the
    * dashboard timeseries family groups on (time-bucket, user_id), and
    * a HashPartitioning(user_id) scan satisfies that
    * ClusteredDistribution (partition key ⊆ grouping keys), so the
    * 4 M-group aggregate exchange disappears the same way the
    * orderkey join exchange does. */
  val facts: Map[String, String] = Map(
    "lineitem" -> "l_orderkey",
    "orders" -> "o_orderkey",
    "events" -> "user_id",
    // customer by its key: the per-customer joins/aggregates downstream
    // of the orderkey fact joins (h10's returned-item top-k, the
    // dashboard's user⋈customer dimension joins, w06/w07's cohort
    // aggregates) all cluster on c_custkey. Bucketing customer makes
    // those joins co-located sorted merges — no customer-side exchange
    // or sort — which is also the form that survives customer
    // outgrowing the driver's broadcast threshold.
    "customer" -> "c_custkey")

  /** 32 matches local[32]; a real cluster sizes this to
    * (fact size / target bucket file size) at ingest. */
  val NumBuckets = 32

  def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption("graft.layout.bucketed")
      .orElse(sys.env.get("SPARK_GRAFT_BUCKETED"))
      .exists(v => v == "1" || v.equalsIgnoreCase("true"))

  /** Since Spark 3.0 a bucketed scan reports its per-bucket SORT order
    * only under this legacy flag (SPARK-28199) — off by default
    * because respecting the order forces one-task-per-bucket reads,
    * a regression when buckets hold many files. This layout writes
    * exactly ONE file per bucket (the repartition before the bucketed
    * write), and a bucketed scan is one task per bucket regardless, so
    * the flag is pure win here: without it every orderkey sort-merge
    * join re-sorts both pre-sorted facts (measured sf10: the 60 M-row
    * lineitem⋈orders leg 2.24 s → 0.96 s; h05 3.0 s → 1.6 s). Set
    * whenever the layout serves tables, session-scoped. */
  private def enableSortedScan(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")

  private def fnv(s: String): String =
    java.lang.Long.toHexString(s.getBytes("UTF-8")
      .foldLeft(1469598103934665603L)((a, b) => a * 1000003L + (b & 0xFF)))

  /** Stable per-path identity — survives corpus regeneration. */
  private def pathKey(dir: String): String =
    fnv(new java.io.File(dir).getCanonicalPath)

  /** Volatile corpus identity: fact file mtimes/sizes — a regenerated
    * corpus at the same path gets a fresh key (and [[ensure]] GCs the
    * stale one via the shared pathKey prefix). */
  private def corpusKey(dir: String): String =
    fnv(facts.keys.toSeq.sorted.map { n =>
      val f = new java.io.File(dir, s"$n.parquet")
      s"${f.lastModified}|${f.length}"
    }.mkString("|"))

  def tableName(dir: String, name: String): String =
    s"graft_bkt_${pathKey(dir)}_${corpusKey(dir)}_$name"

  private def layoutDirName(dir: String): String =
    s"graft_bkt_p${pathKey(dir)}_${corpusKey(dir)}"

  private def dataDir(dir: String, name: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"${layoutDirName(dir)}/$name").getAbsolutePath

  /** Delete bucketed data of PREVIOUS generations of this same corpus
    * path (same pathKey, different corpusKey) — regeneration would
    * otherwise leak a fact-sized dir per generation. Other corpora
    * (different paths → different pathKey) are untouched. */
  private def gcStale(dir: String): Unit = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val prefix = s"graft_bkt_p${pathKey(dir)}_"
    val current = layoutDirName(dir)
    Option(tmp.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.isDirectory && f.getName.startsWith(prefix) && f.getName != current) {
        def del(x: java.io.File): Unit = {
          Option(x.listFiles()).getOrElse(Array.empty).foreach(del)
          x.delete(); ()
        }
        del(f)
      }
    }
  }

  /** Materialize (first session) or re-register (later sessions) the
    * bucketed fact tables for `dir`. Idempotent; returns the table
    * names. */
  def ensure(spark: SparkSession, dir: String): Map[String, String] = {
    enableSortedScan(spark)
    gcStale(dir)
    facts.map { case (name, key) =>
      val tbl = tableName(dir, name)
      if (!spark.catalog.tableExists(tbl)) {
        val loc = dataDir(dir, name)
        val src = graft.Tables.loadPlain(spark, dir, name)
        if (new java.io.File(loc, "_SUCCESS").exists) {
          // data already bucketed on disk — register the external DDL
          // over it (bucket ids are parsed from the file names)
          val schema = src.schema.toDDL
          spark.sql(
            s"""CREATE TABLE $tbl ($schema) USING PARQUET
               |CLUSTERED BY ($key) SORTED BY ($key) INTO $NumBuckets BUCKETS
               |LOCATION '$loc'""".stripMargin)
        } else {
          src.repartition(NumBuckets, col(key))
            .write.mode("overwrite")
            .option("path", loc)
            .bucketBy(NumBuckets, key).sortBy(key)
            .saveAsTable(tbl)
        }
      }
      name -> tbl
    }
  }

  /** The bucketed table for (dir, name) if the layout is enabled and
    * materialized — [[graft.Tables.load]]'s first stop. */
  def loadIfBucketed(spark: SparkSession, dir: String, name: String): Option[DataFrame] =
    if (enabled(spark) && facts.contains(name)) {
      enableSortedScan(spark)
      val tbl = tableName(dir, name)
      if (!spark.catalog.tableExists(tbl) &&
          new java.io.File(dataDir(dir, name), "_SUCCESS").exists) {
        ensure(spark, dir) // cheap re-register path
      }
      if (spark.catalog.tableExists(tbl)) Some(spark.table(tbl)) else None
    } else None
}
