package graft.etl

import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The co-located bucketed layout must be (1) invisible to results —
  * every query answers identically on either layout; (2) visible to
  * plans — the orderkey fact⋈fact join and the per-orderkey aggregate
  * lose their shuffle exchanges; (3) durable — a later JVM re-registers
  * the DDL over the existing bucketed files without rewriting them. */
class BucketedLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def withBucketed[T](f: => T): T = {
    spark.conf.set("graft.layout.bucketed", "true")
    try f finally spark.conf.set("graft.layout.bucketed", "false")
  }

  test("bucketed layout: result parity and exchange-free fact join") {
    BucketedLayout.ensure(spark, sf)

    val plain = graft.SparkEntry.queries("h07_volume_shipping")(spark, sf)
      .collect().map(_.toSeq).toSet
    val (bucketed, planStr) = withBucketed {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val df = graft.SparkEntry.queries("h07_volume_shipping")(spark, sf)
        val rows = df.collect().map(_.toSeq).toSet
        (rows, df.queryExecution.executedPlan.toString)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    assert(bucketed == plain)

    // the lineitem⋈orders join must not shuffle either fact side: with
    // broadcast off, the only hash exchanges left are the ones above
    // the join (aggregate/sort), never between a fact scan and the join
    withBucketed {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val li = Tables.load(spark, sf, "lineitem")
        val o = Tables.load(spark, sf, "orders")
        val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
        j.collect()
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan.take(1200))
        // exactly ONE hash exchange (the 3-group aggregate), none below the join
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
        assert(exchanges == 1, s"expected 1 exchange (final agg), got $exchanges:\n${plan.take(2000)}")
        assert(plan.contains("Bucketed: true"), plan.take(1200))

        // per-orderkey aggregate: bucketing satisfies the clustering →
        // NO exchange at all
        val g = li.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
        g.collect()
        val gplan = g.queryExecution.executedPlan.toString
        assert(!gplan.contains("Exchange hashpartitioning"), gplan.take(1500))
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    }
    assert(planStr.nonEmpty)
  }

  test("bucketed events: timeseries agg rides one deliberate range exchange, same results") {
    BucketedLayout.ensure(spark, sf)
    val plain = graft.SparkEntry.queries("q02_rate_timeseries")(spark, sf)
      .collect().map(_.toSeq).toSet
    withBucketed {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val df = graft.SparkEntry.queries("q02_rate_timeseries")(spark, sf)
        assert(df.collect().map(_.toSeq).toSet == plain)
        // q02's shape: ONE deliberate input range exchange (which both
        // orders the output and clusters (bucket, user) for the
        // aggregate) and nothing else — in particular the aggregate
        // itself must not add a hash exchange, and there is no result
        // orderBy whose sampling would re-run the aggregate
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
        assert("Exchange rangepartitioning".r.findAllIn(plan).size == 1,
          plan.take(1500))

        // the per-user shapes (w06-style) still read the bucketed scan
        // exchange-free: HashPartitioning(user_id) satisfies the
        // ClusteredDistribution of a (user_id, day) aggregate
        val g = Tables.load(spark, sf, "events")
          .groupBy(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
          .agg(count(lit(1)).as("n"))
        g.collect()
        val gplan = g.queryExecution.executedPlan.toString
        assert(!gplan.contains("Exchange"), gplan.take(1500))
        assert(gplan.contains("Bucketed: true"), gplan.take(1500))
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("bucketed layout: catalog loss re-registers over existing files, no rewrite") {
    BucketedLayout.ensure(spark, sf)
    val tbl = BucketedLayout.tableName(sf, "lineitem")
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $tbl")
      .filter(col("col_name") === "Location").select("data_type").collect()(0).getString(0)
    val dir = new java.io.File(new java.net.URI(loc))
    val mtimesBefore = dir.listFiles.map(f => f.getName -> f.lastModified).toMap

    // simulate the next JVM: the InMemoryCatalog forgets the table
    spark.sql(s"DROP TABLE $tbl")
    assert(!spark.catalog.tableExists(tbl))

    val n = withBucketed {
      Tables.load(spark, sf, "lineitem").count() // triggers re-register
    }
    assert(n == Tables.load(spark, sf, "lineitem").count())
    assert(spark.catalog.tableExists(tbl))
    val mtimesAfter = dir.listFiles.map(f => f.getName -> f.lastModified).toMap
    assert(mtimesAfter == mtimesBefore, "re-register must not rewrite data files")

    // still bucketed after re-registration: one file per bucket
    val parts = dir.listFiles.filter(_.getName.startsWith("part-"))
    assert(parts.length == BucketedLayout.NumBuckets,
      s"expected ${BucketedLayout.NumBuckets} bucket files, got ${parts.length}")
  }
}
