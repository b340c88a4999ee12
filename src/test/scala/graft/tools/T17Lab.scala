package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev probe: t17 provenance stage ladder at a data-bound SF, plus a
  * g06-style packed-pair sort/run-length A/B for the pair count. */
object T17Lab {
  def time(name: String)(f: => DataFrame): Double = {
    f.write.format("noop").mode("overwrite").save()
    val ts = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[lab] $name%-44s ${ts.min}%8.3f s")
    ts.min
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .appName("t17lab")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.GraftFunctions.trigramTfPairs
    import graft.operators.BloomSketch
    def docs = graft.Tables.load(spark, d, "documents")
    def g3(in: DataFrame): DataFrame = in
      .select(col("doc_id"), trigramTfPairs(col("text")).as("ps"))
      .select(col("doc_id"), explode(col("ps")).as("p"))
      .select(col("doc_id"), col("p.t").as("gram"))
    val evalAll = g3(docs.filter(col("doc_id") % 37 === 0))
      .withColumnRenamed("doc_id", "eval_doc").cache()
    val nEval = evalAll.agg(countDistinct(col("eval_doc"))).head().getLong(0)
    val k = math.max(8L, (nEval + 1) / 2)
    val keep = evalAll.groupBy(col("gram"))
      .agg(count(lit(1)).as("edf")).filter(col("edf") <= k).select("gram")
    val evalPairs = evalAll.join(keep, Seq("gram"), "left_semi").cache()
    val sketch = BloomSketch.build(evalPairs, "gram")
    println(s"[lab] nEval=$nEval evalPairs=${evalPairs.count()}")

    def trainGrams = g3(docs.filter(col("doc_id") % 37 =!= 0))
      .filter(BloomSketch.probe(sketch, col("gram")))
    def joined = trainGrams.join(evalPairs, Seq("gram"))
    if (args.contains("full")) {
      time("train grams + probe (count)")(trainGrams.groupBy().agg(count(lit(1))))
      time("+ join (count rows)")(joined.groupBy().agg(count(lit(1))))
      def pairAgg = joined.groupBy(col("doc_id"), col("eval_doc"))
        .agg(count(lit(1)).as("shared"))
      time("+ pair hash agg")(pairAgg.groupBy().agg(sum("shared")))
      time("full t17 current")(
        graft.SparkEntry.queries("t17_contamination_provenance")(spark, d))
    }

    // A/B: ONE exchange of raw packed longs, Spark's spillable
    // external sort within partitions, then a STREAMING run-length +
    // per-doc argmax fold (O(1) task memory — no buffering)
    import org.apache.spark.sql.Encoders
    def packed = joined
      .select((shiftleft(col("doc_id"), 31) + col("eval_doc")).as("pk"))
      .as[Long](Encoders.scalaLong)
    println(s"[lab] joined rows = ${packed.count()}")
    def onePass = packed
      .repartition(shiftright(col("pk"), 31))
      .sortWithinPartitions(col("pk"))
      .mapPartitions { it =>
        new Iterator[(Long, Long, Long)] {
          private var cur = if (it.hasNext) it.next() else -1L
          private var done = cur == -1L
          override def hasNext: Boolean = !done
          override def next(): (Long, Long, Long) = {
            val doc = cur >>> 31
            var bestEval = -1L
            var bestC = 0L
            var go = true
            while (go) {
              val k0 = cur
              var c = 1L
              var inner = true
              while (inner) {
                if (it.hasNext) {
                  cur = it.next()
                  if (cur == k0) c += 1 else inner = false
                } else { done = true; inner = false }
              }
              if (c > bestC) { bestC = c; bestEval = k0 & ((1L << 31) - 1) }
              if (done || (cur >>> 31) != doc) go = false
            }
            (doc, bestEval, bestC)
          }
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
      .toDF("doc_id", "eval_doc", "shared")
      .orderBy("doc_id")
    time("t17 PACKED streaming argmax")(onePass)
  }
}
