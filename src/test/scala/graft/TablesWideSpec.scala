package graft

import graft.etl.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Tables.loadDocsWide is SCALE-GUARDED (round-18 verdict item 5):
  * the widen+cache input-skew remedy must fire on a narrow (single
  * file) layout and must NOT materialize a corpus-sized cache on a
  * many-file layout where the scan is already wide. */
class TablesWideSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def writeDocs(dir: String, nFiles: Int): Unit = {
    import spark.implicits._
    (0L until 64L).map(i => (i, s"document number $i with a few words"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(nFiles)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("single-file layout widens behind a cache") {
    val dir = java.nio.file.Files.createTempDirectory("docswide1").toString
    writeDocs(dir, 1)
    try {
      val df = Tables.loadDocsWide(spark, dir)
      assert(df.storageLevel != StorageLevel.NONE,
        "narrow scan should be widened behind a cache boundary")
      assert(df.count() == 64)
      df.unpersist(): Unit
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("many-file layout keeps the plain scan (no corpus-sized cache)") {
    val dir = java.nio.file.Files.createTempDirectory("docswideN").toString
    // >= defaultParallelism (4 in the test session) splits: with
    // maxPartitionBytes at 4m each tiny file is charged openCost (4m)
    // and lands in its own split, deterministically
    writeDocs(dir, 8)
    val oldMax = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    try {
      val df = Tables.loadDocsWide(spark, dir)
      assert(df.storageLevel == StorageLevel.NONE,
        "wide scan must not be repartitioned+cached")
      assert(df.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism)
      assert(df.count() == 64)
    } finally {
      oldMax match {
        case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
        case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
