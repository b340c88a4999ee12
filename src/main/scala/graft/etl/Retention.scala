package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

/** Retention for date-partitioned landed tables — the engine-side
  * analog of the reference's TimescaleDB retention policy
  * (`initdb/01-rtcm_packages.sql:16-17`, 2-month drop): on a layout
  * partitioned by a `date` column (`.../date=YYYY-MM-DD/...`),
  * dropping a partition is a directory delete — no scan, no rewrite,
  * exactly like a timescale chunk drop. Run as a scheduled maintenance
  * job, not an engine operator.
  */
object Retention {

  /** Partition values (dates) currently present in the layout. */
  def datePartitions(spark: SparkSession, tableDir: String): Seq[LocalDate] = {
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val base = new org.apache.hadoop.fs.Path(tableDir)
    if (!fs.exists(base)) return Nil
    fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("date="))
      .map(n => LocalDate.parse(n.stripPrefix("date=")))
      .sorted
  }

  /** Drop partitions strictly older than `keepFrom`. Returns the dates
    * ACTUALLY deleted (a failed delete is not reported as dropped — a
    * scheduled job must see expired-but-still-present partitions
    * again). Directory-level delete: O(partitions), never touches row
    * data of retained partitions. */
  def dropOlderThan(spark: SparkSession, tableDir: String, keepFrom: LocalDate): Seq[LocalDate] = {
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    datePartitions(spark, tableDir)
      .filter(_.isBefore(keepFrom))
      .filter(d => fs.delete(new org.apache.hadoop.fs.Path(tableDir, s"date=$d"), true))
  }
}
