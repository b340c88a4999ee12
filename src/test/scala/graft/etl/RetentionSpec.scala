package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("dropOlderThan deletes only partitions before the cutoff, without scanning") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_retention").toString
    (0 until 1000).map(i => (s"2024-01-${"%02d".format(1 + i % 9)}", i.toLong))
      .toDF("date", "v")
      .write.mode("overwrite").partitionBy("date").parquet(dir)
    assert(Retention.datePartitions(spark, dir).size == 9)

    val dropped = Retention.dropOlderThan(spark, dir, LocalDate.parse("2024-01-04"))
    assert(dropped == Seq(LocalDate.parse("2024-01-01"),
      LocalDate.parse("2024-01-02"), LocalDate.parse("2024-01-03")))
    val left = Retention.datePartitions(spark, dir)
    assert(left.size == 6 && left.head == LocalDate.parse("2024-01-04"))

    // retained data fully readable; dropped dates gone
    val df = spark.read.parquet(dir)
    assert(df.count() > 0)
    assert(df.filter(col("date") < "2024-01-04").count() == 0)
    assert(df.filter(col("date") === "2024-01-05").count() > 0)
  }
}
