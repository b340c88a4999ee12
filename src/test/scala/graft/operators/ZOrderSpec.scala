package graft.operators

import graft.etl.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("morton key interleaves bits (hand-computed values)") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L), (0xFFFFFFFFL, 0L))
      .toDF("x", "y")
      .select(ZOrder.mortonKey2(col("x"), col("y")))
      .collect().map(_.getLong(0)).toSeq
    // interleave(5=101, 3=011) = y1 x1 y0 x0 ... = bits x:1,0,1 at even
    // positions (1+0+16) and y:1,1 at odd positions (2+8) = 27
    assert(got == Seq(0L, 1L, 2L, 3L, 27L, 0x5555555555555555L))
  }

  test("z-order layout prunes files on BOTH dimensions; linear sort only on one") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val grid = spark.range(0, 256L * 256L)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"),
        col("id").as("payload"))

    ZOrder.writeZOrdered(grid, "x", "y", s"$dir/z", numFiles = 64)
    grid.repartitionByRange(64, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))
      .write.mode("overwrite").parquet(s"$dir/linear")

    // per-file min/max — exactly the stats a scan prunes with
    def overlapping(path: String, loX: Long, hiX: Long, loY: Long, hiY: Long): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .filter(col("x0") <= hiX && col("x1") >= loX &&
          col("y0") <= hiY && col("y1") >= loY)
        .count()

    // a 16×16 rectangle = 1/256 of the space
    val zBoth = overlapping(s"$dir/z", 64, 79, 128, 143)
    val linBoth = overlapping(s"$dir/linear", 64, 79, 128, 143)
    // a y-only band: the linear layout (sorted by x first) cannot
    // prune it at all — every x-slice file spans all y
    val zY = overlapping(s"$dir/z", 0, 255, 128, 143)
    val linY = overlapping(s"$dir/linear", 0, 255, 128, 143)

    // z-order: rectangle touches a handful of curve ranges
    assert(zBoth <= 8, s"z-order rectangle overlap: $zBoth files of 64")
    assert(zBoth < linBoth, s"z=$zBoth vs linear=$linBoth")
    assert(zY <= 24, s"z-order y-band overlap: $zY files of 64")
    assert(linY >= 60, s"linear layout should not prune a y-band, got $linY")

    // layout is lossless
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() == 65536L)
    assert(back.agg(sum("payload")).head.getLong(0) == grid.agg(sum("payload")).head.getLong(0))

    // and the scan actually pushes both range predicates to parquet
    val scan = spark.read.parquet(s"$dir/z")
      .filter(col("x").between(64, 79) && col("y").between(128, 143))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(x,64)"),
      s"filters not pushed:\n$plan")
    assert(scan.count() == 256L)
  }
}
