package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** c10's semantic point: near-dup clusters move ATOMICALLY between
  * train/val/test. The fixture plants a 3-copy cluster whose members'
  * individual Knuth-hash buckets land in three DIFFERENT splits
  * (6→val, 9→test, 12→train) — the naive per-doc rule would leak the
  * pair across every boundary; the cluster rule sends all three to
  * the representative's split and the cross-split pair audit is zero.
  */
class LeakageSplitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def bucket(id: Long): Long =
    java.lang.Math.floorMod(java.lang.Math.floorMod(id * 2654435761L, 4294967296L), 10L)

  private def writeDocs(): String = {
    import spark.implicits._
    val near = "spark engines shuffle data between executors when aggregations require it daily"
    val docs = Seq(
      (6L, near), (9L, near), (12L, near), // one near-dup cluster
      (1L, "unique filler document about topic one subject alpha item beta"),
      (20L, "another unique filler text concerning gamma delta epsilon zeta topics"),
      (21L, "third unique filler covering eta theta iota kappa lambda subjects"))
      .map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("graft_split").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("a near-dup cluster whose members hash to three different splits lands whole in the rep's split") {
    // precondition the fixture exists to demonstrate: the naive
    // per-doc buckets of the cluster straddle all three splits
    assert(bucket(6L) == 8L && bucket(9L) == 9L && bucket(12L) == 0L)
    // singleton anchors: 1→train, 20→val, 21→test
    assert(bucket(1L) < 8L && bucket(20L) == 8L && bucket(21L) == 9L)
    val dir = writeDocs()
    val out = graft.SparkEntry.queries("c10_leakage_safe_split")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4))))
      .toMap
    // cluster rep = min(6,9,12) = 6 → bucket 8 → 'val': all 3 members
    // plus singleton 20; train and test get only their singletons
    assert(out("train") == ((1L, 1L, 0L)), s"got $out")
    assert(out("val") == ((4L, 2L, 0L)), s"got $out")
    assert(out("test") == ((1L, 1L, 0L)), s"got $out")
  }

  test("sum_chars partitions the corpus exactly across splits") {
    val dir = writeDocs()
    val rows = graft.SparkEntry.queries("c10_leakage_safe_split")(spark, dir).collect()
    val total = rows.map(_.getLong(3)).sum
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("sum(n_chars)").collect()(0).getLong(0)
    assert(total == expected)
    assert(rows.forall(_.getLong(4) == 0L)) // zero leaked pairs, every row
  }
}
