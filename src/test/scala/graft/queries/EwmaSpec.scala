package graft.queries

import java.sql.Timestamp

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** w10 EWMA: seed = first value in (ts, event_id) order, then
  * ewma = 0.25·v + 0.75·ewma — hand-checked, including out-of-order
  * arrival (the sort, not the input order, defines the fold) and the
  * single-event seed case.
  */
class EwmaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("hand fixture: fold order, same-ts tie-break, single-event seed") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_w10").toString
    def ts(s: String) = Timestamp.valueOf(s)
    Seq(
      // user 1 arrives OUT OF ORDER: sorted sequence is 8.0, 4.0, 2.0
      // → seed 8.0; 0.25·4 + 0.75·8 = 7.0; 0.25·2 + 0.75·7 = 5.75
      (3L, ts("2024-01-01 00:00:03"), 1L, "e", 2.0, "{}"),
      (1L, ts("2024-01-01 00:00:01"), 1L, "e", 8.0, "{}"),
      (2L, ts("2024-01-01 00:00:02"), 1L, "e", 4.0, "{}"),
      // user 2: same ts — event_id breaks the tie (5 before 6):
      // seed 10.0, then 0.25·20 + 0.75·10 = 12.5
      (5L, ts("2024-01-01 00:00:01"), 2L, "e", 10.0, "{}"),
      (6L, ts("2024-01-01 00:00:01"), 2L, "e", 20.0, "{}"),
      // user 3: single event → ewma = the value itself
      (7L, ts("2024-01-01 00:00:01"), 3L, "e", 42.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val rows = graft.SparkEntry.queries("w10_ewma")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((1L, 3L, 5.75), (2L, 2L, 12.5), (3L, 1L, 42.5)))
  }
}
