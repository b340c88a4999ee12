package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** t17 contamination provenance: per train doc, the eval doc sharing
  * the most distinct 3-grams — ties to the smaller eval doc_id,
  * no-overlap docs absent.
  */
class ProvenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("argmax eval doc, tie to smaller id, no-overlap absent") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_t17").toString
    Seq(
      (0L, "a b c d", "ev", 7L),    // eval: {a b c, b c d}
      (37L, "b c d e", "ev", 7L),   // eval: {b c d, c d e}
      // shares 2 grams with EACH eval doc -> tie -> eval_doc 0
      (1L, "a b c d e", "s0", 9L),
      // shares only "c d e" with eval 37
      (2L, "z c d e q", "s0", 9L),
      // no overlap -> absent
      (3L, "p q r s", "s0", 7L))
      .toDF("doc_id", "text", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = graft.SparkEntry.queries("t17_contamination_provenance")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 0L, 2L), (2L, 37L, 1L)))
  }

  test("eval-df cap: non-decisive hot gram leaves the argmax invariant") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_t17cap").toString
    // 10 eval docs (ids 37k), each "u1 u2 u3 e{k}a e{k}b": the gram
    // "u1 u2 u3" is in ALL 10 (eval-df 10 > K = max(8, ceil(10/2)) = 8
    // -> capped); the two cross grams per doc are unique (df 1).
    val evalDocs = (0 until 10).map { k =>
      (37L * k, s"u1 u2 u3 e${k}a e${k}b", "ev", 7L)
    }
    val trainDocs = Seq(
      // identical to eval doc 0: uncapped shared = {u1 u2 u3,
      // u2 u3 e0a, u3 e0a e0b} = 3 vs eval 0, 1 (the hot gram) vs
      // every other eval doc -> argmax eval 0. Capped: the hot gram's
      // -1 hits EVERY candidate equally -> argmax still eval 0,
      // shared = 2 discriminative grams.
      (1L, "u1 u2 u3 e0a e0b", "s0", 9L),
      // shares ONLY the capped gram -> no provenance signal -> absent
      // from the capped report (uncapped would have reported a
      // meaningless 10-way tie broken to eval 0)
      (2L, "u1 u2 u3 zz yy", "s0", 9L))
    (evalDocs ++ trainDocs)
      .toDF("doc_id", "text", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = graft.SparkEntry.queries("t17_contamination_provenance")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 0L, 2L)))
  }
}
