package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** PiiScrub: exact redaction strings, per-rule counts, NFC
  * composition, and whitespace hygiene on planted fixtures — the
  * planted-PII evidence backing the c12 gate query. */
class PiiScrubSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("planted fixtures: exact redactions, counts, nfc, whitespace") {
    import spark.implicits._
    val rows = Seq(
      (1L, "  contact user7@mail7.example.com for details"),
      (2L, "call 555-0123 now or 555-9999"),
      (3L, "server 10.23.0.56 down and 192.168.1.1 up"),
      (4L, "resumé attached"), // decomposed e + U+0301
      (5L, "no pii   here  "),
      (6L, "mixed a@b.co 555-1234 1.2.3.4"))
    val out = PiiScrub.scrub(rows.toDF("doc_id", "text"), "text")
      .select("doc_id", "scrubbed", "n_emails", "n_phones", "n_ips")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == (("contact <EMAIL> for details", 1L, 0L, 0L)))
    assert(out(2L) == (("call <PHONE> now or <PHONE>", 0L, 2L, 0L)))
    assert(out(3L) == (("server <IP> down and <IP> up", 0L, 0L, 2L)))
    assert(out(4L) == (("resumé attached", 0L, 0L, 0L))) // composed é
    assert(out(5L) == (("no pii here", 0L, 0L, 0L)))
    assert(out(6L) == (("mixed <EMAIL> <PHONE> <IP>", 1L, 1L, 1L)))
  }

  test("kernel == sequential regex form on adversarial fuzz corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(1313)
    // alphabet biased toward the patterns' structural chars so email/
    // phone/ip near-misses, boundary cases, and overlaps are dense
    val alpha = "ab01239.-@_% +\tXé"
    val fuzz = (1 to 20000).map { i =>
      val len = rnd.nextInt(40)
      (i.toLong, (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    } ++ Seq(
      (100001L, "a@b.co"), (100002L, "a@b.c"), (100003L, "@b.co"),
      (100004L, "a@.co"), (100005L, "a@b@c.co"), (100006L, "x.co555-0123"),
      (100007L, "123@x.co555-0123"), (100008L, "555-0123a@b.co"),
      (100009L, "1234.1.1.1"), (100010L, "1.2.3.4.5"), (100011L, "1.2.3.4567"),
      (100012L, "555-1234-5678"), (100013L, "111-2222333-4444"),
      (100014L, "a@b.co 10.0.0.1 555-0000"), (100015L, " 1.2.3.4 "),
      (100016L, "a%b+c.d-e_f@g-h.i2.com"), (100017L, "9@9.99"),
      (100018L, "x5555-0123"), (100019L, "1.2.3.4@a.bc"),
      (100020L, "..a@b..co.."))
    val df = fuzz.toDF("doc_id", "text")
    val cols = Seq("doc_id", "scrubbed", "n_emails", "n_phones", "n_ips")
    val kernel = PiiScrub.scrub(df, "text")
      .select(cols.head, cols.tail: _*).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val regex = PiiScrub.scrubRegex(df, "text")
      .select(cols.head, cols.tail: _*).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    fuzz.foreach { case (id, t) =>
      assert(kernel(id) == regex(id), s"doc $id input=[$t]")
    }
  }

  test("nfc normalization: ascii fast path is the identity") {
    import org.apache.spark.unsafe.types.UTF8String
    val s = UTF8String.fromString("plain ascii text")
    assert(graft.functions.NfcNormalize.normalize(s) eq s)
    val dec = UTF8String.fromString("café")
    assert(graft.functions.NfcNormalize.normalize(dec).toString == "café")
  }
}
