package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JsonGetLong contract: on WELL-FORMED JSON, value-identical to
  * TRY_CAST(get_json_object(j, '$.key') AS BIGINT); on malformed
  * documents, best-effort null-or-value without ever raising (the
  * builtin aborts the whole document at the first syntax error — the
  * scan kernel only needs the prefix up to the probed key, which is
  * the documented, laxer TRY contract). */
class JsonGetLongSpec extends AnyFunSuite {
  private lazy val spark = graft.etl.SparkTestSession.spark

  private def both(docs: Seq[String], key: String = "k"): Seq[(String, Option[Long], Option[Long])] = {
    import spark.implicits._
    val df = docs.toDF("j")
      .withColumn("native", GraftFunctions.jsonGetLong(col("j"), key))
      .withColumn("builtin", expr(s"try_cast(get_json_object(j, '$$.$key') as bigint)"))
    df.collect().map { r =>
      (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }.toSeq
  }

  test("targeted well-formed cases equal the builtin") {
    val docs = Seq(
      """{"k": 76}""",
      """{"k":-42}""",
      """{ "k" : 0 }""",
      """{"a": 1, "k": 2, "b": 3}""",
      """{"k": 9223372036854775807}""",
      """{"k": -9223372036854775808}""",
      """{"k": 9223372036854775808}""", // overflow -> null
      """{"k": -9223372036854775809}""", // underflow -> null
      """{"k": 12.5}""", // float -> null (try_cast)
      """{"k": 1.0}""",
      """{"k": 1e3}""",
      """{"k": true}""",
      """{"k": false}""",
      """{"k": null}""",
      """{"k": "42"}""", // quoted int casts
      """{"k": " 42 "}""", // cast trims
      """{"k": "+7"}""",
      """{"k": "-0"}""",
      """{"k": "9.0"}""", // quoted float -> null under try_cast
      """{"k": "abc"}""",
      """{"k": ""}""",
      "{\"k\": \"\\" + "u0034\\" + "u0032\"}", // \uXXXX-escaped digits in value: "42"
      """{"k": {"k": 5}}""", // value is an object -> null
      """{"k": [1, 2]}""", // value is an array -> null
      """{"a": {"k": 5}}""", // nested k only -> null ($.k is top-level)
      """{"a": [{"k": 5}], "k": 7}""", // nested decoy before the real key
      """{"kk": 1}""", // prefix key mismatch
      """{"K": 1}""", // case-sensitive
      """{"k": 1, "k": 2}""", // duplicate keys
      "{\"\\" + "u006b\": 33}", // \uXXXX-escaped key decodes to "k"
      """{"a\"b": 1, "k": 4}""", // escaped quote inside another key
      """{"a": "no \"k\": inside strings", "k": 9}""", // decoy in a string value
      """{"a": "tricky \\", "k": 11}""", // trailing backslash escape
      """  {"k": 5}  """, // surrounding whitespace
      """[1, 2, 3]""", // array root -> null
      """42""", // scalar root -> null
      """{}""",
      """{"a": 1}""")
    for ((j, n, b) <- both(docs))
      assert(n == b, s"mismatch on $j: native=$n builtin=$b")
  }

  test("10k random well-formed documents equal the builtin") {
    val rnd = new scala.util.Random(991)
    def randValue(depth: Int): String = rnd.nextInt(if (depth > 1) 8 else 10) match {
      case 0 => rnd.nextLong().toString
      case 1 => rnd.nextInt(2000).toString
      case 2 => (rnd.nextDouble() * 1000).toString
      case 3 => "\"" + rnd.nextInt(1000) + "\""
      case 4 => Seq("true", "false", "null")(rnd.nextInt(3))
      case 5 => "\"s" + rnd.nextInt(100) + "\""
      case 6 => "\"" + (if (rnd.nextBoolean()) " " else "") + rnd.nextInt(500) + " \""
      case 7 => "9223372036854775" + (800 + rnd.nextInt(100)) // near/over Long.Max
      case 8 => "{" + (0 until rnd.nextInt(3)).map(i =>
        s""""n$i": ${randValue(depth + 1)}""").mkString(", ") + "}"
      case 9 => "[" + (0 until rnd.nextInt(4)).map(_ =>
        randValue(depth + 1)).mkString(", ") + "]"
    }
    val docs = (0 until 10000).map { _ =>
      val keys = rnd.shuffle(("k" +: (0 until rnd.nextInt(4)).map("x" + _)).toList)
        .take(1 + rnd.nextInt(4))
      "{" + keys.map(k => s""""$k": ${randValue(0)}""").mkString(", ") + "}"
    }
    val rows = both(docs)
    val bad = rows.filter { case (_, n, b) => n != b }
    assert(bad.isEmpty, s"${bad.size} mismatches, first: ${bad.take(3)}")
  }

  test("malformed documents never raise; null where the prefix breaks before the key") {
    val docs = Seq(
      """{"k": 01}""", // leading zero (invalid JSON number)
      """{"k": }""",
      """{"k" 5}""",
      """{"k": 5""", // unterminated
      """{k: 5}""", // unquoted key
      """{"a": tru, "k": 5}""", // bad literal before the key (lenient skip may still find k)
      """""",
      """null""",
      """{,}""")
    // must evaluate without throwing; where the syntax break precedes
    // the key, the result must be null
    val got = both(docs).map { case (j, n, _) => j -> n }.toMap
    assert(got("""{"k": }""").isEmpty)
    assert(got("""{"k" 5}""").isEmpty)
    assert(got("""{k: 5}""").isEmpty)
    assert(got("").isEmpty)
    assert(got("null").isEmpty)
    assert(got("{,}").isEmpty)
  }

  test("SQL registration: json_get_long callable and literal-key-guarded") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq("""{"k": 5}""").toDF("j").createOrReplaceTempView("jgl_t")
    val r = spark.sql("select json_get_long(j, 'k') as v from jgl_t").collect()
    assert(r.head.getLong(0) == 5L)
  }
}
