package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** c12: text normalization + PII scrub — the corpus-hygiene stage
  * every production pretraining pipeline runs BEFORE quality gating
  * (CCNet, Gopher, The Pile all normalize + redact before their
  * filters see the text). Reference scope: NTRIPmonitor has no corpus
  * processing at all — this extends the engine's LLM-pipeline surface
  * (SURVEY §2 extension family, c01–c11).
  *
  * The scrub contract, in fixed order so counts and redactions are
  * deterministic and oracle-stateable:
  *   1. Unicode NFC normalization ([[graft.functions.NfcNormalize]],
  *      value-identical to DuckDB's nfc_normalize);
  *   2. e-mail redaction  → `<EMAIL>`  (count per doc);
  *   3. phone redaction   → `<PHONE>`  (count per doc, on the
  *      email-redacted text so rule counts never overlap);
  *   4. IPv4 redaction    → `<IP>`     (count per doc, likewise);
  *   5. whitespace hygiene: collapse space runs, trim.
  * All rules are exact and rule-based — DuckDB `regexp_replace(...,
  * 'g')` / `len(regexp_extract_all(...))` state the oracle; the
  * patterns stay inside the Java-regex ∩ RE2 common subset (no
  * lookaround, no backreferences) so both engines match identically.
  *
  * Gate corpus: the synthetic documents table is lowercase word salad
  * with NO digits, '@', or non-ASCII anywhere — a scrub over the raw
  * table would be an all-zeros oracle. The gate query therefore
  * PLANTS deterministic PII in-plan from doc_id arithmetic (emails on
  * doc_id%7, phones on %11, IPv4 on %13, a decomposed-accent NFC case
  * on %17, trailing-space runs on %5); the oracle plants the
  * byte-identical corpus, so redaction, counting, normalization and
  * the character accounting are all hash-checked end to end.
  *
  * Scale shape: one STATELESS scan projection (NFC + three codegen'd
  * regexp passes + whitespace collapse — no shuffle, no state, fully
  * pipelined inside whole-stage codegen) feeding a map-side-combined
  * aggregate on |sources| groups. At 100 TB the scrub is pure scan
  * work that parallelizes embarrassingly; the only exchange carries
  * |sources| partial rows. The scrubbed text itself is a column of
  * the projection (`scrub`), so the cleaned-corpus emission form is
  * `.select("doc_id", "scrubbed")` + write — same plan minus the
  * report aggregate.
  */
object PiiScrub extends QueryModule {

  /** Java-regex ∩ RE2 common-subset patterns (single source of truth
    * for engine and spec; the oracle SQL states the same strings). */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"
  val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** The reusable scrub projection: adds `nfc` (normalized input),
    * per-rule counts `n_emails`/`n_phones`/`n_ips`, and `scrubbed`
    * (redacted + whitespace-collapsed + trimmed) to `df`. Counts are
    * taken on the text each rule actually saw (post-previous-rule), so
    * Σ counts = number of redactions performed. Execution is the
    * one-pass byte kernel ([[graft.functions.PiiScrubExpr]]) — the
    * regex form ([[scrubRegex]]) measured ~3.3 s of c12's 4.0 s at
    * sf10 and the kernel is property-specced value-identical to it. */
  def scrub(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("nfc", graft.functions.GraftFunctions.nfcNormalize(col(textCol)))
      .withColumn("_sc", graft.functions.GraftFunctions.piiScrub(col("nfc")))
      .withColumn("n_emails", col("_sc.n_emails").cast(LongType))
      .withColumn("n_phones", col("_sc.n_phones").cast(LongType))
      .withColumn("n_ips", col("_sc.n_ips").cast(LongType))
      .withColumn("scrubbed", col("_sc.scrubbed"))
      .drop("_sc")

  /** The sequential-regex statement of the same contract — the
    * semantics the oracle SQL states and the property spec compares
    * the kernel against. */
  def scrubRegex(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("nfc", graft.functions.GraftFunctions.nfcNormalize(col(textCol)))
      .withColumn("n_emails", regexp_count(col("nfc"), lit(EmailRe)).cast(LongType))
      .withColumn("t1", regexp_replace(col("nfc"), EmailRe, "<EMAIL>"))
      .withColumn("n_phones", regexp_count(col("t1"), lit(PhoneRe)).cast(LongType))
      .withColumn("t2", regexp_replace(col("t1"), PhoneRe, "<PHONE>"))
      .withColumn("n_ips", regexp_count(col("t2"), lit(IpRe)).cast(LongType))
      .withColumn("t3", regexp_replace(col("t2"), IpRe, "<IP>"))
      .withColumn("scrubbed", trim(regexp_replace(col("t3"), " +", " ")))
      .drop("t1", "t2", "t3")

  /** Deterministic planted-PII corpus for the gate (see class doc):
    * every planted fragment derives from doc_id arithmetic, so the
    * oracle can synthesize the identical corpus in SQL. */
  def planted(docs: DataFrame): DataFrame =
    docs.withColumn("planted", concat(
      col("text"),
      when(pmod(col("doc_id"), lit(7L)) === 0,
        concat(lit("  contact user"), col("doc_id").cast("string"),
          lit("@mail"), pmod(col("doc_id"), lit(10L)).cast("string"),
          lit(".example.com for details"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(11L)) === 0,
        concat(lit(" call 555-"),
          lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"),
          lit(" now"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(13L)) === 0,
        concat(lit(" server 10."), pmod(col("doc_id"), lit(256L)).cast("string"),
          lit(".0."), pmod(col("doc_id"), lit(100L)).cast("string"),
          lit(" down"))).otherwise(lit("")),
      // DECOMPOSED accent (e + U+0301) -- byte-identical to the
      // oracle's 'resume' || chr(769); NFC composes it to é
      when(pmod(col("doc_id"), lit(17L)) === 0,
        lit(" resumé attached")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(5L)) === 0, lit("   ")).otherwise(lit(""))))

  private def c12(s: SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.load(s, d, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    scrub(planted(docs), "planted")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_emails")).as("n_emails"),
        sum(col("n_phones")).as("n_phones"),
        sum(col("n_ips")).as("n_ips"),
        sum(when(col("n_emails") + col("n_phones") + col("n_ips") > 0, 1L)
          .otherwise(0L)).as("n_docs_pii"),
        sum(when(col("nfc") =!= col("planted"), 1L).otherwise(0L)).as("n_docs_nfc"),
        sum(length(col("planted")).cast(LongType) -
          length(col("scrubbed")).cast(LongType)).as("chars_removed"))
      .orderBy("source")
  }

  private val c12Sql =
    """WITH pl AS (
      |  SELECT source,
      |    text
      |    || CASE WHEN doc_id % 7 = 0 THEN '  contact user' || CAST(doc_id AS VARCHAR)
      |         || '@mail' || CAST(doc_id % 10 AS VARCHAR) || '.example.com for details' ELSE '' END
      |    || CASE WHEN doc_id % 11 = 0 THEN ' call 555-'
      |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' ELSE '' END
      |    || CASE WHEN doc_id % 13 = 0 THEN ' server 10.' || CAST(doc_id % 256 AS VARCHAR)
      |         || '.0.' || CAST(doc_id % 100 AS VARCHAR) || ' down' ELSE '' END
      |    || CASE WHEN doc_id % 17 = 0 THEN ' resume' || chr(769) || ' attached' ELSE '' END
      |    || CASE WHEN doc_id % 5 = 0 THEN '   ' ELSE '' END AS planted
      |  FROM documents),
      |nf AS (SELECT source, planted, nfc_normalize(planted) AS t0 FROM pl),
      |s1 AS (SELECT source, planted, t0,
      |    len(regexp_extract_all(t0, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
      |    regexp_replace(t0, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g') AS t1
      |  FROM nf),
      |s2 AS (SELECT source, planted, t0, n_emails,
      |    len(regexp_extract_all(t1, '\b[0-9]{3}-[0-9]{4}\b')) AS n_phones,
      |    regexp_replace(t1, '\b[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g') AS t2
      |  FROM s1),
      |s3 AS (SELECT source, planted, t0, n_emails, n_phones,
      |    len(regexp_extract_all(t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ips,
      |    regexp_replace(t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS t3
      |  FROM s2),
      |s4 AS (SELECT source, planted, t0, n_emails, n_phones, n_ips,
      |    trim(regexp_replace(t3, ' +', ' ', 'g')) AS scrubbed
      |  FROM s3)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_emails) AS BIGINT) AS n_emails,
      |  CAST(SUM(n_phones) AS BIGINT) AS n_phones,
      |  CAST(SUM(n_ips) AS BIGINT) AS n_ips,
      |  CAST(SUM(CASE WHEN n_emails + n_phones + n_ips > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_pii,
      |  CAST(SUM(CASE WHEN t0 <> planted THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_nfc,
      |  CAST(SUM(length(planted) - length(scrubbed)) AS BIGINT) AS chars_removed
      |FROM s4 GROUP BY 1 ORDER BY 1""".stripMargin

  override def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c12_pii_scrub" -> c12,
    // streaming twin: scrub-at-ingest; per-(window, source) Append
    // emissions re-aggregate to the batch report exactly, so the same
    // planted-corpus oracle checks it (the t20/t22 pattern)
    "c12_scrub_stream" ->
      ((s, d) => graft.streaming.StreamingPiiScrub.replayGate(s, d)))

  override def oracle: Map[String, String] = Map(
    "c12_pii_scrub" -> c12Sql,
    "c12_scrub_stream" -> c12Sql)
}
