package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for a large-scale training-data pipeline
  * over the `documents` table: token counting, quality scoring,
  * language-ID heuristics, word frequency. Every query here is a
  * single partial+final hash aggregate (or a map-side explode + agg)
  * — no driver-side loops, linear in corpus size, shuffle only on the
  * small grouping key.
  */
object TextAnalysis extends QueryModule {
  import Q._

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  /** Whitespace token count, engine-portable: texts are single-space
    * separated, so tokens = spaces + 1. (The BPE-style pre-tokenizer
    * path is t07 via functions.BpeTokenCount — its lookahead regex is
    * not expressible in DuckDB SQL, so t07 is checked by the
    * Python-side oracle in scripts/py_oracles.py.) */
  private def tokenCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, " ", "")) + 1).cast(LongType)
  private def tokenCountSql(c: String): String =
    s"CAST(length($c) - length(replace($c, ' ', '')) + 1 AS BIGINT)"

  // t01: corpus token statistics per language.
  private def t01(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text"))).as("total_tokens"),
        davg(tokenCount(col("text"))).as("avg_tokens"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("lang")

  private val t01Sql =
    s"""SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(${tokenCountSql("text")}) AS BIGINT) AS total_tokens,
       |  ${davgSql(tokenCountSql("text"))} AS avg_tokens,
       |  MAX(n_chars) AS max_chars
       |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  // t02: quality scoring per source — mean token length, short/long
  // flags, stopword density (the quality heuristics of C4-style
  // pipelines, expressed engine-portably).
  // Ratios are aggregate-level (sum/sum of exact ints → one double
  // division), never per-row: a per-row int/int can land exactly on a
  // decimal rounding tie (dyadic rationals), which the two engines
  // break differently.
  private def t02(s: SparkSession, d: String): DataFrame = {
    val toks = tokenCount(col("text"))
    val stopHits = ((length(col("text")) -
      length(regexp_replace(col("text"), " the ", ""))) / lit(5)).cast(LongType)
    docs(s, d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        fixedDec(rhu(sum(col("n_chars")), sum(toks), 1000000L), 6).as("avg_token_len"),
        sum(when(toks < 20, 1L).otherwise(0L)).as("n_short"),
        sum(when(toks > 80, 1L).otherwise(0L)).as("n_long"),
        fixedDec(rhu(sum(stopHits), sum(toks), 1000000000L), 6).as("stop_per_1k_tokens"))
      .orderBy("source")
  }

  private val t02Sql = {
    val toks = tokenCountSql("text")
    val stop = s"CAST(floor((length(text) - length(replace(text, ' the ', ''))) / 5) AS BIGINT)"
    s"""SELECT source, COUNT(*) AS n_docs,
       |  ${fixedDecSql(rhuSql("CAST(SUM(n_chars) AS BIGINT)", s"CAST(SUM($toks) AS BIGINT)", 1000000L), 6)} AS avg_token_len,
       |  CAST(SUM(CASE WHEN ($toks) < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
       |  CAST(SUM(CASE WHEN ($toks) > 80 THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
       |  ${fixedDecSql(rhuSql(s"CAST(SUM($stop) AS BIGINT)", s"CAST(SUM($toks) AS BIGINT)", 1000000000L), 6)} AS stop_per_1k_tokens
       |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // t03: language-ID heuristic (stopword hit) scored against the
  // labeled lang column — accuracy per language.
  private def t03(s: SparkSession, d: String): DataFrame = {
    val padded = concat(lit(" "), col("text"), lit(" "))
    val pred = when(padded.contains(" the ") || padded.contains(" and "), "en")
      .otherwise("other")
    docs(s, d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(pred === col("lang"), 1L).otherwise(0L)).as("n_pred_match"))
      .orderBy("lang")
  }

  private val t03Sql =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN (CASE WHEN contains(' ' || text || ' ', ' the ')
      |                            OR contains(' ' || text || ' ', ' and ')
      |                      THEN 'en' ELSE 'other' END) = lang
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_match
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  // t04: global word frequency via explode — top 25 (map-side explode,
  // one shuffle on the word key, full sort only on the aggregated set).
  private def t04(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("word"))
      .limit(25)

  private val t04Sql =
    """SELECT word, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) w
      |WHERE word <> ''
      |GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 25""".stripMargin

  // t05: n-gram profile — word-bigram counts per language, top 20
  // (explode over zipped shifted arrays; the shingle primitive reused
  // by MinHash dedup).
  private def t05(s: SparkSession, d: String): DataFrame = {
    val words = split(col("text"), " ")
    val bigrams = zip_with(slice(words, lit(1), size(words) - 1),
      slice(words, lit(2), size(words) - 1),
      (a: Column, b: Column) => concat_ws(" ", a, b))
    docs(s, d)
      .select(col("lang"), explode(bigrams).as("bigram"))
      .groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("lang"), col("bigram"))
      .limit(20)
  }

  private val t05Sql =
    """SELECT lang, bigram, COUNT(*) AS n
      |FROM (
      |  SELECT lang, unnest(list_transform(range(1, len(string_split(text,' '))),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS bigram
      |  FROM documents) d
      |GROUP BY 1, 2 ORDER BY 3 DESC, 1, 2 LIMIT 20""".stripMargin

  // t07: BPE-style pre-token statistics per language — the
  // "token budget" pass of a training-data pipeline, over the GPT-2
  // pre-tokenization pattern (functions.TextTokens). Oracle: the
  // pattern's lookahead has no DuckDB equivalent, so the gate
  // recomputes the whole pass in Python (regex module — the
  // pattern's native dialect; scripts/py_oracles.py); value-level
  // checks also live in FunctionsSpec.
  private def t07(s: SparkSession, d: String): DataFrame = {
    import graft.functions.GraftFunctions.bpeTokenCount
    val toks = bpeTokenCount(col("text"))
    docs(s, d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(toks).as("total_bpe_tokens"),
        max(toks).as("max_bpe_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("lang")
  }

  // t06: document fingerprinting via the codegen'd 64-bit rolling
  // hash (order-sensitive content id) — fingerprint uniqueness per
  // language. Oracle: Python-side recompute of the same published
  // polynomial (scripts/py_oracles.py).
  private def t06(s: SparkSession, d: String): DataFrame = {
    import graft.functions.GraftFunctions.rollingHash64
    docs(s, d)
      .select(col("lang"), rollingHash64(col("text")).as("fp"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_distinct_fp"))
      .orderBy("lang")
  }

  // t10: character-bigram language-model quality score — the
  // LM-perplexity-filter stage of a data pipeline (score each doc by
  // how typical its character transitions are of the corpus), in
  // EXACT fixed-point so the oracle hash-matches: the model is the
  // corpus's own transition table (bigram count / start-char count),
  // each transition's probability is scaled to an integer micro-prob
  // via the Q.rhu identity (exact while 2·count·10⁶ < 2⁵³, i.e.
  // corpora under ~4.5e9 transitions — restate the scale at larger
  // corpora), and every output is an integer sum/count. Docs shorter
  // than 2 chars have no transitions and drop out on both sides.
  //
  // Scale shape: one explode (linear in corpus chars), two tiny
  // grouped counts (≤ |alphabet|² rows, broadcast back), one
  // aggregation — no quadratic anything.
  private def t10(s: SparkSession, d: String): DataFrame = {
    val tr = docs(s, d)
      .select(col("doc_id"), col("lang"), split(col("text"), "").as("cs"))
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(slice(sequence(0, size(cs)), 1, greatest(size(cs) - 1, 0)), " +
          "i -> concat(cs[i], cs[i+1]))")).as("bg"))
      .withColumn("c1", substring(col("bg"), 1, 1))
    val bc = tr.groupBy(col("bg").as("bck")).agg(count(lit(1)).as("bcnt"))
    val uc = tr.groupBy(col("c1").as("uck")).agg(count(lit(1)).as("ucnt"))
    tr.join(broadcast(bc), col("bg") === col("bck"))
      .join(broadcast(uc), col("c1") === col("uck"))
      .withColumn("q", rhu(col("bcnt"), col("ucnt"), 1000000L))
      .groupBy(col("lang"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("total_trans"),
        sum(col("q")).as("total_q"),
        rhu(sum(col("q")), count(lit(1)), 1L).as("avg_prob_e6"))
      .orderBy("lang")
  }

  private val t10Sql =
    s"""WITH cs AS (SELECT doc_id, lang, string_split(text, '') AS c FROM documents),
       |tr AS (SELECT doc_id, lang, c[i] || c[i+1] AS bg, c[i] AS c1
       |       FROM cs, UNNEST(range(1, len(c))) AS t(i)),
       |bc AS (SELECT bg, COUNT(*) AS bcnt FROM tr GROUP BY 1),
       |uc AS (SELECT c1, COUNT(*) AS ucnt FROM tr GROUP BY 1),
       |q AS (SELECT tr.doc_id, tr.lang, ${rhuSql("bcnt", "ucnt", 1000000L)} AS q
       |      FROM tr JOIN bc USING (bg) JOIN uc USING (c1))
       |SELECT lang, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS total_trans,
       |  CAST(SUM(q) AS BIGINT) AS total_q,
       |  ${rhuSql("SUM(q)", "COUNT(*)", 1L)} AS avg_prob_e6
       |FROM q GROUP BY 1 ORDER BY 1""".stripMargin

  override def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t01_token_stats" -> t01,
    "t02_quality_scores" -> t02,
    "t03_lang_id_accuracy" -> t03,
    "t04_word_frequency" -> t04,
    "t05_bigram_profile" -> t05,
    "t06_doc_fingerprints" -> t06,
    "t07_bpe_token_stats" -> t07,
    "t10_char_lm_quality" -> t10)

  override def oracle: Map[String, String] = Map(
    "t01_token_stats" -> t01Sql,
    "t02_quality_scores" -> t02Sql,
    "t03_lang_id_accuracy" -> t03Sql,
    "t04_word_frequency" -> t04Sql,
    "t05_bigram_profile" -> t05Sql,
    "t10_char_lm_quality" -> t10Sql)
}
