package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-corpus hygiene + assembly operators beyond per-doc dedup:
  * benchmark decontamination (train-vs-eval n-gram overlap, the check
  * every LLM data pipeline runs before training — see e.g. the
  * GPT-3/PaLM appendix methodology of 13-gram overlap; 5-grams here
  * because the synthetic docs are 30-90 words), corpus-level
  * duplicated-span profiling (the C4-style "how much of each document
  * is boilerplate that recurs elsewhere" measurement, at 3-gram
  * granularity), Gopher-style repetition quality profiling (t11), and
  * deterministic stratified sampling with exact per-stratum quotas
  * (c01 — the mixture-weights operator of corpus assembly).
  *
  * Both emit per-source integer summaries (counts only — no float
  * sums), so results are exact and order-independent by construction.
  *
  * Scale notes: gram explosion is linear in corpus token count and
  * partitions freely. t08's eval-gram side is a DISTINCT projection of
  * the (small, fixed) benchmark set — left UNHINTED so Spark
  * broadcasts it when it fits and shuffle-joins when it doesn't (here
  * the stand-in eval split is 1/37 of the corpus, which at 100 TB
  * must NOT be force-broadcast). t09's gram document-frequency join is
  * corpus-sized on both sides and shuffles on the gram hash — the
  * standard map-reduce duplicated-span plan.
  */
object CorpusOps extends QueryModule {

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  // Distinct word n-grams from a pre-split word array (same
  // pre-materialization rationale as Dedup.shinglesExpr: referencing
  // split(text) inside the lambda would re-split per element). The
  // index list is built TOTAL — slice(sequence(0, size), 1,
  // greatest(size-n+1, 0)) is empty for short docs — because
  // sequence(0, size-n) DESCENDS when size < n ([0,-1], step
  // inferred -1) and ws[i+n-1] then throws under ANSI; a size(ws)
  // filter upstream does not reliably guard the projection once the
  // optimizer reorders/collapses it.
  private def gramExpr(n: Int): String = {
    val refs = (0 until n).map(i => if (i == 0) "ws[i]" else s"ws[i+$i]").mkString(", ")
    s"array_distinct(transform(slice(sequence(0, size(ws)), 1, greatest(size(ws) - ${n - 1}, 0)), " +
      s"i -> concat_ws(' ', $refs)))"
  }

  private val gram3Expr = gramExpr(3)

  private def grammed(s: SparkSession, d: String, minWords: Int, gramExpr: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= minWords)
      .select(col("doc_id"), col("source"), expr(gramExpr).as("grams"))

  // t08: benchmark decontamination. Eval split = doc_id % 37 == 0 (a
  // deterministic stand-in for a held-out benchmark); a train doc is
  // "contaminated" when ≥10% of its distinct 5-grams appear anywhere
  // in the eval split. Per-source integer summary.

  /** Per-TRAIN-doc contamination profile (doc_id, source, n_grams,
    * n_hits) — the shared core of t08's summary and c05's gate, so
    * the eval-split predicate and hit definition live once. */
  private def contamination(s: SparkSession, d: String): DataFrame = {
    // Two round-11 rewrites of the shared t08/c05 core, both measured
    // at sf10: (1) grams from the codegen'd fivegram_tf_pairs scan
    // kernel (the t15/t16 lesson — the interpreted transform/
    // array_distinct gram build dominated the cold pass); the pair
    // table is cached because eval, hits and profile branches all
    // read it. (2) the hits branch is bloom-prefiltered exactly like
    // t16: the warm cost was the gram semi join exchanging the FULL
    // exploded train stream — the broadcast sketch drops ~96% of it
    // scan-side, and the exact semi join after the probe keeps the
    // result bit-identical (no false negatives), so the oracle is
    // unchanged.
    import graft.functions.GraftFunctions.fivegramTfPairs
    import graft.operators.BloomSketch
    val g = docs(s, d)
      .select(col("doc_id"), col("source"), fivegramTfPairs(col("text")).as("ps"))
      .cache()
    val evalGrams = g.filter(col("doc_id") % 37 === 0)
      .select(explode(col("ps")).as("p")).select(col("p.t").as("gram"))
      .distinct().cache()
    val sketch = BloomSketch.build(evalGrams, "gram")
    val train = g.filter(col("doc_id") % 37 =!= 0)
    val hits = train
      .select(col("doc_id"), explode(col("ps")).as("p"))
      .select(col("doc_id"), col("p.t").as("gram"))
      .filter(BloomSketch.probe(sketch, col("gram")))
      .join(evalGrams, Seq("gram"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    train
      .select(col("doc_id"), col("source"), size(col("ps")).cast(LongType).as("n_grams"))
      .filter(col("n_grams") > 0) // ≡ the oracle's len(ws) >= 5 gate
      .join(hits, Seq("doc_id"), "left_outer")
      .na.fill(0L, Seq("n_hits"))
  }

  private def t08(s: SparkSession, d: String): DataFrame =
    contamination(s, d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_grams")).as("total_grams"),
        sum(col("n_hits")).as("total_hits"),
        sum(when(col("n_hits") * 10 >= col("n_grams"), 1L).otherwise(0L)).as("n_contaminated"))
      .orderBy("source")

  /** Oracle twin of `contamination`: CTE chain ending in `pd`
    * (doc_id, source, n_grams, n_hits) — interpolated into t08Sql and
    * c05Sql so the eval-split predicate and hit rule live once. */
  private val contaminationCtesSql =
    """w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
      |           FROM documents WHERE len(string_split(text, ' ')) >= 5),
      |g AS (SELECT doc_id, source,
      |        list_distinct(list_transform(range(1, len(ws) - 3),
      |          i -> array_to_string(ws[i:i+4], ' '))) AS grams
      |      FROM w),
      |ev AS (SELECT DISTINCT UNNEST(grams) AS gram FROM g WHERE doc_id % 37 = 0),
      |tr AS (SELECT doc_id, source, grams FROM g WHERE doc_id % 37 <> 0),
      |hit AS (SELECT doc_id, COUNT(*) AS n_hits
      |        FROM (SELECT doc_id, UNNEST(grams) AS gram FROM tr) x
      |        WHERE gram IN (SELECT gram FROM ev) GROUP BY 1),
      |pd AS (SELECT tr.doc_id, tr.source, len(grams) AS n_grams,
      |         COALESCE(n_hits, 0) AS n_hits
      |       FROM tr LEFT JOIN hit ON tr.doc_id = hit.doc_id)""".stripMargin

  private val t08Sql =
    s"""WITH $contaminationCtesSql
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_grams) AS BIGINT) AS total_grams,
      |  CAST(SUM(n_hits) AS BIGINT) AS total_hits,
      |  CAST(SUM(CASE WHEN n_hits * 10 >= n_grams THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
      |FROM pd GROUP BY 1 ORDER BY 1""".stripMargin

  // t16: bloom-prefiltered decontamination overlap report. t08's
  // contamination contract (eval split doc_id % 37 == 0, distinct-
  // gram hits) at 3-gram granularity — the per-doc AUDIT artifact
  // (doc_id, n_grams, n_hits) for every train doc that shares any
  // 3-gram with the eval split; thresholding into a kill list is the
  // downstream consumer's policy choice. The plan is the 100 TB
  // decontamination shape: the train-gram stream is pruned SCAN-SIDE
  // by a broadcast Bloom sketch of the eval grams before anything
  // shuffles — the exact gram semi join alone would exchange the full
  // corpus gram stream, while the bloom form ships only (true hits +
  // fpp·misses) ≈ 3.5% of it on this corpus. Build and probe are
  // Spark's own runtime-filter expressions (BloomFilterAggregate /
  // might_contain, both codegen'd); the exact semi join AFTER the
  // probe removes bloom false positives, so the result is
  // bit-identical to the exact plan — which is why a plain CTE oracle
  // checks it. The driver holds one numBits/8-byte sketch (never the
  // grams); real benchmark sets are ~fixed-size, so the sketch stays
  // bounded as the corpus grows (the synthetic 1/37 eval split scales
  // with the corpus, so the build sizes numBits from a count of the
  // SMALL side and caps at Spark's runtime-filter ceiling of 8 MB).
  // grams come from the codegen'd trigram_tf_pairs scan kernel (the
  // t15 lesson: split/transform/array_distinct higher-order lambdas
  // are interpreted and dominate the gram build — one byte pass per
  // doc replaces them; pairs are distinct per doc by construction,
  // so pair.t is exactly the distinct-3-gram stream and size(pairs)
  // the distinct count). Kernel output is projected ONCE per branch:
  // n_grams is computed in the Generate's CHILD projection — a size()
  // referenced above the explode would pin the whole pair array into
  // every exploded row. Shared by t16's inline build and the
  // persisted-index twin (operators.DecontamIndex).
  private[graft] def trigrams3(in: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions.trigramTfPairs
    in.select(col("doc_id"), col("source"), trigramTfPairs(col("text")).as("ps"))
      .select(col("doc_id"), col("source"),
        size(col("ps")).cast(LongType).as("n_grams"), explode(col("ps")).as("p"))
      .select(col("doc_id"), col("source"), col("n_grams"),
        col("p.t").as("gram"))
  }

  /** t16's train-side report given the eval side (grams + sketch) from
    * ANY provenance — built inline (t16) or read from the persisted
    * index (t19): one bloom-pruned corpus pass, exact semi-join
    * verify, per-doc aggregate. The groupBy keys are doc-determined,
    * so cardinality = reported docs. */
  private[graft] def overlapReportFrom(train: DataFrame, evalGrams: DataFrame,
      sketch: Array[Byte]): DataFrame = {
    import graft.operators.BloomSketch
    trigrams3(train)
      .filter(BloomSketch.probe(sketch, col("gram")))
      .join(evalGrams, Seq("gram"), "left_semi")
      .groupBy(col("doc_id"), col("source"), col("n_grams"))
      .agg(count(lit(1)).as("n_hits"))
      .select("doc_id", "source", "n_grams", "n_hits")
      .orderBy("doc_id")
  }

  private def t16(s: SparkSession, d: String): DataFrame = {
    import graft.operators.BloomSketch
    // cache ONLY the small side: the distinct eval grams (bounded by
    // the benchmark, not the corpus) serve the bloom build and the
    // exact verify join from memory; the corpus-sized train gram
    // stream is never cached — one scan-side pass inside
    // overlapReportFrom.
    val evalGrams = trigrams3(docs(s, d).filter(col("doc_id") % 37 === 0))
      .select(col("gram")).distinct().cache()
    val sketch = BloomSketch.build(evalGrams, "gram")
    overlapReportFrom(docs(s, d).filter(col("doc_id") % 37 =!= 0), evalGrams, sketch)
  }

  // t17: contamination PROVENANCE — for every train doc sharing a
  // DISCRIMINATIVE 3-gram with the eval split, WHICH eval doc it
  // overlaps most (shared discriminative-gram count; ties to the
  // smaller eval doc_id). t16 answers "how contaminated"; t17 answers
  // "which benchmark leaked" — the audit artifact that decides whether
  // to drop the doc or the benchmark.
  //
  // DISCRIMINATIVE = the d08 document-frequency cap applied on the
  // EVAL side: a gram present in more than K eval docs (K =
  // max(8, ⌈n_eval/2⌉)) carries no provenance signal — a stopword run
  // shared with half the benchmark suite doesn't tell you WHICH
  // benchmark leaked — so it is dropped from the candidate stream
  // before the join. This is also the operator's scale bound: the
  // gram join's fan-out per train gram instance is the gram's
  // eval-doc df, which the cap holds ≤ K, so worst-case join size is
  // (train gram instances) × K instead of × n_eval — on a real
  // 100 TB corpus a ubiquitous trigram appears in essentially every
  // eval doc and the uncapped fan-out is the product of two corpus-
  // scale factors. Invariance contract (ProvenanceSpec fixtures):
  // when a capped gram is NON-DECISIVE — present in every eval doc —
  // dropping it subtracts the same count from every candidate, so the
  // per-train argmax (and the tie rule) is unchanged; a train doc
  // whose overlap is ONLY capped grams is absent from the report (no
  // provenance signal is the finding). When a capped gram is decisive
  // (in >K but not all eval docs), the capped count IS the defined
  // semantics — the oracle applies the identical rule.
  //
  // Plan: the eval (gram, eval_doc) pair table is benchmark-bounded;
  // its df cap is one benchmark-side aggregate + semi join, cached —
  // the corpus-sized train side still makes ONE bloom-pruned pass
  // (the sketch is built from the CAPPED gram set, so capped grams
  // die scan-side with the rest), then the pair aggregate and one
  // struct-max argmax aggregate — no rank window.
  private[graft] val t17CapFloor = 8L
  private def t17(s: SparkSession, d: String): DataFrame = {
    import graft.functions.GraftFunctions.trigramTfPairs
    import graft.operators.BloomSketch
    def g3(in: DataFrame): DataFrame = in
      .select(col("doc_id"), trigramTfPairs(col("text")).as("ps"))
      .select(col("doc_id"), explode(col("ps")).as("p"))
      .select(col("doc_id"), col("p.t").as("gram"))
    val evalAll = g3(docs(s, d).filter(col("doc_id") % 37 === 0))
      .withColumnRenamed("doc_id", "eval_doc").cache()
    // K from the benchmark side only (bounded): one countDistinct on
    // the cached pairs — the KCore/a07 bounded-action class
    val nEval = evalAll.agg(countDistinct(col("eval_doc"))).head().getLong(0)
    val k = math.max(t17CapFloor, (nEval + 1) / 2)
    // g3 emits DISTINCT grams per doc (tf pairs), so count(*) per
    // gram = its eval-doc df
    val keep = evalAll.groupBy(col("gram"))
      .agg(count(lit(1)).as("edf")).filter(col("edf") <= k).select("gram")
    val evalPairs = evalAll.join(keep, Seq("gram"), "left_semi").cache()
    // sketch sized by PAIR count — an overcount of distinct grams,
    // which only lowers the fpp (avoids a separate distinct pass);
    // building it materializes the capped cache, after which the
    // uncapped parent can go
    val sketch = BloomSketch.build(evalPairs, "gram")
    evalAll.unpersist()
    // The (doc_id, eval_doc) pairs out of the join are NEAR-UNIQUE
    // (sf10: 734 M joined rows, ~0.5 B distinct pairs), so the
    // declarative pair count + struct-max argmax double-builds
    // reduce-nothing aggregate maps — 71 s of the query's 126 s at
    // sf10. operators.PackedPairArgmax replaces both aggregates with
    // one exchange of packed 8-byte keys, Spark's spillable external
    // sort, and a constant-memory streaming fold: 126 s → 56 s, then
    // 44 s with the kernel exchange sized at 4× session parallelism —
    // ahead of the single-node baseline's 64.8 s (stage ladder + A/B:
    // tools.T17Lab, BENCH_NOTES round 12). Pack contract holds by
    // data shape (doc ids < 2³¹) and is guard-checked in the kernel.
    graft.operators.PackedPairArgmax(
      g3(docs(s, d).filter(col("doc_id") % 37 =!= 0))
        .filter(BloomSketch.probe(sketch, col("gram")))
        .join(evalPairs, Seq("gram")), // exact inner equi — bloom fps die here
      "doc_id", "eval_doc", "doc_id", "eval_doc", "shared")
      .orderBy("doc_id")
  }

  private val t17Sql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
      |           FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |g AS (SELECT doc_id,
      |        list_distinct(list_transform(range(1, len(ws) - 1),
      |          i -> array_to_string(ws[i:i+2], ' '))) AS grams
      |      FROM w),
      |evp AS (SELECT doc_id AS eval_doc, UNNEST(grams) AS gram
      |        FROM g WHERE doc_id % 37 = 0),
      |keep AS (SELECT gram FROM evp GROUP BY gram
      |         HAVING COUNT(*) <= GREATEST(8,
      |           ((SELECT COUNT(DISTINCT eval_doc) FROM evp) + 1) // 2)),
      |evpk AS (SELECT eval_doc, gram FROM evp
      |         WHERE gram IN (SELECT gram FROM keep)),
      |tr AS (SELECT doc_id, UNNEST(grams) AS gram
      |       FROM g WHERE doc_id % 37 <> 0),
      |sh AS (SELECT tr.doc_id, evpk.eval_doc, COUNT(*) AS shared
      |       FROM tr JOIN evpk USING (gram) GROUP BY 1, 2),
      |r AS (SELECT doc_id, eval_doc, shared,
      |        ROW_NUMBER() OVER (PARTITION BY doc_id
      |          ORDER BY shared DESC, eval_doc) AS rn
      |      FROM sh)
      |SELECT doc_id, eval_doc, shared FROM r WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  /** 3-gram twin of `contaminationCtesSql` (t16's granularity). */
  private val contamination3CtesSql =
    """w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
      |           FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |g AS (SELECT doc_id, source,
      |        list_distinct(list_transform(range(1, len(ws) - 1),
      |          i -> array_to_string(ws[i:i+2], ' '))) AS grams
      |      FROM w),
      |ev AS (SELECT DISTINCT UNNEST(grams) AS gram FROM g WHERE doc_id % 37 = 0),
      |tr AS (SELECT doc_id, source, grams FROM g WHERE doc_id % 37 <> 0),
      |hit AS (SELECT doc_id, COUNT(*) AS n_hits
      |        FROM (SELECT doc_id, UNNEST(grams) AS gram FROM tr) x
      |        WHERE gram IN (SELECT gram FROM ev) GROUP BY 1)""".stripMargin

  private val t16Sql =
    s"""WITH $contamination3CtesSql
      |SELECT tr.doc_id, tr.source, len(grams) AS n_grams, n_hits
      |FROM tr JOIN hit ON tr.doc_id = hit.doc_id
      |ORDER BY 1""".stripMargin

  // t09: duplicated-span profile. A doc's 3-gram is a "duplicated
  // span" when it occurs in ≥2 distinct documents corpus-wide; per
  // source: how many docs, how much of their span inventory is
  // corpus-duplicated, and how many docs carry any duplicated span.
  private def t09(s: SparkSession, d: String): DataFrame = {
    // consumed three times (df counting, dup-per-doc, per-doc sizes)
    val g = grammed(s, d, 3, gram3Expr).cache()
    val exploded = g.select(col("doc_id"), explode(col("grams")).as("gram"))
    // grams are distinct per doc, so count(*) per gram = document freq
    val dupGrams = exploded.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select("gram")
    val dupPerDoc = exploded.join(dupGrams, Seq("gram"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    g.select(col("doc_id"), col("source"), size(col("grams")).cast(LongType).as("n_grams"))
      .join(dupPerDoc, Seq("doc_id"), "left_outer")
      .na.fill(0L, Seq("n_dup"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_grams")).as("total_grams"),
        sum(col("n_dup")).as("dup_grams"),
        sum(when(col("n_dup") > 0, 1L).otherwise(0L)).as("docs_with_dup"))
      .orderBy("source")
  }

  private val t09Sql =
    """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
      |           FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |g AS (SELECT doc_id, source,
      |        list_distinct(list_transform(range(1, len(ws) - 1),
      |          i -> array_to_string(ws[i:i+2], ' '))) AS grams
      |      FROM w),
      |ex AS (SELECT doc_id, UNNEST(grams) AS gram FROM g),
      |dup AS (SELECT gram FROM ex GROUP BY 1 HAVING COUNT(*) >= 2),
      |dpd AS (SELECT doc_id, COUNT(*) AS n_dup FROM ex
      |        WHERE gram IN (SELECT gram FROM dup) GROUP BY 1)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(len(grams)) AS BIGINT) AS total_grams,
      |  CAST(SUM(COALESCE(n_dup, 0)) AS BIGINT) AS dup_grams,
      |  CAST(SUM(CASE WHEN COALESCE(n_dup, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_dup
      |FROM g LEFT JOIN dpd ON g.doc_id = dpd.doc_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // t11: repetition quality profile — the "repetitive document"
  // filters every LLM pipeline applies before training (the Gopher
  // appendix's duplicate-fraction heuristics): per doc the duplicate
  // word fraction (1 − distinct/total), the top-word fraction, and
  // their bigram analogues; per-source integer summary with flag
  // counts at stated thresholds (top word > 10% of words, duplicate
  // words > 50%, duplicate bigrams > 20%). All counts, no floats —
  // exact and order-independent. Scale (round-9 rewrite): the five
  // per-doc counters are computed by the scan-side
  // functions.RepetitionStats kernel — ZERO shuffle before the
  // per-source aggregate, vs the original two explode→hash-agg
  // passes over every word/bigram occurrence (~85 M exploded rows,
  // 12.2 s of the 12.2 s sf10 runtime; RepetitionStatsSpec holds the
  // kernel value-identical to the exploded form, and the oracle SQL
  // still states that exploded form).
  /** Per-doc counters [w, dw, topw, b, db] from the kernel; docs with
    * no non-empty word are dropped (the exploded form's inner base). */
  private def repStats(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), col("source"),
        graft.functions.GraftFunctions.repetitionStats(col("text")).as("r"))
      .select(col("doc_id"), col("source"),
        col("r").getItem(0).as("w"), col("r").getItem(1).as("dw"),
        col("r").getItem(2).as("topw"), col("r").getItem(3).as("b"),
        col("r").getItem(4).as("db"))
      .where(col("w") > 0)

  /** Per-doc word stats (total, distinct, top count) — shared by the
    * t11 profile and the c02 assembly filter. */
  private def wordStats(s: SparkSession, d: String): DataFrame =
    repStats(s, d).select(col("doc_id"), col("source"),
      col("w"), col("dw"), col("topw"))

  private def t11(s: SparkSession, d: String): DataFrame = {
    repStats(s, d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("w")).as("total_words"),
        sum(col("w") - col("dw")).as("dup_words"),
        sum(col("topw")).as("top_word_hits"),
        sum(when(col("topw") * 10 > col("w"), 1L).otherwise(0L)).as("n_top_flagged"),
        sum(when((col("w") - col("dw")) * 2 > col("w"), 1L).otherwise(0L)).as("n_dup_flagged"),
        sum(col("b")).as("total_bigrams"),
        sum(col("b") - col("db")).as("dup_bigrams"),
        sum(when(col("b") > 0 && (col("b") - col("db")) * 5 > col("b"), 1L)
          .otherwise(0L)).as("n_bg_flagged"))
      .orderBy("source")
  }

  private val t11Sql =
    """WITH wc AS (SELECT doc_id, source, word, COUNT(*) AS c
      |            FROM (SELECT doc_id, source, UNNEST(string_split(text, ' ')) AS word
      |                  FROM documents) x
      |            WHERE word <> '' GROUP BY 1, 2, 3),
      |pw AS (SELECT doc_id, source, SUM(c) AS w, COUNT(*) AS dw, MAX(c) AS topw
      |       FROM wc GROUP BY 1, 2),
      |bc AS (SELECT doc_id, bg, COUNT(*) AS c
      |       FROM (SELECT doc_id, UNNEST(list_transform(range(1, len(string_split(text, ' '))),
      |               i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bg
      |             FROM documents) y
      |       GROUP BY 1, 2),
      |pb AS (SELECT doc_id, SUM(c) AS b, COUNT(*) AS db FROM bc GROUP BY 1)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(w) AS BIGINT) AS total_words,
      |  CAST(SUM(w - dw) AS BIGINT) AS dup_words,
      |  CAST(SUM(topw) AS BIGINT) AS top_word_hits,
      |  CAST(SUM(CASE WHEN topw * 10 > w THEN 1 ELSE 0 END) AS BIGINT) AS n_top_flagged,
      |  CAST(SUM(CASE WHEN (w - dw) * 2 > w THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_flagged,
      |  CAST(SUM(COALESCE(b, 0)) AS BIGINT) AS total_bigrams,
      |  CAST(SUM(COALESCE(b - db, 0)) AS BIGINT) AS dup_bigrams,
      |  CAST(SUM(CASE WHEN COALESCE(b, 0) > 0 AND (b - db) * 5 > b THEN 1 ELSE 0 END) AS BIGINT) AS n_bg_flagged
      |FROM pw LEFT JOIN pb ON pw.doc_id = pb.doc_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // c01: deterministic stratified sampling — corpus assembly's
  // mixture-weights operator: an exact ceil(10%) quota per source
  // stratum, members selected by rank of a Knuth multiplicative hash
  // of doc_id — pseudorandom, reproducible, engine-independent (pure
  // integer arithmetic, no RNG). Scale: the rank is a per-stratum
  // window (strata are few by construction); the O(1)-state form at
  // extreme stratum sizes is hash-thresholding against the quota
  // quantile of skey — same sample, no rank — at the cost of an extra
  // quantile pass; the window form keeps exact rank ties stable here.
  private def c01(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val skey = Q.knuth32(col("doc_id"))
    val quota = docs(s, d).groupBy(col("source"))
      .agg(ceil(count(lit(1)) / 10.0).cast(LongType).as("quota"))
    val w = Window.partitionBy(col("source")).orderBy(col("skey"), col("doc_id"))
    docs(s, d).select(col("source"), col("doc_id"), skey.as("skey"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .join(broadcast(quota), Seq("source"))
      .filter(col("rn") <= col("quota"))
      .select(col("source"), col("rn"), col("doc_id"), col("skey"))
      .orderBy("source", "rn")
  }

  private val c01Sql =
    """WITH q AS (SELECT source, CAST(CEIL(COUNT(*) / 10.0) AS BIGINT) AS quota
      |           FROM documents GROUP BY 1),
      |r AS (SELECT source, doc_id,
      |        CAST((doc_id * 2654435761) % 4294967296 AS BIGINT) AS skey,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY source
      |          ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS BIGINT) AS rn
      |      FROM documents)
      |SELECT r.source, rn, doc_id, skey
      |FROM r JOIN q ON r.source = q.source
      |WHERE rn <= quota ORDER BY 1, 2""".stripMargin

  // c07: temperature-balanced mixture sampling — the mixing rule of
  // multilingual/multi-corpus pretraining (the XLM-R / mBERT
  // convention, same rule WebText/Pile apply to sources): stratum s
  // gets a share ∝ n_s^τ with τ = 1/2, UP-weighting low-resource
  // strata relative to proportional sampling so the dominant one
  // (here lang='en', ~44% of the corpus) doesn't drown the tails —
  // the lang strata are the genuinely skewed ones in this corpus
  // (sources are uniform by construction, which would make τ a
  // no-op). τ = 1/2 because sqrt is the one fractional power that is
  // EXACT cross-engine (IEEE correctly-rounded, no libm pow/exp):
  // weight = round(sqrt(n_s)·1e9) as a scaled long (order-free
  // integer sum for the normalizer), quota = (B·w) div S in pure
  // int64 arithmetic (floor allocation, Σ ≤ B by construction — the
  // stated contract; B·w ≤ 1e3·1e15 < 2⁶³ up to 10¹² docs/stratum).
  // B = 200 keeps every quota strictly below its stratum size at all
  // SFs (√ scaling: quotas grow like √SF while strata grow like SF),
  // so the rank filter always SELECTS rather than passing a stratum
  // through whole. Members are the c01 Knuth-hash rank selection
  // under the temperature quota, but served by the bounded TopKByScore
  // aggregate instead of a rank window: quota ≤ B by construction, so
  // the per-stratum rank never needs more than the B smallest skeys —
  // map-side k-row buffers, shuffle ≤ partitions × |langs| × B rows,
  // where the window form would shuffle the ENTIRE corpus into |langs|
  // partitions (maximally skewed at 100 TB; measured 1.57 s → the
  // aggregate form at sf10). score = −skey is exact in double (skey <
  // 2³² < 2⁵³) and (−skey DESC, doc_id ASC) ≡ the c01 (skey ASC,
  // doc_id ASC) order, so the rank is row_number-identical.
  private def c07(s: SparkSession, d: String): DataFrame = {
    val budget = 200L
    val per = docs(s, d).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w",
        round(sqrt(col("n_docs").cast(DoubleType)) * lit(1e9)).cast(LongType))
    val tot = per.agg(sum(col("w")).as("stot"))
    val quota = per.crossJoin(broadcast(tot))
      .withColumn("quota", expr(s"($budget * w) div stot").cast(LongType))
      .select(col("lang"), col("n_docs"), col("quota"))
    val skey = Q.knuth32(col("doc_id"))
    val topk = graft.functions.GraftFunctions.topKByScore(
      (skey * lit(-1L)).cast(DoubleType), col("doc_id"),
      struct(col("doc_id")), budget.toInt)
    docs(s, d).select(col("lang"), col("doc_id"))
      .groupBy(col("lang"))
      .agg(topk.as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("lang"), (col("i") + 1).cast(LongType).as("rn"),
        col("e.payload.doc_id").as("doc_id"))
      .join(broadcast(quota), Seq("lang"))
      .filter(col("rn") <= col("quota"))
      .select(col("lang"), col("n_docs"), col("quota"), col("rn"), col("doc_id"))
      .orderBy("lang", "rn")
  }

  private val c07Sql =
    """WITH per AS (SELECT lang, COUNT(*) AS n_docs,
      |        CAST(ROUND(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1e9, 0) AS BIGINT) AS w
      |      FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS stot FROM per),
      |q AS (SELECT lang, n_docs,
      |        CAST((200 * w) // stot AS BIGINT) AS quota FROM per, tot),
      |r AS (SELECT lang, doc_id,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |          ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS BIGINT) AS rn
      |      FROM documents)
      |SELECT r.lang, n_docs, quota, rn, doc_id
      |FROM r JOIN q ON r.lang = q.lang
      |WHERE rn <= quota ORDER BY 1, 4""".stripMargin

  // c08: epoch-capped upsampled mixture — the Pile's replication rule
  // (Gao et al. 2020 §2.2: each source is assigned an EPOCH count, up-
  // sampled by copying, capped so no source repeats more than a few
  // times). Takes c07's τ=1/2 temperature quota q_s, caps the
  // effective allocation at cap·n_s (cap = 4 epochs), then realizes
  // it as exact replication: every doc gets base = eff div n copies
  // and the rem = eff mod n lowest-Knuth-hash-rank docs get one more —
  // Σ epochs = eff exactly, reproducibly, no RNG. This is the one
  // corpus operator whose OUTPUT is deliberately a multiset (epoch
  // column disambiguates), the shape a packed pretraining shard list
  // actually has.
  //
  // Scale: rem ≤ q_s ≤ B (= 1000, a literal), so the extras selection
  // is the c07 bounded TopKByScore aggregate — never a corpus-wide
  // rank window; the base replication is a broadcast join + explode
  // of a ≤cap-long sequence, map-side, linear. Output ≤ Σ eff ≤ B +
  // cap·Σn bounded by construction (B rows in the subsample regime,
  // cap·n in the upsample regime — at sf0.01 the low-resource langs
  // really do land at base 2 / 2.5 effective epochs while en stays
  // at 1.4, the Pile behavior).
  private def c08(s: SparkSession, d: String): DataFrame = {
    val budget = 1000L
    val cap = 4L
    val per = docs(s, d).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w",
        round(sqrt(col("n_docs").cast(DoubleType)) * lit(1e9)).cast(LongType))
    val tot = per.agg(sum(col("w")).as("stot"))
    val qq = per.crossJoin(broadcast(tot))
      .withColumn("quota", expr(s"($budget * w) div stot").cast(LongType))
      .withColumn("eff", least(col("quota"), lit(cap) * col("n_docs")))
      .withColumn("base", expr("eff div n_docs").cast(LongType))
      .withColumn("rem", expr("eff % n_docs").cast(LongType))
      .select(col("lang"), col("n_docs"), col("quota"), col("base"), col("rem"))
    val skey = Q.knuth32(col("doc_id"))
    val topk = graft.functions.GraftFunctions.topKByScore(
      (skey * lit(-1L)).cast(DoubleType), col("doc_id"),
      struct(col("doc_id")), budget.toInt)
    val ranked = docs(s, d).select(col("lang"), col("doc_id"))
      .groupBy(col("lang")).agg(topk.as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("lang"), (col("i") + 1).cast(LongType).as("rn"),
        col("e.payload.doc_id").as("doc_id"))
    val basePart = docs(s, d).select(col("lang"), col("doc_id"))
      .join(broadcast(qq.select(col("lang"), col("base"))), Seq("lang"))
      .filter(col("base") >= 1)
      .withColumn("epoch", explode(sequence(lit(1L), col("base"))))
      .select(col("lang"), col("doc_id"), col("epoch"))
    val extras = ranked
      .join(broadcast(qq.select(col("lang"), col("base"), col("rem"))), Seq("lang"))
      .filter(col("rn") <= col("rem"))
      .select(col("lang"), col("doc_id"), (col("base") + 1L).as("epoch"))
    basePart.unionByName(extras)
      .join(broadcast(qq), Seq("lang"))
      .select(col("lang"), col("n_docs"), col("quota"), col("base"),
        col("rem"), col("doc_id"), col("epoch"))
      .orderBy("lang", "doc_id", "epoch")
  }

  private val c08Sql =
    """WITH per AS (SELECT lang, COUNT(*) AS n_docs,
      |        CAST(ROUND(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1e9, 0) AS BIGINT) AS w
      |      FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS stot FROM per),
      |q AS (SELECT lang, n_docs,
      |        CAST((1000 * w) // stot AS BIGINT) AS quota FROM per, tot),
      |qq AS (SELECT lang, n_docs, quota,
      |         CAST(LEAST(quota, 4*n_docs) // n_docs AS BIGINT) AS base,
      |         CAST(LEAST(quota, 4*n_docs) % n_docs AS BIGINT) AS rem
      |       FROM q),
      |r AS (SELECT lang, doc_id,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |          ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS BIGINT) AS rn
      |      FROM documents),
      |b AS (SELECT d.lang, d.doc_id, UNNEST(generate_series(1, base)) AS epoch
      |      FROM documents d JOIN qq USING (lang) WHERE base >= 1),
      |e AS (SELECT r.lang, r.doc_id, base + 1 AS epoch
      |      FROM r JOIN qq USING (lang) WHERE rn <= rem)
      |SELECT u.lang, n_docs, quota, base, rem, doc_id, CAST(epoch AS BIGINT) AS epoch
      |FROM (SELECT * FROM b UNION ALL SELECT * FROM e) u JOIN qq USING (lang)
      |ORDER BY 1, 6, 7""".stripMargin

  // c09: corpus SHUFFLE + SHARD manifest — the pipeline's terminal
  // stage (operators.CorpusSharder): deterministic pseudorandom total
  // order (the c01 Knuth-hash key), fixed-size shards of 100 docs,
  // manifest = per-shard doc/token counts + rank range. The engine
  // computes the global rank WITHOUT a global sort: skey is hash-
  // uniform by construction, so pid = skey >> 27 range-partitions
  // statically (no sampling job), a 32-row count collect gives exact
  // prefix offsets (bounded driver state), and rank = pid-local
  // row_number + offset. The oracle states the same rule as one
  // ROW_NUMBER over the full order — DuckDB's single-node sort is
  // exactly what the distributed form avoids. ShardWriterSpec covers
  // the file-emission half (one sorted file per shard ≡ manifest).
  private def c09(s: SparkSession, d: String): DataFrame =
    graft.operators.CorpusSharder.manifest(
      graft.operators.CorpusSharder.assignments(docs(s, d), 100L))

  private val c09Sql =
    """WITH k AS (SELECT doc_id,
      |    CAST((doc_id * 2654435761) % 4294967296 AS BIGINT) AS skey,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok
      |  FROM documents),
      |r AS (SELECT doc_id, n_tok,
      |    CAST(ROW_NUMBER() OVER (ORDER BY skey, doc_id) AS BIGINT) AS rnk
      |  FROM k)
      |SELECT CAST((rnk - 1) // 100 AS BIGINT) AS shard_id,
      |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |  MIN(rnk) AS first_rank, MAX(rnk) AS last_rank
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  // c02: corpus ASSEMBLY — the composition every pipeline actually
  // runs: drop documents failing the t11 repetition gates (top word
  // > 10% of words, duplicate words > 50%), then take c01's exact
  // ceil(10%) stratified sample OF THE SURVIVORS per source. Same
  // building blocks, one declarative plan: Catalyst fuses the filter
  // into the sampling scan's upstream; quotas adapt to post-filter
  // stratum sizes by construction.
  private def c02(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clean = wordStats(s, d)
      .filter(col("topw") * 10 <= col("w") &&
        (col("w") - col("dw")) * 2 <= col("w"))
      .select(col("doc_id"), col("source"))
    val skey = Q.knuth32(col("doc_id"))
    val quota = clean.groupBy(col("source"))
      .agg(ceil(count(lit(1)) / 10.0).cast(LongType).as("quota"))
    val w = Window.partitionBy(col("source")).orderBy(col("skey"), col("doc_id"))
    clean.withColumn("skey", skey)
      .withColumn("rn", row_number().over(w).cast(LongType))
      .join(broadcast(quota), Seq("source"))
      .filter(col("rn") <= col("quota"))
      .select(col("source"), col("rn"), col("doc_id"), col("skey"))
      .orderBy("source", "rn")
  }

  private val c02Sql =
    """WITH wc AS (SELECT doc_id, source, word, COUNT(*) AS c
      |            FROM (SELECT doc_id, source, UNNEST(string_split(text, ' ')) AS word
      |                  FROM documents) x
      |            WHERE word <> '' GROUP BY 1, 2, 3),
      |pw AS (SELECT doc_id, source, SUM(c) AS w, COUNT(*) AS dw, MAX(c) AS topw
      |       FROM wc GROUP BY 1, 2),
      |clean AS (SELECT doc_id, source FROM pw
      |          WHERE topw * 10 <= w AND (w - dw) * 2 <= w),
      |q AS (SELECT source, CAST(CEIL(COUNT(*) / 10.0) AS BIGINT) AS quota
      |      FROM clean GROUP BY 1),
      |r AS (SELECT source, doc_id,
      |        CAST((doc_id * 2654435761) % 4294967296 AS BIGINT) AS skey,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY source
      |          ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS BIGINT) AS rn
      |      FROM clean)
      |SELECT r.source, rn, doc_id, skey
      |FROM r JOIN q ON r.source = q.source
      |WHERE rn <= quota ORDER BY 1, 2""".stripMargin

  // c03: token-budget sequence packing — the batch-assembly operator
  // of LLM training (docs concatenated into fixed token-budget
  // sequences; a doc belongs to the sequence its first token falls
  // in, so a straddling doc overflows its bin — the "concat then
  // split at budget boundaries" contract). Packing is inherently a
  // prefix scan, so the contract keys it by (source, shard =
  // doc_id % 8): each (source, shard) stream packs independently and
  // the scan distributes across 40 independent window partitions —
  // at 100 TB the shard count is raised so no partition's stream
  // exceeds a task (packing quality is unaffected: bins are ~budget
  // sized regardless of which shard a doc lands in). No
  // single-partition window anywhere (PlanAudit-style keyed window).
  // Output: per-source integer bin statistics — exact and
  // order-independent.
  private val PackBudget = 512L

  private def c03(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs(s, d).select(
      col("doc_id"), col("source"), pmod(col("doc_id"), lit(8L)).as("shard"),
      size(filter(split(col("text"), " "),
        (w: Column) => w =!= "")).cast(LongType).as("tok"))
    val w = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    val binned = toks
      .withColumn("cum_before", coalesce(sum(col("tok")).over(w), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / PackBudget).cast(LongType))
    binned
      .groupBy(col("source"), col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("bin_tokens"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_bins"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("bin_tokens")).as("total_tokens"),
        max(col("bin_tokens")).as("max_bin_tokens"),
        min(col("bin_tokens")).as("min_bin_tokens"),
        sum(when(col("bin_tokens") >= PackBudget, 1L).otherwise(0L)).as("n_full_bins"))
      .orderBy("source")
  }

  private val c03Sql =
    s"""WITH t AS (SELECT doc_id, source, doc_id % 8 AS shard,
       |        CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS tok
       |      FROM documents),
       |cb AS (SELECT source, shard, tok,
       |         COALESCE(SUM(tok) OVER (PARTITION BY source, shard ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |       FROM t),
       |b AS (SELECT source, shard, CAST(FLOOR(cum_before / $PackBudget) AS BIGINT) AS bin,
       |        COUNT(*) AS n_docs, SUM(tok) AS bin_tokens
       |      FROM cb GROUP BY 1, 2, 3)
       |SELECT source, COUNT(*) AS n_bins,
       |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       |  CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
       |  CAST(MAX(bin_tokens) AS BIGINT) AS max_bin_tokens,
       |  CAST(MIN(bin_tokens) AS BIGINT) AS min_bin_tokens,
       |  CAST(SUM(CASE WHEN bin_tokens >= $PackBudget THEN 1 ELSE 0 END) AS BIGINT) AS n_full_bins
       |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  // c04: mixture assembly under per-source token budgets — the "data
  // mixture" operator of LLM training (each source gets a token
  // budget proportional to its mixture weight; docs stream in
  // deterministic hash order and a doc is taken iff the tokens
  // accumulated BEFORE it are still under budget — greedy fill with
  // boundary overshoot, the standard contract). Weights derive from
  // the source name (index % 4 + 1), budgets from ONE corpus-total
  // aggregate (broadcast 1-row); selection is a per-source keyed
  // window prefix scan (same scale shape as c03 — at 100 TB a source
  // whose stream exceeds a task gets the shard-key treatment; here
  // sources are the natural partitions). Output: per-source budget /
  // taken-doc / taken-token accounting — exact integers.
  /** (source, doc_id, skey, tok, wgt) mixture stream for a document
    * set — the skey constant, token definition and weight rule live
    * once for c04 and c05. */
  private def mixTokens(docSet: DataFrame): DataFrame = {
    val skey = Q.knuth32(col("doc_id"))
    docSet.select(
      col("source"), col("doc_id"), skey.as("skey"),
      size(filter(split(col("text"), " "),
        (w: Column) => w =!= "")).cast(LongType).as("tok"),
      (pmod(expr("CAST(substring(source, 4) AS BIGINT)"), lit(4L)) + 1L).as("wgt"))
  }

  /** The greedy per-source token-budget fill over a mixTokens stream
    * — shared by c04 (whole corpus) and c05 (decontaminated
    * survivors). */
  private def budgetFill(toks: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val total = toks.agg(sum(col("tok")).as("t_total"))
    val w = Window.partitionBy(col("source")).orderBy(col("skey"), col("doc_id"))
    toks.crossJoin(broadcast(total))
      .withColumn("budget", col("wgt") * expr("t_total div 100"))
      .withColumn("cum_before",
        coalesce(sum(col("tok")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("take", col("cum_before") < col("budget"))
      .groupBy(col("source"))
      .agg(max(col("budget")).as("budget"),
        sum(when(col("take"), 1L).otherwise(0L)).as("n_taken"),
        sum(when(col("take"), col("tok")).otherwise(0L)).as("tok_taken"),
        count(lit(1)).as("n_docs"))
      .orderBy("source")
  }

  private def c04(s: SparkSession, d: String): DataFrame =
    budgetFill(mixTokens(docs(s, d)))

  /** Oracle twin of `mixTokens`, parameterized by the document set. */
  private def mixTokensCteSql(fromClause: String, idRef: String) =
    s"""t AS (SELECT source, $idRef AS doc_id,
       |        CAST(($idRef * 2654435761) % 4294967296 AS BIGINT) AS skey,
       |        CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS tok,
       |        CAST(substring(source, 4) AS BIGINT) % 4 + 1 AS wgt
       |      FROM $fromClause)""".stripMargin

  /** Oracle twin of `budgetFill` over the CTE `t`. */
  private val budgetFillTailSql =
    """tt AS (SELECT SUM(tok) AS t_total FROM t),
      |c AS (SELECT source, tok, wgt * (tt.t_total // 100) AS budget,
      |        COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY skey, doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |      FROM t, tt)
      |SELECT source, CAST(MAX(budget) AS BIGINT) AS budget,
      |  CAST(SUM(CASE WHEN cum_before < budget THEN 1 ELSE 0 END) AS BIGINT) AS n_taken,
      |  CAST(SUM(CASE WHEN cum_before < budget THEN tok ELSE 0 END) AS BIGINT) AS tok_taken,
      |  COUNT(*) AS n_docs
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  private val c04Sql =
    s"""WITH ${mixTokensCteSql("documents", "doc_id")},
       |$budgetFillTailSql""".stripMargin

  // d09: duplicated-span REMOVAL — the operator t09 only profiles.
  // Exact-substring deduplication in the Lee-et-al "Deduplicating
  // Training Data" sense, re-expressed as distributed gram ownership
  // instead of a monolithic suffix array: every 5-gram OCCURRENCE
  // (doc, position) is emitted; a gram with ≥2 occurrences corpus-wide
  // is a duplicated span; its single OWNER occurrence (lexicographic
  // min (doc_id, pos)) keeps its tokens, every other occurrence marks
  // its 5 covered positions for removal; a token is removed iff any
  // removable occurrence covers it. Per-source accounting of the
  // surviving corpus. Scale: occurrences are linear in corpus tokens
  // and partition freely; ownership is one gram-hash aggregate
  // (map-side partial min/count); the removable join shuffles on the
  // gram key; coverage is a ×5 position explode + doc-keyed distinct.
  // Every stage is linear — no suffix array, no single-node sort, no
  // window. (A suffix array finds variable-length spans; fixed-k gram
  // ownership finds every span ≥ k at 1/k the positions — the standard
  // distributed approximation, exact for the k chosen.)
  /** Shared by d09/d10: (tokenized docs, distinct removed positions).
    * covered = (doc_id, q) pairs owned by a non-owner occurrence of a
    * duplicated 5-gram. */
  private def spanRemoval(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val toksAll = docs(s, d).select(
      col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
    // occurrences: 1-based position p, gram = words p..p+4 (docs with
    // <5 words emit none; sequence(1, size-4) would DESCEND for them,
    // so the slice-total guard pattern from gramExpr applies)
    val occ = toksAll.select(
      col("doc_id"),
      explode(expr(
        "transform(slice(sequence(1, size(ws)), 1, greatest(size(ws) - 4, 0)), " +
          "p -> struct(p as p, concat_ws(' ', ws[p-1], ws[p], ws[p+1], ws[p+2], ws[p+3]) as gram))"))
        .as("o"))
      .select(col("doc_id"), col("o.p").as("p"), col("o.gram").as("gram"))
      // consumed twice (ownership stats, removable join) — same
      // pre-materialization rationale as the t08/t09 gram cache
      .cache()
    val gstat = occ.groupBy(col("gram")).agg(
      count(lit(1)).as("cnt"),
      min(struct(col("doc_id"), col("p"))).as("owner"))
      .filter(col("cnt") >= 2)
      .select(col("gram"), col("owner.doc_id").as("o_doc"), col("owner.p").as("o_p"))
    val removable = occ.join(gstat, Seq("gram"))
      .filter(!(col("doc_id") === col("o_doc") && col("p") === col("o_p")))
    val covered = removable
      .select(col("doc_id"), explode(sequence(col("p"), col("p") + 4)).as("q"))
      .distinct()
    (toksAll, covered)
  }

  private def d09(s: SparkSession, d: String): DataFrame = {
    val (toksAll, covered) = spanRemoval(s, d)
    val removed = covered
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_removed"))
    toksAll.select(col("doc_id"), col("source"),
      size(col("ws")).cast(LongType).as("n_tokens"))
      .join(removed, Seq("doc_id"), "left_outer")
      .na.fill(0L, Seq("n_removed"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_removed")).as("removed_tokens"),
        sum(when(col("n_removed") > 0, 1L).otherwise(0L)).as("docs_affected"),
        max(col("n_removed")).as("max_removed"))
      .orderBy("source")
  }

  /** Oracle twin of `spanRemoval`: the ownership CTE chain ending in
    * `cov` (doc_id, q) — interpolated into d09Sql and d10Sql so the
    * gram width, owner tie-break and cover rule live once. */
  private val spanRemovalCtesSql =
    """w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
      |occ AS (SELECT doc_id, CAST(p AS BIGINT) AS p,
      |          array_to_string(ws[p:p+4], ' ') AS gram
      |        FROM w, UNNEST(range(1, greatest(len(ws) - 3, 1))) AS t(p)),
      |own AS (SELECT gram, COUNT(*) AS cnt, MIN(doc_id) AS o_doc
      |        FROM occ GROUP BY 1 HAVING COUNT(*) >= 2),
      |own2 AS (SELECT o.gram, own.o_doc, MIN(o.p) AS o_p
      |         FROM occ o JOIN own ON o.gram = own.gram AND o.doc_id = own.o_doc
      |         GROUP BY 1, 2),
      |rm AS (SELECT o.doc_id, o.p FROM occ o JOIN own2 g ON o.gram = g.gram
      |       WHERE NOT (o.doc_id = g.o_doc AND o.p = g.o_p)),
      |cov AS (SELECT DISTINCT doc_id, p + i AS q
      |        FROM rm, UNNEST(range(0, 5)) AS t(i))""".stripMargin

  private val d09Sql =
    s"""WITH $spanRemovalCtesSql,
      |rd AS (SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY 1)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(len(ws)) AS BIGINT) AS total_tokens,
      |  CAST(SUM(COALESCE(n_removed, 0)) AS BIGINT) AS removed_tokens,
      |  CAST(SUM(CASE WHEN COALESCE(n_removed, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_affected,
      |  CAST(MAX(COALESCE(n_removed, 0)) AS BIGINT) AS max_removed
      |FROM w LEFT JOIN rd ON w.doc_id = rd.doc_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // c05: decontaminated mixture assembly — the composition a real
  // pretraining pipeline runs end-to-end: drop the eval split and
  // every train doc t08 flags as contaminated (≥10% of its distinct
  // 5-grams appear in the eval split). Train docs with <5 words have
  // no 5-grams, CANNOT be gram-checked, and are EXCLUDED from the
  // mixture (not presumed clean) — `contamination` only emits docs
  // that pass the ≥5-word gram filter, and the survivors are its
  // low-hit subset. Then run c04's per-source
  // token-budget greedy fill over the SURVIVORS (weights from the
  // source name, budgets from one broadcast corpus total of surviving
  // tokens). One declarative plan: the contamination gate is a
  // doc-keyed anti-condition feeding the same keyed-window prefix
  // scan as c04 — no new shuffle shapes, so the c04 scale notes apply
  // unchanged.
  private def c05(s: SparkSession, d: String): DataFrame = {
    val clean = contamination(s, d)
      .filter(col("n_hits") * 10 < col("n_grams"))
      .select(col("doc_id"))
    budgetFill(mixTokens(docs(s, d).join(clean, Seq("doc_id"), "left_semi")))
  }

  private val c05Sql =
    s"""WITH $contaminationCtesSql,
       |clean AS (SELECT doc_id FROM pd WHERE n_hits * 10 < n_grams),
       |${mixTokensCteSql("documents d JOIN clean ON d.doc_id = clean.doc_id", "d.doc_id")},
       |$budgetFillTailSql""".stripMargin

  // d10: the removal operator's ACTUAL output — the cleaned corpus.
  // Same ownership semantics as d09; per doc the kept-token count and
  // the cleaned text (kept tokens joined in position order; a doc
  // whose every token is covered comes back empty, not missing).
  // Reassembly is sort_array over (pos, token) structs inside a
  // doc-keyed aggregate — deterministic, bounded by document length,
  // no window. Scale: adds one doc-keyed anti join (tokens vs covered
  // positions) and one doc-keyed aggregate to d09's linear stages.
  private def d10(s: SparkSession, d: String): DataFrame = {
    val (toksAll, covered) = spanRemoval(s, d)
    val toks = toksAll.select(col("doc_id"),
      posexplode(col("ws")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("tok"))
    val kept = toks.join(covered,
      toks("doc_id") === covered("doc_id") && toks("p") === covered("q"),
      "left_anti")
    val agg = kept.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_kept"),
      concat_ws(" ", expr("transform(sort_array(collect_list(struct(p, tok))), x -> x.tok)"))
        .as("text_clean"))
    toksAll.select(col("doc_id"), col("source"))
      .join(agg, Seq("doc_id"), "left_outer")
      .na.fill(0L, Seq("n_kept")).na.fill("", Seq("text_clean"))
      .orderBy("doc_id")
  }

  private val d10Sql =
    s"""WITH $spanRemovalCtesSql,
      |toks AS (SELECT doc_id, CAST(p AS BIGINT) AS p, ws[p] AS tok
      |         FROM w, UNNEST(range(1, len(ws) + 1)) AS t(p)),
      |kept AS (SELECT t.doc_id, t.p, t.tok FROM toks t
      |         LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.q
      |         WHERE c.doc_id IS NULL),
      |agg AS (SELECT doc_id, COUNT(*) AS n_kept,
      |          string_agg(tok, ' ' ORDER BY p) AS text_clean
      |        FROM kept GROUP BY 1)
      |SELECT w.doc_id, source, COALESCE(n_kept, 0) AS n_kept,
      |  COALESCE(text_clean, '') AS text_clean
      |FROM w LEFT JOIN agg ON w.doc_id = agg.doc_id
      |ORDER BY 1""".stripMargin

  // c06: CCNet-style per-language quality bucketing (Wenzek et al.
  // 2020, "CCNet: Extracting High Quality Monolingual Datasets from
  // Web Crawl Data", arXiv:1911.00359): split each language's corpus
  // into head/middle/tail terciles by a per-doc quality score and
  // report per-(lang, bucket) document and token mass — the
  // normalize-quality-within-language pass that precedes
  // quality-thresholded sampling. Score = stopword hits per 1000
  // tokens (the t02 heuristic, per-doc); bucket boundaries are
  // VALUE-terciles: all docs sharing a score value land in the bucket
  // of that value's first rank (ties never split a bucket), which is
  // both the deterministic contract and what makes the oracle exact.
  //
  // Scale shape — the a07 exact-histogram idiom applied to bucketing:
  // the corpus is scanned ONCE into a (lang, score) histogram (score
  // is integer 0..1000, so ≤|langs|·1001 rows; partial+final hash agg,
  // the only data-sized exchange). Rank arithmetic (exclusive cumsum,
  // per-lang totals) runs as lang-keyed windows over the HISTOGRAM —
  // thousands of rows, never the corpus, so the low-cardinality lang
  // key is not a skew hazard — and the tercile report is a re-agg of
  // histogram rows. No join back to documents, no doc-level window,
  // no second corpus pass. The per-doc score divide is the one-IEEE-
  // divide + floor idiom (t12), bit-identical across engines.
  private def c06(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = (length(col("text")) -
      length(regexp_replace(col("text"), " ", "")) + 1).cast(LongType)
    val stop = ((length(col("text")) -
      length(regexp_replace(col("text"), " the ", ""))) / lit(5)).cast(LongType)
    val h = docs(s, d)
      .select(col("lang"), toks.as("toks"),
        floor(stop.cast(DoubleType) * lit(1000.0) / toks.cast(DoubleType)).as("qs"))
      .groupBy(col("lang"), col("qs"))
      .agg(count(lit(1)).as("c"), sum(col("toks")).as("t"))
    val wOrd = Window.partitionBy("lang").orderBy("qs")
    val wAll = Window.partitionBy("lang")
    h.withColumn("cumx", sum(col("c")).over(wOrd) - col("c"))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("bucket", least(lit(2L),
        floor(lit(3.0) * col("cumx").cast(DoubleType) / col("n").cast(DoubleType))))
      .groupBy(col("lang"), col("bucket"))
      .agg(sum(col("c")).as("n_docs"), sum(col("t")).as("n_tokens"),
        min(col("qs")).as("min_q"), max(col("qs")).as("max_q"))
      .orderBy("lang", "bucket")
  }

  private val c06Sql =
    s"""WITH q AS (SELECT lang,
       |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS toks,
       |    CAST(floor((length(text) - length(replace(text, ' the ', ''))) / 5) AS BIGINT) AS stop
       |  FROM documents),
       |q2 AS (SELECT lang, toks, CAST(FLOOR(stop * 1000.0 / toks) AS BIGINT) AS qs FROM q),
       |h AS (SELECT lang, qs, COUNT(*) AS c, SUM(toks) AS t FROM q2 GROUP BY 1, 2),
       |ch AS (SELECT lang, qs, c, t,
       |         SUM(c) OVER (PARTITION BY lang ORDER BY qs) - c AS cumx,
       |         SUM(c) OVER (PARTITION BY lang) AS n FROM h),
       |b AS (SELECT lang, qs, c, t,
       |        LEAST(2, CAST(FLOOR(3.0 * cumx / n) AS BIGINT)) AS bucket FROM ch)
       |SELECT lang, bucket, CAST(SUM(c) AS BIGINT) AS n_docs,
       |  CAST(SUM(t) AS BIGINT) AS n_tokens, MIN(qs) AS min_q, MAX(qs) AS max_q
       |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // c11: the END-TO-END corpus-prep funnel — every stage a user of
  // this library would chain to turn a raw crawl into training-ready
  // shards, composed as ONE plan and reported as the stage-by-stage
  // manifest a data engineer actually reviews: raw → normalize + PII
  // scrub (c12's operator; value-identity on this PII-free corpus —
  // the redaction contract itself is c12's planted-PII gate) → Gopher
  // gate (t20's battery, lenient ≥3/4) → exact dedup (d01's
  // min-keeper rule) → benchmark decontamination (t08's 5-gram rule
  // against the held-out eval split, bloom-pruned scan-side like t16)
  // → temperature mixture (c07's τ=1/2 exact integer quotas, B = 200)
  // → hash split (c10's Knuth rule, 80/10/10; exact-dup leakage is
  // impossible downstream of the dedup stage — NEAR-dup-atomic
  // assignment stays c10's dedicated contract) → and the TERMINAL
  // stages over the train split: token packing (c03's 512-budget
  // bins), BPE tokenization (t22's persisted-tokenizer apply, vocab
  // trained once on the corpus), and shard-emission accounting (c09's
  // CorpusSharder manifest). Every stage reuses the proven operator's
  // exact arithmetic, so the composed oracle is the same CTE chain —
  // including the R-round BPE vocab (BpeTrain.chainSql). Output:
  // (stage, n_units, n_chars, n_tokens) — units are docs for corpus
  // stages, bins/docs/shards for the terminal stages; tokens are
  // whitespace tokens through the funnel and BPE tokens at the
  // tokenize stage.
  //
  // Scale: each stage is its operator's audited shape (stateless
  // scrub projection, scan-kernel grams, bloom scan-side pruning,
  // bounded TopK mixture, keyed pack windows — never a corpus window,
  // rank-without-global-sort sharding), chained through cached
  // intermediates; at 100 TB the caches become materialized parquet
  // between stages (c09's sharded write is the terminal form), which
  // changes nothing about the per-stage plans. The funnel is
  // intentionally held-out-aware: the eval split (doc_id % 37 == 0)
  // feeds ONLY the decon sketch.
  private def c11(s: SparkSession, d: String): DataFrame = {
    import graft.functions.GraftFunctions.{fivegramTfPairs, topKByScore, wordCount, wordTfPairs}
    import graft.operators.BloomSketch
    import org.apache.spark.sql.expressions.Window
    def wsTok(t: Column): Column = wordCount(t).cast(LongType)
    val all = docs(s, d)
    val evalGrams = all.filter(col("doc_id") % 37 === 0)
      .select(explode(fivegramTfPairs(col("text"))).as("p"))
      .select(col("p.t").as("gram")).distinct().cache()
    val sketch = BloomSketch.build(evalGrams, "gram")
    val raw = all.filter(col("doc_id") % 37 =!= 0)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .cache()
    // n_tok computed ONCE per text value and carried through the
    // funnel joins (round 18, guide §2.3): every stage past 1_scrubbed
    // aggregates the SAME scrubbed strings, so the carried long is
    // value-identical to re-running the wordCount kernel per stage —
    // which is what the stage manifest previously did (6 full
    // corpus-text passes; at 100 TB each is a full corpus scan).
    val scrubbed = PiiScrub.scrub(raw, "text")
      .select(col("doc_id"), col("scrubbed").as("text"), col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast(LongType))
      .withColumn("n_tok", wsTok(col("text")))
      .cache()
    // lineage truncation at the funnel's waist (optimization round 18,
    // guide §3.3 "planning time itself can become the bottleneck"):
    // every downstream consumer — keepers, the decon gram chain, the
    // mixture/split/pack/tokenize/shard tails and the stage aggregates
    // — re-embeds its full lineage in the one composed plan, and with
    // the raw→scrub→gate subtree under each of ~15 references the
    // formatted plan was 40.8k lines; Catalyst analysis of that tree
    // cost 3.5–5 s of the 6.5–7.9 s warm wall (measured: Profiler
    // build= vs write= split). An EAGER localCheckpoint of `gated`
    // replaces the subtree with a LogicalRDD for every consumer (the
    // one materialization the cache paid anyway), while every audited
    // shape — the LeftSemi/LeftAnti survivor joins, the might_contain
    // gram probe, the keyed pack windows — sits ABOVE the boundary and
    // stays in the visible plan. localCheckpoint, not cache+count: the
    // r17 A/B showed unpersisting stage CACHES re-compiles dependent
    // cached plans (9.9→14.6 s); the checkpoint cuts lineage without
    // touching the cache manager. (At 100 TB the boundary is the same
    // place a production funnel lands a materialized intermediate.)
    val gated = TextAnalysis
      .gateFlags(scrubbed, carry = Seq("doc_id", "text", "lang", "n_chars", "n_tok"))
      .filter(col("g1") + col("g2") + col("g3") + col("g4") >= 3)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"), col("n_tok"))
      .localCheckpoint()
    val keepers = gated
      .groupBy(xxhash64(col("text")).as("xh"),
        crc32(col("text").cast(BinaryType)).as("cc"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val deduped = gated.join(keepers, Seq("doc_id"), "left_semi").cache()
    val grams = deduped
      .select(col("doc_id"), fivegramTfPairs(col("text")).as("ps"))
    val contaminated = grams
      .select(col("doc_id"), size(col("ps")).cast(LongType).as("n_grams"),
        col("ps"))
      .select(col("doc_id"), col("n_grams"), explode(col("ps")).as("p"))
      .select(col("doc_id"), col("n_grams"), col("p.t").as("gram"))
      .filter(BloomSketch.probe(sketch, col("gram")))
      .join(evalGrams, Seq("gram"), "left_semi")
      .groupBy(col("doc_id"), col("n_grams")).agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") * 10 >= col("n_grams"))
      .select("doc_id")
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti").cache()
    val budget = 200L
    val per = clean.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .withColumn("w",
        round(sqrt(col("n").cast(DoubleType)) * lit(1e9)).cast(LongType))
    val tot = per.agg(sum(col("w")).as("stot"))
    val quota = per.crossJoin(broadcast(tot))
      .withColumn("quota", expr(s"($budget * w) div stot").cast(LongType))
      .select(col("lang"), col("quota"))
    val skey = Q.knuth32(col("doc_id"))
    val topk = topKByScore((skey * lit(-1L)).cast(DoubleType), col("doc_id"),
      struct(col("doc_id")), budget.toInt)
    val picked = clean.select(col("lang"), col("doc_id"))
      .groupBy(col("lang")).agg(topk.as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("lang"), (col("i") + 1).cast(LongType).as("rn"),
        col("e.payload.doc_id").as("doc_id"))
      .join(broadcast(quota), Seq("lang"))
      .filter(col("rn") <= col("quota"))
      .select("doc_id")
    // picked ≤ |langs|·B rows by construction — broadcast-able.
    // Second lineage cut (same §3.3 rationale as `gated`): the train
    // tail — split, pack window, tokenize join, sharder — is another
    // ~8 references over the mixture subtree; the LeftSemi/LeftAnti/
    // might_contain shapes stay visible through the 3_deduped and
    // 4_decontaminated stage-aggregate branches, which reference
    // `deduped`/`clean` directly above this boundary.
    val mixture = clean.join(broadcast(picked), Seq("doc_id"), "left_semi")
      .withColumn("bkt", pmod(skey, lit(10L)))
      .localCheckpoint()
    val train = mixture.filter(col("bkt") < 8).cache()
    val trainChars = train.agg(coalesce(sum(col("n_chars")), lit(0L)).as("n_chars"))
    // 7_packed: c03's keyed prefix-scan packing over the train split
    val w = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    val bins = train
      .select(col("doc_id"), col("source"),
        pmod(col("doc_id"), lit(8L)).as("shard"), col("n_tok").as("tok"))
      .withColumn("cum_before", coalesce(sum(col("tok")).over(w), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / PackBudget).cast(LongType))
      .groupBy(col("source"), col("shard"), col("bin"))
      .agg(sum(col("tok")).as("bin_tokens"))
    val packedRow = bins
      .agg(count(lit(1)).as("n_units"),
        coalesce(sum(col("bin_tokens")), lit(0L)).as("n_tokens"))
      .crossJoin(trainChars)
      .select(lit("7_packed").as("stage"), col("n_units"), col("n_chars"),
        col("n_tokens"))
    // 8_tokenized: t22's persisted-tokenizer apply over the train split
    val vocab = graft.operators.BpeTokenizer.vocab(
      s, graft.operators.BpeTokenizer.ensureBuilt(s, d))
    val perDoc = train
      .select(col("doc_id"), explode(wordTfPairs(col("text"))).as("p"))
      .select(col("doc_id"), col("p.t").as("word"), col("p.c").as("tf"))
      .join(vocab, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("n_tok")).as("tokens"),
        sum(col("tf") * length(col("word")).cast(LongType)).as("chars"))
    val tokenizedRow = perDoc
      .agg(count(lit(1)).as("n_units"),
        coalesce(sum(col("chars")), lit(0L)).as("n_chars"),
        coalesce(sum(col("tokens")), lit(0L)).as("n_tokens"))
      .select(lit("8_tokenized").as("stage"), col("n_units"), col("n_chars"),
        col("n_tokens"))
    // 9_sharded: c09's manifest accounting over the train split (the
    // manifest is computed by the real CorpusSharder pass — rank
    // permutation + shard cut — then reduced to the stage row)
    val shardedRow = graft.operators.CorpusSharder.manifest(
      graft.operators.CorpusSharder.assignments(
        train.select(col("doc_id"), col("text"), col("source")), 100L))
      .agg(count(lit(1)).as("n_units"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
      .crossJoin(trainChars)
      .select(lit("9_sharded").as("stage"), col("n_units"), col("n_chars"),
        col("n_tokens"))
    // stage-manifest fold (round 18, guide §2.4): the seven corpus-
    // stage rows (0_raw..5_mixture + the 6_* split rows) were seven
    // separate aggregates — seven exchanges, ~14 AQE query-stage jobs
    // — over frames whose token sums re-ran the wordCount kernel per
    // stage. One union of per-stage (stage, n_chars, n_tok)
    // projections under ONE groupBy computes the identical sums in a
    // single exchange. The oracle's per-stage aggregates emit a row
    // even over an EMPTY frame (n_units = 0) while its split rows are
    // GROUP BY (dropped when empty) — matched exactly by restoring the
    // six always-present stages from a static frame and passing the
    // 6_* groups through.
    def stRow(name: String, df: DataFrame) =
      df.select(lit(name).as("stage"), col("n_chars"), col("n_tok"))
    val stageRows = stRow("0_raw", raw.withColumn("n_tok", wsTok(col("text"))))
      .unionByName(stRow("1_scrubbed", scrubbed))
      .unionByName(stRow("2_gated", gated))
      .unionByName(stRow("3_deduped", deduped))
      .unionByName(stRow("4_decontaminated", clean))
      .unionByName(stRow("5_mixture", mixture))
      .unionByName(mixture.select(
        concat(lit("6_"), when(col("bkt") < 8, "train")
          .when(col("bkt") === 8, "val").otherwise(lit("test"))).as("stage"),
        col("n_chars"), col("n_tok")))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_units"), sum(col("n_chars")).as("n_chars"),
        sum(col("n_tok")).as("n_tokens"))
      .cache() // ≤ 9 rows, referenced twice below — one union pass, not two
    import s.implicits._
    val staticStages = Seq("0_raw", "1_scrubbed", "2_gated", "3_deduped",
      "4_decontaminated", "5_mixture").toDF("stage")
    val corpusRows = staticStages.join(stageRows, Seq("stage"), "left")
      .select(col("stage"), coalesce(col("n_units"), lit(0L)).as("n_units"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
    corpusRows
      .unionByName(stageRows.filter(col("stage").startsWith("6_")))
      .unionByName(packedRow)
      .unionByName(tokenizedRow)
      .unionByName(shardedRow)
      .orderBy("stage")
  }

  // c16: the c11 funnel with the DEDUP stage swapped for d15's
  // EXACT-SUBSTRING removal — the Lee et al. ("Deduplicating Training
  // Data Makes Language Models Better") ExactSubstr pipeline a user
  // of that paper actually runs: instead of dropping whole duplicate
  // documents, every duplicated span (>= 32 chars, SA-first keeper)
  // is cut out of the text and the CLEANED text flows through the
  // rest of the funnel. Stages: raw -> substring removal (d15's
  // index-derived spans — the persisted SA artifact, round-14 verdict
  // items 1+5) -> Gopher gate over the cleaned text -> exact dedup of
  // cleaned texts (fully-scrubbed docs collapse to one empty keeper —
  // the honest consequence of span removal) -> Knuth hash split
  // 80/10/10. Output: the same (stage, n_units, n_chars, n_tokens)
  // manifest as c11; conservation invariants (raw chars − removed ==
  // substr-stage chars; split rows repartition the dedup survivors)
  // are PipelineE2eSpec contracts. Scale: the d15 stage is its
  // audited shape over the persisted index; every later stage is
  // c11's audited shape over strictly fewer chars. Oracle: Python —
  // the d15 suffix sort composed with the battery/dedup/split
  // restatements (DuckDB cannot materialize the suffix relation).
  private def c16(s: SparkSession, d: String): DataFrame = {
    import graft.functions.GraftFunctions.wordCount
    def wsTok(t: Column): Column = wordCount(t).cast(LongType)
    val all = docs(s, d)
    // n_tok once per cleaned text value, carried through the funnel —
    // the c11 fold's rationale (guide §2.3): stages 1–4 aggregate the
    // same strings, so the carried long equals re-running the kernel
    val cleaned = Dedup.d15From(s, d,
        all.select(col("doc_id"), col("source"), col("text")))
      .select(col("doc_id"), col("source"), col("text_clean").as("text"))
      .withColumn("n_chars", length(col("text")).cast(LongType))
      .withColumn("n_tok", wsTok(col("text")))
      .cache()
    val gated = TextAnalysis
      .gateFlags(cleaned, carry = Seq("doc_id", "text", "n_chars", "n_tok"))
      .filter(col("g1") + col("g2") + col("g3") + col("g4") >= 3)
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"),
        col("n_tok"))
      .cache()
    // keeper identity is the (xxhash64, crc32) pair of the cleaned
    // text while the Python oracle compares texts exactly — a
    // cross-text collision on BOTH hashes (~2^-96) would diverge;
    // the d01/c11 idiom, stated here because c16 dedups DERIVED text
    val keepers = gated
      .groupBy(xxhash64(col("text")).as("xh"),
        crc32(col("text").cast(BinaryType)).as("cc"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val deduped = gated.join(keepers, Seq("doc_id"), "left_semi").cache()
    // stage-manifest fold — the c11 shape: ONE union + ONE groupBy
    // exchange for all stage rows instead of five aggregates; the
    // oracle's always-emitted empty-stage rows restored from a static
    // frame, the 4_* split groups passed through (GROUP BY semantics)
    def stRow(name: String, df: DataFrame) =
      df.select(lit(name).as("stage"), col("n_chars"), col("n_tok"))
    val stageRows = stRow("0_raw",
        all.select(col("text"), col("n_chars").cast(LongType).as("n_chars"))
          .withColumn("n_tok", wsTok(col("text"))))
      .unionByName(stRow("1_substr_removed", cleaned))
      .unionByName(stRow("2_gated", gated))
      .unionByName(stRow("3_deduped", deduped))
      .unionByName(deduped
        .withColumn("bkt", pmod(Q.knuth32(col("doc_id")), lit(10L)))
        .select(concat(lit("4_"), when(col("bkt") < 8, "train")
          .when(col("bkt") === 8, "val").otherwise(lit("test"))).as("stage"),
          col("n_chars"), col("n_tok")))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_units"), sum(col("n_chars")).as("n_chars"),
        sum(col("n_tok")).as("n_tokens"))
      .cache() // ≤ 7 rows, referenced twice — one union pass, not two
    import s.implicits._
    val staticStages = Seq("0_raw", "1_substr_removed", "2_gated",
      "3_deduped").toDF("stage")
    val manifest = staticStages.join(stageRows, Seq("stage"), "left")
      .select(col("stage"), coalesce(col("n_units"), lit(0L)).as("n_units"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      .unionByName(stageRows.filter(col("stage").startsWith("4_")))
      .orderBy("stage")
      .cache()
    // materialize the ≤7 manifest rows, then RETIRE the corpus-text-
    // sized stage caches (round-15 ADVICE): only the tiny manifest
    // cache outlives the call; a dropped block recomputes through the
    // d15 spans parquet handoff, never through a deleted path
    manifest.count()
    Seq(cleaned, gated, deduped, stageRows).foreach(_.unpersist())
    manifest
  }

  private val c11Sql = {
    // raw interpolator: the regex literals must keep their backslashes
    raw"""WITH ${BpeTrain.chainSql},
      |tok AS MATERIALIZED (
      |  SELECT word, CAST(len(syms) AS BIGINT) AS n_tok FROM v${BpeTrain.rounds + 1}),
      |ev AS (
      |  SELECT DISTINCT UNNEST(list_distinct(list_transform(
      |      range(1, len(string_split(text,' ')) - 3),
      |      i -> array_to_string(string_split(text,' ')[i:i+4], ' ')))) AS gram
      |  FROM documents
      |  WHERE doc_id % 37 = 0 AND len(string_split(text,' ')) >= 5),
      |raw AS MATERIALIZED (SELECT doc_id, text, lang, source, n_chars
      |        FROM documents WHERE doc_id % 37 <> 0),
      |scc AS MATERIALIZED (SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |      nfc_normalize(text),
      |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |      '\b[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g'),
      |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
      |      ' +', ' ', 'g')) AS text,
      |    lang, source
      |  FROM raw),
      |sc AS MATERIALIZED (SELECT doc_id, text, lang, source,
      |    CAST(length(text) AS BIGINT) AS n_chars FROM scc),
      |per AS (SELECT doc_id, text, lang, source, n_chars,
      |    len(list_filter(string_split(text,' '), x -> x <> '')) AS w,
      |    len(list_distinct(list_filter(string_split(text,' '), x -> x <> ''))) AS dw,
      |    length(replace(text,' ','')) AS ns,
      |    (CASE WHEN contains(' '||text||' ',' the ') THEN 1 ELSE 0 END
      |    +CASE WHEN contains(' '||text||' ',' a ') THEN 1 ELSE 0 END
      |    +CASE WHEN contains(' '||text||' ',' and ') THEN 1 ELSE 0 END
      |    +CASE WHEN contains(' '||text||' ',' of ') THEN 1 ELSE 0 END) AS sw
      |  FROM sc),
      |gated AS MATERIALIZED (SELECT doc_id, text, lang, source, n_chars FROM per
      |  WHERE (CASE WHEN w >= 50 AND w <= 100000 THEN 1 ELSE 0 END
      |       + CASE WHEN 3*w <= ns AND ns <= 10*w THEN 1 ELSE 0 END
      |       + CASE WHEN sw >= 2 THEN 1 ELSE 0 END
      |       + CASE WHEN 2*dw >= w THEN 1 ELSE 0 END) >= 3),
      |dd AS MATERIALIZED (SELECT doc_id, text, lang, source, n_chars FROM gated
      |  QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY text)),
      |gr AS (SELECT doc_id, list_distinct(list_transform(
      |      range(1, len(string_split(text,' ')) - 3),
      |      i -> array_to_string(string_split(text,' ')[i:i+4], ' '))) AS grams
      |  FROM dd WHERE len(string_split(text,' ')) >= 5),
      |hx AS (SELECT doc_id, COUNT(*) AS n_hits
      |       FROM (SELECT doc_id, UNNEST(grams) AS gram FROM gr) x
      |       WHERE gram IN (SELECT gram FROM ev) GROUP BY 1),
      |cont AS (SELECT gr.doc_id FROM gr JOIN hx ON gr.doc_id = hx.doc_id
      |         WHERE hx.n_hits * 10 >= len(gr.grams)),
      |clean AS MATERIALIZED (SELECT * FROM dd
      |          WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
      |perl AS (SELECT lang, COUNT(*) AS n,
      |    CAST(ROUND(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1e9, 0) AS BIGINT) AS w
      |  FROM clean GROUP BY 1),
      |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS stot FROM perl),
      |qq AS (SELECT lang, CAST((200 * w) // stot AS BIGINT) AS quota
      |       FROM perl, tot),
      |r AS (SELECT doc_id, text, lang, source, n_chars,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS BIGINT) AS rn
      |  FROM clean),
      |mix AS MATERIALIZED (SELECT r.doc_id, r.text, r.source, r.n_chars
      |        FROM r JOIN qq ON r.lang = qq.lang WHERE rn <= quota),
      |sp AS MATERIALIZED (SELECT doc_id, text, source, n_chars,
      |    CASE WHEN (doc_id * 2654435761) % 4294967296 % 10 < 8 THEN '6_train'
      |         WHEN (doc_id * 2654435761) % 4294967296 % 10 = 8 THEN '6_val'
      |         ELSE '6_test' END AS stage FROM mix),
      |train AS MATERIALIZED (SELECT * FROM sp WHERE stage = '6_train'),
      |trch AS (SELECT CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS n_chars FROM train),
      |cb AS (SELECT source, shard, doc_id, tok,
      |         COALESCE(SUM(tok) OVER (PARTITION BY source, shard ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |       FROM (SELECT doc_id, source, doc_id % 8 AS shard,
      |               CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT) AS tok
      |             FROM train)),
      |bins AS (SELECT source, shard, CAST(FLOOR(cum_before / $PackBudget) AS BIGINT) AS bin,
      |           SUM(tok) AS bin_tokens
      |         FROM cb GROUP BY 1, 2, 3),
      |twc AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
      |        FROM (SELECT doc_id, UNNEST(string_split(text,' ')) AS word FROM train) x
      |        WHERE word <> '' GROUP BY 1, 2),
      |tper AS (SELECT doc_id, CAST(SUM(tf * n_tok) AS BIGINT) AS tokens,
      |           CAST(SUM(tf * length(word)) AS BIGINT) AS chars
      |         FROM twc JOIN tok USING (word) GROUP BY 1)
      |SELECT '0_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_units,
      |  CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS n_chars,
      |  CAST(COALESCE(SUM(len(list_filter(string_split(text,' '), x -> x <> ''))), 0) AS BIGINT) AS n_tokens
      |FROM raw
      |UNION ALL SELECT '1_scrubbed', CAST(COUNT(*) AS BIGINT),
      |  CAST(COALESCE(SUM(n_chars), 0) AS BIGINT),
      |  CAST(COALESCE(SUM(len(list_filter(string_split(text,' '), x -> x <> ''))), 0) AS BIGINT) FROM sc
      |UNION ALL SELECT '2_gated', CAST(COUNT(*) AS BIGINT),
      |  CAST(COALESCE(SUM(n_chars), 0) AS BIGINT),
      |  CAST(COALESCE(SUM(len(list_filter(string_split(text,' '), x -> x <> ''))), 0) AS BIGINT) FROM gated
      |UNION ALL SELECT '3_deduped', CAST(COUNT(*) AS BIGINT),
      |  CAST(COALESCE(SUM(n_chars), 0) AS BIGINT),
      |  CAST(COALESCE(SUM(len(list_filter(string_split(text,' '), x -> x <> ''))), 0) AS BIGINT) FROM dd
      |UNION ALL SELECT '4_decontaminated', CAST(COUNT(*) AS BIGINT),
      |  CAST(COALESCE(SUM(n_chars), 0) AS BIGINT),
      |  CAST(COALESCE(SUM(len(list_filter(string_split(text,' '), x -> x <> ''))), 0) AS BIGINT) FROM clean
      |UNION ALL SELECT '5_mixture', CAST(COUNT(*) AS BIGINT),
      |  CAST(COALESCE(SUM(n_chars), 0) AS BIGINT),
      |  CAST(COALESCE(SUM(len(list_filter(string_split(text,' '), x -> x <> ''))), 0) AS BIGINT) FROM mix
      |UNION ALL SELECT stage, CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(n_chars) AS BIGINT),
      |  CAST(SUM(len(list_filter(string_split(text,' '), x -> x <> ''))) AS BIGINT) FROM sp GROUP BY 1
      |UNION ALL SELECT '7_packed', (SELECT CAST(COUNT(*) AS BIGINT) FROM bins),
      |  (SELECT n_chars FROM trch),
      |  (SELECT CAST(COALESCE(SUM(bin_tokens), 0) AS BIGINT) FROM bins)
      |UNION ALL SELECT '8_tokenized', (SELECT CAST(COUNT(*) AS BIGINT) FROM tper),
      |  (SELECT CAST(COALESCE(SUM(chars), 0) AS BIGINT) FROM tper),
      |  (SELECT CAST(COALESCE(SUM(tokens), 0) AS BIGINT) FROM tper)
      |UNION ALL SELECT '9_sharded', (SELECT CAST(CEIL(COUNT(*) / 100.0) AS BIGINT) FROM train),
      |  (SELECT n_chars FROM trch),
      |  (SELECT CAST(COALESCE(SUM(len(list_filter(string_split(text,' '), x -> x <> ''))), 0) AS BIGINT) FROM train)
      |ORDER BY 1""".stripMargin
  }



  // c13: cluster-balanced (domain-discovered) temperature mixture —
  // c07's τ = 1/2 mixing rule applied to UNSUPERVISED strata: when a
  // corpus has no trustworthy source/lang metadata (the common case
  // for web crawl at 100 TB), the domains are discovered by k-means
  // over the embedding space (the Doremi/cluster-based mixing recipe:
  // Xie et al. 2023 balance by learned domain, SemDeDup §2 uses the
  // same clustering), then each CLUSTER gets share ∝ n_c^(1/2) and
  // members are the deterministic Knuth-hash rank selection under the
  // quota. Clustering reuses s03's deterministic fixed-point Lloyd's
  // training verbatim (Similarity.trainCodebook — the identical
  // procedure that builds the ANN index), so the oracle restates it
  // with the shared kmeansAssignCtes chain and the mixture arithmetic
  // is c07's exact-integer quota math keyed by cid.
  //
  // Scale shape: training = KMeansIters broadcast-codebook scans + one
  // <=k-row shuffle each; assignment is a map; the per-cluster rank
  // never windows the corpus — the bounded TopKByScore aggregate
  // keeps map-side k-row buffers (shuffle <= partitions · k · B rows).
  // Unlike c07 (strata = 5 langs), quotas here can reach a tiny
  // cluster's full size — the rank filter then passes that cluster
  // whole, which is the intended τ-mixture behavior for rare domains
  // (up-weight until capped by availability).
  private def c13(s: SparkSession, d: String): DataFrame = {
    val budget = 200L
    val e = Similarity.corpus(s, d)
    val cents = Similarity.trainCodebook(e)
    val assigned = e
      .withColumn("cid",
        graft.functions.GraftFunctions.argMaxCosine(col("v"),
          cents.map(_.toArray)).cast(LongType))
      .select(col("cid"), col("vec_id").as("doc_id"))
    val per = assigned.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w",
        round(sqrt(col("n_docs").cast(DoubleType)) * lit(1e9)).cast(LongType))
    val tot = per.agg(sum(col("w")).as("stot"))
    val quota = per.crossJoin(broadcast(tot))
      .withColumn("quota", expr(s"($budget * w) div stot").cast(LongType))
      .select(col("cid"), col("n_docs"), col("quota"))
    val skey = Q.knuth32(col("doc_id"))
    val topk = graft.functions.GraftFunctions.topKByScore(
      (skey * lit(-1L)).cast(DoubleType), col("doc_id"),
      struct(col("doc_id")), budget.toInt)
    assigned
      .groupBy(col("cid"))
      .agg(topk.as("top"))
      .select(col("cid"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("cid"), (col("i") + 1).cast(LongType).as("rn"),
        col("e.payload.doc_id").as("doc_id"))
      .join(broadcast(quota), Seq("cid"))
      .filter(col("rn") <= col("quota"))
      .select(col("cid"), col("n_docs"), col("quota"), col("rn"), col("doc_id"))
      .orderBy("cid", "rn")
  }

  private def c13Sql: String =
    s"""${Similarity.kmeansAssignCtes()},
       |per AS (SELECT cid, COUNT(*) AS n_docs,
       |        CAST(ROUND(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1e9, 0) AS BIGINT) AS w
       |      FROM afinal GROUP BY 1),
       |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS stot FROM per),
       |q AS (SELECT cid, n_docs,
       |        CAST((200 * w) // stot AS BIGINT) AS quota FROM per, tot),
       |r AS (SELECT cid, vec_id AS doc_id,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY cid
       |          ORDER BY (vec_id * 2654435761) % 4294967296, vec_id) AS BIGINT) AS rn
       |      FROM afinal)
       |SELECT r.cid, n_docs, quota, rn, doc_id
       |FROM r JOIN q USING (cid)
       |WHERE rn <= quota ORDER BY 1, 4""".stripMargin

  // c14: curriculum-ordered shard emission — c09's deterministic
  // shard cut under a DIFFICULTY total order instead of the pure
  // pseudorandom one (curriculum learning's data-ordering stage,
  // Bengio et al. 2009; modern pipelines order pretraining shards by
  // LM-score/quality tiers): order = (qs ascending, Knuth hash within
  // a score, doc_id), where qs is t23's per-mille char-bigram LM
  // typicality score (shard 0 = the most atypical/hardest text, the
  // tail = the most typical — reverse for easy-first by flipping the
  // score). Docs too short to score (< 2 chars, no transitions) take
  // qs = 0 on both sides. The rank is computed WITHOUT a global sort
  // (operators.CorpusSharder.curriculumAssignments: bounded
  // (score, hash-range) grid counts → broadcast-joined exact prefix
  // offsets → per-cell row_number), which is the point — the oracle
  // states the same order as one ROW_NUMBER. Output: the per-shard
  // manifest with its score envelope (min_qs/max_qs monotone across
  // shards by construction).
  private def c14(s: SparkSession, d: String): DataFrame = {
    val scored = TextAnalysis.t23DocScores(s, d).select(col("doc_id"), col("qs"))
    // cached: the assignment needs two passes (grid counts, then the
    // ranked pass) and each would otherwise recompute the whole
    // scoring chain (model build + broadcast-join scoring)
    val base = docs(s, d).select(col("doc_id"), col("text"))
      .join(scored, Seq("doc_id"), "left")
      .withColumn("qs", coalesce(col("qs"), lit(0L)))
      .cache()
    graft.operators.CorpusSharder.curriculumAssignments(base, 100L)
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("qs")).as("min_qs"), max(col("qs")).as("max_qs"),
        min(col("rank")).as("first_rank"), max(col("rank")).as("last_rank"))
      .orderBy("shard_id")
  }

  private def c14Sql: String =
    s"""WITH ${TextAnalysis.t23ScoreCtes},
       |j AS (SELECT d.doc_id, COALESCE(q2.qs, 0) AS qs,
       |        CAST(len(list_filter(string_split(d.text, ' '), x -> x <> '')) AS BIGINT) AS n_tok,
       |        (d.doc_id * 2654435761) % 4294967296 AS skey
       |      FROM documents d LEFT JOIN q2 ON q2.doc_id = d.doc_id),
       |r AS (SELECT qs, n_tok,
       |        CAST(ROW_NUMBER() OVER (ORDER BY qs, skey, doc_id) AS BIGINT) AS rank
       |      FROM j)
       |SELECT CAST((rank - 1) // 100 AS BIGINT) AS shard_id, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens, MIN(qs) AS min_qs,
       |  MAX(qs) AS max_qs, MIN(rank) AS first_rank, MAX(rank) AS last_rank
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  // c15: crawl-over-crawl corpus diff — the incremental-curation
  // report run when a new snapshot lands (CommonCrawl-style monthly
  // dumps): FULL OUTER join the snapshots on doc identity and
  // classify added / removed / changed / unchanged, with the exact
  // char delta over changed docs. One co-partitioned doc_id shuffle
  // join + a |sources|-key aggregate — the canonical diff plan at any
  // scale (near-dup relations between the snapshots are d13's probe
  // job against the persisted index, deliberately not re-stated
  // here). The gate derives snapshot B from the corpus IN-PLAN by
  // deterministic doc_id arithmetic (the c12 planted idiom): Knuth
  // hash mod 7 — class 0 removed, class 1 revised (" rev" appended:
  // a near-identical edit), class 2 additionally re-crawled as a NEW
  // doc (id-offset, "new " prefix); the oracle plants the
  // byte-identical snapshot.
  private val DiffOffset = 1L << 41

  /** The derived "next crawl" snapshot for the gate. */
  private[queries] def snapshotB(a: DataFrame): DataFrame = {
    val m = pmod(Q.knuth32(col("doc_id")), lit(7L))
    val kept = a.filter(m =!= 0)
      .select(col("doc_id"),
        when(m === 1, concat(col("text"), lit(" rev")))
          .otherwise(col("text")).as("text"),
        col("source"))
    val added = a.filter(m === 2)
      .select((col("doc_id") + DiffOffset).as("doc_id"),
        concat(lit("new "), col("text")).as("text"), col("source"))
    kept.unionByName(added)
  }

  private def c15(s: SparkSession, d: String): DataFrame = {
    val a = docs(s, d).select(col("doc_id"), col("text"), col("source"))
    val b = snapshotB(docs(s, d))
      .select(col("doc_id"), col("text").as("text_b"), col("source").as("source_b"))
    val cls = when(col("text").isNull, "added")
      .when(col("text_b").isNull, "removed")
      .when(col("text") === col("text_b"), "unchanged")
      .otherwise("changed")
    a.join(b, Seq("doc_id"), "full_outer")
      .select(coalesce(col("source"), col("source_b")).as("src"), cls.as("cls"),
        when(col("text").isNotNull && col("text_b").isNotNull &&
          col("text") =!= col("text_b"),
          length(col("text_b")).cast(LongType) - length(col("text")).cast(LongType))
          .otherwise(lit(0L)).as("cd"))
      .groupBy(col("src").as("source"))
      .agg(
        sum(when(col("cls") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("cls") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("cls") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("cls") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"),
        sum(col("cd")).as("chars_delta"))
      .orderBy("source")
  }

  private val c15Sql: String =
    s"""WITH k AS (SELECT doc_id, text, source,
       |        ((doc_id * 2654435761) % 4294967296) % 7 AS m FROM documents),
       |b AS (SELECT doc_id,
       |        CASE WHEN m = 1 THEN text || ' rev' ELSE text END AS text, source
       |      FROM k WHERE m <> 0
       |      UNION ALL
       |      SELECT doc_id + $DiffOffset, 'new ' || text, source FROM k WHERE m = 2),
       |j AS (SELECT COALESCE(a.source, b.source) AS source,
       |        CASE WHEN a.doc_id IS NULL THEN 'added'
       |             WHEN b.doc_id IS NULL THEN 'removed'
       |             WHEN a.text = b.text THEN 'unchanged'
       |             ELSE 'changed' END AS cls,
       |        CASE WHEN a.text IS NOT NULL AND b.text IS NOT NULL
       |              AND a.text <> b.text
       |             THEN CAST(length(b.text) AS BIGINT) - CAST(length(a.text) AS BIGINT)
       |             ELSE 0 END AS cd
       |      FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
       |SELECT source,
       |  CAST(SUM(CASE WHEN cls = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       |  CAST(SUM(CASE WHEN cls = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |  CAST(SUM(CASE WHEN cls = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       |  CAST(SUM(CASE WHEN cls = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
       |  CAST(SUM(cd) AS BIGINT) AS chars_delta
       |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  override def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c11_pipeline_e2e" -> c11,
    "c16_pipeline_substr" -> c16,
    "c13_cluster_mixture" -> c13,
    "c14_curriculum_shards" -> c14,
    "c15_corpus_diff" -> c15,
    "c05_decontaminated_mixture" -> c05,
    "c06_quality_buckets" -> c06,
    "d09_span_removal" -> d09,
    "d10_span_removal_text" -> d10,
    "t08_decontamination" -> t08,
    "t16_bloom_decontamination" -> t16,
    // streaming twin: the same report emitted across watermark-bounded
    // micro-batches of a file-replayed document feed — t16's CTE
    // oracle checks it because the watermark flush makes the stream's
    // union of Append emissions exactly the batch report
    "t16_decontamination_stream" ->
      ((s, d) => graft.streaming.StreamingDecontamination.replayGate(s, d)),
    // the persisted-index twin of t16 (build-once eval side, probe-
    // many corpus passes): same oracle because the report is
    // bit-identical by construction — the s06/s03 evidence pattern
    "t19_decontamination_index" -> ((s, d) => {
      val dir = graft.operators.DecontamIndex.ensureBuilt(s, d)
      graft.operators.DecontamIndex.search(s, d, dir)
    }),
    "t17_contamination_provenance" -> t17,
    "t09_dupspan_profile" -> t09,
    "t11_repetition_profile" -> t11,
    "c01_stratified_sample" -> c01,
    "c02_clean_sample" -> c02,
    "c03_token_packing" -> c03,
    "c04_mixture_budget" -> c04,
    "c07_temperature_mixture" -> c07,
    "c08_epoch_mixture" -> c08,
    "c09_corpus_shards" -> c09)

  override def oracle: Map[String, String] = Map(
    "c11_pipeline_e2e" -> c11Sql,
    "c13_cluster_mixture" -> c13Sql,
    "c14_curriculum_shards" -> c14Sql,
    "c15_corpus_diff" -> c15Sql,
    "c05_decontaminated_mixture" -> c05Sql,
    "c06_quality_buckets" -> c06Sql,
    "d09_span_removal" -> d09Sql,
    "d10_span_removal_text" -> d10Sql,
    "t08_decontamination" -> t08Sql,
    "t16_bloom_decontamination" -> t16Sql,
    "t16_decontamination_stream" -> t16Sql,
    "t19_decontamination_index" -> t16Sql,
    "t17_contamination_provenance" -> t17Sql,
    "t09_dupspan_profile" -> t09Sql,
    "t11_repetition_profile" -> t11Sql,
    "c01_stratified_sample" -> c01Sql,
    "c02_clean_sample" -> c02Sql,
    "c03_token_packing" -> c03Sql,
    "c04_mixture_budget" -> c04Sql,
    "c07_temperature_mixture" -> c07Sql,
    "c08_epoch_mixture" -> c08Sql,
    "c09_corpus_shards" -> c09Sql)
}
