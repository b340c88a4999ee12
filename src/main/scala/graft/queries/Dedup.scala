package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document deduplication for a training-data pipeline, on the
  * `documents` table: exact (content-hash groupBy), MinHash+LSH
  * (shingle → minhash signature → banded bucket join → exact-Jaccard
  * verify), SimHash (bit-vote fingerprint + banded hamming pairs).
  *
  * Scale design: every path is linear + one shuffle on a hash key.
  * The only quadratic step (exact Jaccard) runs on LSH candidate
  * pairs, not on the corpus; at 100 TB the band join is the standard
  * shuffle-bounded near-dup sweep (each bucket is O(dups), hot
  * buckets salt-able).
  */
object Dedup extends QueryModule {

  /** (sfDir, table mtime) → embeddings row count (d06 band-width
    * sizing). Keying on the parquet file's mtime means a dataset
    * REGENERATED at the same path in-process (test fixtures, notebook
    * reuse) re-counts instead of silently sizing bands from a stale
    * count; unchanged files still hit the cache. */
  private val vecCount = new java.util.concurrent.ConcurrentHashMap[(String, Long), java.lang.Long]()

  private def embeddingsMtime(d: String): Long =
    try {
      val p = java.nio.file.Paths.get(d, "embeddings.parquet")
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).mapToLong(f =>
          java.nio.file.Files.getLastModifiedTime(f).toMillis).max.orElse(0L)
      else java.nio.file.Files.getLastModifiedTime(p).toMillis
    } catch { case _: java.io.IOException => 0L }

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  // Word 3-shingles: the single owner of the shingle definition is
  // operators.DedupIndex (the persisted-index form must sign documents
  // with the exact batch rule); see the ANSI/total-index-list note
  // there.
  private val shinglesExpr = graft.operators.DedupIndex.ShinglesExpr

  // d01: exact dedup via content hash — keeper id + multiplicity per
  // distinct content, in ONE pass. The group key is the PAIR
  // (xxhash64, crc32) — two independent cheap codegen'd hashes — so a
  // silent merge of two distinct texts needs a simultaneous 96-bit
  // collision (~1e-29 per pair, negligible even at 100 TB row counts;
  // a single 64-bit key would be ~50% at ~5e9 distinct texts). The
  // md5 OUTPUT column rides through the aggregation as a
  // min_by(md5, doc_id) 16-byte digest — measured FASTER at sf100
  // (0.8 s vs 1.3 s) than round 3's join-back form, whose second scan
  // + broadcast join outweighed the per-row md5 it saved. Residual
  // gap vs DuckDB is dictionary-aware grouping + per-action floor,
  // recorded as accepted engine floor in BENCH_NOTES with controls.
  private def d01(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .groupBy(xxhash64(col("text")).as("xh"),
        crc32(col("text").cast(BinaryType)).as("cc"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"),
        min_by(md5(col("text").cast(BinaryType)), col("doc_id")).as("content_hash"))
      .select(col("content_hash"), col("keep_id"), col("n_copies"))
      .orderBy("content_hash")

  // DuckDB has no xxhash64; grouping by the text itself is the same
  // partition of rows (exact content equality), restated with the
  // same hash-once-per-group shape.
  private val d01Sql =
    """SELECT md5(MIN(text)) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY 1""".stripMargin

  /** Per-doc shingle sets, filtered to docs with ≥3 words. */
  /** Documents with the scan width decoupled from the file layout:
    * sf-dir corpora land as ONE parquet file, so every downstream
    * per-doc kernel (shingling, minhashing, simhash votes) would run
    * on a single core straight off the scan (measured: d08's
    * shingle+DF pass was a 5.8 s ONE-TASK stage at sf0.1, twice).
    * A doc_id hash exchange of the compact (doc_id, text) rows is
    * the guide §2.5 input-skew remedy — the same rule
    * Similarity.corpus already applies — and is strictly cheaper
    * than the post-explode exchanges it precedes. The cache marks the
    * exchange as the kernels' INPUT boundary: a bare repartition is
    * defeated by the optimizer, which sinks the deterministic shingle
    * projection below the exchange and serializes it on the 1-task
    * scan side again (measured: the 5.8 s stage just moved into the
    * exchange's map side). Same lifecycle as Similarity.corpus —
    * 2 compact columns, session-owned, rebuilt per bench query after
    * its clearCache. On a production layout (many input files) the
    * scan is already wide and this exchange coalesces per AQE. */
  private def docsWide(s: SparkSession, d: String): DataFrame =
    Tables.loadDocsWide(s, d)

  private def shingled(s: SparkSession, d: String): DataFrame =
    docsWide(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), expr(shinglesExpr).as("sh"))

  // d02: near-dup pairs with exact shingle-Jaccard ≥ 0.9 — the
  // oracle states the full-pairs semantics; the Spark plan reaches the
  // same result set via MinHash-LSH candidates (64 perms, 16 bands ×
  // 4 rows; P[miss | jac ≥ 0.9] = (1−0.9⁴)¹⁶ ≈ 4e-8) + exact verify,
  // i.e. linear scale-out instead of the quadratic cross join.
  /** MinHash-LSH candidates + exact shingle-Jaccard verify: the
    * verified near-dup pair stream shared by d02 (pair audit) and d07
    * (keeper sets). Returns (doc_a, doc_b, inter, uni) sizes. */
  private def verifiedPairs(s: SparkSession, d: String): DataFrame = {
    val sh = shingled(s, d).cache()
    // banding rule owned by operators.DedupIndex (shared with the
    // persisted-index probe, which must sign batches identically)
    val bands = graft.operators.DedupIndex.bandsOf(sh)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jac",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jac") >= 0.9)
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("inter"),
        size(array_union(col("sh_a"), col("sh_b"))).cast("long").as("uni"))
  }

  private def d02(s: SparkSession, d: String): DataFrame =
    verifiedPairs(s, d)
      .select(col("doc_a"), col("doc_b"),
        Q.fixedDec(Q.rhu(col("inter"), col("uni"), 1000L), 3).as("jaccard"))
      .orderBy("doc_a", "doc_b")

  private val d02Sql =
    """WITH s AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
      |  FROM documents WHERE len(string_split(text,' ')) >= 3)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(CAST(CAST(CAST(SIGN(len(list_intersect(a.sh, b.sh))) * FLOOR((ABS(len(list_intersect(a.sh, b.sh))) * 2000 + len(list_distinct(list_concat(a.sh, b.sh)))) / (len(list_distinct(list_concat(a.sh, b.sh))) * 2)) AS BIGINT) AS DECIMAL(38,0)) / 1000 AS DECIMAL(18,3)) AS DOUBLE) AS jaccard
      |FROM s a JOIN s b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.9
      |ORDER BY 1, 2""".stripMargin

  // d08: d02's MinHash-LSH pipeline under a DOCUMENT-FREQUENCY CAP —
  // the standard boilerplate defense (stop-shingle filtering): a
  // shingle occurring in > DfCap documents is corpus boilerplate
  // (navigation chrome, license headers, the salt tokens of the
  // synthetic scaled corpora) and is dropped from every document's
  // set BEFORE minhashing AND from the Jaccard itself — the stated
  // semantics are "similarity over informative shingles". Docs whose
  // whole set is boilerplate drop out (no informative content to
  // match on). Why it matters at 100 TB: boilerplate shared by m docs
  // puts Ω(m²) background pairs at J≈0.1, which band-collide at J⁴
  // per band (measured: d02 burns 234 s at 500 k salted docs on
  // exactly this); capping DF removes those collisions while leaving
  // genuinely-near-dup pairs intact unless their overlap WAS the
  // boilerplate — which is the point. One extra DF aggregation + a
  // semi join, both linear, shuffling on the shingle key.
  //
  // The cap is RELATIVE — max(64, n_docs/1000) — not a fixed
  // constant, and the reason is a measured failure: with a fixed cap
  // of 64 on the 500 k-doc corpus (where every document legitimately
  // has ~100 near-copies, so informative shingles have DF ≈ 100), the
  // cap deleted the SIGNAL and kept only rare boundary noise — every
  // doc collapsed to a 2-3-shingle set, distinct tiny sets formed
  // mega-buckets, and the verify stage went quadratic (spilled out
  // the disk). A boilerplate cap must sit ABOVE the corpus's
  // legitimate duplication multiplicity and scale with corpus size;
  // 0.1% of docs (floor 64) is the standard operating point.
  private def dfCap(nDocs: Long): Long = math.max(64L, nDocs / 1000L)

  private def cappedShingled(s: SparkSession, d: String): DataFrame = {
    val cap = dfCap(docs(s, d).count())
    val ex = shingled(s, d).select(col("doc_id"), explode(col("sh")).as("g"))
    // shingles are distinct per doc, so count(*) per shingle = DF.
    // keep(df ≤ cap) ≡ drop(df > cap), and the two sides differ by
    // orders of magnitude: the over-cap BOILERPLATE set is bounded by
    // occurrences/cap distinct grams (a handful of navigation/license/
    // salt shingles), while the under-cap informative set is nearly
    // every distinct gram in the corpus. Broadcast the side that fits
    // (guide §3.1): an ANTI join against the small boilerplate set
    // replaces the previous SEMI join that broadcast ~2M rare grams
    // (a multi-second serial relation build at sf0.1, unboundedly
    // worse at scale).
    val boil = ex.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") > cap).select("g").cache()
    // LOUD bound before the forced broadcast (the t24/saProbe guard
    // precedent): the over-cap set is bounded by occurrences/cap grams
    // in any sane corpus, but the hint removes the planner's fallback,
    // so verify the premise instead of assuming it. The count runs the
    // DF aggregate once into the (tiny, bounded) cache; the broadcast
    // build below then reads the materialized rows, not a second
    // aggregate pass.
    val nBoil = boil.count()
    val maxBoil = s.conf.getOption("spark.graft.dedupMaxBoilerplateGrams")
      .map(_.toLong).getOrElse(1L << 22)
    require(nBoil <= maxBoil,
      s"DF-cap boilerplate set has $nBoil grams (> $maxBoil broadcast bound): " +
        "the over-cap set should be a handful of boilerplate shingles — " +
        "raise the cap or partition the corpus")
    ex.join(broadcast(boil), Seq("g"), "left_anti")
      .groupBy(col("doc_id")).agg(collect_list(col("g")).as("sh"))
  }

  /** d08's DF-capped verified pair stream (doc_a, doc_b, jaccard) —
    * the SCALE-PATH near-dup pairs (boilerplate shingles capped out,
    * so salted/replicated corpora don't band-collide quadratically) —
    * shared by d08 (pair audit) and d12 (leakage report). */
  private def cappedVerifiedPairs(s: SparkSession, d: String): DataFrame = {
    val sh = cappedShingled(s, d).cache()
    val sig = sh.withColumn("sig", graft.functions.GraftFunctions.minhash64(col("sh")))
    val bands = sig.select(col("doc_id"),
      posexplode(expr(
        "transform(sequence(0, 15), b -> xxhash64(b, sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3]))"))
        .as(Seq("band", "band_hash")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .filter(size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
        size(array_union(col("sh_a"), col("sh_b"))) >= 0.9)
      .select(col("doc_a"), col("doc_b"),
        Q.fixedDec(Q.rhu(size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"),
          size(array_union(col("sh_a"), col("sh_b"))).cast("long"), 1000L), 3).as("jaccard"))
  }

  private def d08(s: SparkSession, d: String): DataFrame =
    cappedVerifiedPairs(s, d).orderBy("doc_a", "doc_b")

  private val d08Sql =
    """WITH s AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
      |  FROM documents WHERE len(string_split(text,' ')) >= 3),
      |ex AS (SELECT doc_id, UNNEST(sh) AS g FROM s),
      |keep AS (SELECT g FROM ex GROUP BY g
      |         HAVING COUNT(*) <= GREATEST(64, CAST(FLOOR((SELECT COUNT(*) FROM documents) / 1000.0) AS BIGINT))),
      |cs AS (SELECT doc_id, list(g) AS sh FROM ex
      |       WHERE g IN (SELECT g FROM keep) GROUP BY doc_id)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(CAST(CAST(CAST(SIGN(len(list_intersect(a.sh, b.sh))) * FLOOR((ABS(len(list_intersect(a.sh, b.sh))) * 2000 + len(list_distinct(list_concat(a.sh, b.sh)))) / (len(list_distinct(list_concat(a.sh, b.sh))) * 2)) AS BIGINT) AS DECIMAL(38,0)) / 1000 AS DECIMAL(18,3)) AS DOUBLE) AS jaccard
      |FROM cs a JOIN cs b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.9
      |ORDER BY 1, 2""".stripMargin

  // d11: SemDeDup-style SEMANTIC dedup over the embeddings table
  // (Abbas et al. 2023, arXiv:2303.09540 — the published recipe for
  // semantic near-dup pruning of web-scale pretraining corpora):
  // k-means-cluster the embedding space, then compare pairs ONLY
  // within a cluster and drop every vector that has a sufficiently
  // cosine-similar cluster-mate. The clustering reuses s03's
  // deterministic fixed-point Lloyd's training (Similarity
  // .trainCodebook — the same procedure that builds the ANN index),
  // and the oracle restates the identical training via
  // Similarity.kmeansAssignCtes, so both engines derive the same cid
  // per vector. Like d06, the query plants a perturbed copy of every
  // vector (+0.02 on dim 1, cos ≈ 0.9997 to its source) so the
  // operator demonstrably separates planted semantic duplicates from
  // the isotropic background at every SF.
  //
  // Deterministic removal contract (id-ordered, order-independent to
  // compute): vec i is REMOVED iff some cluster-mate j < i has
  // cos(i, j) >= 0.8; the reported keeper is the SMALLEST such j and
  // cos_sim is the similarity to that keeper. Keepers of a dup chain
  // are exactly the vecs never appearing in the output's vec_id
  // column. (The paper keeps one arbitrary member per dup group;
  // min-id is the deterministic choice, same rule as d01/d07.)
  //
  // 100 TB shape: one training (KMeansIters corpus scans with a
  // broadcast codebook + one <=k-row shuffle per round), one
  // assignment map, then ONE cid-keyed equi-join shuffle — never a
  // cartesian. Pair work is sum over clusters of |c|^2: with
  // k = ceil(sqrt N) the expected cluster is sqrt(N) and total pair
  // work O(N^1.5) vs the O(N^2) all-pairs sweep (d05's regime); at
  // production scale k is sized N/target_cluster so per-cluster work
  // stays constant and the join is an ordinary keyed shuffle. The
  // known failure mode is a mega-cluster (embedding-space skew) going
  // quadratic — the mitigation is raising k or sub-clustering the hot
  // cluster, the same skew story as LSH hot buckets. Recall bound:
  // pairs split across cluster boundaries are MISSED by design
  // (that's the paper's trade — the near-identical planted pairs
  // land in the same cell because their centroid similarities are
  // near-identical too); d05/d06 remain the exhaustive and sign-LSH
  // sweeps.
  private val SemDedupTau = 0.8

  /** The planted-near-dup training corpus: base ∪ perturbed copy,
    * all-double `v`, ids offset by NDupOffset (d06's construction,
    * with label carried for the chain's column contract). */
  private[queries] def semCorpus(s: SparkSession, d: String): DataFrame = {
    val base = Tables.load(s, d, "embeddings")
      .select(col("vec_id").cast(LongType).as("vec_id"),
        col("label").cast(LongType).as("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val pert = base.select((col("vec_id") + NDupOffset).as("vec_id"), col("label"),
      concat(array(element_at(col("v"), 1) + lit(0.02d)),
        slice(col("v"), 2, 63)).as("v"))
    base.unionByName(pert).repartition(col("vec_id")).cache()
  }

  private def d11(s: SparkSession, d: String): DataFrame = {
    val e = semCorpus(s, d)
    val cents = Similarity.trainCodebook(e)
    val assigned = e.withColumn("cid",
        graft.functions.GraftFunctions.argMaxCosine(col("v"), cents.map(_.toArray)))
      .select(col("cid"), col("vec_id"), col("v"))
    val mate = assigned.select(col("cid").as("cid_r"), col("vec_id").as("j"),
      col("v").as("vj"))
    assigned.join(mate, col("cid") === col("cid_r") && col("j") < col("vec_id"))
      .select(col("vec_id"), col("cid"), col("j"),
        graft.functions.GraftFunctions.cosineSimilarity(col("v"), col("vj")).as("cos"))
      .filter(col("cos") >= SemDedupTau)
      .groupBy(col("vec_id"), col("cid"))
      .agg(min(col("j")).as("keeper_id"), min_by(col("cos"), col("j")).as("kcos"))
      .select(col("vec_id"), col("cid"), col("keeper_id"),
        round(col("kcos"), 6).cast(DecimalType(18, 6)).cast(DoubleType).as("cos_sim"))
      .orderBy("vec_id")
  }

  private def d11Sql: String = {
    // same planted corpus as the Spark side; `v AS embedding`
    // satisfies the chain's column contract (the double view is the
    // only one the chain computes with after the v-based update)
    val veBody =
      """SELECT vec_id, label, v AS embedding, v FROM (
        |    SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |           CAST(label AS BIGINT) AS label,
        |           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |    FROM embeddings
        |    UNION ALL
        |    SELECT CAST(vec_id AS BIGINT) + 1099511627776,
        |           CAST(label AS BIGINT),
        |           [CAST(embedding[1] AS DOUBLE) + 0.02] ||
        |             list_transform(embedding[2:], x -> CAST(x AS DOUBLE))
        |    FROM embeddings) t""".stripMargin
    s"""${Similarity.kmeansAssignCtes(veBody)},
       |pairs AS (
       |  SELECT a.vec_id AS vec_id, a.cid AS cid, b.vec_id AS j,
       |    ${Similarity.cosSql("a.v", "b.v")} AS cos
       |  FROM afinal a JOIN afinal b ON a.cid = b.cid AND b.vec_id < a.vec_id)
       |SELECT vec_id, cid, MIN(j) AS keeper_id,
       |  CAST(CAST(ROUND(arg_min(cos, j), 6) AS DECIMAL(18,6)) AS DOUBLE) AS cos_sim
       |FROM pairs WHERE cos >= $SemDedupTau
       |GROUP BY 1, 2
       |ORDER BY vec_id""".stripMargin
  }

  // d03: the LSH candidate set itself (pre-verification), with shared-
  // band counts — the intermediate a pipeline monitors for bucket
  // skew. Not SQL-expressible (xxhash64) → rows-only.
  private def d03(s: SparkSession, d: String): DataFrame = {
    val sig = shingled(s, d)
      .withColumn("sig", graft.functions.GraftFunctions.minhash64(col("sh")))
    val bands = sig.select(col("doc_id"),
      posexplode(expr(
        "transform(sequence(0, 15), b -> xxhash64(b, sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3]))"))
        .as(Seq("band", "band_hash")))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_bands"))
      .orderBy("doc_a", "doc_b")
  }

  // d04: SimHash — 64-bit bit-vote fingerprint over word-bigram hashes
  // (bigrams, not unigrams: on a shared-vocabulary corpus unigram
  // votes converge to one global fingerprint and the band join goes
  // quadratic); near-dup candidates via 4×16-bit band join + hamming
  // ≤ 6 filter before the pair-dedup (banding trades recall for
  // linearity; complete for hamming ≤ 3 by pigeonhole).
  // Each feature is hashed ONCE (hs), then 64 bit-extractions — not 64
  // re-hashes. Oracle: Python-side recompute (scripts/py_oracles.py;
  // DuckDB has no xxhash64) with a spec-faithful XXH64 and Spark's
  // multi-arg seed chaining, validated against Spark's own vectors.
  private def d04(s: SparkSession, d: String): DataFrame = {
    val withSim = docsWide(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("hs",
        // total index list: a 1-word doc yields NO bigrams (simhash 0)
        // instead of a descending sequence + ANSI index error; the
        // Python oracle's range() over the word list is empty the same
        // way, so the two sides stay in lockstep
        expr("transform(slice(sequence(0, size(ws)), 1, greatest(size(ws) - 1, 0)), " +
          "i -> xxhash64(ws[i], ws[i+1]))"))
      .withColumn("simhash",
        expr("aggregate(sequence(0, 63), 0L, (acc, j) -> acc + " +
          "if(aggregate(hs, 0L, (a, h) -> a + (shiftright(h, j) & 1)) * 2 > size(hs), shiftleft(1L, j), 0L))"))
      .select(col("doc_id"), col("simhash"))
      .cache()
    val chunks = withSim.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), c -> shiftright(simhash, c * 16) & 65535)"))
        .as(Seq("chunk", "chunk_val")))
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.chunk_val") === col("y.chunk_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(expr("x.simhash ^ y.simhash")).cast("long").as("hamming"))
      .filter(col("hamming") <= 6)
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  // d05: embedding near-dup at cosine ≥ 0.45 — EXHAUSTIVE all-pairs by
  // design, value-checked against the quadratic oracle SQL.
  //
  // Why not LSH here: sign-LSH bit-agreement is p = 1 − θ/π, i.e.
  // 0.648 at the 0.45 threshold vs ~0.53–0.60 for this corpus's
  // background (isotropic unit vectors, |cos| mostly < 0.3). With a
  // gap that thin, any band width r selective enough to reject the
  // background (0.55^r ≲ 1/(b·n)) has recall p^r ≈ (0.648)^r ≈ 0 —
  // e.g. r=19, b=96 catches 5% of true pairs, while r small enough to
  // recall (r≤4) puts ~80% of ALL pairs in the candidate set (16
  // buckets per band). Low-threshold dense all-pairs is intrinsically
  // Ω(n²) compute; the LSH regime that IS sub-quadratic (cos ≥ 0.99)
  // is exercised by d06 below via operators.SignLsh.
  //
  // EXECUTION is grid-blocked, not a literal self-cross-join: vectors
  // hash into B ≈ n/8192 blocks; a vector in block g is replicated to
  // the upper-triangle cells (g, j≥g) as the row side and (i<g, g) as
  // the col side, so every unordered pair meets in EXACTLY ONE of the
  // B(B+1)/2 cells (blocks ga≠gb once in cell (min,max); ga=gb on the
  // diagonal, where a triangular loop dedups). Cells shuffle to tasks
  // (several cells per task, each cell two O(n/B) sides ≈ 4 MB), and a
  // mapPartitions kernel runs the per-cell cross product as a tight
  // primitive loop — the same double arithmetic as the VectorDot/
  // VectorNorm expressions (float→double promote, sequential
  // accumulate, dot/(‖x‖·‖y‖)), so results are bit-identical to the
  // expression form, without per-pair join-row machinery. Per-task
  // memory is O(cells/task · n/B) regardless of corpus size; shuffle
  // ≈ n·(B+1)/2 rows spread over distributable cells. At 2 M vectors:
  // B=245, ~30 k cells, ~250 M shuffled rows — a large but ordinary
  // shuffle, where the old cross join either broadcast a 5.5 GB table
  // or fell to a single cartesian stage. Measured at 200 k vectors
  // (sf10, 20 G pairs): see BENCH_NOTES.
  private def d05(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val n = vecCount.computeIfAbsent((d, embeddingsMtime(d)),
      (_: (String, Long)) => Tables.load(s, d, "embeddings").count()).longValue()
    // ~8k vectors per block; floor of 8 keeps ≥36 cells of
    // parallelism at tiny SF
    val b = math.max(8L, math.min(4096L, n / 8192L + 1L)).toInt
    val nCells = b * (b + 1) / 2
    // ~16 cells per task bounds task memory (~70 MB) independent of n
    val nParts = math.max(64, math.min(nCells, nCells / 16 + 1))
    val blk = pmod(xxhash64(col("vec_id")), lit(b)).cast("int")
    val cells = Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"), blk.as("g"))
      .as[(Long, Array[Float], Int)]
      .flatMap { case (id, v, g) =>
        // norm once per source vector — same accumulation order as
        // VectorNorm, carried through the replication
        var ss = 0.0
        var i = 0
        while (i < v.length) { val x = v(i).toDouble; ss += x * x; i += 1 }
        val nm = math.sqrt(ss)
        val out = new Array[(Int, Byte, Long, Array[Float], Double)](b)
        var k = 0
        var j = g
        while (j < b) { out(k) = (g * b + j, 0: Byte, id, v, nm); k += 1; j += 1 }
        var i2 = 0
        while (i2 < g) { out(k) = (i2 * b + g, 1: Byte, id, v, nm); k += 1; i2 += 1 }
        out
      }
    val pairs = cells.toDF("cell", "side", "id", "v", "nm")
      .repartition(nParts, col("cell"))
      .as[(Int, Byte, Long, Array[Float], Double)]
      .mapPartitions { it =>
        val byCell = scala.collection.mutable.HashMap.empty[Int,
          (scala.collection.mutable.ArrayBuffer[(Long, Array[Float], Double)],
            scala.collection.mutable.ArrayBuffer[(Long, Array[Float], Double)])]
        it.foreach { case (cell, side, id, v, nm) =>
          val bufs = byCell.getOrElseUpdate(cell,
            (scala.collection.mutable.ArrayBuffer.empty, scala.collection.mutable.ArrayBuffer.empty))
          (if (side == 0) bufs._1 else bufs._2) += ((id, v, nm))
        }
        def dot(x: Array[Double], y: Array[Double]): Double = {
          val n2 = math.min(x.length, y.length)
          var acc = 0.0
          var i = 0
          while (i < n2) { acc += x(i) * y(i); i += 1 }
          acc
        }
        // unpack each side to flat primitive arrays once per cell so
        // the O(n²/B²) inner loop touches no boxed tuples, and hoist
        // the exact float→double widening out of the pair loop (same
        // values, same accumulation order — bit-identical results)
        final class Side(buf: scala.collection.mutable.ArrayBuffer[(Long, Array[Float], Double)]) {
          val n: Int = buf.length
          val ids = new Array[Long](n)
          val vecs = new Array[Array[Double]](n)
          val norms = new Array[Double](n)
          var i = 0
          while (i < n) {
            val t = buf(i)
            ids(i) = t._1
            val f = t._2
            val dv = new Array[Double](f.length)
            var k = 0
            while (k < f.length) { dv(k) = f(k).toDouble; k += 1 }
            vecs(i) = dv
            norms(i) = t._3
            i += 1
          }
        }
        byCell.iterator.flatMap { case (cell, (b0, b1)) =>
          val diag = (cell / b) == (cell % b)
          val s0 = new Side(b0)
          val s1 = if (diag) s0 else new Side(b1)
          val res = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          var i = 0
          while (i < s0.n) {
            val ia = s0.ids(i)
            val va = s0.vecs(i)
            val na = s0.norms(i)
            var j = if (diag) i + 1 else 0
            while (j < s1.n) {
              val prod = na * s1.norms(j)
              val dv = dot(va, s1.vecs(j))
              // cheap under-approximate gate (margin ≫ fp error of the
              // one division) saves the divide on the ~universal miss
              // path; the exact threshold semantics are unchanged —
              // every near-hit still runs the expression-identical
              // dv/prod >= 0.45 test
              if (dv >= 0.4499 * prod) {
                val cos = dv / prod
                if (cos >= 0.45) {
                  val ib = s1.ids(j)
                  res += ((math.min(ia, ib), math.max(ia, ib), cos))
                }
              }
              j += 1
            }
            i += 1
          }
          res.iterator
        }
      }
    pairs.toDF("vec_a", "vec_b", "cos")
      .select(col("vec_a"), col("vec_b"),
        round(col("cos"), 6).cast(DecimalType(18, 6)).cast(DoubleType).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }

  // d06: embedding near-dup in the regime LSH is FOR — duplicates with
  // small noise (cos ≥ 0.99). The corpus is the embeddings table
  // unioned with a deterministic perturbation of itself (element 1
  // shifted by +0.02 → cos ≈ 0.9998 to its source, background ≤ 0.51),
  // so every vec has exactly one planted near-dup. Spark path:
  // sign-LSH banding + exact-cosine verify of candidates only — one
  // band-join shuffle. Oracle states the quadratic all-pairs
  // semantics.
  //
  // Band width ADAPTS to corpus size — the part fixed-parameter LSH
  // gets wrong at scale: with 16-bit bands, random same-bucket
  // collisions are N²/2¹⁶ per band, which saturates around 10⁶
  // vectors (measured: 2 M + 2 M perturbed vectors → ~30 vectors per
  // bucket → the verify stage went quadratic, 372 s at sf100).
  // Above 500 k vectors the bands widen to 24 bits (collision rate
  // ÷256). Recall cost at the contract threshold cos = 0.99
  // (P[bit agrees] = 1 − θ/π = 0.955): per-pair miss rises from
  // (1−.955¹⁶)¹⁶ ≈ 3e-5 to (1−.955²⁴)¹⁶ ≈ 1.7e-3 — the standard ANN
  // recall trade, stated not silent; at the planted cos 0.9998
  // (p = 0.9936) both settings miss < 1e-13. The oracle-checked SFs
  // (≤ sf0.1, 4 k corpus) stay at 16 bits → result-set equality with
  // the quadratic oracle is unchanged.
  // far above any realistic vec_id (BIGINT) — a small offset would
  // collide with real ids once the corpus exceeds it
  private val NDupOffset = 1L << 40

  private def d06(s: SparkSession, d: String): DataFrame = {
    import graft.functions.GraftFunctions.cosineSimilarity
    val base = Tables.load(s, d, "embeddings")
      .select(col("vec_id").cast(LongType).as("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val pert = base.select((col("vec_id") + NDupOffset).as("vec_id"),
      concat(array(element_at(col("v"), 1) + lit(0.02d)),
        slice(col("v"), 2, 63)).as("v"))
    val corpus = base.unionByName(pert)
    // memoized per (sfDir, mtime): the sizing count is one cheap
    // parquet scan, but re-running it on every plan construction
    // (bench warm-ups, explain paths) would silently tax the measured
    // query; the mtime key catches in-process regeneration
    val corpusVecs = 2L * Dedup.vecCount.computeIfAbsent((d, embeddingsMtime(d)),
      (_: (String, Long)) => Tables.load(s, d, "embeddings").count())
    val bitsPerBand = if (corpusVecs > 500000L) 24 else 16
    val planes = graft.operators.SignLsh.hyperplanes(64, nBands = 16, bitsPerBand = bitsPerBand,
      seed = 0x5eed5L)
    val bands = corpus
      .select(col("vec_id"),
        posexplode(graft.operators.SignLsh.bandValues(col("v"), planes, 16, bitsPerBand))
          .as(Seq("band", "bh")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(corpus.select(col("vec_id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(corpus.select(col("vec_id").as("vec_b"), col("v").as("vb")), "vec_b")
      .withColumn("cos", cosineSimilarity(col("va"), col("vb")))
      .filter(col("cos") >= 0.99)
      .select(col("vec_a"), col("vec_b"),
        round(col("cos"), 6).cast(DecimalType(18, 6)).cast(DoubleType).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }

  private val d06Sql =
    """WITH corpus AS (
      |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |  UNION ALL
      |  SELECT CAST(vec_id AS BIGINT) + 1099511627776,
      |         [CAST(embedding[1] AS DOUBLE) + 0.02] ||
      |           list_transform(embedding[2:], x -> CAST(x AS DOUBLE))
      |  FROM embeddings)
      |SELECT vec_a, vec_b,
      |  CAST(CAST(ROUND(cos, 6) AS DECIMAL(18,6)) AS DOUBLE) AS cos_sim
      |FROM (
      |  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
      |    list_sum(list_transform(range(1, 65), i -> x.v[i] * y.v[i]))
      |    / (sqrt(list_sum(list_transform(x.v, e -> e * e)))
      |     * sqrt(list_sum(list_transform(y.v, e -> e * e)))) AS cos
      |  FROM corpus x JOIN corpus y ON x.vec_id < y.vec_id) p
      |WHERE cos >= 0.99
      |ORDER BY 1, 2""".stripMargin

  // d07: keeper sets — the 100 TB-shaped OUTPUT for near-dup dedup.
  // d02's pair list is the audit view and is quadratic in cluster
  // size; here each connected cluster of the verified near-dup graph
  // (exact Jaccard ≥ 0.9, same contract as d02) collapses to one row
  // (keeper = min doc_id, member count), so the output is linear in
  // the corpus however large the boilerplate clusters grow.
  //
  // CANDIDATE SPARSIFICATION (the part that makes the whole pipeline
  // linear, not just the output): the pairwise band join d02 uses
  // still materializes O(m²) candidates inside an m-member bucket — a
  // 10⁶-copy boilerplate cluster is 5·10¹¹ candidate pairs before CC
  // ever runs. For clustering, that's wasted work: connectivity needs
  // O(m) edges, not all of them. Each LSH bucket therefore emits only
  // rep edges (first member → each other member) + chain edges
  // (consecutive members in sorted order) — ≤ 2 per member — and only
  // THOSE are exact-verified. For buckets of ≤ 3 members this IS the
  // full pair set, so on the oracle-checked SFs (planted clusters of
  // 2-3) the component fixpoint is identical to the all-pairs graph;
  // in general the sparsified graph is component-equal whenever
  // near-dup similarity is locally transitive inside a bucket (the
  // boilerplate/replica case this operator exists for), while an
  // adversarial in-bucket chain-break can under-merge — the
  // exhaustive-pair audit remains d02. A bucket's member list must
  // fit in one row (10⁶ members ≈ 8 MB array vs the 10¹²-row pair
  // blowup it replaces). Clustering is distributed min-label
  // propagation (operators.ConnectedComponents); the oracle states
  // the all-pairs fixpoint with a recursive CTE.
  /** The bucket-sparsified, exact-verified near-dup edge list behind
    * d07 (keeper sets) and c10 (leakage-safe split): rep + chain edges
    * per LSH bucket (≤ 2 per member), exact-Jaccard ≥ 0.9 on just
    * those. Returns (doc_a, doc_b). */
  private def sparseVerifiedEdges(s: SparkSession, d: String): DataFrame = {
    val sh = shingled(s, d).cache()
    val sig = sh.withColumn("sig", graft.functions.GraftFunctions.minhash64(col("sh")))
    val bands = sig.select(col("doc_id"),
      posexplode(expr(
        "transform(sequence(0, 15), b -> xxhash64(b, sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3]))"))
        .as(Seq("band", "band_hash")))
    val sparseEdges = bands
      .groupBy(col("band"), col("band_hash"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ms"))
      .filter(size(col("ms")) > 1)
      .select(explode(expr(
        // rep edges ms[0]->ms[i] plus chain edges ms[i-1]->ms[i]. The
        // chain index list is TOTAL (empty for size(ms) < 2) so a
        // singleton bucket can never hit a descending sequence + ANSI
        // index error even if the size(ms)>1 filter is reordered; the
        // duplicated first edge is dropped by distinct below.
        """concat(
          |  transform(slice(ms, 2, greatest(size(ms) - 1, 0)), m -> struct(ms[0] AS doc_a, m AS doc_b)),
          |  transform(slice(sequence(0, size(ms)), 2, greatest(size(ms) - 1, 0)),
          |    i -> struct(ms[i-1] AS doc_a, ms[i] AS doc_b)))
          |""".stripMargin)).as("e"))
      .select(col("e.doc_a"), col("e.doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
      .distinct()
    sparseEdges
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .filter(size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
        size(array_union(col("sh_a"), col("sh_b"))) >= 0.9)
      .select(col("doc_a"), col("doc_b"))
  }

  private def d07(s: SparkSession, d: String): DataFrame =
    graft.operators.ConnectedComponents.components(sparseVerifiedEdges(s, d))
      .groupBy(col("keeper").as("keeper_id"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy("keeper_id")

  private val d07Sql =
    """WITH RECURSIVE s AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
      |  FROM documents WHERE len(string_split(text,' ')) >= 3),
      |p AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b
      |  FROM s a JOIN s b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.9),
      |e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
      |walk(node, reach) AS (
      |  SELECT a, a FROM e
      |  UNION
      |  SELECT w.node, e.b FROM walk w JOIN e ON e.a = w.reach),
      |labels AS (SELECT node, MIN(reach) AS keeper_id FROM walk GROUP BY node)
      |SELECT keeper_id, COUNT(*) AS n_members FROM labels GROUP BY 1 ORDER BY 1""".stripMargin

  // d12: near-dup LEAKAGE report — which source pairs share verified
  // near-duplicate documents (the "who copied whom" audit a corpus
  // curator runs before assigning per-source mixture weights: a
  // source whose docs near-duplicate another's is double-counting
  // that content in the mixture). Pure composition over the d08
  // DF-CAPPED pair stream — the scale path (identical report on the
  // gate corpus where no shingle hits the cap): two doc-keyed joins
  // attach the sources, pairs are canonicalized (least, greatest) so
  // the report is orientation-free, one |sources|²-bounded aggregate.
  // Same-source internal duplication shows up on the diagonal
  // (s1 = s2) — kept, it is the per-source self-duplication rate.
  // sf10-excluded like the whole d02/d08 pair family: the salted
  // replica gives EVERY doc ~100 near-identical copies, so the
  // verified pair set is ~50·N by construction — a property of the
  // synthetic replication, not of a real corpus or of this plan.
  private def d12(s: SparkSession, d: String): DataFrame = {
    val src = docs(s, d).select(col("doc_id"), col("source"))
    cappedVerifiedPairs(s, d)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_a")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_b")), "doc_b")
      .select(least(col("src_a"), col("src_b")).as("s1"),
        greatest(col("src_a"), col("src_b")).as("s2"))
      .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("n_pairs"))
      .orderBy("s1", "s2")
  }

  private val d12Sql =
    """WITH s AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
      |  FROM documents WHERE len(string_split(text,' ')) >= 3),
      |ex AS (SELECT doc_id, UNNEST(sh) AS g FROM s),
      |keep AS (SELECT g FROM ex GROUP BY g
      |         HAVING COUNT(*) <= GREATEST(64, CAST(FLOOR((SELECT COUNT(*) FROM documents) / 1000.0) AS BIGINT))),
      |cs AS (SELECT doc_id, list(g) AS sh FROM ex
      |       WHERE g IN (SELECT g FROM keep) GROUP BY doc_id),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM cs a JOIN cs b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.9),
      |j AS (
      |  SELECT LEAST(da.source, db.source) AS s1,
      |         GREATEST(da.source, db.source) AS s2
      |  FROM p JOIN documents da ON p.doc_a = da.doc_id
      |         JOIN documents db ON p.doc_b = db.doc_id)
      |SELECT s1, s2, CAST(COUNT(*) AS BIGINT) AS n_pairs
      |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // c10: leakage-safe train/val/test split — the dataset-split stage
  // of corpus assembly. A per-document hash split (the naive rule)
  // LEAKS: two near-duplicate documents hash independently, so one
  // lands in train and its twin in test, and the eval measures
  // memorization (GPT-3's appendix on train-test overlap documents
  // exactly this failure; Dodge et al. 2021 found it throughout C4's
  // users' benchmarks). The fix is to make the NEAR-DUP CLUSTER the
  // unit of assignment: every member inherits its component
  // representative's hash, so a cluster moves atomically and a
  // cross-split pair is impossible FOR PAIRS CONNECTED BY THE
  // SPARSIFIED CLUSTERING (rep/chain edges inside LSH buckets). That
  // conditionality is real: a dissimilar bucket member interleaved in
  // a sorted chain can drop both its incident edges and leave a
  // genuinely-similar pair in different components — which is exactly
  // why the leaked_pairs AUDIT column exists and runs over the
  // EXHAUSTIVE verified pair stream (d02's contract), not the edge
  // subset the clustering used. The certificate of zero leakage is
  // the audited column, not the construction; a nonzero audit at
  // production scale says to densify the bucket edges, not that the
  // operator mis-assigned a cluster. Composition, all existing
  // machinery: cluster =
  // sparseVerifiedEdges + ConnectedComponents (d07's linear path —
  // docs outside any cluster are their own representative via the
  // LEFT join + coalesce), split key = c01's Knuth multiplicative
  // hash of the representative, mod-10 buckets → 80/10/10.
  // Scale: one near-dup clustering (linear, the d07 argument), one
  // doc_id-keyed join of corpus against the label set (labels only
  // cover clustered docs — at real-corpus dup rates a small fraction),
  // a map-side split assignment, a 3-row aggregate, and a pair-stream
  // audit that is itself LSH-bounded. sf10-excluded with the d02/d07
  // family (the salted replica makes every doc a ~100-copy cluster —
  // a property of the synthetic corpus, not the plan).
  private def c10(s: SparkSession, d: String): DataFrame = {
    val labels = graft.operators.ConnectedComponents
      .components(sparseVerifiedEdges(s, d))
    val asg = docs(s, d).select(col("doc_id"), col("n_chars"))
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("keeper"), col("doc_id")))
      .withColumn("bkt", pmod(Q.knuth32(col("rep")), lit(10L)))
      .withColumn("split", when(col("bkt") < 8, lit("train"))
        .when(col("bkt") === 8, lit("val")).otherwise(lit("test")))
      .select(col("doc_id"), col("n_chars"), col("rep"), col("split"))
      .cache()
    // the audit runs over the FULL verified pair set (what the
    // guarantee is about), not the sparse edge subset the clustering
    // used — same set the oracle audits
    val leaked = verifiedPairs(s, d)
      .join(asg.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(asg.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb"))
      .agg(count(lit(1)).as("leaked_pairs"))
    asg.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("rep")).as("n_clusters"),
        sum(col("n_chars")).as("sum_chars"))
      .crossJoin(broadcast(leaked))
      .orderBy("split")
  }

  private val c10Sql =
    """WITH RECURSIVE s AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
      |  FROM documents WHERE len(string_split(text,' ')) >= 3),
      |p AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b
      |  FROM s a JOIN s b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.9),
      |e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
      |walk(node, reach) AS (
      |  SELECT a, a FROM e
      |  UNION
      |  SELECT w.node, e.b FROM walk w JOIN e ON e.a = w.reach),
      |labels AS (SELECT node, MIN(reach) AS keeper_id FROM walk GROUP BY node),
      |sp AS (
      |  SELECT d.doc_id, d.n_chars,
      |         COALESCE(l.keeper_id, d.doc_id) AS rep,
      |         CASE WHEN (COALESCE(l.keeper_id, d.doc_id) * 2654435761) % 4294967296 % 10 < 8 THEN 'train'
      |              WHEN (COALESCE(l.keeper_id, d.doc_id) * 2654435761) % 4294967296 % 10 = 8 THEN 'val'
      |              ELSE 'test' END AS split
      |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.node),
      |leak AS (
      |  SELECT COUNT(*) AS leaked_pairs
      |  FROM p JOIN sp x ON p.a = x.doc_id JOIN sp y ON p.b = y.doc_id
      |  WHERE x.split <> y.split)
      |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(DISTINCT rep) AS BIGINT) AS n_clusters,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  (SELECT CAST(leaked_pairs AS BIGINT) FROM leak) AS leaked_pairs
      |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin


  // d13: INCREMENTAL dedup against the persisted corpus index
  // (operators.DedupIndex) — the dedup family's persisted-index
  // operating mode, completing the (batch, streaming, persisted) ×
  // (dedup, decon, ANN) matrix. The gate splits the table into the
  // EXISTING corpus (doc_id % 7 ≠ 3, whose band postings ensureBuilt
  // persists once) and the incoming BATCH (doc_id % 7 = 3); each
  // batch doc is DROPPED if it near-dups (d02's exact shingle-Jaccard
  // ≥ 0.9) any corpus doc, else if it near-dups an EARLIER-id batch
  // doc (deterministic, non-recursive earlier-id rule — SQL-stateable
  // as one EXISTS, unlike a chained keeper recursion), else KEPT.
  // Plan: the corpus side is ONE postings equi-join (bucket-local,
  // never all-pairs, corpus text touched only at candidate doc_ids);
  // the in-batch side is d02's banding over the batch alone. The
  // oracle states the all-pairs semantics (gate-scale quadratic, the
  // d02 precedent); banding recall at J ≥ 0.9 is the same 4e-8 bound.
  // Output: per-source batch accounting (n_new / dup-vs-corpus /
  // dup-in-batch / kept).
  private def d13(s: SparkSession, d: String): DataFrame = {
    import graft.operators.DedupIndex
    val dir = DedupIndex.ensureBuilt(s, d)
    val newDocs = docs(s, d)
      .filter(pmod(col("doc_id"), lit(7L)) === 3)
      .select(col("doc_id"), col("source"))
    val sh = shingled(s, d).cache()
    val shNew = sh.join(newDocs.select("doc_id"), Seq("doc_id"), "left_semi")
    def jacGe09(a: Column, b: Column): Column =
      size(array_intersect(a, b)).cast(DoubleType) / size(array_union(a, b)) >= 0.9
    val vsCorpus = DedupIndex.candidates(s, dir, shNew)
      .join(sh.select(col("doc_id").as("new_id"), col("sh").as("sh_a")), "new_id")
      .join(sh.select(col("doc_id").as("idx_id"), col("sh").as("sh_b")), "idx_id")
      .filter(jacGe09(col("sh_a"), col("sh_b")))
      .select(col("new_id").as("doc_id")).distinct()
    val bn = DedupIndex.bandsOf(shNew)
    val inBatch = bn.as("x").join(bn.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .filter(jacGe09(col("sh_a"), col("sh_b")))
      .select(col("doc_b").as("doc_id")).distinct()
    newDocs
      .join(vsCorpus.withColumn("vc", lit(1L)), Seq("doc_id"), "left")
      .join(inBatch.withColumn("ib", lit(1L)), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_new"),
        sum(when(col("vc").isNotNull, 1L).otherwise(0L)).as("n_dup_vs_corpus"),
        sum(when(col("vc").isNull && col("ib").isNotNull, 1L).otherwise(0L))
          .as("n_dup_in_batch"),
        sum(when(col("vc").isNull && col("ib").isNull, 1L).otherwise(0L))
          .as("n_kept"))
      .orderBy("source")
  }

  private val d13Sql =
    """WITH s AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
      |  FROM documents WHERE len(string_split(text,' ')) >= 3),
      |nd AS (SELECT doc_id, source FROM documents WHERE doc_id % 7 = 3),
      |sn AS (SELECT * FROM s WHERE doc_id % 7 = 3),
      |so AS (SELECT * FROM s WHERE doc_id % 7 <> 3),
      |vc AS (SELECT DISTINCT a.doc_id FROM sn a JOIN so b
      |       ON CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.9),
      |ib AS (SELECT DISTINCT b.doc_id FROM sn a JOIN sn b
      |       ON a.doc_id < b.doc_id
      |      AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.9)
      |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_new,
      |  CAST(SUM(CASE WHEN v.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_vs_corpus,
      |  CAST(SUM(CASE WHEN v.doc_id IS NULL AND i.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_in_batch,
      |  CAST(SUM(CASE WHEN v.doc_id IS NULL AND i.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM nd d LEFT JOIN vc v ON d.doc_id = v.doc_id
      |          LEFT JOIN ib i ON d.doc_id = i.doc_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // d14: ARBITRARY-LENGTH duplicated-substring discovery — the
  // question d09's fixed-k gram ownership cannot ask ("what are the
  // longest verbatim repeats in this corpus, whatever their length"):
  // build the generalized suffix array distributedly
  // (operators.GeneralizedSuffixArray — prefix doubling, one keyed
  // exchange per round, dense ranks without a global sort), then the
  // classic property that every longest repeat is the LCP of two
  // ADJACENT suffixes in SA order. Candidate pruning: adjacent pairs
  // share a ≥32-char prefix iff their round-32 ranks are equal, so
  // text is fetched (capped at 2048 chars) only for those pairs; the
  // exact LCP runs through the codegen functions.CommonPrefixLen
  // kernel. Output: the top-20 repeats of length ≥ 32 as
  // (lcp, doc_a, off_a, doc_b, off_b), SA-adjacent pair order,
  // deterministic tie-breaks. Oracle: an independent pure-Python
  // suffix sort + adjacent-LCP recompute (scripts/py_oracles.py) —
  // DuckDB cannot materialize the O(n²) suffix relation.
  /** The SA-family kernel: SA-adjacent candidate pairs =
    * (doc_a, off_a, doc_b, off_b, lcp) with the exact LCP (capped at
    * 2048 chars) for every SA-adjacent pair whose rank32 matches (a
    * ≥32-char LCP is impossible otherwise, so text is fetched only
    * for these candidates); (doc_b, off_b) is always the SA-LATER
    * suffix of the pair. Shared by d14's fresh-build form and the
    * persisted-index forms (d15/d16/d17/d18), so all derive the
    * identical pair set from whichever array backs them. */
  private def adjacentLcpFrom(sa: DataFrame, base: DataFrame): DataFrame = {
    // SA adjacency in ONE range exchange (optimization round 18, guide
    // §2.4): ranks are a 0..n−1 permutation, so SA-adjacency ==
    // consecutive rows in rank order. The former self-join exchanged
    // the corpus-sized array TWICE (rank and rank−1 keys) and
    // merge-joined; here the array is range-exchanged once, each
    // partition pairs consecutive rows locally, and cross-partition
    // adjacency comes from ONE collected first-row per partition
    // (fixed width — the denseRank two-pass driver bound). Both RDD
    // passes hang off the same RDD, so the second reuses the first's
    // shuffle files (no re-exchange). rank32-equal pruning and the
    // capped text fetch are unchanged.
    val s = sa.sparkSession
    val parts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ordRdd = sa
      .select(col("rank").cast(LongType), col("doc_id").cast(LongType),
        col("off").cast(LongType), col("rank32").cast(LongType))
      .repartitionByRange(parts, col("rank"))
      .sortWithinPartitions(col("rank"))
      .rdd
    val firsts: Array[(Int, (Long, Long, Long, Long))] =
      ordRdd.mapPartitionsWithIndex { (pid, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          val r = it.next()
          Iterator((pid, (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
        }
      }.collect().sortBy(_._1)
    val nextFirst: Map[Int, (Long, Long, Long, Long)] =
      (0 until firsts.length - 1).map(j => firsts(j)._1 -> firsts(j + 1)._2).toMap
    val bcNext = s.sparkContext.broadcast(nextFirst)
    val candsRdd = ordRdd.mapPartitionsWithIndex { (pid, it) =>
      val tail = bcNext.value.get(pid)
      var prevD = 0L; var prevO = 0L; var prev32 = 0L; var has = false
      def pair(r: Long, d: Long, o: Long, r32: Long): Option[org.apache.spark.sql.Row] = {
        val res =
          if (has && prev32 == r32)
            Some(org.apache.spark.sql.Row(r, prevD, prevO, d, o))
          else None
        prevD = d; prevO = o; prev32 = r32; has = true
        res
      }
      it.flatMap(rr =>
        pair(rr.getLong(0), rr.getLong(1), rr.getLong(2), rr.getLong(3))) ++
        tail.iterator.flatMap { case (r, d, o, r32) => pair(r, d, o, r32) }
    }
    val cands = s.createDataFrame(candsRdd,
      org.apache.spark.sql.types.StructType(
        Seq("b_rank", "doc_a", "off_a", "doc_b", "off_b").map(
          org.apache.spark.sql.types.StructField(_, LongType, nullable = false))))
    val ta = base.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
    val tb = base.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
    cands.join(ta, Seq("doc_a")).join(tb, Seq("doc_b"))
      .select(col("b_rank"),
        col("doc_a"), col("off_a"), col("doc_b"), col("off_b"),
        graft.functions.GraftFunctions.commonPrefixLen(
          expr("substring(text_a, cast(off_a + 1 as int), 2048)"),
          expr("substring(text_b, cast(off_b + 1 as int), 2048)")).as("lcp"))
  }

  /** The d14 report tail: top-20 repeats ≥ 32, deterministic order. */
  private def d14Top(pairs: DataFrame): DataFrame =
    pairs
      .filter(col("lcp") >= 32)
      .select(col("lcp"), col("doc_a"), col("off_a"), col("doc_b"), col("off_b"))
      .orderBy(desc("lcp"), col("doc_a"), col("off_a"), col("doc_b"), col("off_b"))
      .limit(20)

  private def d14(s: SparkSession, d: String): DataFrame = {
    // plain load: the build widens its own explode internally (the
    // GeneralizedSuffixArray scan-width gate) and the pair text fetch
    // is scan-only behind a broadcast — A/B'd (r18) against the
    // widened+cached load, a wash (13.96 vs 14.07 s warm), so the
    // simpler no-cache form stays
    val base = docs(s, d).select(col("doc_id"), col("text"))
    // the fresh-build form (d17 is the persisted-index twin): the
    // array lands in a CORPUS-KEYED dir (overwritten per run, so
    // repeated runs never accumulate copies) that OUTLIVES the
    // returned frame — the cached ≤20-row report's lineage still
    // reads it, so a dropped cache block (eviction, executor loss)
    // recomputes through live files instead of failing on a deleted
    // path (the round-15 ADVICE class); a shutdown hook retires the
    // dir with the JVM. The report frame stays cached — 20 rows —
    // and keeps the real plan visible to PlanAudit.
    val saDir = graft.operators.ArtifactDir.dirFor(d, "documents.parquet", "d14sa")
    d14DirHook.getOrElseUpdate(saDir, {
      sys.addShutdownHook(
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(saDir)): Unit)
      ()
    })
    val sa = graft.operators.GeneralizedSuffixArray.build(base, Some(s"$saDir/sa"))
    val report = d14Top(adjacentLcpFrom(sa, base)).cache()
    report.count()
    sa.unpersist()
    report
  }

  /** One shutdown-hook registration per d14 SA dir (see d14). */
  private val d14DirHook = scala.collection.concurrent.TrieMap.empty[String, Unit]

  // d17: the PERSISTED-INDEX form of the SA family — the SA in the
  // build-once / derive-many operating mode (operators.SuffixArrayIndex,
  // the s06/t19/d13/t26 pattern): a corpus snapshot's array is built
  // and written ONCE (17 min at sf10), and the derived questions —
  // here the d14 repeat report, via the SAME shared adjacentLcpFrom/
  // d14Top derivation — are linear passes over the loaded artifact.
  // The construction is deterministic, so report-from-index equals a
  // fresh d14 exactly — which is how the oracle states the check
  // (d14's Python suffix sort, the t26→t24 precedent). Bench charges
  // the build to its own metric (d17_sa_index_build); the query line
  // is the derive cost a repeated analysis actually pays.
  private def d17(s: SparkSession, d: String): DataFrame = {
    val dir = graft.operators.SuffixArrayIndex.ensureBuilt(s, d)
    val base = docs(s, d).select(col("doc_id"), col("text"))
    d14Top(adjacentLcpFrom(graft.operators.SuffixArrayIndex.load(s, dir), base))
  }

  // d15: exact-substring REMOVAL on the suffix array — the operation
  // d14's report only diagnoses, and the Lee et al. ("Deduplicating
  // Training Data Makes Language Models Better") ExactSubstr step
  // d09/d10 approximate with fixed-5-gram ownership. Contract: a
  // suffix whose LCP with its SA-PREDECESSOR is ≥ 32 chars loses that
  // shared prefix — by the classic SA property LCP(i−1, i) =
  // max_{j<i} LCP(j, i), that removes from every duplicated-substring
  // occurrence exactly the longest prefix that already occurred at an
  // SA-earlier suffix, so the SA-first occurrence (smallest (suffix,
  // doc_id, off)) is the deterministic keeper and every later one is
  // scrubbed. Per doc the marked spans [off, off+lcp) are UNION-merged
  // (overlaps collapse) and the cleaned text is the complement,
  // stitched by substring — never a per-character explode. LCPs cap
  // at 2048 (the d14 cap; both sides state it). Scale: candidate
  // pruning + one spans aggregate (bounded by per-doc span count) +
  // one doc-keyed left join; no new shuffle shapes over d14.
  // Oracle: the d14 Python suffix sort extended with the same
  // predecessor-LCP spans + merge + stitch (scripts/py_oracles.py) —
  // DuckDB cannot materialize the suffix relation.
  /** Per-doc UNION-merge of (doc_id, st, en) spans: one sorted fold,
    * bounded by the doc's span count (CASE guards the empty-
    * accumulator element_at). Returns (doc_id, iv: array<struct>).
    * Shared by d15 (removal spans) and d16 (contamination spans). */
  private def mergedSpans(spans: DataFrame): DataFrame =
    spans.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("st"), col("en")))).as("sp"))
      .select(col("doc_id"), expr(
        """aggregate(sp,
          |  cast(array() as array<struct<st:bigint,en:bigint>>),
          |  (acc, x) -> case
          |    when size(acc) > 0 and x.st <= element_at(acc, -1).en then
          |      concat(slice(acc, 1, size(acc) - 1),
          |        array(named_struct('st', element_at(acc, -1).st,
          |          'en', greatest(element_at(acc, -1).en, x.en))))
          |    else concat(acc, array(x)) end)""".stripMargin).as("iv"))

  private def d15(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("source"), col("text"))
    d15From(s, d, base)
  }

  /** d15 body over the PERSISTED suffix-array index (build-once /
    * derive-many — the d17 pattern, round-14 verdict item 1): the
    * corpus snapshot's SA is a deterministic artifact, so removal-
    * from-index equals removal-from-a-fresh-build exactly (spec-
    * asserted; the Python oracle states the result either way), and a
    * repeated removal question pays the ~1-min derive, not the
    * ~17-min sf10 construction. Shared with c16's funnel stage.
    * `base` must cover the FULL documents set the index was built
    * over (the pair text fetch inner-joins it). */
  private[queries] def d15From(s: SparkSession, d: String, base: DataFrame): DataFrame = {
    val idxDir = graft.operators.SuffixArrayIndex.ensureBuilt(s, d)
    val sa = graft.operators.SuffixArrayIndex.load(s, idxDir)
    // pair text fetch stays on the PLAIN load: the candidate side is
    // broadcast, so the corpus side is scan-only — A/B'd (r18) and the
    // widened load's exchange+cache never pays for itself here
    val pairs = adjacentLcpFrom(sa, base.select(col("doc_id"), col("text")))
    // materialize the (small: one row per duplicated-span occurrence)
    // span set to parquet — reading the spans back cuts the lineage,
    // so nothing SA-derived stays recomputable-by-accident (the
    // round-13 ADVICE leak class); the dir is corpus-keyed and
    // overwritten per run, never accumulating
    val spansDir = graft.operators.ArtifactDir.dirFor(d, "documents.parquet", "d15spans")
    pairs.filter(col("lcp") >= 32)
      .select(col("doc_b").as("doc_id"), col("off_b").as("st"),
        (col("off_b") + col("lcp")).as("en"))
      .write.mode("overwrite").parquet(spansDir)
    val spans = s.read.parquet(spansDir)
    // union-merge the per-doc spans: one sorted fold, bounded by the
    // doc's span count (CASE guards the empty-accumulator element_at)
    val merged = mergedSpans(spans)
    val out = base.join(merged, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("source"),
        length(col("text")).cast(LongType).as("n_chars"),
        spanCharsSum.as("n_removed"),
        cleanStitch.as("text_clean"))
      .orderBy("doc_id")
    out
  }

  /** Total chars covered by the merged spans `iv` (0 when none). */
  private def spanCharsSum: Column =
    coalesce(expr("aggregate(iv, 0L, (a, x) -> a + x.en - x.st)"), lit(0L))

  /** The substring-algebra stitch: `text` with the merged spans `iv`
    * cut out — a bounded fold over the doc's own span list, NEVER a
    * per-character explode (PlanAudit pins). Shared by d15 and d18. */
  private def cleanStitch: Column =
    when(col("iv").isNull, col("text")).otherwise(expr(
      """aggregate(iv, named_struct('p', 0L, 't', ''),
        |  (a, x) -> named_struct('p', x.en,
        |    't', concat(a.t, substring(text, cast(a.p + 1 as int),
        |                               cast(x.st - a.p as int)))),
        |  a -> concat(a.t, substring(text, cast(a.p + 1 as int), 1073741823)))"""
        .stripMargin))

  // d16: EXACT-SUBSTRING decontamination — the cross-corpus form of
  // the d15 machinery, and the exact-match analog of t08/t16/t19's
  // gram/Bloom decontamination (the "remove training documents that
  // contain verbatim eval text" appendix check of the big-LM papers):
  // for every EVAL document (the t08 split, doc_id % 37 = 0), the
  // character spans that appear VERBATIM (≥ 32 chars, capped 2048) in
  // some TRAIN document. On the generalized SA the shared length of
  // an eval suffix with the NEAREST train suffix on one side in SA
  // order is the running MIN of boundary LCPs since that train suffix
  // (and nearest is optimal — mins only shrink with SA distance), so
  // two directional gated-min scans in rank order compute, for EVERY
  // eval suffix, the longest prefix it shares with ANY train suffix.
  // Exactness with the rank32-pruned boundary LCPs: an emitted length
  // m ≥ 32 forces every boundary in its min-chain to carry lcp ≥ 32,
  // hence rank32-equal, hence exactly computed — boundaries below 32
  // (absent candidates, stored 0) can only appear in chains whose min
  // is < 32, which the threshold drops on both engines identically.
  // Scale: the scans are the denseRank two-pass shape (range exchange
  // + bounded per-partition summary + driver composition + broadcast
  // second pass — driver state ≤ |partitions| rows); spans merge with
  // d15's per-doc fold; output one row per eval doc. Oracle: the d14
  // Python suffix sort extended with the same two scans
  // (scripts/py_oracles.py) — DuckDB cannot materialize the relation.
  private def d16(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d).select(col("doc_id"), col("source"), col("text"))
    // d16 too derives from the PERSISTED index (round-14 verdict item
    // 1): it needs the SA's rank column, which the artifact carries;
    // decontamination-from-index == fresh (deterministic
    // construction, spec-asserted), at the derive cost
    val merged = crossSharedSpans(s, d,
      resetSide = pmod(col("doc_id"), lit(37L)) =!= 0L, prefix = "d16spans")
    all.filter(pmod(col("doc_id"), lit(37L)) === 0L)
      .join(merged, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("source"),
        length(col("text")).cast(LongType).as("n_chars"),
        spanCharsSum.as("n_contam_chars"),
        coalesce(size(col("iv")).cast(LongType), lit(0L)).as("n_spans"))
      .orderBy("doc_id")
  }

  /** The d16/d18 scan composition over the persisted SA index: for
    * every suffix on the EMIT side, the longest prefix shared with
    * ANY suffix on the RESET side (`resetSide` true rows), as merged
    * per-doc spans (doc_id, iv) — two directional gated-min scans in
    * rank order ([[scanSharedWithTrain]]; state resets to ∞ on reset-
    * side rows, gate-mins along boundary LCPs on emit-side rows),
    * spans ≥ 32 union-merged after a corpus-keyed parquet handoff
    * under `prefix` (the d15 lineage cut). */
  private def crossSharedSpans(s: SparkSession, d: String,
      resetSide: Column, prefix: String): DataFrame = {
    val idxDir = graft.operators.SuffixArrayIndex.ensureBuilt(s, d)
    val sa = graft.operators.SuffixArrayIndex.load(s, idxDir)
    val base = docs(s, d).select(col("doc_id"), col("text"))
    val pairs = adjacentLcpFrom(sa, base)
    val bnd = pairs.select(col("b_rank"), col("lcp"))
    val lab = sa.select(col("rank"), col("doc_id"), col("off"),
      resetSide.as("train"))
    // BOTH boundary LCPs attach in ONE corpus-sized join pass —
    // ascending scan reads the rank-r boundary (b_rank = r) as
    // `lcpIn`, the descending scan the rank-(r+1) boundary as
    // `lcpOut`; the second bnd join reuses the rank partitioning of
    // the first, and the cached result feeds BOTH directional range
    // exchanges (previously each scan re-joined the corpus-sized lab
    // from scratch — one full sort-merge pass over every suffix,
    // twice; at 226 M suffixes that join was ~1/4 of the d16 derive)
    val both = lab
      .join(bnd.select(col("b_rank").as("rank"), col("lcp").as("lcpIn")),
        Seq("rank"), "left")
      .join(bnd.select((col("b_rank") - 1).as("rank"), col("lcp").as("lcpOut")),
        Seq("rank"), "left")
      .na.fill(0L, Seq("lcpIn", "lcpOut"))
      .cache()
    // BOTH directions in ONE range exchange (optimization round 18,
    // guide §2.4): the fused scan emits max(forward, backward) per
    // suffix directly, so the union+groupBy merge of the two
    // directional outputs disappears with the second exchange. The
    // fusion is segment-bounded (pass 1 measures the longest emit
    // run; the reset density — 36/37 for d16, 1/37 for d18 — keeps
    // real segments tiny) and FALLS BACK to the two-exchange
    // GatedMinScan form when the driver-side check trips (an
    // adversarial run length), so no task ever buffers unboundedly.
    val spansDir = graft.operators.ArtifactDir.dirFor(d, "documents.parquet", prefix)
    val (fused, fusedCache) = graft.operators.GatedMinScan.scanBoth(both
      .select(col("rank").as("ord"), col("doc_id"), col("off"),
        col("train"), col("lcpIn"), col("lcpOut")))
    fused match {
      case Some(m) =>
        // materialize the (small: one row per shared-span suffix)
        // span set, then retire the scan + join caches (the d15
        // handoff; the SA itself is the persisted artifact — nothing
        // of it is cached)
        m.select(col("doc_id"), col("off").as("st"),
            (col("off") + col("m")).as("en"))
          .write.mode("overwrite").parquet(spansDir)
        Seq(fusedCache, both).foreach(_.unpersist())
      case None =>
        fusedCache.unpersist()
        val (l, lc) = scanSharedWithTrain(both
          .select(col("rank").as("ord"), col("doc_id"), col("off"),
            col("train"), col("lcpIn")))
        val (r, rc) = scanSharedWithTrain(both
          .select((-col("rank")).as("ord"), col("doc_id"), col("off"),
            col("train"), col("lcpOut").as("lcpIn")))
        l.unionByName(r).groupBy(col("doc_id"), col("off"))
          .agg(max(col("m")).as("m"))
          .select(col("doc_id"), col("off").as("st"),
            (col("off") + col("m")).as("en"))
          .write.mode("overwrite").parquet(spansDir)
        Seq(lc, rc, both).foreach(_.unpersist())
    }
    mergedSpans(s.read.parquet(spansDir))
  }

  // d18: TRAIN-side exact decontamination — the APPLY form of d16's
  // report, and the operation a pipeline actually runs before
  // training: remove from every TRAIN document the character spans
  // (≥ 32, capped 2048) that appear VERBATIM in ANY eval document
  // (the t08 split), keeping the train text otherwise intact —
  // d16 tells you WHICH eval docs leaked; d18 produces the train
  // corpus with the leaked passages cut out (the decontamination
  // appendix remedy of the big-LM papers, at exact-substring
  // precision instead of d09/t08's fixed-gram approximation).
  // Composition of proven parts: the same two directional gated-min
  // scans with the ROLES INVERTED (state resets on EVAL suffixes,
  // emits train suffixes — crossSharedSpans is parametric in the
  // reset side), d15's union-merge + substring-algebra stitch.
  // Scale: identical shapes to d16 + d15's stitch join; the SA is
  // the persisted artifact. Oracle: the d16 Python scans with roles
  // swapped + the d15 stitch (scripts/py_oracles.py) — DuckDB cannot
  // materialize the suffix relation.
  private def d18(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d).select(col("doc_id"), col("source"), col("text"))
    val merged = crossSharedSpans(s, d,
      resetSide = pmod(col("doc_id"), lit(37L)) === 0L, prefix = "d18spans")
    all.filter(pmod(col("doc_id"), lit(37L)) =!= 0L)
      .join(merged, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("source"),
        length(col("text")).cast(LongType).as("n_chars"),
        spanCharsSum.as("n_scrubbed"),
        cleanStitch.as("text_clean"))
      .orderBy("doc_id")
  }

  /** One directional gated-min scan (see d16) — the machinery is the
    * SA family's single-owner [[graft.operators.GatedMinScan]] (shared
    * with d19's incremental probe); this alias keeps the d16/d18 call
    * sites reading as before. */
  private def scanSharedWithTrain(rows: DataFrame): (DataFrame, DataFrame) =
    graft.operators.GatedMinScan.scan(rows)

  /** d19's deterministic "new crawl batch": one synthesized doc per
    * corpus doc with doc_id % 53 == 7, its text a novel-filler frame
    * around TWO verbatim slices of the source doc — the first always
    * ≥ 40 code points (detectable under the ≥32 contract), the second
    * 24..87 (detectable only when ≥ 32, and absent for short docs),
    * so matched, sub-threshold, and no-second-span cases all occur.
    * Batch docs are NOT in the index (novel framing), which is the
    * point of the probe; the Python oracle restates this construction
    * code-point-for-code-point (Spark substring/pmod == Python
    * slicing/% on non-negatives). Shared with SuffixArrayProbeSpec. */
  private[graft] def d19Batch(s: SparkSession, d: String): DataFrame =
    docs(s, d).filter(pmod(col("doc_id"), lit(53L)) === 7L)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        concat(
          lit("novel-head-"), col("doc_id").cast(StringType), lit("-xq "),
          expr("substring(text, 11, cast(40 + pmod(doc_id, 160) as int))"),
          lit(" plugh-"), col("doc_id").cast(StringType), lit("-mid "),
          expr("substring(text, 211, cast(24 + pmod(doc_id, 64) as int))"),
          lit(" novel-tail-zz")).as("text"))

  // d19: INCREMENTAL cross-corpus probe — the SA family's missing
  // operating mode (round-15 verdict item 1, the d13/t19/s06 pattern):
  // a new crawl batch is checked for verbatim spans (≥ 32 chars,
  // capped 2048 — d16's contract) shared with the PERSISTED corpus
  // index WITHOUT rebuilding it — batch onboarding pays a linear
  // probe (one filtered scan of the index's prefix-hash sidecar +
  // work proportional to the pruned union), not the 17-min-class sf10
  // reconstruction over corpus ∪ batch. Method + exactness argument:
  // operators.SuffixArrayIndex.probe. Output: the d16-shaped report,
  // one row per batch doc. Oracle: an INDEPENDENT Python recompute —
  // sorted corpus suffixes, each batch suffix bisected in, max LCP of
  // the two insertion neighbors (the classic nearest-in-SA-order
  // property), spans merged (scripts/py_oracles.py) — a different
  // algorithm than the engine's pruned-union scans, so agreement
  // checks the semantics, not the implementation.
  /** d19's probe + report body over an arbitrary batch frame
    * (doc_id, text) — shared by batch d19 and the at-ingest twin
    * (streaming.StreamingSaProbe): spans are PER-DOC (a batch doc's
    * chains depend only on its own text and the corpus index — emit-
    * side rows never reset a scan), so any partition of the batch
    * into micro-batches unions to exactly the one-shot report. */
  private[graft] def d19ReportFrom(s: SparkSession, d: String,
      batch: DataFrame, spansDir: String,
      sidecar: Option[DataFrame] = None): DataFrame = {
    val merged = mergedSpans(
      graft.operators.SuffixArrayIndex.probe(s, d, batch, spansDir, sidecar))
    batch.join(merged, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        length(col("text")).cast(LongType).as("n_chars"),
        spanCharsSum.as("n_contam_chars"),
        coalesce(size(col("iv")).cast(LongType), lit(0L)).as("n_spans"))
  }

  private def d19(s: SparkSession, d: String): DataFrame =
    d19ReportFrom(s, d, d19Batch(s, d),
      graft.operators.ArtifactDir.dirFor(d, "documents.parquet", "d19spans"))
      .orderBy("doc_id")

  override def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d14_longest_dup_substrings" -> d14,
    "d16_exact_decontamination" -> d16,
    "d19_sa_probe_decontamination" -> d19,
    // streaming twin: the probe applied at ingest (foreachBatch class
    // — per-doc outputs union to the one-shot report exactly), so
    // d19's Python oracle checks it too
    "d19_probe_stream" ->
      ((s, d) => graft.streaming.StreamingSaProbe.replayGate(s, d)),
    "d17_sa_index_report" -> d17,
    "d18_train_decontamination" -> d18,
    "d15_substring_removal" -> d15,
    "c10_leakage_safe_split" -> c10,
    "d12_neardup_leakage" -> d12,
    "d01_exact_dedup_hash" -> d01,
    "d02_minhash_jaccard_pairs" -> d02,
    "d03_lsh_candidates" -> d03,
    "d04_simhash_pairs" -> d04,
    "d05_embedding_neardup" -> d05,
    "d06_signlsh_neardup" -> d06,
    "d07_neardup_keeper_sets" -> d07,
    "d08_minhash_dfcap" -> d08,
    "d11_semantic_dedup" -> d11,
    "d13_incremental_dedup" -> d13)

  // Quadratic by definition — the oracle states the all-pairs
  // semantics; see d05's scaladoc for why sub-quadratic banding cannot
  // apply at this threshold on isotropic vectors.
  private val d05Sql =
    """SELECT vec_a, vec_b,
      |  CAST(CAST(ROUND(cos, 6) AS DECIMAL(18,6)) AS DOUBLE) AS cos_sim
      |FROM (
      |  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(x.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(y.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
      |  FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id) p
      |WHERE cos >= 0.45
      |ORDER BY 1, 2""".stripMargin

  override def oracle: Map[String, String] = Map(
    "c10_leakage_safe_split" -> c10Sql,
    "d12_neardup_leakage" -> d12Sql,
    "d01_exact_dedup_hash" -> d01Sql,
    "d02_minhash_jaccard_pairs" -> d02Sql,
    "d05_embedding_neardup" -> d05Sql,
    "d06_signlsh_neardup" -> d06Sql,
    "d07_neardup_keeper_sets" -> d07Sql,
    "d08_minhash_dfcap" -> d08Sql,
    "d11_semantic_dedup" -> d11Sql,
    "d13_incremental_dedup" -> d13Sql)
}
