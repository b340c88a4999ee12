package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan audit: asserts the scale-critical plan properties
  * (filter/column pushdown to parquet, broadcast joins for dims,
  * whole-stage codegen coverage) for representative queries and
  * prints a report. Run: `sbt "runMain graft.PlanAudit [sfDir]"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var failures = 0
    // codegen stages print as "WholeStageCodegen (n)" in formatted
    // mode and as "*(n)" markers in the simple plan string
    val codegenCheck: String => Boolean =
      s => s.contains("WholeStageCodegen") || "\\*\\(\\d+\\)".r.findFirstIn(s).isDefined
    // Negative/counting checks (no exchange beyond k, no
    // single-partition window) are only meaningful on the SIMPLE plan
    // string: formatted explain prints node names and their arguments
    // on separate lines, so markers like "Exchange hashpartitioning"
    // never co-occur there and a not-exists/count predicate would be
    // VACUOUSLY true through the p(formatted) || p(plan) OR. These
    // helpers reject the formatted representation (identified by its
    // header) so the OR falls through to the simple string.
    val simpleOnly: (String => Boolean) => String => Boolean = p => s =>
      !s.contains("== Physical Plan ==") && p(s)
    // a ReusedExchange line repeats its referent's description text,
    // so count only lines that EXECUTE an exchange
    def maxHashExchanges(k: Int): String => Boolean = simpleOnly(s =>
      s.split("== Initial Plan ==").head.split("\n")
        .count(l => l.contains("Exchange hashpartitioning") &&
          !l.contains("ReusedExchange")) <= k)
    val noSinglePartitionWindow: String => Boolean = simpleOnly(s =>
      !s.split("\n").sliding(6).exists(w =>
        w.head.contains("Window") && w.exists(_.contains("SinglePartition"))))
    // simple-plan lines carry tree-drawing prefixes ("+- ", ":- ",
    // "*(3) ") before the node name — trim().startsWith(node) never
    // matches, making negative checks vacuous; strip them first
    def nodeIs(line: String, node: String): Boolean =
      line.replaceAll("""^[\s:+\-*()\d]*""", "").startsWith(node)
    def audit(name: String)(checks: (String, String => Boolean)*): Unit = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      // execute THIS QueryExecution first (collect, not a write —
      // writes clone the plan): AQE finalizes the adaptive plan and
      // inserts the WholeStageCodegen stages only on execution
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val formatted = try df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      catch { case _: Throwable => plan }
      checks.foreach { case (desc, p) =>
        val ok = p(formatted) || p(plan)
        if (!ok) failures += 1
        println(f"[plan] ${if (ok) "PASS" else "FAIL"}%s  $name%-28s $desc")
      }
    }

    // Q6-shape: pure filter+agg — predicates and projection must reach
    // the parquet scan.
    audit("h06_filter_agg")(
      "filters pushed to scan" -> (_.contains("PushedFilters: [IsNotNull(l_shipdate)")),
      "column-pruned read (4 cols)" -> (s =>
        s.contains("ReadSchema") && !s.contains("l_orderkey")),
      "whole-stage codegen" -> codegenCheck)

    // dim joins must broadcast, not shuffle, the small side
    audit("q01_rate_avg_2level")(
      "customer dim broadcast" -> (_.contains("BroadcastHashJoin")))
    audit("h03_topk_join")(
      "filtered dim broadcast" -> (_.contains("BroadcastHashJoin")),
      "shipdate filter pushed" -> (_.contains("PushedFilters: [IsNotNull(l_shipdate)")))
    audit("h05_join_chain")(
      ">=3 broadcast joins in chain" -> (s =>
        "BroadcastHashJoin".r.findAllIn(s).size >= 3),
      "orderdate filter pushed" -> (_.contains("GreaterThanOrEqual(o_orderdate")))
    audit("q07_latest_per_key_join")(
      "dims broadcast around window" -> (s =>
        "BroadcastHashJoin".r.findAllIn(s).size >= 2))
    audit("q16b_in_subquery_semi")(
      "semi join broadcasts aggregated side" -> (s =>
        s.contains("BroadcastHashJoin") && s.contains("LeftSemi")))
    audit("h04_exists_semi")(
      "exists as semi join" -> (_.contains("LeftSemi")),
      "quantity filter pushed" -> (_.contains("GreaterThanOrEqual(l_quantity,45")))

    // aggregates must be partial+final (map-side combine)
    audit("h01_pricing_summary")(
      "partial aggregation" -> (_.contains("HashAggregate")),
      "codegen'd agg" -> codegenCheck)

    // top-k: sort only after aggregation, with limit
    audit("h10_returned_topk")(
      "TakeOrderedAndProject (no full sort)" -> (_.contains("TakeOrderedAndProject")))

    // w04 deciles: the global rank must be distributed — a window with
    // no PARTITION BY would plan Exchange SinglePartition under a
    // WindowExec (all rows on one task at any scale). The rewrite
    // range-partitions and ranks per range, so every Window keeps a
    // partition key.
    audit("w04_ntile_deciles")(
      "no single-partition window" -> noSinglePartitionWindow,
      "windows are partitioned (pid)" -> (s =>
        !s.contains("Window [") || s.contains("windowspecdefinition(pid")))

    // q05 sums the JSON-extracted column twice (bytes + kbps): the
    // parse must stay ONE Project expression per row, not be collapsed
    // into per-aggregate re-evaluation (each plan node prints at most
    // twice in the AQE tree — >4 occurrences would mean duplication).
    audit("q05_flow_timeseries")(
      "JSON parsed once per row" -> (s =>
        "get_json_object".r.findAllIn(s).size <= 4))

    // w05 grouped top-k: must plan as a partial+final object aggregate
    // (bounded k-row map-side buffers) with NO window node — the
    // whole point vs the rank-window form.
    audit("w05_topk_per_group")(
      "partial+final object aggregate" -> (s =>
        "ObjectHashAggregate".r.findAllIn(s).size >= 2),
      "no window node" -> (s => !s.contains("Window")))

    // a05 as-of: the self-as-of merge must read events ONCE (one
    // scan, one exchange), plan the custom merge node (no window /
    // sort-merge-join fallback), and prune the events scan to the
    // three used columns through the custom node (AsOfMergePruning +
    // ColumnPruning in the same batch)
    audit("a05_asof_join")(
      // count scans in the FINAL plan only (the AQE string repeats
      // the tree under "== Initial Plan ==")
      "single-scan as-of merge" -> (s => {
        val finalPlan = s.split("== Initial Plan ==").head
        finalPlan.contains("AsOfMerge") &&
          "Scan parquet".r.findAllIn(finalPlan).size == 1
      }),
      "no window/join fallback" -> (s =>
        !s.contains("Window") && !s.contains("SortMergeJoin")),
      "events scan pruned through as-of (no props/value)" -> (s =>
        !s.contains("props") && !s.contains("value#")))

    // h19's OR-of-conjunctions spans both sides; the common l_partkey
    // equi-join must still be extracted (no cartesian/nested-loop)
    audit("h19_disjunctive_pred")(
      "equi-join extracted from disjunction" -> (_.contains("BroadcastHashJoin")),
      "no cartesian fallback" -> (s =>
        !s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin")))

    // h21's EXISTS/NOT-EXISTS pair is collapsed to a per-order profile
    // over lineitem semi-joined to the candidate order keys: the fact
    // must cross no sort-merge self-join (the literal EXISTS form
    // planned two full self exchanges), the anti-exists must be an
    // aggregate, and every join side that can broadcast must
    audit("h21_only_returner")(
      // l1 + the profile probe: exactly two lineitem reads, plus
      // orders/supplier/nation — the literal EXISTS form scans the
      // fact three times and exchanges it twice
      "fact scanned at most twice (≤5 scans total)" -> (s => {
        val finalPlan = s.split("== Initial Plan ==").head
        "Scan parquet".r.findAllIn(finalPlan).size <= 5
      }),
      "per-order profile aggregated" -> (_.contains("HashAggregate")),
      "key-set semi + dims broadcast" -> (s =>
        s.contains("BroadcastHashJoin") && s.contains("LeftSemi")))

    // h02: the correlated-min must be ONE pass — a per-partkey window
    // over the joined relation, not a second lineitem scan + self-join
    audit("h02_min_supplier_part")(
      "single lineitem scan" -> (s => {
        val finalPlan = s.split("== Initial Plan ==").head
        "Scan parquet".r.findAllIn(finalPlan).size <= 4 // lineitem+3 dims
      }),
      "windowed min keyed by part" -> (_.contains("windowspecdefinition(p_partkey")))

    // t08: the eval-gram side of the decontamination join must NOT be
    // a hardcoded broadcast — at 100 TB the eval split exceeds the
    // driver; Spark may still choose broadcast at this SF, but the
    // semi join itself has to be present
    audit("t08_decontamination")(
      "gram probe is a semi join" -> (_.contains("LeftSemi")))

    // the tf-pair scan kernels (WordTfPairs/BigramTfPairs) generate
    // code (no CodegenFallback), so the scan→project→explode stage
    // must sit INSIDE a WholeStageCodegen span: in the simple plan
    // every operator line mentioning the kernel carries a *(n) marker
    val tfPairsFused: String => Boolean = simpleOnly(s =>
      // the expressions print as wordtfpairs(...)/bigramtfpairs(...);
      // codegen markers only exist in the FINAL adaptive plan
      s.split("== Initial Plan ==").head
        .split("\n").filter(l => l.toLowerCase.contains("tfpairs(") &&
          // scan nodes echo the kernel in DataFilters but are the
          // columnar INPUT to a WSCG stage, never marker-carrying
          !l.contains("FileScan")) match {
        case ls if ls.isEmpty => false // kernel absent = regression
        case ls => ls.forall(l => "\\*\\(\\d+\\)".r.findFirstIn(l).isDefined)
      })
    audit("t05_bigram_profile")(
      "tf-pair kernel fused into WSCG scan stage" -> tfPairsFused)
    audit("t12_bm25_topk")(
      "tf-pair kernel fused into WSCG scan stage" -> tfPairsFused)

    // a USER-written window-form top-k (the w05 idiom spelled as
    // row_number + filter) must hit plans.TopKRewrite in the default
    // session — the extension is registered above, not per-test
    {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy("o_orderpriority").orderBy(desc("score"), col("tie"))
      val df = Tables.load(spark, sfDir, "orders")
        .withColumn("score", coalesce(col("o_totalprice").cast("double"), lit(0.0)))
        .withColumn("tie", coalesce(col("o_orderkey"), lit(0L)))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val checks = Seq(
        "rewritten to bounded aggregate" ->
          ("ObjectHashAggregate".r.findAllIn(plan).size >= 2),
        "no window node in user query" -> !plan.contains("Window"))
      checks.foreach { case (desc, ok) =>
        if (!ok) failures += 1
        println(f"[plan] ${if (ok) "PASS" else "FAIL"}%s  user_window_topk            $desc")
      }
    }

    // round-5 operators: the blocked all-pairs sweep must run as an
    // equi-join/kernel plan (no cartesian or nested-loop stage — the
    // exact walls the grid blocking removes), the DF-cap dedup keeps
    // its cap as a semi join, and the stratified sampler broadcasts
    // its per-stratum quotas
    audit("d05_embedding_neardup")(
      "no cartesian/nested-loop stage" -> (s => {
        val finalPlan = s.split("== Initial Plan ==").head
        !finalPlan.contains("CartesianProduct") &&
          !finalPlan.contains("BroadcastNestedLoopJoin")
      }))
    // semantic dedup's pair stage is a cid-keyed equi self-join —
    // within-cluster pairs only, never a corpus cross product
    audit("d11_semantic_dedup")(
      "pair stage is a cid equi join (no cartesian)" -> (s => {
        val finalPlan = s.split("== Initial Plan ==").head
        !finalPlan.contains("CartesianProduct") &&
          !finalPlan.contains("BroadcastNestedLoopJoin")
      }))
    // leakage report rides d02's banded pair stream — same guarantee
    audit("d12_neardup_leakage")(
      "banded candidates (no cartesian)" -> (s => {
        val finalPlan = s.split("== Initial Plan ==").head
        !finalPlan.contains("CartesianProduct") &&
          !finalPlan.contains("BroadcastNestedLoopJoin")
      }))
    // the DF cap drops boilerplate grams via an ANTI join against the
    // SMALL over-cap set (broadcast the side that fits — round 17;
    // previously a semi join that broadcast the huge under-cap set)
    audit("d08_minhash_dfcap")(
      "DF cap as anti join vs the small boilerplate set" ->
        (_.contains("LeftAnti")),
      "no cartesian stage" -> (s =>
        !s.split("== Initial Plan ==").head.contains("CartesianProduct")))
    // incremental dedup: the corpus side must be ONE postings
    // equi-join (bucket-local banding, never all-pairs against the
    // corpus), decisions are left equi joins
    audit("d13_incremental_dedup")(
      "postings probe + verify stay equi-joined (no cartesian)" -> (s => {
        val finalPlan = s.split("== Initial Plan ==").head
        !finalPlan.contains("CartesianProduct") &&
          !finalPlan.contains("BroadcastNestedLoopJoin")
      }))
    // leakage-safe split: clustering + assignment stay equi-joined;
    // the only nested-loop stage allowed is the single-row audit
    // broadcast (leaked_pairs attached to the 3-row report)
    audit("c10_leakage_safe_split")(
      "no cartesian product" -> (s =>
        !s.split("== Initial Plan ==").head.contains("CartesianProduct")),
      "only the 1-row audit broadcast is nested-loop" -> simpleOnly(s =>
        s.split("== Initial Plan ==").head.split("\n")
          .count(l => l.contains("BroadcastNestedLoopJoin") &&
            !l.contains("ReusedExchange")) <= 1),
      "rep assignment is a left equi join" -> (_.contains("LeftOuter")))
    // time-to-convert: quantiles resolve over HISTOGRAM rows (domain-
    // bounded), never a per-user sort; one user exchange feeds every
    // funnel stage, histogram agg + its cohort window are the rest
    audit("w13_time_to_convert")(
      "no single-partition window" -> noSinglePartitionWindow,
      "user exchange + histogram agg + cohort window only" -> maxHashExchanges(3),
      "quantile windows keyed by cohort" ->
        (_.contains("windowspecdefinition(cohort_day#")))
    // the e2e funnel composes audited stage shapes: decon grams die
    // scan-side at the bloom probe, the mixture rank is the bounded
    // TopK aggregate (never a rank window), the only window in the
    // whole 12-stage plan is the pack stage's (source, shard)-keyed
    // prefix scan (c03's audited shape) plus the sharder's pid-keyed
    // rank (c09's audited shape), dedup/decon/mixture survivor
    // filtering is semi/anti equi joins
    audit("c11_pipeline_e2e")(
      "bloom probe reaches the gram scan" -> (_.contains("might_contain")),
      "mixture rank is the bounded TopK aggregate (no rank window)" -> (s =>
        s.split("\n").filter(_.contains("windowspecdefinition")).forall(l =>
          l.contains("windowspecdefinition(source") ||
            l.contains("windowspecdefinition(pid"))),
      "no single-partition window" -> noSinglePartitionWindow,
      "no cartesian product" -> (s =>
        !s.split("== Initial Plan ==").head.contains("CartesianProduct")),
      "survivor filters are semi/anti joins" -> (s =>
        s.contains("LeftSemi") && s.contains("LeftAnti")))
    audit("c01_stratified_sample")(
      "per-stratum quotas broadcast" -> (_.contains("BroadcastHashJoin")))
    // temperature mixture reuses c01's rank selection; the τ-weighted
    // quota table (one row per stratum) must reach the rank filter as
    // a broadcast, and the rank window must stay lang-keyed
    audit("c07_temperature_mixture")(
      "temperature quotas broadcast" -> (_.contains("BroadcastHashJoin")),
      "bounded TopK aggregate (no rank window)" -> (s =>
        "ObjectHashAggregate".r.findAllIn(s).size >= 2 &&
          !s.contains("Window")))

    // c13 cluster mixture: same τ-mixture machinery keyed by the
    // k-means cid — the per-cluster rank must be the bounded TopK
    // aggregate (a rank window would shuffle the corpus into |k|
    // partitions) and the quota join a broadcast
    audit("c13_cluster_mixture")(
      "temperature quotas broadcast" -> (_.contains("BroadcastHashJoin")),
      "bounded TopK aggregate (no rank window)" -> (s =>
        "ObjectHashAggregate".r.findAllIn(s).size >= 2 &&
          !s.contains("Window")))

    // d14 suffix-array repeats: the LCP stage must stay equi-join-only
    // (rank adjacency + the two text fetches — a cartesian or nested
    // loop means candidates degenerated to all-pairs), and the exact
    // compare must run through the codegen prefix kernel
    audit("d14_longest_dup_substrings")(
      "LCP stage equi-join only (no cartesian / nested loop)" -> simpleOnly(s => {
        val fin = s.split("== Initial Plan ==").head
        !fin.contains("CartesianProduct") && !fin.contains("BroadcastNestedLoop")
      }),
      "common-prefix kernel planned" -> (s =>
        s.toLowerCase.contains("commonprefixlen")))

    // d15 substring removal: the visible plan is the span-merge +
    // stitch stage (the SA build is materialized behind the spans
    // parquet handoff) — it must stay a doc-keyed aggregate + ONE
    // doc-keyed outer equi join, never a cartesian / nested loop, and
    // never a per-character explode (the stitch is substring algebra)
    audit("d15_substring_removal")(
      "no cartesian / nested loop" -> simpleOnly(s => {
        val fin = s.split("== Initial Plan ==").head
        !fin.contains("CartesianProduct") && !fin.contains("BroadcastNestedLoop")
      }),
      "doc-keyed span aggregate" -> (s =>
        s.contains("sort_array") || s.contains("collect_list")),
      "no per-character explode in the stitch" -> simpleOnly(s =>
        !s.split("== Initial Plan ==").head.split("\n")
          .exists(l => nodeIs(l, "Generate") && l.contains("posexplode"))))

    // d16 exact decontamination: the visible plan is the span-merge +
    // eval-doc report (the SA + directional scans are materialized
    // behind the spans parquet handoff; the scans themselves are the
    // denseRank two-pass shape, never a Window) — one doc-keyed
    // aggregate + one doc-keyed outer equi join, no cartesian, and
    // the eval-split filter must reach the parquet scan
    audit("d16_exact_decontamination")(
      "no cartesian / nested loop" -> simpleOnly(s => {
        val fin = s.split("== Initial Plan ==").head
        !fin.contains("CartesianProduct") && !fin.contains("BroadcastNestedLoop")
      }),
      "no single-partition window" -> noSinglePartitionWindow,
      "doc-keyed span aggregate" -> (s =>
        s.contains("sort_array") || s.contains("collect_list")))

    // c16 substring-dedup funnel: the visible plan is d15's span-merge
    // + stitch feeding the stage aggregates (gate/dedup/split) — one
    // union of keyed aggregates, doc-keyed equi joins only, no
    // cartesian, no single-partition window (the split is a groupBy,
    // never a rank window over the corpus)
    audit("c16_pipeline_substr")(
      "no cartesian / nested loop" -> simpleOnly(s => {
        val fin = s.split("== Initial Plan ==").head
        !fin.contains("CartesianProduct") && !fin.contains("BroadcastNestedLoop")
      }),
      "no single-partition window" -> noSinglePartitionWindow,
      "doc-keyed span aggregate" -> (s =>
        s.contains("sort_array") || s.contains("collect_list")),
      "no per-character explode in the stitch" -> simpleOnly(s =>
        !s.split("== Initial Plan ==").head.split("\n")
          .exists(l => nodeIs(l, "Generate") && l.contains("posexplode"))))

    // d18 train-side decontamination: d16's scan composition (roles
    // inverted) + d15's stitch — same pins as both: one doc-keyed
    // aggregate + one doc-keyed outer equi join, no cartesian, no
    // single-partition window, and the stitch is substring algebra
    // (never a per-character explode)
    audit("d18_train_decontamination")(
      "no cartesian / nested loop" -> simpleOnly(s => {
        val fin = s.split("== Initial Plan ==").head
        !fin.contains("CartesianProduct") && !fin.contains("BroadcastNestedLoop")
      }),
      "no single-partition window" -> noSinglePartitionWindow,
      "doc-keyed span aggregate" -> (s =>
        s.contains("sort_array") || s.contains("collect_list")),
      "no per-character explode in the stitch" -> simpleOnly(s =>
        !s.split("== Initial Plan ==").head.split("\n")
          .exists(l => nodeIs(l, "Generate") && l.contains("posexplode"))))

    // d19 incremental SA probe: the visible plan is the span-merge +
    // per-batch-doc report (the probe's pruned-union scans are
    // materialized behind the spans parquet handoff, the d15/d16
    // discipline) — one doc-keyed aggregate + one doc-keyed outer
    // equi join over the BATCH, no cartesian, no single-partition
    // window; the persisted index itself is never rebuilt (asserted
    // separately below: probing again must not touch dir/sa)
    audit("d19_sa_probe_decontamination")(
      "no cartesian / nested loop" -> simpleOnly(s => {
        val fin = s.split("== Initial Plan ==").head
        !fin.contains("CartesianProduct") && !fin.contains("BroadcastNestedLoop")
      }),
      "no single-partition window" -> noSinglePartitionWindow,
      "doc-keyed span aggregate" -> (s =>
        s.contains("sort_array") || s.contains("collect_list")))
    // the probe's contract is INCREMENTAL onboarding: a second probe
    // against the same corpus must leave the persisted array's files
    // untouched (mtime-stable) — the rebuild it exists to avoid
    locally {
      val saDir = new java.io.File(
        graft.operators.SuffixArrayIndex.indexDirFor(sfDir), "sa")
      def sig = Option(saDir.listFiles()).getOrElse(Array.empty[java.io.File])
        .map(f => (f.getName, f.lastModified, f.length)).sortBy(_._1).toSeq
      val before = sig
      SparkEntry.queries("d19_sa_probe_decontamination")(spark, sfDir).collect()
      val ok = before.nonEmpty && sig == before
      if (!ok) failures += 1
      println(f"[plan] ${if (ok) "PASS" else "FAIL"}%s  d19_sa_probe_decontamination repeat probe leaves the persisted array untouched")
    }

    // c14 curriculum shards: the difficulty total order must come from
    // the bounded-grid rank (per-(qs, pid) windows + the broadcast
    // offset join), never a single-partition window over the corpus
    audit("c14_curriculum_shards")(
      "no single-partition window" -> noSinglePartitionWindow,
      "offset table broadcast" -> (_.contains("BroadcastHashJoin")),
      "char-bigram scan kernel planned" -> (s =>
        s.toLowerCase.contains("charbigramtfpairs")))

    // t24 quality-classifier distillation: the leaf report (and each
    // training level, same shape) is ONE map-side-combined aggregate
    // over the cached feature frame — the RepetitionStats kernel feeds
    // the features, nothing windows or sort-merge-joins the corpus,
    // and the only hash exchanges are the node-keyed partial/final
    // aggregate pair (the 1-row accuracy frame rides a broadcast)
    audit("t24_quality_classifier")(
      "repetition-stats kernel planned" -> (s =>
        s.toLowerCase.contains("repetitionstats")),
      "no corpus window / shuffle join" -> (s =>
        !s.contains("Window") && !s.contains("SortMergeJoin")),
      "node aggregate exchanges only" -> maxHashExchanges(2))
    // exact correlation: one scan into a |groups|-key aggregate of six
    // integer sufficient statistics — no joins, no window
    audit("a10_exact_corr")(
      "single scan aggregate (no joins)" -> simpleOnly(s =>
        !s.split("== Initial Plan ==").head.split("\n")
          .exists(l => l.contains("Join"))),
      "one hash exchange" -> maxHashExchanges(1),
      "no window node" -> (s => !s.contains("Window")))
    // gap-fill: last-reading pick is a struct-max AGGREGATE (never a
    // window over raw events); the LOCF window runs over the
    // span-bounded grid, keyed by type
    audit("w11_gapfill_locf")(
      "no single-partition window" -> noSinglePartitionWindow,
      "grid equi join (no cartesian)" -> (s => {
        val fin = s.split("== Initial Plan ==").head
        !fin.contains("CartesianProduct") &&
          !fin.contains("BroadcastNestedLoopJoin")
      }))
    // ship-lag quantiles: the merge must not re-sort the facts and the
    // cumsum windows run over histogram rows keyed by priority
    audit("h23_shiplag_quantiles")(
      "no single-partition window" -> noSinglePartitionWindow,
      "no cartesian / nested loop" -> (s => {
        val fin = s.split("== Initial Plan ==").head
        !fin.contains("CartesianProduct") &&
          !fin.contains("BroadcastNestedLoopJoin")
      }))
    // path mining: user-keyed lag windows (never single-partition),
    // tiny path-keyed count, bounded TakeOrdered
    audit("w12_event_paths")(
      "no single-partition window" -> noSinglePartitionWindow,
      "bounded TakeOrdered result" -> (_.contains("TakeOrderedAndProject")))
    // exact mode: two-level histogram aggregate — both exchanges carry
    // aggregated (group, value) rows, never raw facts, and the argmax
    // is a struct-min aggregate, not a rank window
    audit("a09_mode_per_group")(
      "no window node" -> (s => !s.contains("Window")),
      "two histogram exchanges max" -> maxHashExchanges(2))
    // epoch mixture: base replication is a broadcast join + bounded
    // sequence explode; the rem-extras selection rides the same
    // bounded TopK aggregate as c07 — never a corpus-wide rank window
    audit("c08_epoch_mixture")(
      "per-stratum allocation broadcast" -> (_.contains("BroadcastHashJoin")),
      "bounded TopK aggregate (no rank window)" -> (s =>
        "ObjectHashAggregate".r.findAllIn(s).size >= 2 &&
          !s.contains("Window")))
    // corpus shard manifest: the global pseudorandom rank must come
    // from the pid-keyed window over the static hash-uniform range
    // split (+ driver prefix offsets) — NEVER a single-partition
    // window or a global sort of the corpus; exchange budget = the
    // pid window's clustering + the shard_id aggregate
    audit("c09_corpus_shards")(
      "rank window keyed by pid" -> (_.contains("windowspecdefinition(pid#")),
      "no single-partition window" -> noSinglePartitionWindow,
      "pid window + shard agg exchanges only" -> maxHashExchanges(2))
    // the gate battery is one scan-side projection (kernel + substring
    // probes) into a |sources|-key aggregate — any join or second
    // exchange means a rule leaked into a per-doc lookup
    audit("t20_gopher_gates")(
      "no joins (single scan aggregate)" -> simpleOnly(s =>
        !s.split("== Initial Plan ==").head.split("\n")
          .exists(l => l.contains("Join"))),
      "one hash exchange" -> maxHashExchanges(1),
      "whole-stage codegen" -> codegenCheck)
    // the range join must run as an equi join on the time bin — the
    // whole point of the binning is that Spark would otherwise plan
    // the BETWEEN predicate as a nested-loop/cartesian stage
    audit("r01_range_join")(
      "binned equi join (no nested loop)" -> (s => {
        val finalPlan = s.split("== Initial Plan ==").head
        !finalPlan.contains("CartesianProduct") &&
          !finalPlan.contains("BroadcastNestedLoopJoin")
      }))
    // interval×interval overlap must likewise stay an equi join on
    // the bin — a non-equi session self-join would nested-loop
    audit("r02_interval_overlap")(
      "binned equi join (no nested loop)" -> (s => {
        val finalPlan = s.split("== Initial Plan ==").head
        !finalPlan.contains("CartesianProduct") &&
          !finalPlan.contains("BroadcastNestedLoopJoin")
      }))
    // packing's prefix scan must run as keyed windows, never a
    // single-partition window
    audit("c03_token_packing")(
      "no single-partition window" -> noSinglePartitionWindow,
      "window keyed by (source, shard)" -> (s =>
        !s.contains("Window [") || s.contains("windowspecdefinition(source")))

    // mixture fill must broadcast the 1-row corpus total and key its
    // prefix scan by source (never a single-partition window)
    audit("c04_mixture_budget")(
      "corpus total broadcast" -> (_.contains("BroadcastNestedLoopJoin")),
      "no single-partition window" -> noSinglePartitionWindow)
    // span removal: every stage is an equi join / hash aggregate over
    // gram or doc keys — a cartesian anywhere means the ownership
    // formulation degenerated to all-pairs
    audit("d09_span_removal")(
      "no cartesian / nested-loop stage" -> (s => {
        val finalPlan = s.split("== Initial Plan ==").head
        !finalPlan.contains("CartesianProduct") &&
          !finalPlan.contains("BroadcastNestedLoopJoin")
      }),
      "whole-stage codegen" -> codegenCheck)
    // exact quantiles: the percentile table and group totals are
    // broadcast-sized by construction; the in-bin resolution window
    // must stay keyed (g, pct, bin), never a global sort
    audit("a07_exact_quantiles")(
      "pct x group-total cross is broadcast" -> (_.contains("BroadcastNestedLoopJoin")),
      "no single-partition window" -> noSinglePartitionWindow)
    // retention: one user-keyed exchange must serve the distinct, the
    // per-user min and the self-join — the repartition(user_id) exists
    // precisely so the (user, day) distinct doesn't force its own
    // wider-keyed shuffle, so exactly two hash exchanges total (the
    // user repartition + the small final (cohort, offset) aggregate)
    audit("w06_retention_cohorts")(
      "single user-keyed exchange + final agg only" -> maxHashExchanges(2))
    // funnel: every stage join/aggregate rides the one up-front
    // user_id repartition; only the day-cardinality final aggregate
    // may add a hash exchange
    audit("w07_conversion_funnel")(
      "stage pipeline exchange-free after user repartition" -> maxHashExchanges(2))

    // triangle census: the wedge self-join and the closing-edge join
    // must be equi joins (the degree orientation exists to avoid the
    // neighborhood product); nested loops may appear ONLY as the
    // final one-row scalar crosses of the three aggregate totals
    audit("g04_triangle_census")(
      "no cartesian stage" -> (s =>
        !s.split("== Initial Plan ==").head.contains("CartesianProduct")),
      "wedge + closing joins are hash equi joins" -> (s => {
        val finalPlan = s.split("== Initial Plan ==").head
        ("SortMergeJoin".r.findAllIn(finalPlan).size +
          "BroadcastHashJoin".r.findAllIn(finalPlan).size +
          "ShuffledHashJoin".r.findAllIn(finalPlan).size) >= 2
      }))
    // sliding windows: both output families must aggregate against
    // LOW-cardinality keys only — the per-(hop, type) totals explode
    // runs over totals (not events), and distinct-users is the
    // interval sweep (lag/lead boundary deltas + prefix sum), so the
    // O(rows)-key (window, type, user) dedup aggregate the naive
    // count-distinct plans must NEVER appear; never an Expand either
    audit("w08_sliding_windows")(
      "no Expand (single-distinct two-level agg)" -> simpleOnly(s =>
        !s.split("== Initial Plan ==").head.split("\n")
          .exists(nodeIs(_, "Expand"))),
      // alias-proof: in the shipped plan user_id occurs ONLY as a
      // window partition key (the sweep) / exchange key — it must
      // never be a GROUPING key of any aggregate (Hash, Sort or
      // ObjectHash), which is what every naive count-distinct or
      // (window, user) dedup plan needs regardless of how the window
      // column is aliased
      "no O(rows)-key dedup agg: user_id never an aggregate grouping key" ->
        simpleOnly(s => !s.split("== Initial Plan ==").head.split("\n")
          .exists { l =>
            val k = l.indexOf("Aggregate(keys=[")
            k >= 0 && {
              val keys = l.substring(k + "Aggregate(keys=[".length)
              val end = keys.indexOf(']')
              (if (end >= 0) keys.substring(0, end) else keys)
                .contains("user_id#")
            }
          }),
      // anchored to the sweep's window SPEC (lag/lead over a window
      // partitioned by user_id), not just the `hop` alias — though the
      // alias is also pinned by a comment at the w08 definition
      "interval-sweep windows present (lag + lead over user partition)" ->
        (s => s.split("\n").exists(l => l.contains("lag(hop") &&
            l.contains("windowspecdefinition(user_id#")) &&
          s.split("\n").exists(l => l.contains("lead(hop") &&
            l.contains("windowspecdefinition(user_id#"))),
      "one data-sized + four partial exchanges max" ->
        maxHashExchanges(5))

    // a08 grouping sets: the ×|sets| Expand must feed the PARTIAL
    // aggregate inside the scan stage, so the one data-sized exchange
    // ships partially-aggregated (group, set) rows — never ×3 raw rows
    audit("a08_grouping_sets")(
      "Expand plans the grouping sets" -> simpleOnly(s =>
        s.split("== Initial Plan ==").head.split("\n")
          .exists(nodeIs(_, "Expand"))),
      "one hash exchange (partial agg above Expand)" -> maxHashExchanges(1))

    // w09 attribution: both touch windows share one user_id-keyed
    // exchange + sort; the only other hash exchange is the |types|²-row
    // final aggregate
    audit("w09_attribution")(
      "touch windows keyed by user_id" -> (_.contains("windowspecdefinition(user_id#")),
      "no single-partition window" -> noSinglePartitionWindow,
      "one data-sized + one final-agg exchange" -> maxHashExchanges(2))

    // t14 ranking must come from the two-level histogram idiom: every
    // window is keyed by lang or (lang, freq) — never corpus- or
    // vocab-sized in one partition
    audit("t14_zipf_rank_profile")(
      "rank windows keyed by lang" -> (_.contains("windowspecdefinition(lang#")),
      "no single-partition window" -> noSinglePartitionWindow)

    // t15 gram ownership: the occurrences⋈owner join stays a gram-keyed
    // equi join — no cartesian / nested-loop anywhere
    audit("t15_ngram_novelty")(
      "no cartesian / nested loop" -> simpleOnly(s => {
        val fin = s.split("== Initial Plan ==").head
        !fin.contains("CartesianProduct") && !fin.contains("BroadcastNestedLoop")
      }))

    // t17 provenance: bloom probe scan-side like t16; the per-train
    // argmax is the PackedPairArgmax kernel — no window, no pair-
    // count aggregate map; CORPUS-side exchange budget = ONE hash
    // exchange (the kernel's packed-key repartition; the near-unique
    // pair cardinality made the old pair-agg + argmax-agg pair of
    // exchanges the dominant cost — see the operator scaladoc).
    // The benchmark-side eval-df cap (gram-df aggregate + semi join)
    // lives inside the CACHED evalPairs build — its exchanges run
    // once at cache materialization over benchmark-bounded data and
    // print as InMemoryRelation innerChildren BELOW the relation
    // node, so the corpus budget is counted on the plan truncated at
    // the first InMemoryRelation line (every corpus-side exchange
    // sits above the cached-table join in this tree).
    audit("t17_contamination_provenance")(
      "bloom probe (might_contain) planned" -> (_.contains("might_contain")),
      "no rank window anywhere" -> simpleOnly(s =>
        !s.split("== Initial Plan ==").head.split("\n")
          .exists(nodeIs(_, "Window"))),
      "no cartesian / nested loop" -> simpleOnly(s => {
        val fin = s.split("== Initial Plan ==").head
        !fin.contains("CartesianProduct") && !fin.contains("BroadcastNestedLoop")
      }),
      "one corpus-side hash exchange (packed kernel)" -> simpleOnly(s =>
        s.split("== Initial Plan ==").head.split("\n")
          .takeWhile(!_.contains("InMemoryRelation"))
          .count(l => l.contains("Exchange hashpartitioning") &&
            !l.contains("ReusedExchange")) <= 1))

    // t19 persisted decontamination index: the probe must still sit
    // scan-side and the verify stay an exact semi join, AND the eval
    // side must come from the persisted index parquet (graft_decon
    // dir), not a recomputation over documents
    audit("t19_decontamination_index")(
      "bloom probe (might_contain) planned" -> (_.contains("might_contain")),
      "exact verify is a semi join" -> (_.contains("LeftSemi")),
      "eval grams read from the persisted index" -> (_.contains("graft_decon")))

    // t18 importance weights: scoring is word/doc-keyed equi joins
    // only (the 1-row split-counts broadcast is the sole nested-loop,
    // bounded by construction); the top-50 is a bounded TakeOrdered,
    // never a global sort of the per-doc scores; no window anywhere
    audit("t18_importance_weights")(
      "tf-pair kernel fused into WSCG scan stage" -> tfPairsFused,
      "no cartesian product" -> simpleOnly(s =>
        !s.split("== Initial Plan ==").head.contains("CartesianProduct")),
      "top-50 is bounded TakeOrdered" -> (_.contains("TakeOrderedAndProject")),
      "no window operator" -> simpleOnly(s =>
        !s.split("== Initial Plan ==").head.split("\n")
          .exists(nodeIs(_, "Window"))))

    // s08 quantization recall: both top-10 rankings stay keyed by the
    // bounded query set (q_id windows or the TopK aggregate) — never a
    // corpus-sized single-partition sort; the overlap join is a
    // (q_id, vec_id) equi join
    audit("s08_quant_recall")(
      "no single-partition window" -> noSinglePartitionWindow,
      "no corpus-wide global sort before the final 6-row output" ->
        simpleOnly(s => s.split("== Initial Plan ==").head.split("\n")
          .count(l => l.contains("Exchange rangepartitioning")) <= 1))

    // c06 quality buckets: the a07 histogram idiom — rank windows run
    // over the (lang, score) HISTOGRAM keyed by lang, never a
    // corpus-sized or single-partition window; the corpus is scanned
    // once into the histogram aggregate (map-side partial), no join
    // back to documents
    audit("c06_quality_buckets")(
      "windows keyed by lang" -> (_.contains("windowspecdefinition(lang#")),
      "no single-partition window" -> noSinglePartitionWindow,
      "histogram agg has map-side partial" -> (_.contains("partial_count")),
      "no join back to the corpus" -> simpleOnly(s =>
        !s.split("== Initial Plan ==").head.split("\n")
          .exists(l => nodeIs(l, "SortMergeJoin") || nodeIs(l, "BroadcastHashJoin") ||
            nodeIs(l, "ShuffledHashJoin"))))

    // w10 EWMA: the whole recursive fold rides ONE user-keyed exchange
    // (zero under the user-bucketed layout) — the collect/sort/fold is
    // per-group aggregate machinery, never a window or a second shuffle
    audit("w10_ewma")(
      "one user-keyed hash exchange max" -> maxHashExchanges(1),
      "no single-partition window" -> noSinglePartitionWindow)

    // t16 bloom decontamination: the broadcast-sketch probe must sit
    // SCAN-SIDE (a might_contain Filter on the exploded gram stream
    // feeding the exact semi join), so at scale the gram exchange
    // ships bloom survivors only; the verify join stays an equi semi
    // join and the whole query keeps the 2-hash-exchange budget
    // (eval-gram distinct + per-doc hit count — the profile join and
    // the semi join broadcast at audit SF and stay keyed at scale)
    audit("t16_bloom_decontamination")(
      "bloom probe (might_contain) planned" -> (_.contains("might_contain")),
      "exact verify is a semi join" -> (_.contains("LeftSemi")),
      "probe is scan-side: filter BELOW the semi join in the tree" ->
        simpleOnly(s => {
          val lines = s.split("== Initial Plan ==").head.split("\n")
          val join = lines.indexWhere(_.contains("LeftSemi"))
          val probe = lines.indexWhere(_.contains("might_contain"))
          join >= 0 && probe > join // children print after parents
        }),
      "no cartesian / nested loop" -> simpleOnly(s => {
        val fin = s.split("== Initial Plan ==").head
        !fin.contains("CartesianProduct") && !fin.contains("BroadcastNestedLoop")
      }),
      "two hash exchanges max" -> maxHashExchanges(2))

    // PageRank's per-iteration joins must stay equi joins over the
    // cached degreed edge list — no cartesian anywhere in 5 rounds
    audit("g02_pagerank")(
      "no cartesian in the iteration chain" -> (s => {
        val finalPlan = s.split("== Initial Plan ==").head
        !finalPlan.contains("CartesianProduct")
      }),
      "edge list served from cache" -> (_.contains("InMemoryTableScan")))

    // g05 k-core: the gate query's visible plan is the post-peel
    // summary (per-round lineage is checkpoint-truncated), so assert
    // no cartesian there, and audit the per-round peel plan directly
    // via KCore.peelRound — the surviving-node filter must be two
    // LEFT-SEMI equi joins fed by a partially-aggregated degree count,
    // never a nested loop or an IN-materialization
    audit("g05_kcore")(
      "no cartesian / nested loop in summary" -> simpleOnly(s => {
        val fin = s.split("== Initial Plan ==").head
        !fin.contains("CartesianProduct") && !fin.contains("BroadcastNestedLoop")
      }))
    locally {
      val pairs = graft.Tables.load(spark, sfDir, "orders")
        .select(org.apache.spark.sql.functions.col("o_custkey").as("a"))
        .withColumn("b", org.apache.spark.sql.functions.col("a") + 1)
      val round = graft.operators.KCore.peelRound(pairs, 2)
      round.collect()
      val plan = round.queryExecution.executedPlan.toString
      val fin = plan.split("== Initial Plan ==").head
      val checks = Seq(
        "peel round: two left-semi joins" ->
          ("LeftSemi".r.findAllIn(fin).size >= 2),
        "peel round: no cartesian / nested loop" ->
          (!fin.contains("CartesianProduct") && !fin.contains("BroadcastNestedLoop")),
        "peel round: degree agg partial (map-side combine)" ->
          fin.contains("HashAggregate"))
      checks.foreach { case (desc, ok) =>
        if (!ok) failures += 1
        println(f"[plan] ${if (ok) "PASS" else "FAIL"}%s  g05_kcore                    $desc")
      }
    }

    // g06 co-purchase: pair generation must be the order-keyed equi
    // self-join (quadratic only within a basket), the hot-item cap a
    // semi join, the result a bounded TakeOrdered — a cartesian or a
    // full sort means the projection degenerated to all-part-pairs
    audit("g06_copurchase_pairs")(
      "streaming pair kernel (no join, no cartesian)" -> (s => {
        val fin = s.split("== Initial Plan ==").head
        !fin.contains("CartesianProduct") && !fin.contains("Join")
      }),
      // plain layout (this audit) pays the basket co-locating
      // repartition + the pair exchange; the bucketed layout elides
      // the first
      "pair + co-locate exchanges only" -> maxHashExchanges(2),
      "bounded TakeOrdered result" -> (_.contains("TakeOrderedAndProject")))

    // g07 label propagation: each round is a labels→edges join + two
    // aggregates — the plurality argmax must be a struct-max
    // AGGREGATE (the oracle's ROW_NUMBER is restated engine-side
    // without any window), and the fixed edge layout must serve from
    // cache across rounds
    audit("g07_label_propagation")(
      "no rank window in the round chain" -> (s => !s.contains("Window")),
      "no cartesian / nested loop" -> simpleOnly(s => {
        val fin = s.split("== Initial Plan ==").head
        !fin.contains("CartesianProduct") && !fin.contains("BroadcastNestedLoop")
      }),
      "edge list served from cache" -> (_.contains("InMemoryTableScan")))

    // t10 char-LM: same kernel + broadcast-model contract as t23
    // (round 12 moved t10's transition counts onto the codegen
    // char-bigram kernel)
    audit("t10_char_lm_quality")(
      "char-bigram scan kernel planned" -> (s =>
        s.toLowerCase.contains("charbigramtfpairs")),
      "model joins broadcast (no shuffle join)" -> (s =>
        s.contains("BroadcastHashJoin") && !s.contains("SortMergeJoin")))

    // t23 perplexity terciles: the per-doc score comes off the codegen
    // char-bigram kernel; the model tables are alphabet²-bounded and
    // must reach the scoring pass as BROADCASTS (a shuffle join here
    // would ship the corpus-sized pair stream); the tercile windows
    // run lang-keyed over the HISTOGRAM, never single-partition
    audit("t23_perplexity_buckets")(
      "char-bigram scan kernel planned" -> (s =>
        s.toLowerCase.contains("charbigramtfpairs")),
      "model joins broadcast (no shuffle join)" -> (s =>
        s.contains("BroadcastHashJoin") && !s.contains("SortMergeJoin")),
      "no single-partition window" -> noSinglePartitionWindow)

    // s09 filtered ANN: the label predicate must reach the postings
    // parquet scan as a PUSHED filter and the cid probe prune as a
    // PARTITION filter — the scan touches only the probed buckets'
    // files, and row groups skip on label stats
    audit("s09_filtered_ann")(
      "label equality pushed to parquet" -> (_.contains("EqualTo(label")),
      "cid probe prune is a partition filter" -> (s =>
        s.split("\n").exists(l =>
          l.contains("PartitionFilters") && l.contains("cid"))))

    // s10 batch ANN: per-query top-k must be the bounded TopK
    // aggregate (plans.TopKRewrite — a rank window here would sort
    // every probed posting), the (q_id, cid, query) table a broadcast,
    // and the cid union prune a partition filter on the one scan
    audit("s10_batch_ann")(
      "bounded TopK aggregate (no rank window)" -> (s =>
        s.contains("ObjectHashAggregate") && !s.contains("Window")),
      "probe table broadcast" -> (_.contains("BroadcastHashJoin")),
      "cid union prune is a partition filter" -> (s =>
        s.split("\n").exists(l =>
          l.contains("PartitionFilters") && l.contains("cid"))))

    // s12 semantic decontamination: the eval probe rides the s10
    // batch shape — bounded TopK (k=1) aggregate, probe table
    // broadcast, the probed-cid prune a partition filter on the ONE
    // postings scan — and the eval×train composition must never be a
    // cartesian (the candidate restriction is a scan-side filter, not
    // a join)
    audit("s12_semantic_decontamination")(
      "bounded TopK aggregate (no rank window)" -> (s =>
        s.contains("ObjectHashAggregate") && !s.contains("Window")),
      "probe table broadcast" -> (_.contains("BroadcastHashJoin")),
      "cid probe prune is a partition filter" -> (s =>
        s.split("\n").exists(l =>
          l.contains("PartitionFilters") && l.contains("cid"))),
      "no eval-train cartesian" -> (s => {
        val fin = s.split("== Initial Plan ==").head
        !fin.contains("CartesianProduct") && !fin.contains("BroadcastNestedLoop")
      }))

    // m09 image near-dup: the candidate generation must stay the
    // banded (band, value) equi self-join — a cartesian or nested
    // loop means it degenerated to all-pairs hamming
    audit("m09_image_neardup")(
      "band join is equi (no cartesian / nested loop)" -> simpleOnly(s => {
        val fin = s.split("== Initial Plan ==").head
        !fin.contains("CartesianProduct") && !fin.contains("BroadcastNestedLoop")
      }))

    // t21 BPE: the gate query's visible plan is the driver-local rule
    // list (per-round lineage is checkpoint-truncated), so audit the
    // candidate plan directly via BpeTrain.pairArgmax — the pair
    // explode must feed a partially-aggregated (l, r) count (no
    // shuffle before the partial agg) and the argmax must be a
    // bounded TakeOrdered, never a full sort. The incremental trainer
    // runs this exact explode+partial-agg kernel once over the full
    // vocab (round 0) and per round over the AFFECTED slice only
    // (pairsOf ∘ containsPair — same plan below a pushed predicate),
    // with the per-round argmax the same TakeOrdered over the
    // delta-maintained count table (BpeTrainSpec pins R=64 parity).
    locally {
      val round = graft.queries.BpeTrain.pairArgmax(
        graft.queries.BpeTrain.initVocab(spark, sfDir))
      round.collect()
      val plan = round.queryExecution.executedPlan.toString
      val fin = plan.split("== Initial Plan ==").head
      val checks = Seq(
        "pair round: bounded TakeOrdered argmax" ->
          fin.contains("TakeOrderedAndProject"),
        "pair round: partial hash agg (map-side combine)" ->
          ("HashAggregate".r.findAllIn(fin).size >= 2),
        "pair round: no window / cartesian" ->
          (!fin.contains("Window") && !fin.contains("CartesianProduct")))
      checks.foreach { case (desc, ok) =>
        if (!ok) failures += 1
        println(f"[plan] ${if (ok) "PASS" else "FAIL"}%s  t21_bpe_merges               $desc")
      }
    }

    // t22 tokenize-apply: the visible plan is the word-keyed join of
    // the kernel tf-pairs against the (checkpoint-truncated) trained
    // vocab — an equi join (AQE picks broadcast while vocab is small;
    // never force-broadcast), two keyed aggregates, no cartesian
    audit("t22_bpe_tokenize")(
      "vocab equi join (no cartesian)" -> (s => {
        val fin = s.split("== Initial Plan ==").head
        (fin.contains("BroadcastHashJoin") || fin.contains("SortMergeJoin") ||
          fin.contains("ShuffledHashJoin")) &&
          !fin.contains("CartesianProduct") &&
          !fin.contains("BroadcastNestedLoopJoin")
      }),
      "no window node" -> (s => !s.contains("Window")))

    // AQE skew-join: the w02/q02-shape hot key (one join key holding
    // 80% of the fact) must trigger the sort-merge skew split — the
    // runtime mitigation for skew the static planner can't see. The
    // audit runs the same skewed join with the skew handler off and
    // on and reports the task-duration spread (max/median) both ways;
    // detector thresholds are scaled to audit-sized data (defaults
    // are 256 MB — correct at cluster scale, unreachable here).
    {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val conf = spark.conf
      val saved = Seq(
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.coalescePartitions.enabled")
        .map(k => k -> conf.getOption(k)).toMap
      try {
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        // distributed range (no driver-side local table) with a ~64 B
        // payload so the hot task's work dominates per-task overhead
        val fact = spark.range(0, 2000000).select(
          when(col("id") % 5 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("v"),
          rpad(hex(col("id")), 64, "x").as("payload"))
        val dim = spark.range(0, 2000000, 5)
          .select(col("id").as("k"), (col("id") * 2).as("tag"))

        // spread = worst per-stage max/median task duration (stages
        // with ≥4 tasks — the join stage is where the hot key lands;
        // whole-query pooling would let the local-table parallelize
        // stages mask it)
        def spread(skewOn: Boolean): (Double, Long, String) = {
          conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
          val byStage = new java.util.concurrent.ConcurrentHashMap[
            Int, java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]]()
          val listener = new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
              if (t.taskInfo != null)
                byStage.computeIfAbsent(t.stageId,
                  (_: Int) => new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]())
                  .add(t.taskInfo.duration)
          }
          spark.sparkContext.addSparkListener(listener)
          try {
            // aggregate ON TOP of the join (the 2 M joined rows stay in
            // the executors); payload is referenced so pruning can't
            // drop it from the skewed shuffle
            val j = fact.join(dim, "k")
              .agg(sum(length(col("payload"))).as("bytes"), count(lit(1)).as("n"))
            val t0 = System.nanoTime()
            val r = j.collect()
            assert(r(0).getLong(1) == 2000000L)
            val wallMs = (System.nanoTime() - t0) / 1000000L
            // listener events are delivered async; give the bus a beat
            Thread.sleep(1000)
            var worst = 1.0
            byStage.forEach { (_, q) =>
              val arr = scala.collection.mutable.ArrayBuffer[Long]()
              q.forEach(d => arr += d.longValue())
              if (arr.length >= 4) {
                val sorted = arr.sorted
                val med = math.max(1L, sorted(sorted.length / 2))
                worst = math.max(worst, sorted.last.toDouble / med)
              }
            }
            (worst, wallMs, j.queryExecution.executedPlan.toString)
          } finally spark.sparkContext.removeSparkListener(listener)
        }

        val (spreadOff, wallOff, _) = spread(skewOn = false)
        val (spreadOn, wallOn, planOn) = spread(skewOn = true)
        // The deterministic evidence is the plan marker (skew=true on
        // the SMJ): AQE saw the skewed partition and split it. Timing
        // is telemetry only — this VM shows 2-6× run-to-run noise, so
        // the old "spread improved ≥1.2×" hard gate flaked (measured
        // 1.16× on a run whose wall time still halved). The one timing
        // assertion kept hard is a wide no-regression guard.
        val checks = Seq(
          "skew split engaged (skew=true in SMJ)" -> planOn.contains("skew=true"),
          "skew split not a regression (wall on < 3x off)" ->
            (wallOn < 3 * math.max(wallOff, 1L)))
        checks.foreach { case (desc, ok) =>
          if (!ok) failures += 1
          println(f"[plan] ${if (ok) "PASS" else "FAIL"}%s  aqe_skew_join               $desc")
        }
        println(f"[plan] INFO  aqe_skew_join               worst-stage max/median task " +
          f"time: off=$spreadOff%.1f on=$spreadOn%.1f (advisory; expect off >> on); " +
          f"wall off=${wallOff}ms on=${wallOn}ms")
      } finally saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }

    println(s"[plan] ${if (failures == 0) "ALL PASS" else s"$failures FAILURES"}")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
