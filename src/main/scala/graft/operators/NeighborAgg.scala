package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact time-neighborhood aggregates WITHOUT pair enumeration.
  *
  * The r01 family ("every point within ±W of every anchor, then
  * aggregate") has two executable shapes:
  *
  *  1. enumerate the qualifying pairs (RangeJoin.pointInInterval) and
  *     aggregate them — correct, but the pair stream is
  *     |anchors| × (2W × point density): 1.1e9 rows at sf10 already,
  *     and GROWING QUADRATICALLY with density. Worse, Spark plans a
  *     multi-countDistinct aggregate over it as an Expand (one copy of
  *     every pair row per distinct column) — measured 26.9 s at sf10;
  *  2. observe that every requested statistic is a function of the
  *     per-type PREFIX SUMS of the point timeline,
  *       F_T(t) = |{p of type T : us(p) ≤ t}|,
  *       S_T(t) = Σ {us(p) : p of type T, us(p) ≤ t},
  *     evaluated at three positions per anchor:
  *       c_below = F(a) − F(a−W−1),   c_above = F(a+W) − F(a),
  *       Σ|us−a|  = [c_below·a − (S(a)−S(a−W−1))]
  *                + [(S(a+W)−S(a)) − c_above·a],
  *     so the whole answer needs 3·|anchors| prefix evaluations —
  *     LINEAR in the input, independent of density.
  *
  * `sweepEval` computes exact F/S at arbitrary probe positions as a
  * DISTRIBUTED TIMELINE SWEEP (the w04 distributed-rank pattern):
  *   - union point and probe rows into one stream ordered by
  *     (position, kind) — points sort BEFORE probes at equal time, so
  *     a probe at t sees every point ≤ t including ties;
  *   - split the time domain at sampled boundaries (one approxQuantile
  *     pass; the boundary expression is deterministic over the row, so
  *     every pass agrees by construction — no checkpoint);
  *   - each range runs all per-type running counters in a single
  *     in-partition pass (never a single-partition sweep);
  *   - each range's exclusive prefix totals (≤ nRanges rows, a
  *     driver-side prefix sum like w04's) splice the ranges together.
  *
  * (A two-level bin-histogram formulation — the a07 shape — also
  * avoids the pairs, but measured 45 s at sf10: the densified bin
  * list × type cross, the per-bin fan-out joins, and the multi-column
  * assembly joins cost more than one range-partitioned sort. The
  * sweep touches each row O(1) times with zero fan-out.)
  *
  * At 100 TB the contrast with pair enumeration is stark: pairs grow
  * with anchors × density (a 100× denser timeline is 10,000× the
  * pairs), while the sweep is one balanced range-partitioned pass
  * over points + probes — time-local rows are range-local, so 1000
  * executors sweep disjoint slices of the timeline in parallel.
  *
  * RangeJoin.pointInInterval remains the right operator when the
  * CONSUMER needs the pairs themselves; this one replaces it when the
  * consumer is an aggregate (counts, sums, existence) over the
  * neighborhood — which is what the reference's dashboard asks.
  */
object NeighborAgg {

  private val D38 = DataTypes.createDecimalType(38, 0)

  // running Σus counters are maintained as TWO LONG window sums
  // (hi = us >> SHIFT, lo = us & (2^SHIFT − 1); exact for negative us
  // in two's complement): decimal running sums in WindowExec cost
  // ~10× a long sum (measured 14 s of r01's 30 s at sf10), while the
  // split stays exact — Σhi ≤ n·2^(63−SHIFT) and Σlo ≤ n·2^SHIFT both
  // fit LONG for n ≤ 2^37 rows, and the consumer reconstructs
  // ΔS = Δhi·2^SHIFT + Δlo in DECIMAL on the small assembly side.
  private val SHIFT = 25
  private val MASK = (1L << SHIFT) - 1

  /** For each probe row: the exact per-type count (and, with
    * `withSums`, Σus) of points with `usCol ≤ posCol`, returned as
    * arrays `__cnts` / `__sum_his` + `__sum_los` (the split Σus, see
    * SHIFT) aligned with `types`. Probe columns
    * pass through. Column names must not collide with `__sw_`-prefixed
    * internals.
    *
    * Execution: the per-range running counters are a tight primitive
    * loop in `mapPartitions` — the one place in this engine where the
    * imperative escape hatch earns its keep. The declarative
    * alternative (k·3 conditional running SUMs OVER (PARTITION BY
    * range ORDER BY time)) is plan-equivalent but WindowExec updates
    * every aggregate buffer per row outside whole-stage codegen:
    * measured 18.3 s for this stage at sf10 (15 counters × 16 M rows)
    * vs 3.3 s for the loop. Distribution safety is unchanged — the
    * sweep is still range-partitioned by the same deterministic
    * sampled-boundary ids (never a single-partition pass), per-range
    * totals come from a codegen hash aggregate over the unsorted
    * stream, and the driver only ever sees ≤ nRanges × 3k longs.
    */
  def sweepEval(points: DataFrame, typeCol: String, usCol: String,
                types: Seq[String], probes: DataFrame, posCol: String,
                withSums: Boolean, nRanges: Int = 96): DataFrame = {
    val spark = points.sparkSession
    val probeSchema = probes.schema
    val k = types.length

    // unified stream: probe payload rides along as one opaque struct
    val payloadType = StructType(probeSchema.fields)
    val pts = points.select(col(typeCol).as("__sw_type"),
      col(usCol).cast(LongType).as("__sw_us"), lit(0).as("__sw_kind"),
      lit(null).cast(payloadType).as("__sw_payload"))
    val prb = probes.select(lit(null).cast(StringType).as("__sw_type"),
      col(posCol).cast(LongType).as("__sw_us"), lit(1).as("__sw_kind"),
      struct(probeSchema.fieldNames.map(col): _*).as("__sw_payload"))
    val stream = pts.unionByName(prb)

    // deterministic range ids from sampled time boundaries (w04):
    // boundary ties land on one side, so equal-time rows never
    // straddle a range, and every pass over `ranged` agrees on the
    // ids by construction — no checkpoint needed
    val bounds = stream.withColumn("__sw_usd", col("__sw_us").cast(DoubleType))
      .stat.approxQuantile("__sw_usd",
        (1 until nRanges).map(_.toDouble / nRanges).toArray, 0.001)
      .map(_.toLong).distinct.sorted
    val pidExpr = bounds.zipWithIndex.foldRight(lit(bounds.length): Column) {
      case ((b, i), acc) => when(col("__sw_us") <= lit(b), lit(i)).otherwise(acc)
    }
    val ranged = stream.withColumn("__sw_pid", pidExpr)

    // exclusive per-range prefix totals (≤ nRanges × 3k longs) from a
    // whole-stage-codegen hash aggregate — no shuffle, no sort
    def isT(i: Int): Column =
      col("__sw_kind") === 0 && col("__sw_type") === types(i)
    val hiC = shiftright(col("__sw_us"), SHIFT)
    val loC = col("__sw_us").bitwiseAND(lit(MASK))
    val totAggs = (0 until k).map(i =>
      sum(when(isT(i), 1L).otherwise(0L)).as(s"__sw_tc$i")) ++
      (if (withSums) (0 until k).flatMap(i => Seq(
        sum(when(isT(i), hiC).otherwise(0L)).as(s"__sw_th$i"),
        sum(when(isT(i), loC).otherwise(0L)).as(s"__sw_tl$i")))
      else Nil)
    val totals = ranged.groupBy(col("__sw_pid"))
      .agg(totAggs.head, totAggs.tail: _*)
      .collect()
      .map(r => r.getInt(0) ->
        ((0 until k).map(i => r.getLong(1 + i)).toArray,
          if (withSums) (0 until k).flatMap(i => Seq(
            r.getLong(1 + k + 2 * i), r.getLong(2 + k + 2 * i))).toArray
          else Array.empty[Long]))
      .sortBy(_._1)
    val cntOff = collection.mutable.Map.empty[Int, Array[Long]]
    val sumOff = collection.mutable.Map.empty[Int, Array[Long]]
    var cAcc = Array.fill(k)(0L)
    var sAcc = Array.fill(2 * k)(0L)
    totals.foreach { case (pid, (cs, ss)) =>
      cntOff(pid) = cAcc; sumOff(pid) = sAcc
      cAcc = cAcc.zip(cs).map { case (a, b) => a + b }
      if (withSums) sAcc = sAcc.zip(ss).map { case (a, b) => a + b }
    }
    val bcOff = spark.sparkContext.broadcast(
      (cntOff.toMap, sumOff.toMap, types.zipWithIndex.toMap))

    // main pass: one hash exchange on the range id, in-partition sort
    // by (range, time, kind) — points sort before probes at equal
    // time, so a probe at t sees every point ≤ t including ties —
    // then the primitive sweep loop; ranges reset counters, offsets
    // splice ranges back together
    val sorted = ranged
      .repartition(math.min(nRanges, 32), col("__sw_pid"))
      .sortWithinPartitions(col("__sw_pid"), col("__sw_us"), col("__sw_kind"))
    val outSchema = StructType(probeSchema.fields ++
      (StructField("__cnts", ArrayType(LongType, containsNull = false)) +:
        (if (withSums) Seq(
          StructField("__sum_his", ArrayType(LongType, containsNull = false)),
          StructField("__sum_los", ArrayType(LongType, containsNull = false)))
        else Nil)))
    val kk = k
    val ws = withSums
    val swept = sorted.mapPartitions { it =>
      val (cOffM, sOffM, tIdx) = bcOff.value
      var curPid = Int.MinValue
      val cnt = new Array[Long](kk)
      val shi = new Array[Long](kk)
      val slo = new Array[Long](kk)
      var cOff: Array[Long] = null
      var sOff: Array[Long] = null
      it.flatMap { r =>
        val pid = r.getInt(4)
        if (pid != curPid) {
          curPid = pid
          java.util.Arrays.fill(cnt, 0L)
          if (ws) { java.util.Arrays.fill(shi, 0L); java.util.Arrays.fill(slo, 0L) }
          cOff = cOffM(pid); sOff = if (ws) sOffM(pid) else null
        }
        if (r.getInt(2) == 0) {
          val ti = tIdx.getOrElse(r.getString(0), -1)
          if (ti >= 0) {
            val us = r.getLong(1)
            cnt(ti) += 1
            if (ws) { shi(ti) += us >> SHIFT; slo(ti) += us & MASK }
          }
          Iterator.empty
        } else {
          val payload = r.getStruct(3).toSeq
          val oc = Array.tabulate(kk)(i => cnt(i) + cOff(i))
          val extra: Seq[Any] =
            if (ws) Seq(oc,
              Array.tabulate(kk)(i => shi(i) + sOff(2 * i)),
              Array.tabulate(kk)(i => slo(i) + sOff(2 * i + 1)))
            else Seq(oc)
          Iterator.single(org.apache.spark.sql.Row.fromSeq(payload ++ extra))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    swept.toDF()
  }

  /** The r01 contract, pair-free: for anchors = `events` rows matching
    * `anchorType` and points = ALL events, per point type emit
    *   n_pairs   = # (anchor, point) pairs with |Δus| ≤ W, ids differ,
    *   n_anchors = # distinct anchors in ≥1 such pair,
    *   n_points  = # distinct points in ≥1 such pair,
    *   sum_abs_dt_us = Σ |Δus| over the pairs,
    * exactly equal to RangeJoin.pointInInterval + the aggregate (types
    * with no pairs are not emitted), in time linear in |events|.
    *
    * `events` needs (idCol: unique, typeCol: string, usCol: long).
    */
  def neighborStats(events: DataFrame, idCol: String, typeCol: String,
                    usCol: String, anchorType: String, w: Long,
                    nRanges: Int = 32): DataFrame = {
    val types = events.select(typeCol).distinct().collect()
      .map(_.getString(0)).sorted.toSeq
    require(types.length <= 1000, s"type dimension too wide: ${types.length}")

    // pass 1 — per (anchor, type): c (pair count) and s (Σ|Δus|) from
    // three prefix evaluations; self-pair (same id, Δ=0) excluded from
    // the anchor's own type count
    val probes1 = events.filter(col(typeCol) === anchorType)
      .select(col(idCol).as("__a_id"), col(usCol).as("__a_us"),
        explode(array(
          struct(lit(0).as("__tag"), (col(usCol) - w - 1).as("__pos")),
          struct(lit(1).as("__tag"), col(usCol).as("__pos")),
          struct(lit(2).as("__tag"), (col(usCol) + w).as("__pos"))))
          .as("__p"))
      .select(col("__a_id"), col("__a_us"),
        col("__p.__tag").as("__tag"), col("__p.__pos").as("__pos"))
    val pe1 = sweepEval(events.select(col(typeCol), col(usCol)),
      typeCol, usCol, types, probes1, "__pos", withSums = true, nRanges)
    // combine the 3 probe rows per anchor FIRST (one narrow shuffle of
    // 3 rows/anchor; each (anchor, tag) is unique, so a conditional
    // MAX selects the row's arrays), THEN explode per type — the
    // exploded side never shuffles
    def tagArr(tag: Int, c: String): Column =
      max(when(col("__tag") === tag, col(c)))
    val byAnchor = pe1.groupBy(col("__a_id"), col("__a_us"))
      .agg(tagArr(0, "__cnts").as("f0"), tagArr(1, "__cnts").as("f1"),
        tagArr(2, "__cnts").as("f2"),
        tagArr(0, "__sum_his").as("h0"), tagArr(1, "__sum_his").as("h1"),
        tagArr(2, "__sum_his").as("h2"),
        tagArr(0, "__sum_los").as("l0"), tagArr(1, "__sum_los").as("l1"),
        tagArr(2, "__sum_los").as("l2"))
    val typeOf: Column = element_at(lit(types.toArray), col("__ti") + 1)
    val z = col("__z")
    val perAnchorType = byAnchor.select(col("__a_us"),
      posexplode(arrays_zip(col("f0"), col("f1"), col("f2"), col("h0"),
        col("h1"), col("h2"), col("l0"), col("l1"), col("l2")))
        .as(Seq("__ti", "__z")))
      .withColumn(typeCol, typeOf)
      .withColumn("cB", z("f1") - z("f0"))
      .withColumn("cA", z("f2") - z("f1"))
      .withColumn("c",
        col("cB") + col("cA") -
          when(col(typeCol) === anchorType, 1L).otherwise(0L))
      // per-anchor Δ of the split running Σus reconstructs in DECIMAL
      // (Δhi·2^SHIFT can pass LONG once the in-window count × us
      // does); the per-anchor Σ|Δt| is small and casts back exactly
      .withColumn("s",
        ((col("cB").cast(D38) - col("cA")) * col("__a_us")
          + ((z("h2") - z("h1")) - (z("h1") - z("h0"))).cast(D38) * lit(1L << SHIFT)
          + ((z("l2") - z("l1")) - (z("l1") - z("l0"))))
          .cast(LongType))
    val perType = perAnchorType.groupBy(col(typeCol))
      .agg(sum(col("c")).as("n_pairs"),
        count(when(col("c") > 0, lit(1))).as("n_anchors"),
        sum(col("s")).as("sum_abs_dt_us"))
      .where(col("n_pairs") > 0)

    // pass 2 — n_points as INTERVAL COVERAGE, no per-point grouping:
    // every anchor opens at a−W and closes at a+W+1 (integer micros,
    // and points sort before probes at equal time, so both boundaries
    // take effect exactly at the contract's closed [a−W, a+W]); each
    // event probes its own position once and qualifies iff the open −
    // close depth covers it — ≥2 when the event IS an anchor, whose
    // own interval always covers it
    val anchorTi = types.indexOf(anchorType)
    val bnd = events.filter(col(typeCol) === anchorType)
      .select(explode(array(
        struct(lit("o").as("__b"), (col(usCol) - w).as("__b_us")),
        struct(lit("c").as("__b"), (col(usCol) + w + 1).as("__b_us"))))
        .as("__p"))
      .select(col("__p.__b").as("__b"), col("__p.__b_us").as("__b_us"))
    val probes2 = events.select(col(usCol).as("__e_us"),
      array_position(lit(types.toArray), col(typeCol)).cast(IntegerType)
        .minus(1).as("__ti"))
    val pe2 = sweepEval(bnd, "__b", "__b_us", Seq("c", "o"),
      probes2, "__e_us", withSums = false, nRanges)
      .select(col("__ti"),
        (col("__cnts").getItem(1) - col("__cnts").getItem(0)).as("__depth"))
    val nPoints = pe2
      .where(col("__depth") >=
        when(col("__ti") === anchorTi, 2L).otherwise(1L))
      .groupBy(col("__ti"))
      .agg(count(lit(1)).as("n_points"))
      .select(element_at(lit(types.toArray), col("__ti") + 1).as(typeCol),
        col("n_points"))

    perType.join(nPoints, typeCol)
      .select(col(typeCol), col("n_pairs"), col("n_anchors"),
        col("n_points"), col("sum_abs_dt_us"))
  }

  /** The same contract by pair enumeration: RangeJoin.pointInInterval
    * + one aggregate. Cheaper CONSTANTS than the sweep (3 jobs, one
    * binned equi join) — the right plan while the expected pair count
    * stays small; the sweep overtakes it when density × anchors makes
    * the pair stream (and the multi-countDistinct Expand over it) the
    * bottleneck. NeighborAggSpec holds the two exactly equal.
    */
  def pairStats(events: DataFrame, idCol: String, typeCol: String,
                usCol: String, anchorType: String, w: Long): DataFrame = {
    val pts = events.select(col(idCol).as("__p_id"),
      col(typeCol).as(typeCol), col(usCol).cast(LongType).as("__p_us"))
    val anchors = events.filter(col(typeCol) === anchorType)
      .select(col(idCol).as("__a_id"), col(usCol).cast(LongType).as("__a_us"),
        (col(usCol).cast(LongType) - w).as("__lo"),
        (col(usCol).cast(LongType) + w).as("__hi"))
    RangeJoin.pointInInterval(anchors, pts, "__lo", "__hi", "__p_us", 2 * w)
      .filter(col("__p_id") =!= col("__a_id"))
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("__a_id")).as("n_anchors"),
        countDistinct(col("__p_id")).as("n_points"),
        sum(abs(col("__p_us") - col("__a_us"))).as("sum_abs_dt_us"))
      .select(col(typeCol), col("n_pairs"), col("n_anchors"),
        col("n_points"), col("sum_abs_dt_us"))
  }

  /** Cost-based plan choice between `pairStats` and `neighborStats`
    * (the data-driven-selection idiom this engine also uses for the
    * PageRank broadcast): one cheap stats pass (count, anchor count,
    * time span — a codegen aggregate, no shuffle) estimates the
    * expected pair count under uniform density,
    *   est_pairs = anchors × (n / span) × (2W+1),
    * and the sweep takes over once est_pairs > 8 × n — below that the
    * pair join's smaller fixed cost wins (measured at sf0.1: pairs
    * 0.98 s vs sweep 3.1 s warm; at sf10: pairs 26.9 s vs sweep
    * 12.2 s — crossover sits at pairs/input ≈ 5–10, and the estimate
    * only mis-picks between two CORRECT plans when density is heavily
    * non-uniform).
    */
  def neighborStatsAuto(events: DataFrame, idCol: String, typeCol: String,
                        usCol: String, anchorType: String, w: Long,
                        nRanges: Int = 32): DataFrame = {
    val st = events.agg(count(lit(1)),
      count(when(col(typeCol) === anchorType, lit(1))),
      min(col(usCol).cast(LongType)), max(col(usCol).cast(LongType))).head()
    val n = st.getLong(0)
    val nA = st.getLong(1)
    if (n == 0L || nA == 0L)
      return pairStats(events, idCol, typeCol, usCol, anchorType, w)
    val span = math.max(1L, st.getLong(3) - st.getLong(2) + 1)
    val estPairs = nA.toDouble * (n.toDouble / span) * (2.0 * w + 1)
    if (estPairs > 8.0 * n)
      neighborStats(events, idCol, typeCol, usCol, anchorType, w, nRanges)
    else pairStats(events, idCol, typeCol, usCol, anchorType, w)
  }
}
