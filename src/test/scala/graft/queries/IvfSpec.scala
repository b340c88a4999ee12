package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Learned-codebook IVF (s03): structural + recall contracts of the
  * fixed-point Lloyd's k-means quantizer at nlist = ⌈√N⌉.
  * (Result-set exactness vs the DuckDB recomputation of the same
  * training is the oracle gate's job; these are the semantic
  * contracts the oracle can't express.)
  */
class IvfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def top10(name: String): Seq[Long] =
    graft.SparkEntry.queries(name)(spark, sf).collect().take(10).map(_.getLong(0)).toSeq

  test("full probing (nprobe = nlist) degenerates to exact brute force") {
    // with every bucket probed, the IVF index must return EXACTLY the
    // s01 top-10 — the index prunes, it never re-scores
    val exact = top10("s01_knn_brute_cosine")
    val full = Similarity.ivfTopK(spark, sf, nprobe = Int.MaxValue)
      .collect().map(_.getLong(0)).toSeq
    assert(full == exact, s"full-probe IVF $full != brute $exact")
  }

  test("PQ-ADC top-k (s05): recall floor and exact rescore values") {
    val s1 = graft.SparkEntry.queries("s01_knn_brute_cosine")(spark, sf).collect()
    val exactScores = s1.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact10 = s1.take(10).map(_.getLong(0)).toSet
    val pq = graft.SparkEntry.queries("s05_pq_adc_topk")(spark, sf).collect()
    assert(pq.length == 10)
    // recall floor: 4-bit-per-subspace codes + rescore-50 on an
    // isotropic corpus (measured 0.8 at sf0.01; floor leaves margin)
    val ids = pq.map(_.getLong(0)).toSet
    assert((exact10 & ids).size >= 6, s"recall ${(exact10 & ids).size}/10")
    // the rescore is EXACT: every returned cos_sim equals the
    // brute-force score for that vector (PQ approximates WHICH
    // vectors to look at, never the reported score)
    pq.foreach { r =>
      assert(r.getDouble(r.fieldIndex("cos_sim")) == exactScores(r.getLong(0)))
    }
    // the ADC approximation correlates: candidates ordered by adc_ip
    // must rank the true best candidate in the kept set
    assert(ids.contains(s1.head.getLong(0)), "true top-1 missing from PQ result")
  }

  test("2-probe recall against the exact top-10") {
    val exact = top10("s01_knn_brute_cosine").toSet
    val ivf = top10("s03_ivf_ann_topk").toSet
    // 64-dim isotropic corpus at nlist=√N, 2 probes: locality is weak
    // by construction (no planted cluster structure), so the contract
    // is a floor, not near-perfection — the near-dup regime where IVF
    // shines is exercised at larger SFs by the bench
    assert(ivf.size == 10)
    assert((exact & ivf).size >= 3, s"recall ${(exact & ivf).size}/10: exact=$exact ivf=$ivf")
  }

  test("every result of the 2-probe search is genuinely in a probed bucket") {
    // scores of the 2-probe result are a subset of the exact scores:
    // the rescore is exact, so any returned (vec_id, cos) pair must
    // equal its brute-force counterpart
    val exact = graft.SparkEntry.queries("s01_knn_brute_cosine")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = graft.SparkEntry.queries("s03_ivf_ann_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    ivf.foreach { case (id, c) =>
      exact.get(id).foreach(ec => assert(ec == c, s"vec $id rescored $c != exact $ec"))
    }
  }

  test("persisted IVF index: same answer as in-query training, probed partitions only") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_spec").toString
    graft.operators.IvfIndex.build(spark, sf, dir)
    val fromIndex = graft.operators.IvfIndex.search(spark, sf, dir, nprobe = 2, k = 10)
    val inQuery = graft.SparkEntry.queries("s03_ivf_ann_topk")(spark, sf)
    assert(fromIndex.collect().toSeq.map(_.toSeq) == inQuery.collect().toSeq.map(_.toSeq))
    // the pruned scan carries the probe filter as a PARTITION filter
    // (directory-level pruning, not per-row)
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"))
    // behavioral proof of pruning: delete every NON-probed partition
    // directory — the search must not notice, because it never lists
    // or reads them
    val cb = spark.read.parquet(s"$dir/codebook")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).map(_._2)
    val qv = graft.Tables.load(spark, sf, "embeddings").filter(col("vec_id") === 0)
      .selectExpr("transform(embedding, x -> cast(x as double))")
      .collect()(0).getSeq[Double](0)
    val probes = Similarity.probeIds(cb, qv, 2).toSet
    val postingsDir = new java.io.File(s"$dir/postings")
    val victims = postingsDir.listFiles().filter(f =>
      f.getName.startsWith("cid=") &&
        !probes.contains(f.getName.stripPrefix("cid=").toLong))
    assert(victims.length > 2, "fixture must have more buckets than probes")
    victims.foreach(d => { d.listFiles().foreach(_.delete()); d.delete() })
    val afterDelete = graft.operators.IvfIndex.search(spark, sf, dir, nprobe = 2, k = 10)
    assert(afterDelete.collect().toSeq.map(_.toSeq) == inQuery.collect().toSeq.map(_.toSeq))
  }

  test("incremental append under a frozen codebook equals the one-shot build") {
    import org.apache.spark.sql.functions.col
    val ref = java.nio.file.Files.createTempDirectory("graft_ivf_ref").toString
    graft.operators.IvfIndex.build(spark, sf, ref)

    // a second index that shares the trained codebook but receives its
    // postings in two INCREMENTAL batches (ingest-style)
    val grown = java.nio.file.Files.createTempDirectory("graft_ivf_grow").toString
    spark.read.parquet(s"$ref/codebook")
      .coalesce(1).write.parquet(s"$grown/codebook")
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .withColumn("label", col("label").cast("long")) // corpus() label cast
    val half = vecs.filter(col("vec_id") % 2 === 0)
    val rest = vecs.filter(col("vec_id") % 2 =!= 0)
    graft.operators.IvfIndex.append(spark, grown,
      half.select("vec_id", "label", "embedding"))
    graft.operators.IvfIndex.append(spark, grown,
      rest.select("vec_id", "label", "embedding"))

    // same frozen quantizer → same assignments → same search answer
    val a = graft.operators.IvfIndex.search(spark, sf, ref, nprobe = 2, k = 10)
      .collect().toSeq.map(_.toSeq)
    val b = graft.operators.IvfIndex.search(spark, sf, grown, nprobe = 2, k = 10)
      .collect().toSeq.map(_.toSeq)
    assert(a == b)
    // and identical per-cell membership, not just the probed cells
    def cells(d: String) = spark.read.parquet(s"$d/postings")
      .selectExpr("cast(cid as long) AS cid").groupBy("cid").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells(grown) == cells(ref))
    // the second append touched only its own batch's cells: every
    // file in untouched partitions predates it — proxy: total file
    // count per cell grows only where the batch landed (appends add
    // files, never rewrite)
    val postings = new java.io.File(s"$grown/postings")
    assert(postings.listFiles().count(_.getName.startsWith("cid=")) ==
      new java.io.File(s"$ref/postings").listFiles().count(_.getName.startsWith("cid=")))
  }

  test("streaming vector ingest keeps the index fresh (appendStream == one-shot build)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ref = java.nio.file.Files.createTempDirectory("graft_ivf_sref").toString
    graft.operators.IvfIndex.build(spark, sf, ref)
    val live = java.nio.file.Files.createTempDirectory("graft_ivf_live").toString
    spark.read.parquet(s"$ref/codebook").coalesce(1).write.parquet(s"$live/codebook")

    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .withColumn("label", col("label").cast("long"))
      .select("vec_id", "label", "embedding")
      .as[(Long, Long, Array[Float])].collect().toSeq
    val input = MemoryStream[(Long, Long, Array[Float])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ivf_ck").toString
    val q = graft.operators.IvfIndex.appendStream(live,
      input.toDS().toDF("vec_id", "label", "embedding"), ckpt)
    try {
      // three micro-batches of arriving vectors
      vecs.grouped(math.max(1, vecs.size / 3 + 1)).foreach { g =>
        input.addData(g)
        q.processAllAvailable()
      }
    } finally q.stop()

    val a = graft.operators.IvfIndex.search(spark, sf, ref, nprobe = 2, k = 10)
      .collect().toSeq.map(_.toSeq)
    val b = graft.operators.IvfIndex.search(spark, sf, live, nprobe = 2, k = 10)
      .collect().toSeq.map(_.toSeq)
    assert(a == b)
  }
}
