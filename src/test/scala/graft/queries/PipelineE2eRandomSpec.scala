package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** c11 vs an INDEPENDENT driver-side reimplementation of the whole
  * funnel (gates, dedup, decon, quota, split re-derived from the
  * stated rules, not from the engine's code) over seeded random
  * corpora with planted duplicates, eval-overlapping docs, gate
  * failures, and two languages — the same randomized-sweep evidence
  * pattern PackedPairArgmaxSpec uses for the kernel. */
class PipelineE2eRandomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private case class Doc(id: Long, text: String, lang: String, nChars: Long)

  private def reference(docs: Seq[Doc]): Map[String, (Long, Long, Long)] = {
    val stop = Seq("the", "a", "and", "of")
    def words(t: String) = t.split(" ").filter(_.nonEmpty)
    def gates(t: String): Int = {
      val w = words(t).length.toLong
      val dw = words(t).distinct.length.toLong
      val ns = t.replace(" ", "").length.toLong
      val sw = stop.count(s => s" $t ".contains(s" $s "))
      Seq(w >= 50 && w <= 100000L, 3 * w <= ns && ns <= 10 * w,
        sw >= 2, 2 * dw >= w).count(identity)
    }
    def grams(t: String): Set[String] = {
      val ws = words(t)
      if (ws.length < 5) Set.empty
      else ws.sliding(5).map(_.mkString(" ")).toSet
    }
    def skey(id: Long) = java.lang.Math.floorMod(id * 2654435761L, 4294967296L)
    val evalGrams = docs.filter(_.id % 37 == 0).flatMap(d => grams(d.text)).toSet
    val raw = docs.filter(_.id % 37 != 0)
    val gated = raw.filter(d => gates(d.text) >= 3)
    val keep = gated.groupBy(_.text).values.map(_.minBy(_.id).id).toSet
    val dd = gated.filter(d => keep(d.id))
    val clean = dd.filter { d =>
      val g = grams(d.text)
      val hits = (g & evalGrams).size
      g.isEmpty || hits * 10 < g.size
    }
    val per = clean.groupBy(_.lang).map { case (l, ds) =>
      l -> math.round(math.sqrt(ds.size.toDouble) * 1e9)
    }
    val stot = per.values.sum
    val mix = clean.groupBy(_.lang).toSeq.flatMap { case (l, ds) =>
      val quota = (200L * per(l)) / stot
      ds.sortBy(d => (skey(d.id), d.id)).take(quota.toInt)
    }
    def stage(name: String, ds: Seq[Doc]) =
      name -> ((ds.size.toLong, ds.map(_.nChars).sum,
        ds.map(d => words(d.text).length.toLong).sum))
    val splits = mix.groupBy { d =>
      val b = java.lang.Math.floorMod(skey(d.id), 10L)
      if (b < 8) "6_train" else if (b == 8) "6_val" else "6_test"
    }
    (Seq(stage("0_raw", raw), stage("1_scrubbed", raw), // scrub = identity here
      stage("2_gated", gated), stage("3_deduped", dd),
      stage("4_decontaminated", clean), stage("5_mixture", mix)) ++
      splits.toSeq.map { case (s, ds) => stage(s, ds) }).toMap
  }


  test("randomized corpora: engine funnel manifest equals the independent reference") {
    import spark.implicits._
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val vocab = (1 to 30).map(i => s"tok$i")
      def sentence(n: Int): String =
        (if (rnd.nextBoolean()) "the of " else "") +
          (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      // a pool with planted duplicates; ids include %37==0 eval docs
      val pool = (1 to 8).map(_ => sentence(rnd.nextInt(40) + 35))
      val docs = (1 to 60).map { i =>
        val id = (trial * 300 + i).toLong
        val t =
          if (rnd.nextInt(4) == 0) pool(rnd.nextInt(pool.size)) // dup / overlap
          else sentence(rnd.nextInt(40) + 35)
        Doc(id, t, if (rnd.nextBoolean()) "en" else "de", t.length.toLong)
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft_e2e_r$trial").toString
      docs.map(d => (d.id, d.text, d.lang, "srcA", d.nChars))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = graft.SparkEntry.queries("c11_pipeline_e2e")(spark, dir)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val ref = reference(docs)
      // corpus stages + split: exact vs the independent reference
      val corpusStages = got.view.filterKeys(k => !k.startsWith("7_") &&
        !k.startsWith("8_") && !k.startsWith("9_")).toMap
      assert(corpusStages == ref, s"trial $trial: got $got\nref $ref")
      // terminal stages: conservation invariants vs the reference
      val (trainDocs, trainChars, trainToks) =
        ref.getOrElse("6_train", (0L, 0L, 0L))
      assert(got("7_packed")._2 == trainChars && got("7_packed")._3 == trainToks,
        s"trial $trial packed: $got vs train ($trainChars, $trainToks)")
      assert(got("8_tokenized")._1 == trainDocs && got("8_tokenized")._3 >= trainToks,
        s"trial $trial tokenized: $got")
      assert(got("9_sharded") ==
        ((math.ceil(trainDocs / 100.0).toLong, trainChars, trainToks)),
        s"trial $trial sharded: $got")
    }
  }
}
