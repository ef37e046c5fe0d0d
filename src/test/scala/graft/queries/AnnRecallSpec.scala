package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Similarity

/** q_ann_recall semantics: the recall@10 measurement of every approximate
  * ANN leg against the exact leg, and the two monotonicity laws that make
  * the measurement trustworthy rather than a lucky fixture artifact:
  *
  *  - IVF recall is non-decreasing in nprobe (probe sets nest, and an exact
  *    top-10 member ranks ≤10 inside any candidate subset containing it),
  *    reaching exactly 1.0 at nprobe = K (all clusters probed ≡ full scan);
  *  - PQ recall is non-decreasing in the reranked shortlist size (ADC
  *    shortlists nest; exact rerank keeps every true member), reaching
  *    exactly 1.0 when the shortlist is the whole corpus.
  *
  * Together these pin the HNSW-replacement story end to end: the engine's
  * approximate legs are tunably approximate, with a measured dial that
  * provably recovers exactness at its top setting.
  */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val K = 10

  private lazy val rows =
    graft.SparkEntry.queries("q_ann_recall")(spark, dir).collect()

  private def recallOf(leg: String): Map[Long, Double] =
    rows.filter(_.getAs[String]("leg") == leg)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Double]("recall")).toMap

  test("shape: 6 legs × 3 queries, hits consistent with recall") {
    assert(rows.length == 18)
    assert(rows.map(_.getAs[String]("leg")).distinct.sorted.toSeq ==
      Seq("exact", "ivf_np1", "ivf_np2", "ivfpq", "pq_adc", "pq_rerank"))
    rows.foreach { r =>
      val hits = r.getAs[Long]("hits")
      assert(hits >= 0 && hits <= K)
      assert(math.abs(r.getAs[Double]("recall") - hits.toDouble / K) < 1e-9)
    }
  }

  test("exact leg recalls itself perfectly") {
    assert(recallOf("exact").values.forall(_ == 1.0))
  }

  test("ivf recall is non-decreasing in nprobe (declared legs)") {
    val np1 = recallOf("ivf_np1"); val np2 = recallOf("ivf_np2")
    np1.keys.foreach(q => assert(np2(q) >= np1(q),
      s"qid=$q: nprobe=2 recall ${np2(q)} < nprobe=1 recall ${np1(q)}"))
  }

  test("pq rerank (shortlist 20) recall ≥ adc (shortlist 10) per query") {
    val adc = recallOf("pq_adc"); val rr = recallOf("pq_rerank")
    adc.keys.foreach(q => assert(rr(q) >= adc(q),
      s"qid=$q: rerank recall ${rr(q)} < adc recall ${adc(q)}"))
  }

  test("ivf recall rises to exactly 1.0 at nprobe = K (full probe ≡ exact)") {
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val qs = e.filter(col("vec_id").isin(0, 1, 2))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cent = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val exact = Similarity.bruteForceTopK(
        qs, "qid", "qvec", e, "vec_id", "embedding", K)
      .select(col("qid"), col("vec_id")).as[(Long, Long)].collect().toSet
    // recall at nprobe = 1, 2, 4 computed independently of the query plan
    val recalls = Seq(1, 2, 4).map { np =>
      val got = Similarity.ivfSearch(
          qs, "qid", "qvec", e, "vec_id", "embedding", cent, "cid", "cvec",
          nprobe = np, k = K)
        .select(col("qid"), col("vec_id")).as[(Long, Long)].collect().toSet
      np -> got.intersect(exact).size.toDouble / exact.size
    }
    recalls.sliding(2).foreach { case Seq((n1, r1), (n2, r2)) =>
      assert(r2 >= r1, s"recall fell from $r1 (np=$n1) to $r2 (np=$n2)")
    }
    assert(recalls.last._2 == 1.0, s"nprobe=K recall != 1.0: ${recalls.last}")
  }

  test("pq:auto resolves from the persisted fit-time curve to the smallest " +
      "target-meeting shortlist, and its LIVE recall on fresh queries holds " +
      "the floor (round-18 directive #1)") {
    import spark.implicits._
    import graft.index.{AnnIndex, IndexData, IndexJob, PqIndex}
    val tmp = java.nio.file.Files.createTempDirectory("graft-pqauto").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("string").as("doc_id"), col("embedding"))
    val built = IndexJob.fromTable(docs, "doc_id", "text",
      df => split(df("text"), " "), embeddings = Some(emb))
    IndexData.write(built.documents, built.settings, tmp)
    IndexJob.withPq(IndexData.load(spark, tmp), tmp, pqCodes = 16, pqIters = 3)
    val idx = IndexData.load(spark, tmp)

    // resolution contract: smallest measured step meeting the 0.9 target
    // (or the curve's last = corpus ≡ exact), exactly what the CLI serves
    val curve = AnnIndex.decodeCurve(
      idx.setting(PqIndex.RecallCurveKey).getOrElse(fail("no pq curve")))
    val expected = curve.find(_._2 >= 0.9).getOrElse(curve.last)._1
    val (np, sl) = graft.Cli.resolveAutoShortlist(idx, (0, graft.Cli.AutoShortlist))
    assert((np, sl) == ((0, expected)), s"curve=$curve")
    assert(sl > 0 && sl <= idx.pq.get.codes.count())

    // live recall at the RESOLVED shortlist, on queries the fit-time
    // sample rule did not hand-pick (vec_id 0/1/2 vs the md5-spread
    // sample): the auto dial must hold a floor under the 0.9 fit target
    val qs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id").isin(0, 1, 2))
      .select(col("embedding")).as[Array[Float]].collect()
    val live = qs.map { qvec =>
      val exact = graft.search.HybridSearch.vssTopK(idx.documents, qvec, K)
        .select("doc_id").as[String].collect().toSet
      val got = graft.search.HybridSearch.vssTopKPq(
          idx.pq.get, idx.documents, qvec, K, sl)
        .select("doc_id").as[String].collect().toSet
      got.intersect(exact).size.toDouble / exact.size
    }.sum / qs.length
    assert(live >= 0.8, s"live recall $live at resolved shortlist $sl " +
      s"(curve $curve) under the 0.8 floor")
  }
}
