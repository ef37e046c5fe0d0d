package graft.index

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.embed.LookupEmbedder
import graft.search.HybridSearch

/** The persisted IVF sidecar and the `--ann` search path: deterministic fit,
  * artifact roundtrip, partition-pruned probe scans, and the recall contract
  * (nprobe = K ≡ exact — fusion semantics unchanged). */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val K = 4 // clusters

  /** documents + embeddings testdata as a written index artifact with the
    * ANN sidecar, built once for the suite. */
  private lazy val artifactDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").cast("string").as("doc_id"), col("embedding"))
    val idx = IndexJob.fromTable(docs, "doc_id", "text",
      df => split(df("text"), " "), embeddings = Some(emb))
    IndexData.write(idx.documents, idx.settings, dir)
    IndexJob.withAnn(IndexData.load(spark, dir), dir, annClusters = K, annIters = 3)
    dir
  }

  private lazy val index: IndexData = IndexData.load(spark, artifactDir)

  private def queryVec: Array[Float] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") === 7).select("embedding")
      .as[Array[Float]].head()

  private def searchOpts(nprobe: Int) = HybridSearch.Options(
    k = 10, rerank = false, annNprobe = nprobe)

  private def run(nprobe: Int): Seq[(String, Double)] =
    HybridSearch.search(index, "spark join merge",
      analyzer = graft.analyze.WhitespaceAnalyzer,
      embedder = Some(new LookupEmbedder(Map("spark join merge" -> queryVec))),
      reranker = None,
      opts = searchOpts(nprobe))
      .select("doc_id", "score")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

  test("drift metric rides the postings: assign_dist column ≡ recomputed join") {
    val ann = index.ann.getOrElse(fail("ann sidecar missing"))
    assert(ann.postings.columns.contains("assign_dist"))
    // the column-scan metric (what merges now pay) against the recomputing
    // broadcast-join form (what pre-column sidecars fall back to): same
    // per-row distances, so the means agree to float-sum reassociation
    val viaColumn = ann.meanAssignDist
    val viaJoin = ann.postings
      .join(broadcast(ann.centroids), col("cluster") === col("cid"))
      .agg(avg(graft.functions.VectorOps.cosineDist(col("embedding"), col("cvec"))))
      .head().getDouble(0)
    assert(math.abs(viaColumn - viaJoin) < 1e-9, s"$viaColumn vs $viaJoin")
  }

  test("fit is deterministic: same corpus, same centroids, both runs") {
    val docs = index.documents
    def centroids() = AnnIndex.fit(docs, "doc_id", "embedding", k = K, iters = 2)
      .orderBy("cid").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    assert(centroids().toSeq == centroids().toSeq)
  }

  test("artifact roundtrip: sidecar loads, postings are cluster-partitioned, lists cover the corpus") {
    val ann = index.ann.getOrElse(fail("ann sidecar missing after withAnn"))
    assert(ann.numClusters == K)
    // directory layout: hive-partitioned by cluster
    val sub = new java.io.File(s"$artifactDir/${AnnIndex.PostingsDir}")
      .listFiles().map(_.getName).filter(_.startsWith("cluster="))
    assert(sub.nonEmpty && sub.length <= K, sub.mkString(","))
    // every embedded document is in exactly one inverted list
    assert(ann.postings.count() == index.documents.filter(col("embedding").isNotNull).count())
    assert(ann.postings.select("doc_id").distinct().count() == ann.postings.count())
    // FILE-COUNT bound (round-16, the disk_ivf_auto adjudication): the
    // clustered write keeps total list files ≤ shuffle.partitions + K —
    // the raw partitionBy write scattered up to one file per (shuffle
    // partition × cluster) and a cold probe paid a footer round-trip per
    // file (506 files on the sf0.1 bench artifact; see PLANS.md round-16)
    val files = new java.io.File(s"$artifactDir/${AnnIndex.PostingsDir}")
      .listFiles().filter(_.getName.startsWith("cluster="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    assert(files.sum <= spark.sessionState.conf.numShufflePartitions + files.length,
      s"ann_postings carries ${files.sum} files over ${files.length} clusters")
  }

  test("nprobe = numClusters reproduces the exact search result (fusion unchanged)") {
    assert(run(nprobe = K) == run(nprobe = 0))
  }

  test("ann search VSS leg is a partition-pruned scan of only the probed clusters") {
    val ann = index.ann.get
    val leg = HybridSearch.vssTopKIvf(ann, queryVec, k = 10, nprobe = 2)
    val p = leg.queryExecution.executedPlan.toString
    // the probe filter must land as a PARTITION filter on the parquet scan
    // (reads nprobe/K of the files), not a post-scan data filter
    assert("PartitionFilters: \\[[^\\]]*cluster".r.findFirstIn(p).isDefined, p.take(1500))
    // and the scan must be the pruned ann_postings, not the documents table
    assert(p.contains(AnnIndex.PostingsDir), p.take(1500))
    assert(leg.count() <= 10)
  }

  test("probe selection is deterministic and ranked by centroid distance") {
    val ann = index.ann.get
    val p1 = ann.probe(queryVec, 2)
    assert(p1 == ann.probe(queryVec, 2))
    assert(p1.length == 2 && p1.distinct.length == 2)
    assert(ann.probe(queryVec, K).take(2) == p1) // prefix-stable ranking
  }

  test("driver-local probe ≡ distributed probe (the scalar math can't drift)") {
    val ann = index.ann.get
    val qvecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 10).orderBy("vec_id")
      .select("embedding").as[Array[Float]].collect()
    assert(qvecs.length == 10)
    for (qv <- qvecs; np <- Seq(1, 2, K))
      assert(ann.probe(qv, np) == ann.probeDistributed(qv, np),
        s"local vs distributed probe diverged at nprobe=$np")
  }

  test("local cosine distance is bit-identical to the codegen expression") {
    val pairs = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 8)
      .select(col("embedding").as("a"))
      .crossJoin(spark.read.parquet(s"$sf/embeddings.parquet")
        .filter(col("vec_id") >= 8 && col("vec_id") < 12)
        .select(col("embedding").as("b")))
    val viaExpr = pairs
      .select(col("a"), col("b"),
        graft.functions.VectorOps.cosineDist(col("a"), col("b")).as("d"))
      .collect()
    viaExpr.foreach { r =>
      val local = AnnIndex.localCosineDist(
        r.getSeq[Float](0).toArray, r.getSeq[Float](1).toArray)
      assert(java.lang.Double.doubleToLongBits(local) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)))
    }
  }

  test("ivf leg recall vs the exact leg is high at nprobe=2 and its hits are real") {
    val exact = HybridSearch.vssTopK(index.documents, queryVec, 10)
      .select("doc_id").as[String].collect().toSet
    val approx = HybridSearch.vssTopKIvf(index.ann.get, queryVec, 10, nprobe = 2)
      .select("doc_id").as[String].collect().toSet
    assert(approx.nonEmpty && approx.size <= 10)
    // every approx hit is a real document (no fabrication — the IVF lists
    // store corpus vectors verbatim)
    assert(approx.subsetOf(
      index.documents.select("doc_id").as[String].collect().toSet))
    val recall = (exact intersect approx).size.toDouble / exact.size
    // sf0.001 embeddings are near-uniform — a hostile case for IVF; the
    // contract asserted hard is nprobe=K ≡ exact (above), this is a sanity
    // floor that the probed half of the corpus still finds most neighbors
    assert(recall >= 0.3, s"recall $recall; exact=$exact approx=$approx")
  }

  private def clusteredDocs(ids: Seq[String], axisOf: Int => Int) =
    graft.TestFixtures.clusteredDocs(spark, ids, axisOf)

  test("fit persists a sample recall curve: monotone in nprobe, 1.0 at K, " +
      "decodable from settings") {
    // the artifact fit via withAnn persisted the curve
    val persisted = index.setting(AnnIndex.RecallCurveKey)
    assert(persisted.isDefined, "no ann_recall_curve setting after fit")
    val curve = AnnIndex.decodeCurve(persisted.get)
    assert(curve.nonEmpty && curve.last._1 == K)
    // monotone non-decreasing (probe sets nest; structural, not fixture luck)
    curve.sliding(2).foreach {
      case Seq((n1, r1), (n2, r2)) =>
        assert(r2 >= r1 - 1e-9, s"recall fell from $r1 (np=$n1) to $r2 (np=$n2)")
      case _ => ()
    }
    // full probe scans everything — recall is exactly 1.0 by construction
    assert(curve.last._2 == 1.0, s"recall at nprobe=K != 1.0: ${curve.last}")
    // re-measuring on the same artifact reproduces the persisted values
    val ann = index.ann.getOrElse(fail("no ann sidecar"))
    val remeasured = AnnIndex.recallCurve(
      ann, index.documents, "doc_id", "embedding")
    assert(AnnIndex.encodeCurve(remeasured) == persisted.get)
    // encode/decode round-trip
    assert(AnnIndex.decodeCurve(AnnIndex.encodeCurve(curve)) ==
      AnnIndex.decodeCurve(persisted.get))
  }

  test("drift contract: shifted merge raises ann_drift past the threshold; --refit-ann restores it and the recall floor") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-drift").toString
    // corpus A: 200 docs clustered on axes 0-3 — a fit the IVF index nails
    val docsA = clusteredDocs((0 until 200).map(i => f"a$i%03d"), _ % 4)
    IndexData.write(docsA, Seq.empty[(String, String)].toDF("key", "value"), dir)
    val a1 = IndexJob.withAnn(IndexData.load(spark, dir), dir, annClusters = K, annIters = 3)
    // fresh fit: baseline persisted, drift 0 by definition
    val fit = a1.setting(AnnIndex.FitMeanDistKey).map(_.toDouble)
      .getOrElse(fail("no fit baseline after fresh withAnn"))
    assert(fit > 0.0)
    assert(a1.setting(AnnIndex.DriftKey).map(_.toDouble).contains(0.0))

    // merge a batch from a SHIFTED distribution (axes 8-11 — orthogonal to
    // everything the centroids were fit on) through the real incremental
    // path: frozen centroids re-derive the lists, the metric is re-measured
    // settings passed the way the CLI passes them — only the embedder keys.
    // The merge must UPSERT against the artifact's settings (not truncate),
    // or the fit-time drift baseline would be clobbered on every merge.
    val docsB = clusteredDocs((0 until 100).map(i => f"b$i%03d"), i => 8 + i % 4)
    val a2 = IndexJob.mergeAndWrite(spark, docsB,
      IndexJob.settingsOf(spark, "synthetic", 16), dir, clear = false)
    assert(a2.setting(AnnIndex.FitMeanDistKey).map(_.toDouble).contains(fit),
      "fit baseline must survive an incremental merge with embedder-only settings")
    assert(a2.setting("embedding_model").contains("synthetic"))
    val drift = a2.setting(AnnIndex.DriftKey).map(_.toDouble)
      .getOrElse(fail("no drift after incremental merge"))
    assert(drift > AnnIndex.DriftWarnThreshold,
      s"shifted-distribution merge should raise drift past the warn threshold; got $drift")

    // recall under the frozen (stale) centroids for a shifted-region query
    val qB = Array.tabulate(16)(j => if (j == 9) 1.0f else 0.0f)
    def recallAt(ann: AnnIndex, documents: org.apache.spark.sql.DataFrame): Double = {
      val exact = HybridSearch.vssTopK(documents, qB, 10)
        .select("doc_id").as[String].collect().toSet
      val approx = HybridSearch.vssTopKIvf(ann, qB, 10, nprobe = 1)
        .select("doc_id").as[String].collect().toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val frozenRecall = recallAt(a2.ann.get, a2.documents)

    // --refit-ann: re-fit over the merged corpus (K carried over), drift
    // resets below the threshold and recall is at least restored
    val a3 = IndexJob.withAnn(a2, dir, annClusters = 0, refit = true)
    assert(a3.ann.map(_.numClusters).contains(K)) // K carried over
    val refitDrift = a3.setting(AnnIndex.DriftKey).map(_.toDouble).get
    assert(refitDrift == 0.0)
    val refitRecall = recallAt(a3.ann.get, a3.documents)
    assert(refitRecall >= frozenRecall,
      s"refit recall $refitRecall should not be below frozen recall $frozenRecall")
    assert(refitRecall >= 0.5, s"refit recall floor: $refitRecall")
  }

  test("IndexJob.run --ann-clusters end-to-end on markdown files") {
    val docsDir = java.nio.file.Files.createTempDirectory("graft-ann-docs")
    java.nio.file.Files.writeString(docsDir.resolve("a.md"),
      "# Spark\n\nspark joins merge quickly\n")
    java.nio.file.Files.writeString(docsDir.resolve("b.md"),
      "# Ducks\n\nducks quack on the pond\n")
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ann-idx").toString
    val built = IndexJob.run(spark, Seq(docsDir.toString), idxDir,
      new graft.embed.HashingEmbedder(16),
      opts = IndexJob.Options(annClusters = 2, annIters = 2))
    assert(built.ann.isDefined)
    val loaded = IndexData.load(spark, idxDir)
    assert(loaded.ann.isDefined)
    val hits = HybridSearch.search(loaded, "spark",
      embedder = Some(new graft.embed.HashingEmbedder(16)),
      opts = HybridSearch.Options(k = 3, rerank = false, annNprobe = 1))
      .select("doc_id").collect()
    assert(hits.nonEmpty)
  }
}
