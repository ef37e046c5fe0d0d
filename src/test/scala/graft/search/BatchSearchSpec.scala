package graft.search

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.embed.HashingEmbedder
import graft.index.IndexJob

class BatchSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("batch search equals per-query hybrid search") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".cast("string").as("doc_id"), $"embedding")
    val index = IndexJob.fromTable(
      docs, "doc_id", "text",
      df => split(df("text"), " "), embeddings = Some(emb))

    val embedder = new HashingEmbedder(64, graft.analyze.WhitespaceAnalyzer.tokenize)
    val queries = Seq(
      "q0" -> "spark join merge",
      "q1" -> "window batch stream",
      "q2" -> "customer order value")

    val batch = BatchSearch.searchBatch(index, queries,
      analyzer = graft.analyze.WhitespaceAnalyzer,
      embedder = Some(embedder),
      opts = BatchSearch.Options(k = 5))
      .collect()
      .groupBy(_.getAs[String]("qid"))
      .view.mapValues(_.map(r =>
        (r.getAs[String]("doc_id"), math.rint(r.getAs[Double]("score") * 1e9))).toSet)
      .toMap

    queries.foreach { case (qid, text) =>
      val single = HybridSearch.search(index, text,
        analyzer = graft.analyze.WhitespaceAnalyzer,
        embedder = Some(embedder), reranker = None,
        opts = HybridSearch.Options(k = 5)).collect()
        .map(r => (r.getAs[String]("doc_id"), math.rint(r.getAs[Double]("score") * 1e9))).toSet
      assert(batch(qid) == single, s"mismatch for $qid")
    }

    // zero-embedding query in the batch: degrades to BM25-only for THAT
    // query (null vss leg, no NaN scores), others unaffected — the
    // HybridSearch.search zero-norm contract, batch edition
    final class ZeroFor(q: String) extends graft.embed.Embedder {
      def dim = 64
      def name = "zero-for"
      def embed(texts: Seq[String]): Seq[Array[Float]] =
        texts.map(t =>
          if (t == q) Array.fill(64)(0f) else embedder.embed(Seq(t)).head)
    }
    val withZero = BatchSearch.searchBatch(index, queries,
      analyzer = graft.analyze.WhitespaceAnalyzer,
      embedder = Some(new ZeroFor("spark join merge")),
      opts = BatchSearch.Options(k = 5)).collect()
    assert(withZero.nonEmpty)
    withZero.foreach { r =>
      assert(!r.getAs[Double]("score").isNaN,
        s"NaN score for ${r.getAs[String]("qid")}/${r.getAs[String]("doc_id")}")
    }
    val zeroQ = withZero.filter(_.getAs[String]("qid") == "q0")
    assert(zeroQ.nonEmpty, "zeroed query returned nothing (BM25 leg lost)")
    zeroQ.foreach(r => assert(r.isNullAt(r.fieldIndex("vss_score")),
      "vss_score should be null for the zero-embedded query"))

    // ANN batch leg: probing ALL clusters must reproduce the exact batch
    // result (the probeSearchBatch composition changes the scan, never the
    // candidate semantics at full probe)
    val cents = graft.index.AnnIndex.fit(index.documents, "doc_id", "embedding",
      k = 3, iters = 2).localCheckpoint(true)
    val ann = graft.index.AnnIndex(cents,
      graft.index.AnnIndex.buildPostings(index.documents, "doc_id", "embedding", cents))
    val annIndex = index.copy(ann = Some(ann))
    val annBatch = BatchSearch.searchBatch(annIndex, queries,
      analyzer = graft.analyze.WhitespaceAnalyzer,
      embedder = Some(embedder),
      opts = BatchSearch.Options(k = 5, annNprobe = 3))
      .collect()
      .groupBy(_.getAs[String]("qid"))
      .view.mapValues(_.map(r =>
        (r.getAs[String]("doc_id"), math.rint(r.getAs[Double]("score") * 1e9))).toSet)
      .toMap
    assert(annBatch == batch, "full-probe ANN batch diverged from exact batch")

    // reranked batch parity: the batch rerank surface must return the SAME
    // documents+scores as per-query HybridSearch.search with the same
    // reranker — full fused candidate set reranked, threshold applied to
    // the reranked score (not the pre-rerank hybrid score)
    val reranker =
      new graft.rerank.TokenOverlapReranker(graft.analyze.WhitespaceAnalyzer.tokenize)
    val rr = BatchSearch.searchBatchReranked(index, queries, reranker,
      analyzer = graft.analyze.WhitespaceAnalyzer,
      embedder = Some(embedder),
      opts = BatchSearch.Options(k = 5)).collect()
    val byQid = rr.groupBy(_.getAs[String]("qid"))
    assert(byQid.keySet == queries.map(_._1).toSet)
    byQid.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rows.length).toSeq)
    }
    queries.foreach { case (qid, text) =>
      val single = HybridSearch.search(index, text,
        analyzer = graft.analyze.WhitespaceAnalyzer,
        embedder = Some(embedder), reranker = Some(reranker),
        opts = HybridSearch.Options(k = 5)).collect()
        .map(r => (r.getAs[String]("doc_id"), math.rint(r.getAs[Double]("score") * 1e9))).toSet
      val fromBatch = byQid(qid)
        .map(r => (r.getAs[String]("doc_id"), math.rint(r.getAs[Double]("score") * 1e9))).toSet
      assert(fromBatch == single, s"rerank parity mismatch for $qid")
    }
  }

  test("probeSearchBatch prunes the persisted lists scan to the probed " +
      "clusters (rows-read)") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select($"vec_id".cast("string").as("doc_id"), $"embedding")
    val d = java.nio.file.Files.createTempDirectory("batchann").toString
    val ann = graft.index.AnnIndex.buildAndWrite(emb, "doc_id", "embedding", d,
      k = 8, iters = 3)
    val total = ann.postings.count()
    val qs = emb.limit(3).select($"doc_id".as("qid"), $"embedding".as("qvec"))
      .localCheckpoint(true)
    // expectNonZero: the bound below is `read ≤ 70% of total` — a slow
    // listener bus returning 0 would pass it vacuously (round-15 ADVICE)
    val (res, read) = graft.util.InputMetrics.rowsRead(spark, expectNonZero = true) {
      ann.probeSearchBatch(qs, "qid", "qvec", nprobe = 1, k = 5).collect()
    }
    assert(res.nonEmpty)
    assert(read > 0, "rows-read pin needs a real read-out, got 0")
    // 3 queries × nprobe=1 probe ≤3 of the 8 cluster directories — the scan
    // must read well under the whole lists table. Pre-round-15 this read
    // 100% at ANY nprobe: the broadcast cluster join alone never pruned the
    // partitioned scan (DPP does not fire on a windowed-subquery build
    // side); the static pushed `cluster IN (…)` from the collected probed
    // set is what prunes — the quantity that keeps the batch ANN leg from
    // scanning the full corpus-sized lists at scale.
    assert(read <= (total * 7) / 10, s"read $read of $total lists rows")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
  }
}
