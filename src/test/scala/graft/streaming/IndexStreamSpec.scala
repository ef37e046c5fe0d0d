package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.embed.HashingEmbedder
import graft.index.{IndexData, IndexJob}

class IndexStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def write(dir: String, name: String, text: String): Unit =
    Files.writeString(Paths.get(dir, name), text)

  private def canonDocs(df: DataFrame) = {
    import org.apache.spark.sql.functions._
    df.select(col("doc_id"), col("file_path"), col("header_path"),
        col("line_start"), col("line_end"), col("content"))
      .collect().map(_.toSeq).toSet
  }

  test("drip-fed stream converges to the batch-built index") {
    val docs = Files.createTempDirectory("idxstream-docs").toString
    val streamIdx = Files.createTempDirectory("idxstream-s").toString + "/idx"
    val batchIdx = Files.createTempDirectory("idxstream-b").toString + "/idx"
    val embedder = new HashingEmbedder(dim = 16)

    write(docs, "a.md", "# Alpha\n\nspark merges sorted runs fast\n")
    val q = IndexStream.start(spark, docs, streamIdx, embedder)
    try {
      q.processAllAvailable()

      // first file indexed and searchable mid-stream
      val mid = IndexData.load(spark, streamIdx)
      assert(mid.documents.count() >= 1)

      // two more files arrive in a later micro-batch
      write(docs, "b.md", "# Beta\n\nvector cosine search embedding space\n\n## Sub\n\nmore body text\n")
      write(docs, "c.md", "plain text body with no headers at all\n")
      q.processAllAvailable()
    } finally q.stop() // a failed assertion must not leak the stream

    val streamed = IndexData.load(spark, streamIdx)
    val batch = IndexJob.run(spark, Seq(docs), batchIdx, new HashingEmbedder(dim = 16))

    // content-addressed ids ⇒ exact equality of the artifacts
    assert(canonDocs(streamed.documents) == canonDocs(batch.documents))
    assert(streamed.documents.count() == batch.documents.count())
    // derived BM25 stats agree too
    val sStats = streamed.stats.collect().map(_.toSeq).toSet
    val bStats = batch.stats.collect().map(_.toSeq).toSet
    assert(sStats == bStats)
  }

  test("watched index with ANN sidecar: lists re-derive each batch, --ann finds new docs") {
    import org.apache.spark.sql.functions._
    val docs = Files.createTempDirectory("idxstream-ann-docs").toString
    val idxDir = Files.createTempDirectory("idxstream-ann-s").toString + "/idx"
    val embedder = new HashingEmbedder(dim = 16)

    write(docs, "a.md", "# Alpha\n\nspark merges sorted runs fast\n")
    val q = IndexStream.start(spark, docs, idxDir, embedder,
      opts = IndexJob.Options(annClusters = 2, annIters = 2))
    try {
      q.processAllAvailable()
      assert(IndexData.load(spark, idxDir).ann.isDefined) // built on batch 1
      write(docs, "b.md", "# Beta\n\nvector cosine search embedding space\n")
      q.processAllAvailable()
    } finally q.stop()

    val idx = IndexData.load(spark, idxDir)
    val ann = idx.ann.getOrElse(fail("ann sidecar missing"))
    // frozen-centroid re-assignment covered the batch-2 doc: every merged
    // document is in exactly one inverted list
    assert(ann.postings.count() == idx.documents.count())
    // and --ann search (probing ALL clusters) can reach the new doc
    val hits = graft.search.HybridSearch.search(idx, "vector cosine",
      embedder = Some(embedder),
      opts = graft.search.HybridSearch.Options(k = 3, rerank = false,
        annNprobe = ann.numClusters))
      .select("file_path").collect().map(_.getString(0))
    assert(hits.exists(_.endsWith("b.md")), hits.mkString(","))
  }

  test("tfidf watch: frozen-model deltas, re-fit barrier restores batch equality") {
    import org.apache.spark.sql.functions._
    val docs = Files.createTempDirectory("idxstream-tf-docs").toString
    val streamIdx = Files.createTempDirectory("idxstream-tf-s").toString + "/idx"
    val batchIdx = Files.createTempDirectory("idxstream-tf-b").toString + "/idx"
    val dim = 32

    write(docs, "a.md", "# Alpha\n\nspark merges sorted runs fast\n")
    // refitEvery = 0: no automatic re-fit, so the second batch demonstrably
    // embeds under the FROZEN bootstrap model before the explicit barrier
    val q = IndexStream.startTfIdf(spark, docs, streamIdx, dim, refitEvery = 0)
    try {
      q.processAllAvailable()
      assert(IndexData.load(spark, streamIdx).documents.count() >= 1)
      write(docs, "b.md", "# Beta\n\nvector cosine search embedding space\n")
      write(docs, "c.md", "plain spark text body with cosine vector terms\n")
      q.processAllAvailable()
    } finally q.stop()

    // before the barrier: b/c docs carry the bootstrap model's (stale) idf —
    // the documented contract, not an accident. The barrier re-fits over the
    // merged corpus and re-embeds everything.
    IndexStream.tfidfRefit(spark, streamIdx, dim)

    val streamed = IndexData.load(spark, streamIdx)
    val batch = IndexJob.runTfIdf(spark, Seq(docs), batchIdx, dim)

    assert(canonDocs(streamed.documents) == canonDocs(batch.documents))
    // embeddings must be bit-identical after the barrier: both sides are
    // one fitTransform over the same (content-addressed) corpus
    def embs(df: DataFrame) = df
      .select(col("doc_id"), col("embedding"))
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(embs(streamed.documents) == embs(batch.documents))
    // and the persisted models agree
    val sm = graft.embed.TfIdfEmbed.load(spark, s"$streamIdx/tfidf_model")
    val bm = graft.embed.TfIdfEmbed.load(spark, s"$batchIdx/tfidf_model")
    assert(sm.dim == bm.dim && sm.idf.toSeq == bm.idf.toSeq)
  }
}
