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
}
