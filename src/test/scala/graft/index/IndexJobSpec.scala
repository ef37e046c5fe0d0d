package graft.index

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.analyze.DefaultAnalyzer
import graft.embed.HashingEmbedder
import graft.search.HybridSearch

/** The §7.2 minimum end-to-end slice: INDEX a markdown tree with the regex
  * analyzer + hashing embedder, then SEARCH it and get the right chunk back. */
class IndexJobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("index markdown directory then search it end-to-end") {
    val root = Files.createTempDirectory("graft-idx").toFile
    val docs = new java.io.File(root, "docs"); docs.mkdirs()
    val sub = new java.io.File(docs, "sub"); sub.mkdirs()
    Files.writeString(new java.io.File(docs, "a.md").toPath,
      """---
        |title: a
        |---
        |# Search Engines
        |
        |## Full Text
        |BM25 ranks documents by term frequency.
        |
        |## Vectors
        |Embeddings capture semantic similarity.
        |""".stripMargin)
    Files.writeString(new java.io.File(sub, "b.md").toPath,
      "# Cooking\n\nRecipes involve ingredients and heat.\n")
    Files.writeString(new java.io.File(sub, "ignore.txt").toPath, "not markdown")

    val indexDir = new java.io.File(root, "index").getAbsolutePath
    val embedder = new HashingEmbedder(32)
    val index = IndexJob.run(spark, Seq(docs.getAbsolutePath), indexDir, embedder,
      opts = IndexJob.Options(trimPathPrefix = Some("file:" + docs.getAbsolutePath)))

    // artifact shape
    val documents = index.documents.collect()
    assert(documents.length == 4) // 3 sections in a.md + 1 in b.md
    val paths = documents.map(_.getAs[String]("file_path")).toSet
    assert(paths == Set("a.md", "sub/b.md")) // .txt ignored, prefix trimmed
    val headers = documents.map(_.getAs[String]("header_path")).toSet
    assert(headers.contains("Search Engines/Full Text"))
    assert(index.setting("embedding_model").contains(embedder.name))
    assert(index.setting("embedding_dim").contains("32"))
    // front matter stripped but line numbers preserved: '# Search Engines'
    // is line 4 of the original file
    val first = documents.filter(_.getAs[String]("header_path") == "Search Engines")
    assert(first.head.getAs[Int]("line_start") == 4)

    // stats exist and are consistent
    assert(index.stats.collect().head.getAs[Long]("n_docs") == 4L)

    // search finds the right chunk, hybrid end-to-end
    val hits = HybridSearch.search(index, "BM25 term frequency ranking",
      analyzer = DefaultAnalyzer,
      embedder = Some(embedder),
      reranker = None,
      opts = HybridSearch.Options(k = 2)).collect()
    assert(hits.nonEmpty)
    assert(hits.head.getAs[String]("header_path") == "Search Engines/Full Text")
  }
}
