package graft.search

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.analyze.{Analyzers, CjkBigramAnalyzer}
import graft.index.{IndexData, IndexJob}

/** End-to-end Japanese retrieval through the persisted-settings contract:
  * index built with the CJK bigram analyzer + trained Word2Vec embedder,
  * then searched by RE-RESOLVING both from the saved artifact — the full
  * analyzer/model consistency loop the reference keeps via its settings
  * table (reference `src/db.py:93-97`, `src/cli.py:327-338`), exercised on
  * the kind of Japanese content the reference targets. */
class JapaneseSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bigram + word2vec index: settings round-trip and Japanese query hits") {
    val docsDir = java.nio.file.Files.createTempDirectory("graft-ja-docs")
    def write(name: String, text: String): Unit =
      java.nio.file.Files.write(docsDir.resolve(name),
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    write("kensaku.md",
      "# 検索エンジン\n\n全文検索と意味検索を組み合わせたハイブリッド検索。\n\n" +
        "## 分散処理\n\nSparkで動く分散データ処理の仕組み。\n")
    write("ryouri.md",
      "# 料理メモ\n\n味噌汁と炊き込みご飯の作り方。\n\n野菜を切って煮込む。\n")
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ja-idx").toString

    IndexJob.runWord2Vec(spark, Seq(docsDir.toString), idxDir,
      dim = 16, analyzer = CjkBigramAnalyzer)

    // the artifact pins BOTH model and analyzer
    val index = IndexData.load(spark, idxDir)
    assert(index.setting("analyzer").contains("bigram"))
    assert(index.setting("embedding_model").contains("w2v-16"))

    // search resolves analyzer + embedder FROM the settings, like the CLI
    val analyzer = Analyzers.byName(index.setting("analyzer").get)
    val embedder = graft.embed.Word2VecEmbed.load(spark, s"$idxDir/w2v_model")
      .embedder(analyzer.tokenize)
    val hits = HybridSearch.search(index, "全文検索",
      analyzer = analyzer, embedder = Some(embedder),
      opts = HybridSearch.Options(k = 3, rerank = false)).collect()
    assert(hits.nonEmpty, "Japanese query found nothing")
    // the search doc must beat the cooking doc: its chunks contain the
    // query bigrams (全文/文検/検索), the other file shares none of them
    val top = hits.head
    assert(top.getAs[String]("file_path").endsWith("kensaku.md"),
      hits.map(_.getAs[String]("file_path")).mkString(", "))
    assert(top.getAs[String]("content").contains("全文検索"))

    // tokens-are-data guard: the same query through the UNIGRAM default
    // produces different terms, so cross-analyzer search would not see the
    // stored bigram postings — exactly why the setting must round-trip
    assert(CjkBigramAnalyzer.tokenize("全文検索") !=
      graft.analyze.DefaultAnalyzer.tokenize("全文検索"))
  }

  test("dictionary analyzer: wordlist persists inside the settings name " +
      "and Japanese retrieval segments by dictionary words") {
    val docsDir = java.nio.file.Files.createTempDirectory("graft-jd-docs")
    def write(name: String, text: String): Unit =
      java.nio.file.Files.write(docsDir.resolve(name),
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    write("kensaku.md",
      "# 検索エンジン\n\n全文検索と意味検索を組み合わせたハイブリッド検索。\n")
    write("ryouri.md",
      "# 料理メモ\n\n味噌汁と炊き込みご飯の作り方。\n")
    val idxDir = java.nio.file.Files.createTempDirectory("graft-jd-idx").toString

    val dict = graft.analyze.DictionaryAnalyzer(
      Set("全文検索", "意味検索", "検索", "エンジン", "ハイブリッド"))
    IndexJob.runWord2Vec(spark, Seq(docsDir.toString), idxDir,
      dim = 16, analyzer = dict)

    // the ONE settings value carries the whole tokenization contract:
    // resolving byName from the persisted string reproduces the analyzer
    val index = IndexData.load(spark, idxDir)
    val persisted = index.setting("analyzer").get
    assert(persisted.startsWith("dict:"))
    val analyzer = Analyzers.byName(persisted)
    assert(analyzer.tokenize("全文検索エンジン") == Seq("全文検索", "エンジン"))

    // model reload honors the persisted dim (exercises the load guard)
    val model = graft.embed.Word2VecEmbed.load(spark, s"$idxDir/w2v_model",
      expectedDim = Some(16))
    assert(model.dim == 16)
    // FTS-only search: on a 2-doc corpus the w2v cosine leg is noise
    // (vectors trained on ~20 sentences), and the property under test is
    // that the DICTIONARY token 全文検索 drives retrieval — the cooking doc
    // shares no query term, so BM25 alone must rank kensaku.md first
    val hits = HybridSearch.search(index, "全文検索",
      analyzer = analyzer, embedder = None,
      opts = HybridSearch.Options(k = 3, rerank = false)).collect()
    assert(hits.nonEmpty, "dictionary-analyzer query found nothing")
    assert(hits.head.getAs[String]("file_path").endsWith("kensaku.md"),
      hits.map(_.getAs[String]("file_path")).mkString(", "))
    // and the match is on the WORD token, not loose bigram overlap: the
    // stored postings contain 全文検索 as one term
    assert(analyzer.tokenize(hits.head.getAs[String]("content"))
      .contains("全文検索"))
  }
}
