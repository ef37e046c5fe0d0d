package graft.analyze

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.embed.HashingEmbedder
import graft.index.{IndexData, IndexJob}
import graft.search.HybridSearch

/** The analyzer-path Unicode fold (round-17 directive #1): `--normalize`
  * wraps the tokenizer in a [[NormalizingAnalyzer]] whose form persists
  * INSIDE the analyzer settings name, so search re-resolves and folds the
  * query text identically — full-width ASCII, compatibility ligatures, and
  * decomposed accents index and query as the same terms (what Lindera does
  * internally before segmentation, reference `src/splitter.py:39-47`).
  * Plus the incremental-merge analyzer-consistency guard that makes a
  * mixed-token-space artifact unrepresentable. */
class NormalizeAnalyzerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("NormalizingAnalyzer folds width/ligature/decomposed forms before " +
      "tokenization; content-level behavior matches java.text.Normalizer") {
    val nfkc = NormalizingAnalyzer("NFKC", DefaultAnalyzer)
    // full-width ASCII → half-width (then DefaultAnalyzer lower-cases)
    assert(nfkc.tokenize("ＳＰＡＲＫ　ＳＱＬ") == Seq("spark", "sql"))
    // compatibility ligature ﬁ → fi
    assert(nfkc.tokenize("ﬁlter") == Seq("filter"))
    // decomposed e + COMBINING ACUTE composes to é (one letter run)
    assert(nfkc.tokenize("café") == Seq("café"))
    // NFC composes but keeps compatibility forms distinct
    val nfc = NormalizingAnalyzer("NFC", DefaultAnalyzer)
    assert(nfc.tokenize("ＳＰＡＲＫ") != Seq("spark"))
    // already-normalized fast path: plain ASCII unchanged
    assert(nfkc.tokenize("plain ascii text") == DefaultAnalyzer.tokenize("plain ascii text"))
  }

  test("registry: norm:<FORM>:<inner> round-trips byName/nameOf, including " +
      "a dict: inner whose name contains colons; malformed names rejected") {
    val plain = NormalizingAnalyzer("NFKC", DefaultAnalyzer)
    assert(Analyzers.nameOf(plain) == "norm:NFKC:default")
    assert(Analyzers.byName("norm:NFKC:default") == plain)
    val dict = NormalizingAnalyzer("NFD", DictionaryAnalyzer(Set("消しゴム")))
    val name = Analyzers.nameOf(dict)
    assert(name.startsWith("norm:NFD:dict:"))
    assert(Analyzers.byName(name) == dict)
    // bigram inner too
    assert(Analyzers.byName("norm:NFKC:bigram") ==
      NormalizingAnalyzer("NFKC", CjkBigramAnalyzer))
    intercept[RuntimeException](Analyzers.byName("norm:NFKC"))
    intercept[IllegalArgumentException](NormalizingAnalyzer("NFKX", DefaultAnalyzer))
    // nesting rejected: one fold per tokenizer
    intercept[IllegalArgumentException](
      NormalizingAnalyzer("NFC", NormalizingAnalyzer("NFC", DefaultAnalyzer)))
  }

  /** End-to-end index+search: a HALF-width doc, a FULL-width query. The
    * query analyzer is resolved from the artifact settings exactly the way
    * the CLI does (byName), so the fold rides the persisted name. */
  private def buildAndQuery(analyzer: Analyzer): Array[org.apache.spark.sql.Row] = {
    val docs = Files.createTempDirectory("norm-docs").toString
    Files.writeString(Paths.get(docs, "a.md"),
      "# Spark\n\nspark shuffles partitions during wide joins\n")
    Files.writeString(Paths.get(docs, "b.md"),
      "# Other\n\nducks quack loudly on the quiet pond\n")
    val idx = Files.createTempDirectory("norm-idx").toString + "/idx"
    val built = IndexJob.run(spark, Seq(docs), idx, new HashingEmbedder(16),
      analyzer = analyzer, opts = IndexJob.Options(clear = true))
    val resolved = Analyzers.byName(built.setting("analyzer").get)
    HybridSearch.search(built, "ＳＰＡＲＫ　ｓｈｕｆｆｌｅｓ", // full-width query
      analyzer = resolved, embedder = None, reranker = None,
      opts = HybridSearch.Options(k = 2, scoreThreshold = 0.0)).collect()
  }

  test("full-width query matches a half-width doc ONLY with --normalize " +
      "(the Lindera-parity sliver): flag absent = byte-identical miss") {
    val without = buildAndQuery(DefaultAnalyzer)
    assert(without.isEmpty,
      s"full-width query must MISS without the fold, got ${without.length} hits")
    val withFold = buildAndQuery(NormalizingAnalyzer("NFKC", DefaultAnalyzer))
    assert(withFold.nonEmpty, "full-width query must HIT with --normalize NFKC")
    assert(withFold.head.getAs[String]("file_path").endsWith("a.md"))
  }

  test("the norm: analyzer name survives save → O(delta) append → compact, " +
      "and search keeps matching at every stage") {
    val docs = Files.createTempDirectory("normrt-docs").toString
    def opts(scanDir: String, clear: Boolean) = IndexJob.Options(
      clear = clear, mergeMode = "append",
      trimPathPrefix = Some(s"file:$scanDir"))
    Files.writeString(Paths.get(docs, "a.md"),
      "# A\n\nspark shuffles partitions during wide joins\n")
    val idx = Files.createTempDirectory("normrt-idx").toString + "/idx"
    val an = NormalizingAnalyzer("NFKC", DefaultAnalyzer)
    val emb = new HashingEmbedder(16)
    IndexJob.run(spark, Seq(docs), idx, emb, analyzer = an,
      opts = opts(docs, clear = true))
    def check(stage: String): Unit = {
      val loaded = IndexData.load(spark, idx)
      assert(loaded.setting("analyzer").contains("norm:NFKC:default"),
        s"$stage: analyzer setting lost the fold")
      val hits = HybridSearch.search(loaded, "ＳＰＡＲＫ",
        analyzer = Analyzers.byName(loaded.setting("analyzer").get),
        embedder = None, reranker = None,
        opts = HybridSearch.Options(k = 5, scoreThreshold = 0.0)).collect()
      assert(hits.nonEmpty, s"$stage: folded query no longer matches")
    }
    check("after save")
    // O(delta) append of a second file, SAME analyzer (guard allows)
    val just = Files.createTempDirectory("normrt-just").toString
    Files.writeString(Paths.get(just, "b.md"),
      "# B\n\nvector cosine search over embeddings\n")
    IndexJob.run(spark, Seq(just), idx, emb, analyzer = an,
      opts = opts(just, clear = false))
    check("after append")
    IndexJob.compact(spark, idx)
    check("after compact")
  }

  test("dict-lattice end-to-end: the persisted dict-lattice: name re-resolves " +
      "at search time, and lattice segmentation recovers a hit the greedy " +
      "index structurally cannot") {
    val docs = Files.createTempDirectory("lat-docs").toString
    // corpus doc: いしやき — greedy over {いし, いしや, やき} tokenizes it
    // [いしや, き] (commits to the longest prefix), lattice [いし, やき]
    Files.writeString(Paths.get(docs, "a.md"), "# 屋台\n\nいしやきの店\n")
    Files.writeString(Paths.get(docs, "b.md"), "# Other\n\nducks on the pond\n")
    val words = Set("いし", "いしや", "やき")
    def build(analyzer: Analyzer): IndexData = {
      val idx = Files.createTempDirectory("lat-idx").toString + "/idx"
      IndexJob.run(spark, Seq(docs), idx, new HashingEmbedder(16),
        analyzer = analyzer, opts = IndexJob.Options(clear = true))
      IndexData.load(spark, idx)
    }
    def hits(idx: IndexData): Array[org.apache.spark.sql.Row] = {
      // re-resolve from settings EXACTLY like the CLI — the round-trip
      // under test is name → byName → same segmentation on the query
      val resolved = Analyzers.byName(idx.setting("analyzer").get)
      HybridSearch.search(idx, "やき", analyzer = resolved,
        embedder = None, reranker = None,
        opts = HybridSearch.Options(k = 5, scoreThreshold = 0.0)).collect()
    }
    val latticeIdx = build(LatticeDictionaryAnalyzer(words))
    assert(latticeIdx.setting("analyzer").exists(_.startsWith("dict-lattice:")))
    val latticeHits = hits(latticeIdx)
    assert(latticeHits.nonEmpty, "lattice index must match the やき query")
    assert(latticeHits.head.getAs[String]("file_path").endsWith("a.md"))
    // the greedy artifact indexed [いしや, き]: the query token やき cannot
    // match — the recall the lattice upgrade exists to recover
    val greedyIdx = build(DictionaryAnalyzer(words))
    assert(greedyIdx.setting("analyzer").exists(_.startsWith("dict:")))
    assert(hits(greedyIdx).isEmpty,
      "greedy index must MISS the やき query (いしや|き tokenization)")
  }

  test("incremental merge greedy → lattice over the SAME wordlist fails " +
      "fast (different names = different token spaces)") {
    val docs = Files.createTempDirectory("latg-docs").toString
    Files.writeString(Paths.get(docs, "a.md"), "# A\n\nいしやきの店\n")
    val emb = new HashingEmbedder(16)
    val words = Set("いし", "やき")
    val idx = Files.createTempDirectory("latg-idx").toString + "/idx"
    IndexJob.run(spark, Seq(docs), idx, emb,
      analyzer = DictionaryAnalyzer(words),
      opts = IndexJob.Options(clear = true))
    val e = intercept[RuntimeException] {
      IndexJob.run(spark, Seq(docs), idx, emb,
        analyzer = LatticeDictionaryAnalyzer(words),
        opts = IndexJob.Options(clear = false))
    }
    assert(e.getMessage.contains("--clear"), e.getMessage)
  }

  test("incremental merge with a DIFFERENT analyzer fails fast with the " +
      "--clear remedy (mixed token spaces unrepresentable), both merge modes") {
    val docs = Files.createTempDirectory("normg-docs").toString
    Files.writeString(Paths.get(docs, "a.md"), "# A\n\nalpha beta gamma\n")
    val emb = new HashingEmbedder(16)
    for (mode <- Seq("rewrite", "append")) {
      val idx = Files.createTempDirectory(s"normg-idx-$mode").toString + "/idx"
      IndexJob.run(spark, Seq(docs), idx, emb,
        analyzer = DefaultAnalyzer,
        opts = IndexJob.Options(clear = true, mergeMode = mode))
      val e = intercept[RuntimeException] {
        IndexJob.run(spark, Seq(docs), idx, emb,
          analyzer = NormalizingAnalyzer("NFKC", DefaultAnalyzer),
          opts = IndexJob.Options(clear = false, mergeMode = mode))
      }
      assert(e.getMessage.contains("--clear"), s"$mode: ${e.getMessage}")
      assert(e.getMessage.contains("norm:NFKC:default"), s"$mode: ${e.getMessage}")
      // the artifact is untouched: still searchable under the stored analyzer
      val loaded = IndexData.load(spark, idx)
      assert(loaded.setting("analyzer").contains("default"))
    }
  }
}
