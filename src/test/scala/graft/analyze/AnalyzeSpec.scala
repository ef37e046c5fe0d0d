package graft.analyze

import org.scalatest.funsuite.AnyFunSuite

class AnalyzeSpec extends AnyFunSuite {

  test("WhitespaceAnalyzer splits on single spaces only") {
    assert(WhitespaceAnalyzer.tokenize("a b c") == Seq("a", "b", "c"))
    assert(WhitespaceAnalyzer.tokenize("") == Seq.empty)
    assert(WhitespaceAnalyzer.tokenize("one") == Seq("one"))
  }

  test("DefaultAnalyzer lower-cases and splits on non-alphanumerics") {
    assert(DefaultAnalyzer.tokenize("Hello, World! x2") == Seq("hello", "world", "x2"))
  }

  test("DefaultAnalyzer emits CJK ideographs as unigrams") {
    // mirrors the reference's per-morpheme segmentation granularity for CJK
    // (reference src/splitter.py:39-47 uses Lindera; we use unigrams)
    assert(DefaultAnalyzer.tokenize("全文検索とabc") ==
      Seq("全", "文", "検", "索", "と", "abc"))
  }

  test("FrontMatter strips a leading YAML block and counts its lines") {
    val doc = "---\ntitle: x\n---\n# Body\ntext\n"
    assert(FrontMatter.strip(doc) == "# Body\ntext\n")
    assert(FrontMatter.strippedLineCount(doc) == 3)
    assert(FrontMatter.split(doc)._1.contains("title: x"))
  }

  test("FrontMatter passes through documents without front matter") {
    val doc = "# No front matter\n---\nnot at start\n"
    assert(FrontMatter.strip(doc) == doc)
    assert(FrontMatter.strippedLineCount(doc) == 0)
  }
}
