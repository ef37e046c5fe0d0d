package graft.analyze

import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the chonkie-strategy recursive splitter (reference
  * `src/splitter.py:126-218`), especially where it observably differs from
  * the llama-index header strategy. */
class RecursiveChunkerSpec extends AnyFunSuite {

  test("document under budget stays one chunk — no header split") {
    val md = "# A\n\nalpha beta\n\n## B\n\ngamma delta"
    val cs = new RecursiveChunker(chunkSize = 100).chunk("f.md", md)
    assert(cs.length == 1)
    assert(cs.head.lineStart == 1 && cs.head.lineEnd == 7)
    assert(cs.head.headerPath == "") // nothing precedes the chunk
    assert(cs.head.content == md)
  }

  test("oversize document splits at headers; own header excluded from path") {
    val md = "# A\n\none two three four\n\n## B\n\nfive six seven eight"
    val cs = new RecursiveChunker(chunkSize = 5).chunk("f.md", md)
    assert(cs.length == 2, cs)
    // chunk 1 starts AT '# A' — its own header is not in its header_path
    // (reference computes header_path from text BEFORE the chunk,
    // src/splitter.py:174-200)
    assert(cs(0).headerPath == "")
    assert(cs(0).lineStart == 1 && cs(0).lineEnd == 3)
    // chunk 2's preceding text contains '# A' (level 1) but not '## B'
    // itself
    assert(cs(1).headerPath == "A")
    assert(cs(1).lineStart == 5 && cs(1).lineEnd == 7)
  }

  test("oversize section recurses to blank-line level and merges greedily") {
    val md = "p1 a b\n\np2 c d\n\np3 e f\n\np4 g h"
    // each paragraph = 3 tokens; budget 6 → two paragraphs per chunk
    val cs = new RecursiveChunker(chunkSize = 6).chunk("f.md", md)
    assert(cs.map(_.content) == Seq("p1 a b\n\np2 c d", "p3 e f\n\np4 g h"), cs)
    assert(cs.map(c => (c.lineStart, c.lineEnd)) == Seq((1, 3), (5, 7)))
  }

  test("sentence level splits when lines don't help; word level as last resort") {
    val sentence = "one two three. four five six! seven eight nine"
    val cs = new RecursiveChunker(chunkSize = 3).chunk("f.md", sentence)
    assert(cs.length == 3, cs)
    assert(cs.map(_.tokens.size).forall(_ <= 3))
    // a single unbreakable run falls through to word grouping
    val words = "w1 w2 w3 w4 w5 w6 w7"
    val ws = new RecursiveChunker(chunkSize = 3).chunk("f.md", words)
    assert(ws.length == 3 && ws.map(_.tokens.size) == Seq(3, 3, 1), ws)
  }

  test("CRLF document: headers detected and paragraph splits fire (lines " +
      "carry a trailing \\r after the \\n-only line extraction)") {
    val md = "# A\r\n\r\none two three four\r\n\r\n## B\r\n\r\nfive six seven eight"
    val cs = new RecursiveChunker(chunkSize = 5).chunk("f.md", md)
    // pre-fix the header regex rejected '\r'-terminated lines — no header
    // was ever detected and header paths were empty everywhere
    assert(cs.length == 2, cs)
    assert(cs(1).headerPath == "A", cs(1))
    // and blank-line splitting works on \r\n\r\n: an oversize headerless
    // CRLF body must split between paragraphs, not fall to per-line splits
    val body = "one two three\r\n\r\nfour five six"
    val ps = new RecursiveChunker(chunkSize = 3).chunk("g.md", body)
    assert(ps.length == 2, ps)
    assert(ps(0).content.contains("one") && ps(1).content.contains("four"))
  }

  test("front matter stripped but line numbers refer to the original file") {
    val md = "---\ntitle: x\n---\n# H\n\nbody text here"
    val cs = new RecursiveChunker(chunkSize = 100).chunk("f.md", md)
    assert(cs.length == 1)
    assert(cs.head.lineStart == 4 && cs.head.lineEnd == 6)
    assert(!cs.head.content.contains("title:"))
  }

  test("only real headers enter header paths; bare ## contributes no segment") {
    // shebang / #include lines start with '#' but are NOT markdown headers
    val md = "# Real\n\n#!/usr/bin/env bash\n#include <x.h>\n\n" +
      "words " * 30 + "\n\n## \n\nmore words here " * 10
    val cs = new RecursiveChunker(chunkSize = 20).chunk("f.md", md)
    assert(cs.nonEmpty)
    cs.foreach { c =>
      assert(!c.headerPath.contains("!/usr/bin"), c.headerPath)
      assert(!c.headerPath.contains("include"), c.headerPath)
      // non-empty /-joined segments only (a bare "##" adds nothing)
      assert(c.headerPath.split("/").forall(seg => c.headerPath.isEmpty || seg.nonEmpty),
        c.headerPath)
    }
  }

  test("hardSplit packs by analyzer tokens, not whitespace words") {
    // each "word" is 4 DefaultAnalyzer tokens (a,b,c,d) — no newlines or
    // sentence punctuation, so this reaches the word-level last resort
    val text = Seq.fill(12)("a,b,c,d").mkString(" ")
    val cs = new RecursiveChunker(chunkSize = 8).chunk("f.md", text)
    assert(cs.forall(_.tokens.size <= 8), cs.map(_.tokens.size))
    assert(cs.map(_.tokens.size).sum == 48)
  }

  test("factory selects strategy by enum name") {
    import graft.index.IndexJob
    val rec = IndexJob.chunkerFor(IndexJob.Options(splitter = "recursive"), DefaultAnalyzer)
    val cho = IndexJob.chunkerFor(IndexJob.Options(splitter = "chonkie"), DefaultAnalyzer)
    val hdr = IndexJob.chunkerFor(IndexJob.Options(), DefaultAnalyzer)
    assert(rec.isInstanceOf[RecursiveChunker] && cho.isInstanceOf[RecursiveChunker])
    assert(hdr.isInstanceOf[MarkdownChunker])
  }
}
