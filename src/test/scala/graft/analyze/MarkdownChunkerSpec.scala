package graft.analyze

import org.scalatest.funsuite.AnyFunSuite

class MarkdownChunkerSpec extends AnyFunSuite {

  private val chunker = new MarkdownChunker()

  test("header sections become chunks with header paths and 1-indexed lines") {
    val md =
      """# Title
        |intro line
        |
        |## Section A
        |a1
        |a2
        |
        |## Section B
        |b1
        |""".stripMargin
    val chunks = chunker.chunk("f.md", md)
    assert(chunks.map(_.headerPath) == Seq("Title", "Title/Section A", "Title/Section B"))
    val a = chunks(1)
    assert(a.lineStart == 4 && a.lineEnd == 6)
    assert(a.content == "## Section A\na1\na2")
    assert(a.tokens.contains("section"))
  }

  test("front matter is stripped but line numbers refer to the original file") {
    val md = "---\nkey: v\n---\n# H\nbody\n"
    val chunks = chunker.chunk("f.md", md)
    assert(chunks.size == 1)
    assert(chunks.head.lineStart == 4) // '# H' is line 4 of the original
    assert(!chunks.head.content.contains("key: v"))
  }

  test("sibling header of same level pops the stack") {
    val md = "# A\n## B\nx\n# C\ny\n"
    val chunks = chunker.chunk("f.md", md)
    assert(chunks.map(_.headerPath) == Seq("A", "A/B", "C"))
  }

  test("oversized sections sub-split on paragraphs with bounded chunks") {
    val para = (1 to 40).map(i => s"word$i").mkString(" ")
    val md = "# Big\n" + (1 to 20).map(_ => para).mkString("\n\n")
    val small = new MarkdownChunker(chunkSize = 100, overlap = 20)
    val chunks = small.chunk("f.md", md)
    assert(chunks.size > 1)
    // every chunk stays within budget + one paragraph slack
    assert(chunks.forall(_.tokens.size <= 140 + 20))
    // line ranges are ordered and within the doc
    chunks.foreach(c => assert(c.lineStart <= c.lineEnd))
    // consecutive chunks overlap (the 20-token tail is re-included)
    val starts = chunks.map(_.lineStart)
    assert(starts == starts.sorted)
  }

  test("every non-blank, non-front-matter line lands in some chunk (100 random docs)") {
    val rnd = new scala.util.Random(42)
    def randomLine(): String = rnd.nextInt(8) match {
      case 0     => "#" * (1 + rnd.nextInt(3)) + " Header" + rnd.nextInt(10)
      case 1 | 2 => ""
      case 3     => "- item " + rnd.nextInt(100)
      case _     => Seq.fill(1 + rnd.nextInt(6))("w" + rnd.nextInt(50)).mkString(" ")
    }
    for (_ <- 1 to 100) {
      val doc = Seq.fill(5 + rnd.nextInt(40))(randomLine()).mkString("\n")
      val chunks = chunker.chunk("f.md", doc)
      val lines = doc.split("\n", -1)
      val covered = chunks.flatMap(c => c.lineStart to c.lineEnd).toSet
      lines.zipWithIndex.foreach { case (l, i) =>
        if (l.trim.nonEmpty) assert(covered.contains(i + 1), s"line ${i + 1} '$l' uncovered in:\n$doc")
      }
      chunks.foreach { c =>
        assert(c.lineStart >= 1 && c.lineEnd <= lines.length && c.lineStart <= c.lineEnd)
      }
    }
  }

  test("chunks a Japanese doc like the reference sample (sample_docs/sample.md)") {
    val md =
      """# サンプルドキュメント
        |
        |これはサンプルです。
        |
        |## 全文検索について
        |
        |全文検索の説明。
        |
        |## ベクトル検索について
        |
        |ベクトル検索の説明。
        |""".stripMargin
    val chunks = chunker.chunk("sample.md", md)
    assert(chunks.size == 3)
    assert(chunks(1).headerPath == "サンプルドキュメント/全文検索について")
    assert(chunks(1).tokens.contains("検"))
  }
}
