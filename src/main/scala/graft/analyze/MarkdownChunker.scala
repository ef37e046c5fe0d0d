package graft.analyze

import graft.core.Schemas.Chunk

/** Splits one file into chunks — the engine's UDTF (one row in, many out),
  * applied with `Dataset.flatMap` (SURVEY.md §2.11 T2).
  *
  * Reproduces the reference splitter's observable semantics (reference
  * `src/splitter.py:28-218`):
  *  - YAML front matter stripped first (`src/utils/yaml_front_matter.py:7-25`);
  *    line numbers still refer to the ORIGINAL file.
  *  - Documents split at Markdown headers; each chunk carries the `"H1/H2/H3"`
  *    join of its enclosing headers (`src/splitter.py:586-618`, `:74`).
  *  - Sections larger than the token budget are sub-split on blank-line
  *    paragraph boundaries with token overlap between consecutive chunks;
  *    defaults chunkSize=512 tokens, overlap=50 (`src/splitter.py:240-243`,
  *    `621-626`).
  *  - `line_start`/`line_end` are 1-indexed inclusive
  *    (`src/splitter.py:264-287`).
  */
trait Chunker extends Serializable {
  def chunk(filePath: String, text: String): Seq[Chunk]
}

final class MarkdownChunker(
    chunkSize: Int = 512,
    overlap: Int = 50,
    analyzer: Analyzer = DefaultAnalyzer)
  extends Chunker {

  private val Header = "^(#{1,6})\\s+(.*?)\\s*$".r

  def chunk(filePath: String, rawText: String): Seq[Chunk] = {
    val skipped = FrontMatter.strippedLineCount(rawText)
    val text = FrontMatter.strip(rawText)
    if (text.trim.isEmpty) return Seq.empty

    val lines = text.split("\n", -1)

    // A section: lines between headers, under a header-path stack. Line
    // numbers ride each line (chunk bounds derive from body.head/last).
    final case class Section(headerPath: String, lines: Vector[(Int, String)])

    val sections = Vector.newBuilder[Section]
    var stack = List.empty[(Int, String)] // (level, title), innermost first
    var cur = Vector.newBuilder[(Int, String)]
    var curNonEmpty = false

    def headerPath: String = stack.reverse.map(_._2).mkString("/")
    def closeSection(): Unit = {
      val ls = cur.result()
      if (curNonEmpty) sections += Section(headerPath, ls)
      cur = Vector.newBuilder[(Int, String)]
      curNonEmpty = false
    }

    var i = 0
    while (i < lines.length) {
      lines(i) match {
        case Header(hashes, title) =>
          closeSection()
          val level = hashes.length
          stack = (level, title) :: stack.dropWhile(_._1 >= level)
          cur += ((i, lines(i)))
          curNonEmpty = true // a header alone still yields a chunk of its line
        case line =>
          cur += ((i, line))
          if (line.trim.nonEmpty) curNonEmpty = true
      }
      i += 1
    }
    closeSection()

    sections.result().flatMap { sec =>
      val body = sec.lines.dropWhile(_._2.trim.isEmpty).reverse.dropWhile(_._2.trim.isEmpty).reverse
      if (body.isEmpty) Nil
      else {
        val content = body.map(_._2).mkString("\n")
        val toks = analyzer.tokenize(content)
        if (toks.size <= chunkSize) {
          Seq(mkChunk(filePath, sec.headerPath, body, skipped))
        } else {
          subSplit(body).map(para => mkChunk(filePath, sec.headerPath, para, skipped))
        }
      }
    }
  }

  /** Greedy paragraph packing up to chunkSize tokens, with `overlap` tokens of
    * trailing paragraphs re-included at the start of the next chunk. */
  private def subSplit(body: Vector[(Int, String)]): Seq[Vector[(Int, String)]] = {
    // paragraphs = blank-line-separated runs of lines
    val paras = Vector.newBuilder[Vector[(Int, String)]]
    var cur = Vector.newBuilder[(Int, String)]
    var any = false
    body.foreach { case (idx, line) =>
      if (line.trim.isEmpty) {
        if (any) { paras += cur.result(); cur = Vector.newBuilder; any = false }
      } else { cur += ((idx, line)); any = true }
    }
    if (any) paras += cur.result()
    val ps = paras.result()
    if (ps.isEmpty) return Seq.empty

    def ptoks(p: Vector[(Int, String)]): Int =
      analyzer.tokenize(p.map(_._2).mkString("\n")).size

    val sizes = ps.map(ptoks)
    val out = Seq.newBuilder[Vector[(Int, String)]]
    var chunkParas = Vector.empty[Int] // indices into ps
    var chunkTok = 0
    def emit(): Unit = if (chunkParas.nonEmpty) out += chunkParas.flatMap(ps(_))

    var i = 0
    while (i < ps.length) {
      val s = sizes(i)
      if (chunkTok > 0 && chunkTok + s > chunkSize) {
        emit()
        // overlap: re-include trailing paragraphs up to `overlap` tokens
        var keep = Vector.empty[Int]
        var kept = 0
        var j = chunkParas.length - 1
        while (j >= 0 && kept + sizes(chunkParas(j)) <= overlap) {
          keep = chunkParas(j) +: keep
          kept += sizes(chunkParas(j))
          j -= 1
        }
        chunkParas = keep
        chunkTok = kept
      }
      chunkParas = chunkParas :+ i
      chunkTok += s
      i += 1
    }
    emit()
    out.result()
  }

  private def mkChunk(
      filePath: String,
      headerPath: String,
      body: Vector[(Int, String)],
      skippedLines: Int): Chunk = {
    val content = body.map(_._2).mkString("\n")
    Chunk(
      filePath = filePath,
      headerPath = headerPath,
      lineStart = body.head._1 + 1 + skippedLines,
      lineEnd = body.last._1 + 1 + skippedLines,
      content = content,
      tokens = analyzer.tokenize(content))
  }
}
