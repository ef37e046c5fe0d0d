package graft.analyze

import graft.core.Schemas.Chunk

/** The second splitter strategy: a chonkie-style RECURSIVE chunker
  * (reference `src/splitter.py:126-218`, selected by `SplitterType.CHONKIE`
  * via the factory at `src/splitter.py:621-651`), vs [[MarkdownChunker]]'s
  * llama-index header strategy.
  *
  * Semantics reproduced from the reference:
  *  - Recursive delimiter levels, coarse to fine (`src/splitter.py:138-145`):
  *    headers → blank lines → newlines → sentence punctuation `[.?!;:]` →
  *    whitespace words (the parameterless last level). A piece that fits the
  *    token budget is emitted; an oversize piece is split at the next level.
  *    Adjacent pieces re-merge greedily up to the budget (chonkie's merge
  *    rule), so chunks approach `chunkSize` instead of fragmenting.
  *  - A chunk's `header_path` derives from the text BEFORE the chunk
  *    (`src/splitter.py:174-200`): walking backwards, keep each header whose
  *    level is strictly higher than anything seen so far. Consequence: a
  *    chunk that itself starts with a header does NOT include that header in
  *    its own path — a real observable difference from the llama-index
  *    strategy, preserved faithfully.
  *  - YAML front matter is stripped before chunking but line numbers refer
  *    to the original file (`src/splitter.py:160-168` finds offsets in the
  *    original content); 1-indexed inclusive.
  *  - No overlap between chunks (the reference's chonkie path passes
  *    `chunk_size` only).
  *
  * Token counting uses the pluggable [[Analyzer]]; piece merging sums piece
  * token counts, which is exact for delimiter-bounded tokenizers (tokens
  * never span newlines/punctuation for the default analyzer).
  */
final class RecursiveChunker(
    chunkSize: Int = 512,
    analyzer: Analyzer = DefaultAnalyzer)
  extends Chunker {

  private val HeaderLine = "^#{1,6}([ \t].*)?$".r

  def chunk(filePath: String, rawText: String): Seq[Chunk] = {
    val skipped = FrontMatter.strippedLineCount(rawText)
    val text = FrontMatter.strip(rawText)
    if (text.trim.isEmpty) return Seq.empty

    val spans = rec(text, 0, text.length, level = 0)
    spans.flatMap { case (s0, e0) =>
      // trim whitespace edges, preserving offsets for line numbers
      var s = s0
      while (s < e0 && text(s).isWhitespace) s += 1
      var e = e0
      while (e > s && text(e - 1).isWhitespace) e -= 1
      if (s >= e) None
      else {
        val content = text.substring(s, e)
        Some(Chunk(
          filePath = filePath,
          headerPath = headerPathBefore(text, s),
          lineStart = countNl(text, s) + 1 + skipped,
          lineEnd = countNl(text, e) + 1 + skipped,
          content = content,
          tokens = analyzer.tokenize(content)))
      }
    }
  }

  private def countNl(text: String, until: Int): Int = {
    var n = 0; var i = 0
    while (i < until) { if (text(i) == '\n') n += 1; i += 1 }
    n
  }

  /** Reference `src/splitter.py:174-200`: walk the preceding lines backwards,
    * collecting each header strictly higher-level than any already seen. */
  private def headerPathBefore(text: String, off: Int): String = {
    var headers = List.empty[String]
    var current = Int.MaxValue
    text.substring(0, off).split("\n", -1).reverseIterator.foreach { line =>
      if (line.startsWith("#")) {
        val level = line.takeWhile(_ == '#').length
        if (level < current) {
          current = level
          headers = line.dropWhile(_ == '#').trim :: headers
        }
      }
    }
    headers.mkString("/")
  }

  private def tok(text: String, s: Int, e: Int): Int =
    analyzer.tokenize(text.substring(s, e)).size

  private def rec(text: String, s: Int, e: Int, level: Int): Seq[(Int, Int)] = {
    if (tok(text, s, e) <= chunkSize) Seq((s, e))
    else if (level >= 4) hardSplit(text, s, e)
    else {
      val pts = splitPoints(text, s, e, level)
      if (pts.isEmpty) rec(text, s, e, level + 1)
      else {
        val bounds = (s +: pts) :+ e
        val pieces = bounds.zip(bounds.tail).filter { case (a, b) => a < b }
        merge(text, pieces).flatMap { case (a, b) =>
          if (tok(text, a, b) <= chunkSize) Seq((a, b))
          else rec(text, a, b, level + 1)
        }
      }
    }
  }

  /** Greedy re-merge of adjacent pieces while the summed token count stays
    * within the budget (chonkie's merge step — pieces are contiguous, so a
    * merged piece is just the enclosing span). */
  private def merge(text: String, pieces: Seq[(Int, Int)]): Seq[(Int, Int)] = {
    val sizes = pieces.map { case (a, b) => tok(text, a, b) }
    val out = Seq.newBuilder[(Int, Int)]
    var start = -1; var end = -1; var acc = 0
    pieces.zip(sizes).foreach { case ((a, b), n) =>
      if (start < 0) { start = a; end = b; acc = n }
      else if (acc + n <= chunkSize) { end = b; acc += n }
      else { out += ((start, end)); start = a; end = b; acc = n }
    }
    if (start >= 0) out += ((start, end))
    out.result()
  }

  /** New-piece start positions strictly inside (s, e) for each level. */
  private def splitPoints(text: String, s: Int, e: Int, level: Int): Seq[Int] = level match {
    case 0 => // markdown header line starts
      val pts = Seq.newBuilder[Int]
      var i = s
      while (i < e) {
        if (text(i) == '\n' && i + 1 < e && text(i + 1) == '#') {
          val lineEnd = text.indexOf('\n', i + 1) match {
            case -1 => e
            case x  => math.min(x, e)
          }
          if (HeaderLine.matches(text.substring(i + 1, lineEnd))) pts += (i + 1)
        }
        i += 1
      }
      pts.result()
    case 1 => // after each blank-line run
      val pts = Seq.newBuilder[Int]
      var i = s
      while (i < e - 1) {
        if (text(i) == '\n' && text(i + 1) == '\n') {
          var j = i + 1
          while (j < e && text(j) == '\n') j += 1
          if (j < e) pts += j
          i = j
        } else i += 1
      }
      pts.result()
    case 2 => // after each newline
      (s until (e - 1)).filter(text(_) == '\n').map(_ + 1)
    case _ => // after sentence punctuation (plus trailing spaces)
      val pts = Seq.newBuilder[Int]
      var i = s
      while (i < e - 1) {
        if (".?!;:".indexOf(text(i)) >= 0) {
          var j = i + 1
          while (j < e && (text(j) == ' ' || text(j) == '\t')) j += 1
          if (j < e && ".?!;:".indexOf(text(j)) < 0) pts += j
          i = j
        } else i += 1
      }
      pts.result()
  }

  /** Last level: groups of `chunkSize` whitespace-delimited words. */
  private def hardSplit(text: String, s: Int, e: Int): Seq[(Int, Int)] = {
    // word spans
    val words = Seq.newBuilder[(Int, Int)]
    var i = s
    while (i < e) {
      while (i < e && text(i).isWhitespace) i += 1
      if (i < e) {
        val ws = i
        while (i < e && !text(i).isWhitespace) i += 1
        words += ((ws, i))
      }
    }
    words.result().grouped(math.max(1, chunkSize)).map { g =>
      (g.head._1, g.last._2)
    }.toSeq
  }
}
