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

  // optional trailing \r: line extraction strips only the \n, so a CRLF
  // document's lines all end in \r — without the tolerance no header is
  // ever detected on Windows-edited files (MarkdownChunker's header regex
  // ends in \s*$ and already accepts it)
  private val HeaderLine = "^#{1,6}([ \t].*?)?\r?$".r

  def chunk(filePath: String, rawText: String): Seq[Chunk] = {
    val skipped = FrontMatter.strippedLineCount(rawText)
    val text = FrontMatter.strip(rawText)
    if (text.trim.isEmpty) return Seq.empty

    // One forward pass builds the line index (start offsets) and the header
    // index (line idx, level, title) — per-chunk lookups are then binary
    // searches instead of full-prefix substring+split rescans, keeping a
    // many-chunk document O(n log n) rather than O(n × chunks).
    val lineStarts = {
      val b = Array.newBuilder[Int]
      b += 0
      var i = 0
      while (i < text.length) { if (text(i) == '\n') b += i + 1; i += 1 }
      b.result()
    }
    val headerIdx = {
      val b = Vector.newBuilder[(Int, Int, String)] // (line idx, level, title)
      var li = 0
      while (li < lineStarts.length) {
        val st = lineStarts(li)
        val en = if (li + 1 < lineStarts.length) lineStarts(li + 1) - 1 else text.length
        val line = text.substring(st, en)
        if (HeaderLine.matches(line)) {
          b += ((li, line.takeWhile(_ == '#').length, line.dropWhile(_ == '#').trim))
        }
        li += 1
      }
      b.result()
    }
    def lineOf(off: Int): Int = {
      // last line start <= off
      var lo = 0; var hi = lineStarts.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (lineStarts(mid) <= off) lo = mid else hi = mid - 1
      }
      lo
    }
    def headerPathAt(off: Int): String = {
      val li = lineOf(off)
      var headers = List.empty[String]
      var current = Int.MaxValue
      def consider(level: Int, title: String): Unit =
        if (level < current) {
          current = level
          // a bare "##" line resets nesting but contributes no segment —
          // header paths are /-joined NON-EMPTY segments
          if (title.nonEmpty) headers = title :: headers
        }
      // the partial current line before the chunk start counts as preceding
      // text (reference semantics: header path derives from text[0:off))
      val partial = text.substring(lineStarts(li), off)
      if (partial.nonEmpty && HeaderLine.matches(partial))
        consider(partial.takeWhile(_ == '#').length, partial.dropWhile(_ == '#').trim)
      // full lines strictly before, walked backwards through the header index
      var hi = {
        var res = -1
        var lo = 0; var h = headerIdx.length - 1
        while (lo <= h) {
          val mid = (lo + h) >>> 1
          if (headerIdx(mid)._1 < li) { res = mid; lo = mid + 1 } else h = mid - 1
        }
        res
      }
      while (hi >= 0 && current > 1) { // no header can beat level 1
        val (_, level, title) = headerIdx(hi)
        consider(level, title)
        hi -= 1
      }
      headers.mkString("/")
    }

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
          headerPath = headerPathAt(s),
          lineStart = lineOf(s) + 1 + skipped,
          lineEnd = lineOf(e) + 1 + skipped,
          content = content,
          tokens = analyzer.tokenize(content)))
      }
    }
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
    case 1 => // after each blank-line run (a CRLF blank line is "\r\n" — a
      // line containing only \r is blank too, or paragraph splits never
      // fire on Windows-edited files)
      def blankAfterNewline(j: Int): Boolean =
        text(j) == '\n' || (text(j) == '\r' && j + 1 < e && text(j + 1) == '\n')
      val pts = Seq.newBuilder[Int]
      var i = s
      while (i < e - 1) {
        if (text(i) == '\n' && blankAfterNewline(i + 1)) {
          var j = i + 1
          while (j < e && (text(j) == '\n' || text(j) == '\r')) j += 1
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

  /** Last level: greedy word packing against the ANALYZER-token budget (a
    * fixed word count would overshoot chunkSize when words tokenize to
    * multiple analyzer tokens, e.g. punctuation-dense text). Every group
    * takes at least one word, so a single word over budget still emits. */
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
    val out = Seq.newBuilder[(Int, Int)]
    var start = -1; var end = -1; var acc = 0
    words.result().foreach { case (a, b) =>
      val n = tok(text, a, b)
      if (start < 0) { start = a; end = b; acc = n }
      else if (acc + n <= math.max(1, chunkSize)) { end = b; acc += n }
      else { out += ((start, end)); start = a; end = b; acc = n }
    }
    if (start >= 0) out += ((start, end))
    out.result()
  }
}
