package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.analyze.{DefaultAnalyzer, FrontMatter, MarkdownChunker}

/** Property-based invariants (SURVEY.md §5 item 3) — pure-Scala engine
  * parts, no SparkSession needed. */
object EngineProperties extends Properties("graft") {

  // ---- A4 fusion invariants (reference src/searcher.py:218-241) ----
  // Scala reimplementation of the rule used to cross-check the Column
  // expression in SearchSpec; here we pin its algebraic invariants.
  private def fuse(fts: Option[Double], vss: Option[Double]): Double =
    (fts, vss) match {
      case (Some(f), Some(v)) => (f + v) / 2.0
      case (Some(f), None)    => f * 0.8
      case (None, Some(v))    => v * 0.8
      case (None, None)       => 0.0
    }

  private val scoreGen = Gen.option(Gen.choose(0.0, 10.0))

  property("fusion: both present is the mean") =
    forAll(Gen.choose(0.0, 10.0), Gen.choose(0.0, 10.0)) { (f, v) =>
      math.abs(fuse(Some(f), Some(v)) - (f + v) / 2.0) < 1e-12
    }

  property("fusion: singletons scale by 0.8, bounded by input") =
    forAll(Gen.choose(0.0, 10.0)) { f =>
      fuse(Some(f), None) == f * 0.8 && fuse(Some(f), None) <= f
    }

  property("fusion: non-negative for non-negative inputs") =
    forAll(scoreGen, scoreGen) { (f, v) => fuse(f, v) >= 0.0 }

  // ---- analyzer invariants ----
  property("analyzer: tokens are non-empty and lower-case") =
    forAll(Gen.asciiPrintableStr) { s =>
      val toks = DefaultAnalyzer.tokenize(s)
      toks.forall(t => t.nonEmpty && t == t.toLowerCase)
    }

  property("analyzer: idempotent over its own output") =
    forAll(Gen.asciiPrintableStr) { s =>
      val once = DefaultAnalyzer.tokenize(s)
      DefaultAnalyzer.tokenize(once.mkString(" ")) == once
    }

  // ---- front matter invariants ----
  property("front matter: strip is idempotent") =
    forAll(Gen.asciiStr) { s =>
      FrontMatter.strip(FrontMatter.strip(s)) == FrontMatter.strip(s)
    }

  // ---- chunker invariants ----
  private val lineGen: Gen[String] = Gen.frequency(
    4 -> Gen.alphaNumStr.map(w => s"text $w"),
    1 -> Gen.choose(1, 4).map(l => "#" * l + " Head"),
    2 -> Gen.const(""))
  private val docGen: Gen[String] =
    Gen.listOfN(25, lineGen).map(_.mkString("\n"))
  private val chunker = new MarkdownChunker()

  property("chunker: line ranges ordered, 1-indexed, within doc") =
    forAll(docGen) { doc =>
      val n = doc.split("\n", -1).length
      chunker.chunk("f.md", doc).forall(c =>
        c.lineStart >= 1 && c.lineStart <= c.lineEnd && c.lineEnd <= n)
    }

  property("chunker: chunk tokens come from the analyzer over its content") =
    forAll(docGen) { doc =>
      chunker.chunk("f.md", doc).forall(c =>
        c.tokens == DefaultAnalyzer.tokenize(c.content))
    }

  property("chunker: header paths are /-joined non-empty segments") =
    forAll(docGen) { doc =>
      chunker.chunk("f.md", doc).forall { c =>
        c.headerPath.isEmpty || c.headerPath.split("/").forall(_.nonEmpty)
      }
    }

  // ---- recursive (chonkie-strategy) chunker invariants ----
  // Small budget so the generator actually exercises the recursive split +
  // merge machinery, not just the fits-whole fast path.
  private val recursive = new graft.analyze.RecursiveChunker(chunkSize = 12)

  property("recursive chunker: line ranges ordered, 1-indexed, monotone, within doc") =
    forAll(docGen) { doc =>
      val n = doc.split("\n", -1).length
      val cs = recursive.chunk("f.md", doc)
      cs.forall(c => c.lineStart >= 1 && c.lineStart <= c.lineEnd && c.lineEnd <= n) &&
        cs.zip(cs.drop(1)).forall { case (a, b) => a.lineStart <= b.lineStart }
    }

  property("recursive chunker: covers every non-whitespace character exactly once") =
    forAll(docGen) { doc =>
      val got = recursive.chunk("f.md", doc)
        .map(_.content.filterNot(_.isWhitespace)).mkString
      got == FrontMatter.strip(doc).filterNot(_.isWhitespace)
    }

  property("recursive chunker: analyzer tokens, budget respected on word-shaped docs") =
    forAll(docGen) { doc =>
      // every generated word is a single analyzer token, so the hard-split
      // word groups can never exceed the token budget either
      recursive.chunk("f.md", doc).forall(c =>
        c.tokens == DefaultAnalyzer.tokenize(c.content) && c.tokens.size <= 12)
    }

  property("both chunker strategies: header paths are /-joined non-empty segments") =
    forAll(docGen) { doc =>
      recursive.chunk("f.md", doc).forall { c =>
        c.headerPath.isEmpty || c.headerPath.split("/").forall(_.nonEmpty)
      }
    }

  // ---- curation kernel invariants (pure mirrors of the SQL/Column math) ----

  /** Scala mirror of q_embed_quantize's per-element rule. */
  private def quantize(x: Double, scale: Double): Long =
    math.floor(x / scale * 127.0 + 0.5).toLong

  private val vecGen: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.choose(-1.0, 1.0)).suchThat(_.exists(_ != 0.0))

  property("int8 quantize: codes bounded, monotone, reconstruct within half a step") =
    forAll(vecGen) { v =>
      val scale = v.map(math.abs).max
      val qs = v.map(quantize(_, scale))
      val bounded = qs.forall(q => q >= -127L && q <= 127L)
      val sorted = v.sorted.map(quantize(_, scale))
      val monotone = sorted.zip(sorted.drop(1)).forall { case (a, b) => a <= b }
      val step = scale / 127.0
      val close = v.zip(qs).forall { case (x, q) =>
        math.abs(q.toDouble / 127.0 * scale - x) <= step / 2.0 + 1e-12
      }
      bounded && monotone && close
    }

  property("shard nibble: md5 hex prefix decodes into [0, 16)") =
    forAll(Gen.asciiStr) { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val shard = "0123456789abcdef".indexOf(hex.head)
      shard >= 0 && shard < 16
    }

  property("bigram model: add-one-smoothed probabilities lie in (0, 1]") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d"))) { toks =>
      val uni = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val big = toks.zip(toks.tail).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val v = uni.size.toLong
      toks.zip(toks.tail).forall { p =>
        val prob = (big(p) + 1).toDouble / (uni(p._1) + v).toDouble
        prob > 0.0 && prob <= 1.0 && math.log(prob) <= 0.0
      }
    }

  // ---- CJK bigram analyzer invariants ----
  private val mixedTextGen: Gen[String] = {
    val latin = Gen.alphaNumChar
    val han = Gen.choose(0x4e00, 0x9fa5).map(_.toChar)
    val hira = Gen.choose(0x3041, 0x3096).map(_.toChar)
    val kata = Gen.choose(0x30a1, 0x30fa).map(_.toChar)
    val punct = Gen.oneOf(' ', '.', ',', '!', '、', '。')
    Gen.listOf(Gen.frequency(
      3 -> latin, 2 -> han, 2 -> hira, 1 -> kata, 2 -> punct)).map(_.mkString)
  }

  private def cjkClass(c: Char): Int =
    if (c >= 0x4e00 && c <= 0x9fff) 1
    else if (c >= 0x3040 && c <= 0x309f) 2
    else if (c >= 0x30a0 && c <= 0x30ff) 3
    else 0

  property("cjk bigram: every token is a verbatim substring of the lower-cased input") =
    forAll(mixedTextGen) { text =>
      val lower = text.toLowerCase
      graft.analyze.CjkBigramAnalyzer.tokenize(text).forall(lower.contains)
    }

  property("cjk bigram: CJK tokens are 1-2 chars; every adjacent same-script pair emitted") =
    forAll(mixedTextGen) { text =>
      val toks = graft.analyze.CjkBigramAnalyzer.tokenize(text)
      val cjkLenOk = toks.filter(_.exists(c => cjkClass(c) != 0))
        .forall(t => t.length == 1 || t.length == 2)
      val expected = text.toLowerCase.sliding(2).collect {
        case p if p.length == 2 && cjkClass(p(0)) != 0 &&
          cjkClass(p(0)) == cjkClass(p(1)) => p
      }.toSet
      cjkLenOk && expected.subsetOf(toks.toSet)
    }

  property("cjk bigram: latin-only input tokenizes exactly like DefaultAnalyzer") =
    forAll(Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '))).map(_.mkString)) { text =>
      graft.analyze.CjkBigramAnalyzer.tokenize(text) == DefaultAnalyzer.tokenize(text)
    }

  // ---- dictionary analyzer invariants ----
  private val dictCaseGen: Gen[(Set[String], String)] = for {
    text <- mixedTextGen
    // draw dictionary words FROM the text (so matches actually occur) plus
    // arbitrary CJK words that may or may not appear
    fromText <- Gen.listOf(for {
      start <- Gen.choose(0, math.max(0, text.length - 1))
      len <- Gen.choose(2, 4)
    } yield text.toLowerCase.slice(start, math.min(text.length, start + len)))
    free <- Gen.listOf(Gen.listOfN(3,
      Gen.choose(0x4e00, 0x9fa5).map(_.toChar)).map(_.mkString))
    words = (fromText ++ free).filter(w =>
      w.length >= 2 && w.forall(c => cjkClass(c) != 0)).toSet
  } yield (words, text)

  property("dict analyzer: every token is a substring of the lower-cased input") =
    forAll(dictCaseGen) { case (words, text) =>
      val lower = text.toLowerCase
      graft.analyze.DictionaryAnalyzer(words).tokenize(text).forall(lower.contains)
    }

  property("dict analyzer: CJK tokens are dictionary words or ≤2 code points") =
    forAll(dictCaseGen) { case (words, text) =>
      val dict = words.map(_.toLowerCase)
      graft.analyze.DictionaryAnalyzer(words).tokenize(text)
        .filter(_.exists(c => cjkClass(c) != 0))
        .forall(t => dict.contains(t) || t.codePointCount(0, t.length) <= 2)
    }

  property("dict analyzer: empty dictionary ≡ the bigram analyzer") =
    forAll(mixedTextGen) { text =>
      graft.analyze.DictionaryAnalyzer(Set.empty).tokenize(text) ==
        graft.analyze.CjkBigramAnalyzer.tokenize(text)
    }

  property("dict analyzer: registry name round-trips segmentation exactly") =
    forAll(dictCaseGen) { case (words, text) =>
      val a = graft.analyze.DictionaryAnalyzer(words)
      val b = graft.analyze.Analyzers.byName(graft.analyze.Analyzers.nameOf(a))
      b.tokenize(text) == a.tokenize(text)
    }

  // ---- w2v mean-vector kernel invariants ----
  private val w2vCaseGen: Gen[(Map[String, Array[Float]], Seq[String])] = for {
    dim <- Gen.choose(2, 8)
    vocabWords <- Gen.nonEmptyListOf(Gen.identifier.map(_.take(6)))
    vecs <- Gen.listOfN(vocabWords.size,
      Gen.listOfN(dim, Gen.choose(-1.0f, 1.0f)).map(_.toArray))
    extra <- Gen.listOf(Gen.identifier.map("zz" + _))
    picks <- Gen.listOf(Gen.oneOf(vocabWords ++ extra))
  } yield (vocabWords.zip(vecs).toMap, picks)

  property("w2v mean vector: output is unit-norm, or exactly zero when nothing matches") =
    forAll(w2vCaseGen) { case (vocab, tokens) =>
      val dim = vocab.headOption.map(_._2.length).getOrElse(2)
      val v = graft.embed.Word2VecEmbed.meanVector(dim, vocab, tokens)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.length == dim && (math.abs(norm - 1.0) < 1e-5 || v.forall(_ == 0.0f))
    }
}
