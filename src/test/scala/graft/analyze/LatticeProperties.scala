package graft.analyze

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property pins for the dict-lattice segmenter (round-20 directive #3):
  * the Viterbi path must be provably OPTIMAL under the published cost
  * model, not merely plausible — checked against an independent top-down
  * memoized minimum over all segmentations (different traversal order, no
  * tie-breaking, cost only), plus structural invariants of the path and
  * the analyzers' agreement surface. Pure Scala, no SparkSession. */
object LatticeProperties extends Properties("lattice") {

  private val alphabet = "あいうえお".toCharArray.map(_.toString).toSeq

  private val wordGen: Gen[String] = for {
    len <- Gen.choose(1, 3)
    cs <- Gen.listOfN(len, Gen.oneOf(alphabet))
  } yield cs.mkString

  private val dictGen: Gen[Set[String]] =
    Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, wordGen).map(_.toSet))

  private val spanGen: Gen[String] = for {
    len <- Gen.choose(0, 8)
    cs <- Gen.listOfN(len, Gen.oneOf(alphabet))
  } yield cs.mkString

  /** Independent reference: top-down memoized min cost over ALL
    * segmentations into (dictionary word | single unknown char). The
    * generator alphabet is BMP-only, so char == code point here. */
  private def bruteMinCost(span: String, dict: Set[String]): Long = {
    val maxLen = if (dict.isEmpty) 0 else dict.map(_.length).max
    val memo = Array.fill(span.length + 1)(-1L)
    def go(i: Int): Long =
      if (i == span.length) 0L
      else if (memo(i) >= 0) memo(i)
      else {
        var best = LatticeDictionaryAnalyzer.UnknownCost + go(i + 1)
        var l = math.min(maxLen, span.length - i)
        while (l >= 1) {
          if (dict.contains(span.substring(i, i + l)))
            best = math.min(best, LatticeDictionaryAnalyzer.WordCost + go(i + l))
          l -= 1
        }
        memo(i) = best
        best
      }
    go(0)
  }

  private def pathCost(path: Seq[(String, Boolean)]): Long =
    path.map { case (_, isDict) =>
      if (isDict) LatticeDictionaryAnalyzer.WordCost
      else LatticeDictionaryAnalyzer.UnknownCost
    }.sum

  property("path is optimal: Viterbi cost == brute-force minimum") =
    forAll(dictGen, spanGen) { (words, span) =>
      val a = LatticeDictionaryAnalyzer(words)
      pathCost(a.segmentPath(span)) == bruteMinCost(span, words)
    }

  property("path is well-formed: concatenates to the span, dict edges are " +
      "dictionary words, unknown edges are single chars") =
    forAll(dictGen, spanGen) { (words, span) =>
      val path = LatticeDictionaryAnalyzer(words).segmentPath(span)
      path.map(_._1).mkString == span &&
        path.forall { case (t, isDict) =>
          if (isDict) words.contains(t) else t.length == 1
        }
    }

  property("fully-tileable spans cost at most the tiling (k repeats of a " +
      "dictionary word ⇒ cost ≤ k·WordCost)") =
    // a full tiling exists by construction, so the optimum can never pay
    // more than it (all-dict-ONLY is not asserted: an equal-cost mixed
    // path could legitimately tie, and ties are a tie-break concern — the
    // optimality property above already pins the cost exactly)
    forAll(dictGen.suchThat(_.nonEmpty), Gen.choose(1, 4)) { (words, k) =>
      val span = Seq.fill(k)(words.head).mkString
      pathCost(LatticeDictionaryAnalyzer(words).segmentPath(span)) <=
        k * LatticeDictionaryAnalyzer.WordCost
    }

  property("empty dictionary degenerates to the bigram analyzer on any text") =
    forAll(spanGen) { span =>
      LatticeDictionaryAnalyzer(Set.empty).tokenize(span) ==
        CjkBigramAnalyzer.tokenize(span)
    }

  property("latin/digit text tokenizes exactly like DefaultAnalyzer " +
      "(the CJK machinery never touches it)") =
    forAll(dictGen, Gen.asciiPrintableStr) { (words, s) =>
      LatticeDictionaryAnalyzer(words).tokenize(s) == DefaultAnalyzer.tokenize(s)
    }

  property("lattice never emits MORE dictionary-fallback noise than greedy " +
      "on covered text: every output token set stays within span substrings") =
    forAll(dictGen, spanGen) { (words, span) =>
      val toks = LatticeDictionaryAnalyzer(words).tokenize(span)
      toks.forall(span.contains) &&
        DictionaryAnalyzer(words).tokenize(span).forall(span.contains)
    }
}
