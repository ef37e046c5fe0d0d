package graft.props

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.analyze.{Analyzers, DefaultAnalyzer, NormalizingAnalyzer,
  WhitespaceAnalyzer}

/** Property invariants for the round-18 analyzer-path Unicode fold —
  * pure-Scala, no SparkSession. The fold must be exactly "normalize the
  * text, then tokenize": any divergence (partial folding, fold-after-split
  * reordering, fast-path skew) breaks the index⇄query symmetry the
  * `norm:<FORM>:<inner>` settings name promises. */
object NormalizeProperties extends Properties("graft.normalize") {

  private val forms = Gen.oneOf("NFC", "NFD", "NFKC", "NFKD")

  // strings that actually exercise normalization: mix ASCII, full-width
  // ASCII (U+FF21/FF42/FF11 + ideographic space), decomposed e+combining
  // acute vs precomposed U+00E9, the fi/ff ligatures, CJK, half-width
  // katakana, and an astral-plane emoji (surrogate pair)
  private val interesting: Gen[String] = {
    val atoms = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf(
        "Ａ", "ｂ", "１", "　",
        "é", "é", "ﬁ", "ﬀ",
        "漢", "か", "ｶ",
        new String(Character.toChars(0x1F600)),
        " ", "a", "Z", "0")).map(_.mkString))
    Gen.listOfN(4, atoms).map(_.mkString)
  }

  property("fold ≡ normalize-then-tokenize, for every form and inner") =
    forAll(forms, interesting) { (form, s) =>
      val f = java.text.Normalizer.Form.valueOf(form)
      Seq(DefaultAnalyzer, WhitespaceAnalyzer).forall { inner =>
        NormalizingAnalyzer(form, inner).tokenize(s) ==
          inner.tokenize(java.text.Normalizer.normalize(s, f))
      }
    }

  property("idempotent: folding already-folded text changes nothing") =
    forAll(forms, interesting) { (form, s) =>
      val an = NormalizingAnalyzer(form, DefaultAnalyzer)
      val once = an.tokenize(s)
      an.tokenize(java.text.Normalizer.normalize(
        s, java.text.Normalizer.Form.valueOf(form))) == once
    }

  property("index⇄query symmetry: canonically-equivalent encodings of the " +
      "same text tokenize identically under the fold") =
    forAll(interesting) { s =>
      val an = NormalizingAnalyzer("NFKC", DefaultAnalyzer)
      // NFD(s) is canonically equivalent to s, so NFKC maps both to the
      // same string — the fold must erase the byte difference
      val variant = java.text.Normalizer.normalize(
        s, java.text.Normalizer.Form.NFD)
      an.tokenize(s) == an.tokenize(variant)
    }

  property("ASCII fast path: pure-ASCII text tokenizes exactly like the " +
      "inner analyzer under every form") =
    forAll(forms, Gen.asciiPrintableStr) { (form, s) =>
      NormalizingAnalyzer(form, DefaultAnalyzer).tokenize(s) ==
        DefaultAnalyzer.tokenize(s)
    }

  property("registry round-trip: byName(nameOf(a)) == a for normalized " +
      "analyzers over every registered inner") =
    forAll(forms, Gen.oneOf[graft.analyze.Analyzer](DefaultAnalyzer,
      WhitespaceAnalyzer, graft.analyze.CjkBigramAnalyzer)) { (form, inner) =>
      val a = NormalizingAnalyzer(form, inner)
      Analyzers.byName(Analyzers.nameOf(a)) == a
    }
}
