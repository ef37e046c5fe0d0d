package graft.search

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Seeded fuzz for the snippet kernel: the Spark column expressions
  * ([[Snippets.project]] — instr/substring/greatest/replace) against an
  * independent driver-side replica written in plain JVM string semantics.
  * Catches 1-based/0-based drift, window arithmetic off-by-ones,
  * first-term precedence bugs, and replace-vs-regex divergence — on texts
  * the oracle fixture never produces (repeated terms, terms at position 1,
  * terms straddling the 100-char cut, punctuation-adjacent matches, terms
  * with regex metacharacters, absent terms).
  *
  * Generator stays in the BMP (ASCII + accents + CJK): Spark's
  * instr/substring count CODE POINTS while java.lang.String counts UTF-16
  * units, so an astral-plane fuzz would need a codePoint-based replica —
  * the serving analyzer tokens this kernel sees are BMP in practice. */
class SnippetsFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side replica of the kernel's four outputs. */
  private def reference(text: String, terms: Seq[String])
      : (Option[String], Option[Long], String, Option[String]) = {
    val term = terms.find(t => text.contains(t))
    val off = term.map(t => text.indexOf(t).toLong + 1L)
    val start0 = off.map(o => math.max(1L, o - Snippets.ContextChars))
      .getOrElse(1L).toInt - 1 // 1-based → 0-based
    val snippet = text.substring(
      math.min(start0, text.length),
      math.min(start0 + Snippets.SnippetLen, text.length))
    val highlighted = term.map(t => snippet.replace(t, s"[$t]"))
    (term, off, snippet, highlighted)
  }

  test("seeded fuzz: kernel ≡ JVM-string replica over 150 random " +
      "(text, terms) cases incl. metacharacter terms and cut-line straddles") {
    val rnd = new scala.util.Random(19) // seeded: failures reproduce
    val alphabet = "ab cde.f漢かé+*()[]"
    def randText(n: Int): String =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val cases = (1 to 150).map { _ =>
      val text = randText(rnd.nextInt(180))
      val terms = (1 to 1 + rnd.nextInt(3)).map { _ =>
        if (rnd.nextBoolean() && text.length > 3) {
          // a REAL substring of the text, so matches actually occur
          val s = rnd.nextInt(text.length - 1)
          text.substring(s, math.min(text.length, s + 1 + rnd.nextInt(4)))
        } else randText(1 + rnd.nextInt(4))
      }.filter(_.nonEmpty).distinct
      (text, terms)
    }.filter(_._2.nonEmpty)

    cases.foreach { case (text, terms) =>
      val row = Snippets.project(
          Seq(Tuple1(text)).toDF("content"), col("content"), terms)
        .select("term", "off", "snippet", "highlighted").collect().head
      val (eTerm, eOff, eSnippet, eHl) = reference(text, terms)
      val label = s"text=${text.take(60)}… terms=$terms"
      assert(Option(row.getString(0)) == eTerm, s"term: $label")
      assert((if (row.isNullAt(1)) None else Some(row.getLong(1))) == eOff,
        s"off: $label")
      assert(row.getString(2) == eSnippet, s"snippet: $label")
      assert(Option(row.getString(3)) == eHl, s"highlighted: $label")
    }
  }
}
