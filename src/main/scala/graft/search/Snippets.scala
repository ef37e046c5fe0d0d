package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Search-hit snippet extraction — the oracle-checked `q_search_snippets`
  * kernel (first matching query term in query-order precedence, its
  * 1-based character offset, a ±40-char window, the term
  * [bracket]-highlighted), shared verbatim between the batch query and the
  * serving surfaces' `--snippets` projection so the two can never drift
  * (round-18 directive #3).
  *
  * Pure string expressions over the ≤k hit rows — map-only and, applied to
  * an already-collected serving result (a local relation), evaluated
  * without launching any job. The reference's serving layer shows a flat
  * 200-char content preview per hit (X10, `src/cli.py:247-262`); this is
  * the term-anchored upgrade over the same rows.
  */
object Snippets {

  /** Characters of context kept BEFORE the matched term. */
  val ContextChars = 40

  /** Total snippet length in characters. */
  val SnippetLen = 100

  /** First query term occurring verbatim in `text`, query-order
    * precedence; null when none matches (a VSS-only hit, or case-folded
    * tokens that never appear verbatim in the original text). */
  def firstTerm(text: Column, terms: Seq[String]): Column =
    terms.foldRight(lit(null).cast("string")) { (t, acc) =>
      when(instr(text, t) > 0, lit(t)).otherwise(acc)
    }

  /** Append (term, off, snippet, highlighted) to `df`.
    *
    * A term-less row degrades to a document-head snippet — `greatest`
    * ignores the null offset, so the window anchors at position 1 — with
    * `term`/`off`/`highlighted` null (serving emits JSON nulls). The
    * highlight is a LITERAL all-occurrence replace (both engines'
    * `replace`), never a regex: on the serving path the term is whatever
    * the analyzer tokenized out of the user's query, and a token with
    * regex metacharacters (`c++` under the whitespace analyzer) must
    * highlight, not throw a pattern-syntax error (round-19 self-review). */
  def project(df: DataFrame, text: Column, terms: Seq[String]): DataFrame =
    df.withColumn("term", firstTerm(text, terms))
      .withColumn("off", instr(text, col("term")).cast("long"))
      .withColumn("snippet", substring(
        text, greatest(lit(1), col("off") - ContextChars).cast("int"),
        lit(SnippetLen)))
      .withColumn("highlighted",
        replace(col("snippet"), col("term"),
          concat(lit("["), col("term"), lit("]"))))
}
