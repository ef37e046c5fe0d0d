package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BPE APPLY — encode words under a FIXED, ordered merge table (the
  * tokenizer-as-artifact half of the BPE story; [[BpeTrainer]] is the
  * fit half). Standard greedy semantics (Sennrich et al., public
  * algorithm): a word starts as its character sequence, then each merge
  * (a, b), in training order, rewrites every adjacent (a, b) symbol pair
  * left-to-right into the single symbol `ab` before the next merge runs.
  *
  * Representation trick that makes this pure expression algebra (no UDF,
  * both engines evaluate the IDENTICAL fold): the symbol sequence is a
  * `'|'`-delimited string, and one merge pass is a left fold over the
  * re-split symbols — if the accumulator ends with symbol `a` (exact
  * boundary check: equals `a`, or ends with `"|a"`) and the next symbol
  * is `b`, the tail symbol rewrites to `ab`; otherwise the symbol
  * appends. Left-to-right greediness falls out of the fold order, and
  * "no re-merge within a pass" falls out of `ab` no longer ending in `a`
  * (for the merge's own pair; later merges see it fresh — exactly the
  * BPE contract). Spark evaluates `aggregate(slice(syms, 2, n-1),
  * syms[1], step)`; DuckDB evaluates `list_reduce(syms, step)` — the
  * same fold with the same initial element.
  *
  * Scale: map-only over documents, O(|merges| · word length) per word,
  * no shuffle, stays inside WholeStageCodegen. A production vocab swaps
  * [[Merges]] for the trained table; the fold shape is unchanged.
  */
object BpeEncode {

  /** The pinned demo merge table (ordered). Compile-time constant so the
    * DuckDB oracle can mirror it literally — the operator under test is
    * ENCODE-given-a-vocab, not the vocab itself. */
  val Merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d", "e" -> "r")

  /** One merge pass over a '|'-delimited symbol string (Column).
    *
    * PLAN-SHAPE CONTRACT: apply each pass in its OWN projection (a
    * `withColumn` per merge over word ROWS, after exploding words), never
    * nested as one expression per word. Spark has no common-subexpression
    * elimination inside lambda bodies, and each pass references its input
    * three times — nesting |merges| passes re-evaluates the whole chain
    * ~3^|merges| times per word (measured: ~200 ms/doc at 6 merges; the
    * row-wise chain is milliseconds for the same corpus). Catalyst's
    * CollapseProject keeps the stepwise projections separate because the
    * intermediate is referenced more than once and is non-cheap. */
  def mergePass(sym: Column, a: String, b: String): Column = {
    val parts = split(sym, "\\|")
    aggregate(slice(parts, lit(2), size(parts) - 1), element_at(parts, 1),
      (acc, x) =>
        when((acc === lit(a) || endswith(acc, lit("|" + a))) && x === lit(b),
          concat(left(acc, length(acc) - lit(a.length)), lit(a + b)))
          .otherwise(concat(acc, lit("|"), x)))
  }

  private def mergePassSql(symExpr: String, a: String, b: String): String =
    s"list_reduce(string_split($symExpr, '|'), (acc, x) -> " +
      s"CASE WHEN (acc = '$a' OR ends_with(acc, '|$a')) AND x = '$b' " +
      s"THEN left(acc, length(acc) - ${a.length}) || '$a$b' " +
      s"ELSE acc || '|' || x END)"

  /** Encode a word-ROWS frame: adds `outCol` with the '|'-delimited BPE
    * symbol string of `wordCol`. Round 21: one compiled pass per word via
    * the native [[graft.functions.BpeEncodeWord]] kernel — the stepwise
    * HOF fold ([[encodeWordsHof]], kept as the executable spec) re-split
    * and re-built the symbol string once per merge in interpreted lambdas
    * (O(|merges|·|word|²) char copying; it dominated q_bpe_encode at
    * ~1.5 s). Bit-identical output, pinned in KernelExpressionsSpec. */
  def encodeWords(df: org.apache.spark.sql.DataFrame, wordCol: String,
      outCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    df.withColumn(outCol, ColumnBridge.column(graft.functions.BpeEncodeWord(
      ColumnBridge.expression(col(wordCol)), Merges)))
  }

  /** The pre-round-21 expression-algebra fold — the executable
    * specification [[encodeWords]] is pinned against (and the shape the
    * DuckDB oracle replays literally via [[encodeWordSql]]). */
  def encodeWordsHof(df: org.apache.spark.sql.DataFrame, wordCol: String,
      outCol: String): org.apache.spark.sql.DataFrame =
    Merges.foldLeft(
      df.withColumn(outCol, concat_ws("|", split(col(wordCol), "")))) {
      case (acc, (a, b)) => acc.withColumn(outCol, mergePass(col(outCol), a, b))
    }

  def encodeWordSql(wExpr: String): String = {
    val chars = s"list_aggregate(string_split($wExpr, ''), 'string_agg', '|')"
    Merges.foldLeft(chars) { case (s, (a, b)) => mergePassSql(s, a, b) }
  }

  /** Symbol count of an encoded string: separator count + 1 via codegen'd
    * `length`/`translate` instead of a regex re-split — symbols never
    * contain '|' (words with '|' are filtered before encoding), so the
    * counts are identical, including the empty-string edge
    * (size(split("")) = 1 = 0 − 0 + 1). */
  def symbolCount(enc: Column): Column =
    (length(enc) - length(translate(enc, "|", "")) + 1).cast("long")

  def symbolCountSql(encExpr: String): String =
    s"CAST(len(string_split($encExpr, '|')) AS BIGINT)"
}
