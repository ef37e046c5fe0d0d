package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming collocation counting — the incremental face of
  * [[graft.search.PhraseSearch.collocations]].
  *
  * The batch operator forms pairs by a positional self-join (the right
  * shape over the `positions/` sidecar, where tokens are not materialized).
  * A stream cannot self-join its own micro-batch without watermark
  * machinery — but it doesn't need to: pair formation is WITHIN one
  * document, so on a token-carrying frame it is a pure array expression
  * (each token pairs with the next `window` tokens of its own array),
  * map-only and stateless. The only stateful stage is then a standard
  * streaming aggregation — Spark's state store carries exactly the
  * (term_a, term_b) → count map the batch groupBy computes, incrementally
  * correct in update/complete mode with no custom state code.
  *
  * PMI is deliberately NOT computed in the stream: it depends on corpus
  * totals that change every micro-batch, so any in-stream PMI is stale the
  * moment it's emitted. The serving pattern is count-state in the stream
  * and PMI as a cheap projection over the current snapshot (unigram counts
  * stream the same way; the projection is [[pmiOver]]).
  *
  * Scale posture: the map stage is O(tokens · window) rows per document
  * with no shuffle; the aggregation shuffles pair rows once with map-side
  * partial counts; state size is the distinct-pair vocabulary (what any
  * corpus-wide pair count must hold, independent of stream length).
  * CollocStreamSpec pins stream-vs-batch count equality across
  * micro-batches AND the array formulation's parity with the positional
  * join formulation.
  */
object CollocStream {

  /** (term_a, term_b) — one row per ordered within-window pair, from the
    * tokens array directly (no positions table, no join). Works on batch
    * AND streaming frames. */
  def pairsFromTokens(docs: DataFrame, tokensCol: String,
      window: Int): DataFrame = {
    require(window >= 1, s"collocation window must be ≥ 1, got $window")
    docs
      .select(explode(flatten(transform(col(tokensCol), (t, i) =>
        // slice is 1-based: partners of the 0-based token i are the
        // `window` tokens starting at 1-based position i+2
        transform(slice(col(tokensCol), i + lit(2), lit(window)), u =>
          struct(t.as("term_a"), u.as("term_b")))))).as("p"))
      .select(col("p.term_a").as("term_a"), col("p.term_b").as("term_b"))
  }

  /** Ordered within-window pair counts, incrementally maintained when
    * `docs` is a streaming frame (update or complete output mode). */
  def pairCounts(docs: DataFrame, tokensCol: String, window: Int): DataFrame =
    pairsFromTokens(docs, tokensCol, window)
      .groupBy("term_a", "term_b")
      .agg(count(lit(1)).cast("long").as("n_ab"))

  /** Unigram occurrence counts — the other state a PMI projection needs;
    * same incremental shape. */
  def termCounts(docs: DataFrame, tokensCol: String): DataFrame =
    docs.select(explode(col(tokensCol)).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).cast("long").as("n"))

  /** PMI over SNAPSHOTS of the two count tables — COMPLETE-mode memory-sink
    * state of the two streaming aggregations (one row per key), or their
    * batch equivalents. An UPDATE-mode sink is NOT a valid input: it
    * appends per-batch delta rows, so a pair key can appear multiple times
    * and the PMI join would double-count it; dedup to the latest row per
    * key first if update mode is all you have (ADVICE r17).
    * Delegates to the ONE scoring implementation
    * ([[graft.search.PhraseSearch.pmiOver]]) — batch and stream cannot
    * diverge on the formula by construction. */
  def pmiOver(pairCounts: DataFrame, termCounts: DataFrame,
      minCount: Long): DataFrame =
    graft.search.PhraseSearch.pmiOver(pairCounts, termCounts, minCount)
}
