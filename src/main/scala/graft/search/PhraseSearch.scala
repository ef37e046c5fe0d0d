package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Phrase (adjacency) search over a POSITIONAL postings table — the index
  * path that replaces the per-query corpus token scan (round-15 directive
  * #3). The positions table ([[Bm25.positionalPostings]]; artifact sidecar
  * `positions/`, term-clustered + term-sorted like the postings layout)
  * makes a phrase query a chain of PRUNED equality probes joined on
  * (doc_id, aligned pos): each leg's `term = 'x'` predicate pushes to the
  * parquet scan and row-group min/max stats cut the read to that term's
  * occurrence list, so the whole query reads Σ df(tᵢ)-proportional rows —
  * corpus-flat, where the token-scan formulation (`q_phrase_match`) reads
  * every tokens array per query. PhrasePostingsSpec pins both the result
  * parity and the rows-read bound.
  */
object PhraseSearch {

  /** Documents containing `terms` as an ADJACENT run, with occurrence
    * counts: (doc_id, n_matches). The classic positional self-join — leg i
    * probes `term = terms(i)` and aligns on `pos − i`, so a surviving
    * (doc_id, pos) pair marks a full phrase occurrence starting at pos.
    * A 1-term "phrase" degenerates to (doc_id, tf) — consistent.
    *
    * Join shape at scale: every leg is a pruned probe of the positions
    * table (df-proportional, NOT corpus-proportional), and the n−1 joins
    * key on (doc_id, pos) — shuffles of probe-sized inputs only. Duplicate
    * phrase terms ("to be to") work: each leg filters by VALUE, and the
    * position alignment keeps occurrences distinct. */
  def phraseMatches(positions: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "phraseMatches needs a non-empty phrase")
    val leg0 = positions.filter(col("term") === terms.head)
      .select(col("doc_id"), col("pos"))
    terms.zipWithIndex.drop(1).foldLeft(leg0) { case (acc, (t, i)) =>
        acc.join(
          positions.filter(col("term") === t)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
      }
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_matches"))
  }

  /** Ordered PROXIMITY match (the sloppy-phrase / co-occurrence-window
    * operator): documents where `first` is followed by `second` within
    * `window` token positions, with the PAIR count. Same pruned two-probe
    * shape as [[phraseMatches]] — the join condition widens from pos+1 to a
    * pos range, expressed as an equi-join on a derived BUCKET key plus a
    * range residual so the planner gets a hash join (probe-sized inputs),
    * never a broadcast-nested-loop over the full range predicate: a second
    * occurrence at pos p matches first occurrences in (p−window, p), which
    * spans at most two window-sized buckets — each second-leg row emits its
    * own bucket and the previous one, and the residual keeps exactness.
    * `window = 1` degenerates to the 2-term adjacency of [[phraseMatches]].
    * At 100 TB: reads are df-proportional (pruned term probes), the join
    * keys on (doc_id, bucket) — never all-pairs within a document. */
  def proximityMatches(positions: DataFrame, first: String, second: String,
      window: Int): DataFrame = {
    require(window >= 1, s"proximity window must be ≥ 1, got $window")
    val a = positions.filter(col("term") === first)
      .select(col("doc_id"), col("pos").as("_pa"),
        floor(col("pos") / window).as("_bucket"))
    val b = positions.filter(col("term") === second)
      .select(col("doc_id"), col("pos").as("_pb"),
        explode(array(floor(col("pos") / window),
          floor(col("pos") / window) - 1)).as("_bucket"))
    a.join(b, Seq("doc_id", "_bucket"))
      .filter(col("_pb") > col("_pa") && col("_pb") - col("_pa") <= window)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_pairs"))
  }
}
