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

  /** UNORDERED proximity: documents where `first` and `second` co-occur
    * within `window` positions in either order, with the pair count. Same
    * bucketed-equi-join shape as [[proximityMatches]], with the residual
    * widened to |pb − pa| ≤ window — pa now falls in [pb−w, pb+w], which
    * spans at most THREE window-sized buckets, so each second-leg row
    * emits its own bucket and both neighbours. Each (pa, pb) combination
    * counts once (one row per leg per occurrence); `first` and `second`
    * must be distinct terms — a term never shares a position with itself,
    * but a symmetric self-pair would double-count, so it is rejected.
    * Training-pipeline shape: co-occurrence window mining (skip-gram
    * windows, PMI inputs) is unordered by definition. */
  def proximityMatchesUnordered(positions: DataFrame, first: String,
      second: String, window: Int): DataFrame = {
    require(window >= 1, s"proximity window must be ≥ 1, got $window")
    require(first != second,
      "unordered proximity needs two distinct terms (a self-pair would double-count)")
    val a = positions.filter(col("term") === first)
      .select(col("doc_id"), col("pos").as("_pa"),
        floor(col("pos") / window).as("_bucket"))
    val b = positions.filter(col("term") === second)
      .select(col("doc_id"), col("pos").as("_pb"),
        explode(array(floor(col("pos") / window) - 1,
          floor(col("pos") / window),
          floor(col("pos") / window) + 1)).as("_bucket"))
    a.join(b, Seq("doc_id", "_bucket"))
      .filter(abs(col("_pb") - col("_pa")) <= window)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_pairs"))
  }

  /** N-term SLOPPY PHRASE (the Lucene `slop` shape): documents containing
    * every term of `terms` (distinct values, in order) inside a span of at
    * most `window` positions, with the match-tuple count. Generalizes the
    * two-term [[proximityMatches]] by CHAINING the bucketed probes: leg 0
    * anchors, every later leg joins on (doc_id, anchor-bucket) — a leg-i
    * occurrence within `window` of the anchor lies in one of the anchor's
    * three window-sized buckets, so each leg-i row emits 3 bucket keys and
    * the join stays a hash join on probe-sized inputs (never a per-doc
    * all-pairs or a nested-loop range join). Residuals keep exactness:
    * each leg must sit AFTER its predecessor (ordered), and the final span
    * check is last(pos) − anchor(pos) ≤ window (with ascending positions
    * that IS max − min). Reads stay df-proportional: every leg is a pushed
    * `term = 'x'` probe of the term-clustered positions sidecar.
    * `terms.size == 2` reproduces [[proximityMatches]] exactly;
    * `window = terms.size − 1` degenerates to strict adjacency. */
  def sloppyPhraseMatches(positions: DataFrame, terms: Seq[String],
      window: Int): DataFrame = {
    require(terms.size >= 2, s"sloppy phrase needs ≥ 2 terms, got ${terms.size}")
    require(terms.distinct.size == terms.size,
      "sloppy phrase terms must be distinct (duplicate terms would pair a position with itself)")
    require(window >= terms.size - 1,
      s"window $window cannot hold ${terms.size} ordered terms (needs ≥ ${terms.size - 1})")
    val anchor = positions.filter(col("term") === terms.head)
      .select(col("doc_id"), col("pos").as("_p0"),
        floor(col("pos") / window).as("_bucket"))
    val joined = terms.zipWithIndex.drop(1).foldLeft(anchor) { case (acc, (t, i)) =>
      val leg = positions.filter(col("term") === t)
        .select(col("doc_id"), col("pos").as(s"_p$i"),
          explode(array(floor(col("pos") / window) - 1,
            floor(col("pos") / window),
            floor(col("pos") / window) + 1)).as("_bucket"))
      acc.join(leg, Seq("doc_id", "_bucket"))
        // in-order + within the anchor's window: prunes the tuple space at
        // every hop, so intermediate cardinality never exceeds the final
        // match count times the per-doc occurrence fan-in of one term
        .filter(col(s"_p$i") > col(s"_p${i - 1}") &&
          col(s"_p$i") - col("_p0") <= window)
    }
    joined
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_matches"))
  }

  /** CORPUS-WIDE collocation mining (the statistic a training pipeline
    * derives before skip-gram / co-occurrence features, and the classic
    * "find multi-word expressions" pass): every ORDERED term pair whose
    * second member follows the first within `window` positions, counted
    * over the whole corpus and scored by pointwise mutual information
    * pmi = ln(n_ab · T ∕ (n_a · n_b)), where n_a/n_b are corpus occurrence
    * counts and T the total token count. High PMI + high count = a
    * collocation ("new york"); PMI near 0 = independent co-occurrence.
    *
    * Scale shape: pair formation is ONE equi-join on (doc_id, pos) — each
    * left occurrence explodes into its `window` partner positions, so the
    * join input is O(Σdl · window) rows and never per-doc all-pairs; the
    * per-pair count is a map-side-combinable groupBy; the `minCount`
    * threshold cuts the long tail BEFORE the dictionary joins (pairs
    * surviving a corpus-level count floor are few, so AQE broadcasts
    * them); T is a one-row broadcast. No stage touches documents — only
    * the positions sidecar. */
  def collocations(positions: DataFrame, window: Int,
      minCount: Long): DataFrame = {
    require(window >= 1, s"collocation window must be ≥ 1, got $window")
    val a = positions.select(col("doc_id"), col("term").as("term_a"),
      explode(sequence(col("pos") + 1, col("pos") + window)).as("_pb"))
    val b = positions.select(col("doc_id"), col("term").as("term_b"),
      col("pos").as("_pb"))
    val pairs = a.join(b, Seq("doc_id", "_pb"))
      .groupBy("term_a", "term_b")
      .agg(count(lit(1)).cast("long").as("n_ab"))
    // materialize the vocab-sized unigram counts ONCE: pmiOver consumes
    // this frame three times (term_a join, term_b join, the T total), and
    // Spark does not share scan subtrees across join sides — without the
    // checkpoint, each use re-scanned the Σdl-row positions table
    // (CollocProbe measured 4× positions reads per mining pass; with it,
    // the irreducible 3: the two pair-join legs + this one unigram pass).
    // LAZY (eager = false): constructing the frame must not run a job —
    // the checkpoint materializes with the caller's first action and the
    // three consumers share it from then on; the vocab-sized blocks are
    // reclaimed by the ContextCleaner when the frame goes unreferenced,
    // like every other persist in the engine.
    val uni = positions.groupBy("term")
      .agg(count(lit(1)).cast("long").as("n"))
      .localCheckpoint(false)
    pmiOver(pairs, uni, minCount)
  }

  /** [[collocations]] computed from the tokens frame `(doc_id, tokens)`
    * instead of the positions sidecar — for callers that still HAVE the
    * arrays (the corpus-mining query), where pair formation needs no join
    * at all: each occurrence pairs with the next `window` positions of its
    * own array (posexplode + slice + explode, all map-side in the scan
    * stage), so the Σdl·window pair stream crosses exactly ONE exchange
    * (the partial-agg'd pair count) instead of the positional self-join's
    * two join-side shuffles + count shuffle (round 22). The pair multiset
    * is identical to the (doc_id, pos) equi-join's — b.pos ∈ (a.pos,
    * a.pos + window], positions past the array end simply don't exist —
    * and scoring goes through the same [[pmiOver]]. Sidecar-only callers
    * (the index CLI, the stream parity checks) keep [[collocations]]. */
  def collocationsFromTokens(docsTokens: DataFrame, window: Int,
      minCount: Long): DataFrame = {
    require(window >= 1, s"collocation window must be ≥ 1, got $window")
    val pairs = docsTokens
      .select(col("tokens"), posexplode(col("tokens")).as(Seq("_i", "term_a")))
      .select(col("term_a"),
        explode(slice(col("tokens"), col("_i") + lit(2), lit(window))).as("term_b"))
      .groupBy("term_a", "term_b")
      .agg(count(lit(1)).cast("long").as("n_ab"))
    val uni = docsTokens.select(explode(col("tokens")).as("term"))
      .groupBy("term").agg(count(lit(1)).cast("long").as("n"))
      .localCheckpoint(false)
    pmiOver(pairs, uni, minCount)
  }

  /** PMI scoring over a pair-count table `(term_a, term_b, n_ab)` and a
    * unigram-count table `(term, n)`: pmi = ln(n_ab · T ∕ (n_a · n_b)),
    * T = Σn. THE one scoring implementation — [[collocations]] feeds it
    * the positional-join counts, [[graft.streaming.CollocStream]] feeds it
    * snapshots of its incrementally-maintained streaming aggregations; a
    * formula change lands in both by construction. The `minCount` floor
    * cuts the pair long-tail BEFORE the dictionary joins. */
  def pmiOver(pairCounts: DataFrame, termCounts: DataFrame,
      minCount: Long): DataFrame = {
    val uni = termCounts.select(col("term"), col("n").cast("double").as("n"))
    val total = uni.agg(sum(col("n")).as("_t"))
    pairCounts.filter(col("n_ab") >= minCount)
      .join(uni.select(col("term").as("term_a"), col("n").as("_na")), "term_a")
      .join(uni.select(col("term").as("term_b"), col("n").as("_nb")), "term_b")
      .crossJoin(broadcast(total))
      .select(col("term_a"), col("term_b"), col("n_ab"),
        log(col("n_ab") * col("_t") / (col("_na") * col("_nb"))).as("pmi"))
  }
}
