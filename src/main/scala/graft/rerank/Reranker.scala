package graft.rerank

/** Pluggable cross-encoder reranker (reference `src/models/reranker.py:56-122`,
  * batch_size=8, input truncated to 2048 chars at
  * `src/models/reranker.py:86`).
  *
  * Contract: given the query and a batch of candidate texts, return one
  * relevance score per text (higher = better). Scores are re-attached to
  * candidates by `doc_id`, never by position (SURVEY.md §2.3 J3 warns the
  * reference's positional re-attach is fragile — we carry the key through).
  */
trait Reranker extends Serializable {
  def name: String
  /** One score per input text, same order as `texts`. */
  def score(query: String, texts: Seq[String]): Seq[Double]
}

/** Deterministic stand-in for CrossEncoder: normalized token-overlap
  *   score = |Q ∩ D| / sqrt(|Q| · |D|)
  * over distinct lower-cased tokens. Monotone in shared vocabulary, bounded
  * [0,1], and fully reproducible — the reranker used by correctness tests
  * (SURVEY.md §5 item 2). */
final class TokenOverlapReranker(
    tokenize: String => Seq[String] = graft.analyze.DefaultAnalyzer.tokenize _)
  extends Reranker {

  override def name: String = "token-overlap"

  override def score(query: String, texts: Seq[String]): Seq[Double] = {
    val q = tokenize(query).toSet
    texts.map { t =>
      val d = tokenize(t).toSet
      if (q.isEmpty || d.isEmpty) 0.0
      else q.intersect(d).size.toDouble / math.sqrt(q.size.toDouble * d.size.toDouble)
    }
  }
}
