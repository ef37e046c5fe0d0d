package graft.embed

/** Embedder over precomputed text→vector mappings — the eval-set case where
  * query embeddings were produced offline (the engine treats embedding as an
  * opaque vector source, like the reference's settings-pinned model,
  * `src/db.py:93-97`). */
final class LookupEmbedder(vectors: Map[String, Array[Float]]) extends Embedder {
  require(vectors.nonEmpty, "LookupEmbedder needs at least one vector")
  override val dim: Int = vectors.head._2.length
  override def name: String = s"lookup-$dim"
  override def embed(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(t => vectors.getOrElse(t,
      throw new NoSuchElementException(s"no precomputed vector for query: $t")))
}
