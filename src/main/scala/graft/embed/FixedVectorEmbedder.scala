package graft.embed

/** Embedder that returns one pre-computed vector for any text — used when the
  * corpus ships pre-computed embeddings (testdata `embeddings.parquet`) and
  * the query vector is supplied externally, mirroring how the reference
  * treats the embedding model as an opaque source of vectors
  * (`src/models/embedding.py:48-77`). */
final class FixedVectorEmbedder(vec: Array[Float]) extends Embedder {
  override def dim: Int = vec.length
  override def name: String = s"fixed-$dim"
  override def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map(_ => vec)
}
