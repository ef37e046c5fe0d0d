package graft.embed

import scala.util.hashing.MurmurHash3

/** Pluggable sentence embedder — the engine-side counterpart of the
  * reference's SentenceTransformer (reference `src/models/embedding.py:48-77`,
  * batch_size=8, model cached per process `src/models/embedding.py:15-45`).
  *
  * The engine treats embedding as an opaque batched text→vector function,
  * exactly as the reference does; morphological/model parity is out of scope
  * (SURVEY.md §7.4). Implementations must be Serializable: they ship to
  * executors and run inside `mapPartitions` with internal batching
  * (SURVEY.md §2.11 T3).
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Batch embed. Must return one unit-L2-norm vector per input text. */
  def embed(texts: Seq[String]): Seq[Array[Float]]
  /** Identifier persisted in the index `settings`, so search can verify it
    * re-uses the index-time model (reference `src/db.py:93-97`). */
  def name: String
}

/** Deterministic, dependency-free hashed bag-of-words embedder: each token is
  * murmur3-hashed into one of `dim` buckets with a ±1 sign bit, the bucket
  * counts are L2-normalized. A self-contained stand-in for the reference's
  * HF model (`cl-nagoya/ruri-v3-310m`, reference `src/cli.py:60-64`) giving
  * real cosine geometry (shared tokens ⇒ higher similarity) with zero model
  * downloads. */
final class HashingEmbedder(
    override val dim: Int = 64,
    tokenize: String => Seq[String] = graft.analyze.DefaultAnalyzer.tokenize _)
  extends Embedder {

  override def name: String = s"hashing-bow-$dim"

  override def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    val v = new Array[Float](dim)
    tokenize(t).foreach { tok =>
      val h = MurmurHash3.stringHash(tok, 0x9747b28c)
      val idx = math.floorMod(h, dim)
      val sign = if (((h >>> 31) & 1) == 0) 1.0f else -1.0f
      v(idx) += sign
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += v(i).toDouble * v(i).toDouble; i += 1 }
    if (norm > 0) {
      val inv = 1.0 / math.sqrt(norm)
      i = 0
      while (i < dim) { v(i) = (v(i) * inv).toFloat; i += 1 }
    }
    v
  }
}
