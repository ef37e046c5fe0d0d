package graft.embed

import org.apache.spark.ml.feature.Word2Vec
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A genuinely TRAINED model behind the [[Embedder]] trait: MLlib skip-gram
  * Word2Vec fitted on the corpus, with per-document embeddings as the
  * L2-normalized mean of learned word vectors.
  *
  * This closes the "no real model behind the trait" gap operationally while
  * keeping the correctness surface on the deterministic embedders: it proves
  * the index pipeline's `mapPartitions`/bulk batching path with learned
  * (non-stand-in) vectors, exactly where the reference plugs its
  * SentenceTransformer (reference `src/models/embedding.py:48-77`).
  *
  * Geometry contract: `Word2VecModel.transform` sums the vectors of
  * in-vocabulary tokens and scales by 1/|tokens| — a positive scalar — so
  * after L2 normalization the query-time embedder only has to reproduce the
  * SUM in token order and normalize. One definition of that kernel lives in
  * [[Word2VecEmbed.meanVector]]; the bulk path and the query path both use
  * it, so index-time and query-time geometry can never drift.
  *
  * Scale posture: training cost is one fit over the token corpus; the model
  * itself is vocab×dim floats. `minCount` prunes the long tail so the model
  * stays broadcast-sized at 100 TB (vocab growth is sublinear in corpus
  * size; a 1M-word vocab at dim 64 is ~256 MB — prune or hash above that).
  * The transform side is a broadcast map + map-only kernel: no shuffle.
  */
object Word2VecEmbed {

  /** Fitted model: learned word vectors, broadcast-sized. */
  final case class W2vModel(dim: Int, vectors: Map[String, Array[Float]]) {
    def name: String = s"w2v-$dim"

    def save(spark: SparkSession, path: String): Unit = {
      import spark.implicits._
      vectors.toSeq.map { case (w, v) => (w, v.toSeq) }.toDF("word", "vector")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }

    def embedder(tokenize: String => Seq[String] =
        graft.analyze.DefaultAnalyzer.tokenize _): Embedder =
      new W2vQueryEmbedder(this, tokenize)
  }

  /** Reload saved word vectors. Fails LOUDLY on an empty vector table
    * (an empty corpus or over-aggressive minCount would otherwise
    * round-trip as a dim-0 model named "w2v-0" that silently embeds every
    * query to a zero vector — round-9 ADVICE); pass `expectedDim` (the
    * index's persisted `embedding_dim` setting) to also assert the stored
    * geometry matches what the index was built with. */
  def load(spark: SparkSession, path: String,
      expectedDim: Option[Int] = None): W2vModel = {
    val rows = spark.read.parquet(path).collect()
    val vectors = rows.map { r =>
      r.getAs[String]("word") -> r.getAs[Seq[Float]]("vector").toArray
    }.toMap
    if (vectors.isEmpty)
      throw new IllegalStateException(
        s"w2v model at $path has an empty vocabulary — refusing to serve " +
          "zero-length query embeddings (was the corpus empty, or minCount " +
          "too aggressive at fit time?)")
    val dim = vectors.head._2.length
    expectedDim.foreach { d =>
      require(d == dim,
        s"w2v model at $path has dim $dim but the index was built with " +
          s"embedding_dim $d — refusing a geometry mismatch")
    }
    W2vModel(dim, vectors)
  }

  /** The ONE shared kernel: sum of known-word vectors in token order,
    * L2-normalized (all-OOV → zero vector, matching the bulk transform). */
  def meanVector(dim: Int, vectors: Map[String, Array[Float]],
      tokens: Seq[String]): Array[Float] = {
    val sum = new Array[Double](dim)
    tokens.foreach { t =>
      vectors.get(t) match {
        case Some(v) =>
          var i = 0
          while (i < dim) { sum(i) += v(i); i += 1 }
        case None => ()
      }
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += sum(i) * sum(i); i += 1 }
    val out = new Array[Float](dim)
    if (norm > 0) {
      val inv = 1.0 / math.sqrt(norm)
      i = 0
      while (i < dim) { out(i) = (sum(i) * inv).toFloat; i += 1 }
    }
    out
  }

  /** Train on the corpus and add an `embedding: array<float>` column.
    *
    * `numPartitions = 1` (the default) + fixed seed keeps training
    * deterministic (MLlib's multi-partition Word2Vec is Hogwild-style and
    * run-order dependent) — the correctness-surface posture. At scale pass
    * `numPartitions = N`: training parallelizes over N partitions and
    * run-to-run vector JITTER is accepted; the SERVING contract is
    * unaffected either way, because serving always reloads the SAVED
    * vectors and the one shared [[meanVector]] kernel makes bulk and query
    * geometry a pure function of those — EmbedSpec pins exactly this
    * (partitioned fit → save → load → bit-identical bulk/query agreement).
    */
  def fitTransform(df: DataFrame, tokensCol: String, dim: Int = 64,
      minCount: Int = 1, outputCol: String = "embedding",
      seed: Long = 42L, sortCols: Seq[String] = Nil,
      numPartitions: Int = 1): (DataFrame, W2vModel) = {
    // `sortCols`: skip-gram SGD is input-ORDER sensitive even at one
    // training partition, so callers that need run-to-run reproducibility
    // independent of arrival order (the streaming refit barrier vs the
    // batch build) fit over a deterministically sorted single partition —
    // training at numPartitions=1 is serial anyway, so the coalesce costs
    // nothing extra. The TRANSFORM still runs over `df` untouched. With
    // numPartitions > 1 determinism is off the table by design, so the
    // fit input is simply spread over N partitions.
    val fitInput =
      if (numPartitions > 1) df.repartition(numPartitions)
      else if (sortCols.isEmpty) df
      else df.orderBy(sortCols.map(col): _*).coalesce(1)
    val w2v = new Word2Vec()
      .setInputCol(tokensCol).setOutputCol("_w2v")
      .setVectorSize(dim).setMinCount(minCount)
      .setNumPartitions(math.max(1, numPartitions)).setSeed(seed)
    val fitted = w2v.fit(fitInput)
    val vectors = fitted.getVectors.collect().map { r =>
      r.getAs[String]("word") -> r.getAs[Vector]("vector").toArray.map(_.toFloat)
    }.toMap
    val model = W2vModel(dim, vectors)
    val bc = df.sparkSession.sparkContext.broadcast(vectors)
    // one kernel for bulk and query paths (see scaladoc): the fitted
    // transform's scalar 1/|tokens| washes out under the L2 norm, so going
    // through meanVector here costs nothing and guarantees the contract
    val embed = udf((toks: Seq[String]) =>
      meanVector(dim, bc.value, Option(toks).getOrElse(Seq.empty)))
    (df.withColumn(outputCol, embed(col(tokensCol))), model)
  }
}

/** Query-time embedder reproducing the bulk geometry on the driver: same
  * word vectors, same sum order, same L2 norm. */
final class W2vQueryEmbedder(
    model: Word2VecEmbed.W2vModel,
    tokenize: String => Seq[String]) extends Embedder {

  override def dim: Int = model.dim
  override def name: String = model.name

  override def embed(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(t => Word2VecEmbed.meanVector(model.dim, model.vectors, tokenize(t)))
}
