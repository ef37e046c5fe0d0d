package graft.embed

import org.apache.spark.ml.feature.{HashingTF, IDF, Normalizer}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DataFrame-native bulk embedding for the INDEX path: hashed TF → IDF →
  * L2 normalize (MLlib pipeline), emitting the same `array<float>` embedding
  * column the per-row [[Embedder]] contract produces.
  *
  * This is the self-contained stand-in for the reference's
  * SentenceTransformer bulk encode (`src/models/embedding.py:48-77`) when
  * indexing at scale: whole-corpus statistics (IDF) need a distributed fit,
  * which the per-row `Embedder` trait can't express. The fitted model (dim +
  * idf weights) persists inside the index artifact so query-time embedding
  * reproduces the exact index-time geometry — the same contract the
  * reference keeps via its `settings` table (`src/db.py:93-97`).
  */
object TfIdfEmbed {

  /** Fitted model: hashed dimension + per-bucket idf weights. */
  final case class TfIdfModel(dim: Int, idf: Array[Double]) {
    def name: String = s"tfidf-$dim"

    def save(spark: SparkSession, path: String): Unit = {
      import spark.implicits._
      Seq((dim, idf.toSeq)).toDF("dim", "idf")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }

    /** Query-time embedder reproducing the pipeline on the driver: same
      * hash buckets (HashingTF.indexOf), same idf weights, same L2 norm. */
    def embedder(tokenize: String => Seq[String] =
        graft.analyze.DefaultAnalyzer.tokenize _): Embedder =
      new TfIdfQueryEmbedder(this, tokenize)
  }

  /** Load a persisted model; fails LOUDLY on an empty/truncated model file
    * and on a dim drift from the artifact's `embedding_dim` setting (the
    * same guards Word2VecEmbed.load has) — a silently accepted mismatch
    * makes every query vector the wrong length and vector search returns
    * zero results with no error. */
  def load(spark: SparkSession, path: String,
      expectedDim: Option[Int] = None): TfIdfModel = {
    val rows = spark.read.parquet(path).collect()
    require(rows.nonEmpty,
      s"empty tfidf model at $path — re-index with --embedder tfidf to re-fit")
    val r = rows.head
    val m = TfIdfModel(r.getAs[Int]("dim"), r.getAs[Seq[Double]]("idf").toArray)
    expectedDim.foreach(d => require(m.dim == d,
      s"tfidf model at $path has dim ${m.dim} but the index settings say " +
        s"embedding_dim=$d — model and artifact are out of sync; re-index"))
    m
  }

  /** Fit IDF over the corpus and add an `embedding: array<float>` column. */
  def fitTransform(df: DataFrame, tokensCol: String, dim: Int = 256,
      outputCol: String = "embedding"): (DataFrame, TfIdfModel) = {
    val tf = new HashingTF().setInputCol(tokensCol).setOutputCol("_tf")
      .setNumFeatures(dim)
    val withTf = tf.transform(df)
    val idfModel = new IDF().setInputCol("_tf").setOutputCol("_tfidf").fit(withTf)
    val norm = new Normalizer().setInputCol("_tfidf").setOutputCol("_nvec").setP(2.0)
    val withVec = norm.transform(idfModel.transform(withTf))
    val toFloats = udf((v: Vector) => v.toArray.map(_.toFloat))
    val out = withVec
      .withColumn(outputCol, toFloats(col("_nvec")))
      .drop("_tf", "_tfidf", "_nvec")
    (out, TfIdfModel(dim, idfModel.idf.toArray))
  }

  /** Back-compat convenience when the model isn't needed. */
  def withTfIdfEmbedding(df: DataFrame, tokensCol: String, dim: Int = 256,
      outputCol: String = "embedding"): DataFrame =
    fitTransform(df, tokensCol, dim, outputCol)._1
}

/** Driver/executor-local query embedding against a fitted [[TfIdfEmbed.TfIdfModel]]. */
final class TfIdfQueryEmbedder(
    model: TfIdfEmbed.TfIdfModel,
    tokenize: String => Seq[String]) extends Embedder {

  @transient private lazy val hasher =
    new HashingTF().setNumFeatures(model.dim)

  override def dim: Int = model.dim
  override def name: String = model.name

  override def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    val v = new Array[Double](model.dim)
    tokenize(t).foreach { tok =>
      val i = hasher.indexOf(tok)
      v(i) += 1.0
    }
    var i = 0
    while (i < model.dim) { v(i) *= model.idf(i); i += 1 }
    val norm = math.sqrt(v.map(x => x * x).sum)
    val out = new Array[Float](model.dim)
    if (norm > 0) {
      i = 0
      while (i < model.dim) { out(i) = (v(i) / norm).toFloat; i += 1 }
    }
    out
  }
}
