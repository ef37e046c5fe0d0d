package graft.ops

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib-backed approximate nearest neighbors — the library scale path for
  * V2 when brute force is too expensive (SURVEY.md §2.5 V2 note).
  *
  * `BucketedRandomProjectionLSH` is Euclidean; on UNIT vectors
  * ‖a−b‖² = 2·(1−cos), so Euclidean rank order equals cosine rank order —
  * callers must pre-normalize (index-time normalization is the engine
  * default, SURVEY.md §4.2). At scale the corpus is hashed once
  * (`model.transform` persisted); each query probes only colliding buckets
  * instead of scanning the corpus.
  */
object ApproxKnn {

  /** Approximate top-k by cosine distance over a pre-normalized
    * `array<float>` embedding column. Returns (idCol, dist, plus query cols).
    */
  def approxTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], k: Int,
      bucketLength: Double = 1.0, numHashTables: Int = 4): DataFrame = {
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val prepared = corpus
      .withColumn("_mlvec", toVec(col(vecCol)))
      .select(col(idCol), col("_mlvec"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("_mlvec").setOutputCol("_hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(42L)
    val model = lsh.fit(prepared)
    val q = Vectors.dense(queryVec.map(_.toDouble))
    model.approxNearestNeighbors(prepared, q, k, "_l2dist").toDF()
      .withColumn("dist", col("_l2dist") * col("_l2dist") / 2.0) // = 1 − cos on unit vectors
      .select(col(idCol), col("dist"))
  }

  /** Batch approximate top-k: ONE `approxSimilarityJoin` for the whole
    * query set — candidate pairs only form inside colliding LSH buckets
    * (recall governed by `numHashTables`), then a per-query window ranks
    * them. This is the multi-query shape: [[approxTopK]]'s
    * `approxNearestNeighbors` runs one full job per query vector from the
    * driver, which cannot scale to a query SET; here queries hash once,
    * the bucket join is a single distributed equi-join, and `maxL2 = 2.0`
    * (the unit-sphere diameter) leaves the cut to the top-k rather than
    * the radius. Output: (qidCol, idCol, dist, rank), cosine distance on
    * unit vectors, deterministic (rounded-dist, id) per-query order. */
  def approxTopKBatch(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, bucketLength: Double = 1.0, numHashTables: Int = 4,
      maxL2: Double = 2.0, excludeSelf: Boolean = false): DataFrame = {
    // distinct output names are load-bearing: with qidCol == idCol the
    // final select would emit two same-named columns and the window's
    // partitionBy/orderBy would fail on ambiguous references
    require(qidCol != idCol,
      s"qidCol and idCol must differ (both '$qidCol'); alias one side — " +
        "for corpus-as-queries self-join shapes pass e.g. qidCol = \"qid\"")
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val prepared = corpus
      .select(col(idCol).as("_cid"), toVec(col(vecCol)).as("_mlvec"))
    val qprep = queries
      .select(col(qidCol).as("_qid"), toVec(col(qvecCol)).as("_mlvec"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("_mlvec").setOutputCol("_hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(42L)
    val model = lsh.fit(prepared)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol))
      .orderBy(round(col("dist"), 6).asc, col(idCol).asc)
    val pairs = model.approxSimilarityJoin(qprep, prepared, maxL2, "_l2dist").toDF()
      .select(col("datasetA._qid").as(qidCol), col("datasetB._cid").as(idCol),
        (col("_l2dist") * col("_l2dist") / 2.0).as("dist")) // = 1 − cos on unit vectors
    // excludeSelf: the near-dup shape draws queries FROM the corpus — the
    // self-pair is always distance 0 and would eat rank 1 of every query
    // (every sibling top-k here — bruteForceTopK, knnJoin, ivfSearch —
    // offers the same knob)
    (if (excludeSelf) pairs.filter(col(qidCol) =!= col(idCol)) else pairs)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
