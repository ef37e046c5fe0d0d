package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Approximate-nearest-neighbor building blocks over an `array<float>`
  * embedding column (BASELINE.json north-star surface).
  *
  * Baseline: exact brute-force cosine top-k (`TakeOrderedAndProject`, no full
  * sort). Scale paths:
  *  - IVF: assign every vector to its nearest centroid; at query time search
  *    only the probed centroid's partition. The assignment is one broadcast
  *    cross join (centroids are tiny) + a windowed argmin — at 100 TB the
  *    corpus partitions BY cluster id, so a query touches 1/K of the data.
  *  - Sign-LSH: bucket = sign bits of dot products against a small set of
  *    hyperplanes; candidate pairs only form within a bucket, so the
  *    near-dup join is `groupBy(bucket)` — never all-pairs.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector.
    * `queries`: (qid, qvec); `corpus`: (id, vec). Broadcast the query side.
    * Ties broken on rounded distance then id, so results are deterministic. */
  def bruteForceTopK(
      queries: DataFrame, qidCol: String, qvecCol: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .withColumn("dist", VectorOps.cosineDist(col(vecCol), col(qvecCol)))
    val filtered = if (excludeSelf) joined.filter(col(qidCol) =!= col(idCol)) else joined
    val w = Window.partitionBy(col(qidCol))
      .orderBy(round(col("dist"), 6).asc, col(idCol).asc)
    filtered
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** IVF assignment: nearest centroid per vector (argmin via windowed
    * row_number with deterministic tiebreak). `centroids`: (cid, cvec). */
  def ivfAssign(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(round(col("_cdist"), 6).asc, col(cidCol).asc)
    corpus.crossJoin(broadcast(centroids))
      .withColumn("_cdist", VectorOps.cosineDist(col(vecCol), col(cvecCol)))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .withColumnRenamed("_cdist", "centroid_dist")
  }

  /** Exact top-k neighbors via the custom [[graft.plans.CosineKnnJoin]]
    * operator: broadcast query side, one bounded heap per query per corpus
    * partition, ≤ partitions×Q×k candidate rows out — no N×Q
    * materialization, no wide shuffle (unlike [[bruteForceTopK]]'s
    * crossJoin+window plan). Same results, deterministic (rounded-dist, id)
    * ordering. */
  def knnJoin(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import graft.plans.{CosineKnnJoin, GraftStrategies}
    val spark = corpus.sparkSession
    GraftStrategies.install(spark)
    // null ids/vectors can never participate; filtering here keeps the exec
    // total (null id would NPE the strict tiebreak; null vec can't match).
    // NaN distances (zero-norm vectors) are excluded by the exec — brute
    // force instead sorts them last, so results differ only when fewer than
    // k finite-distance candidates exist.
    val l = corpus.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
    val r = queries.filter(col(qidCol).isNotNull && col(qvecCol).isNotNull)
      .select(col(qidCol).as("qid"), col(qvecCol).as("qvec"))
    // heap keeps k+1 when self-matches are dropped afterwards (self is ≤1 slot)
    val heapK = if (excludeSelf) k + 1 else k
    val cand = ColumnBridge.ofRows(spark,
      CosineKnnJoin(ColumnBridge.logicalPlan(l), ColumnBridge.logicalPlan(r), heapK))
    val filtered = if (excludeSelf) cand.filter(col("id") =!= col("qid")) else cand
    val w = Window.partitionBy(col("qid")).orderBy(round(col("dist"), 6).asc, col("id").asc)
    filtered
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Full IVF query path: probe each query's `nprobe` nearest centroids,
    * then search ONLY vectors assigned to a probed cluster — the standard
    * inverted-file ANN layout. At 100 TB the assignment is precomputed and
    * the corpus is partitioned/bucketed BY `cluster`, so the probe join is
    * a partition-pruned equi-join touching `nprobe/K` of the data; nothing
    * here is ever all-pairs. Recall < 1.0 by design (a neighbor can live in
    * an unprobed cluster) — that's the IVF trade, not a bug; exactness is
    * [[knnJoin]]'s job.
    *
    * `queries`: (qid, qvec); `corpus`: (id, vec); `centroids`: (cid, cvec).
    * Output: (qid, id, rank, dist) — deterministic (rounded-dist, id) order.
    * Inputs are re-aliased to internal names up front (the knnJoin pattern),
    * so callers may pass frames sharing column names (all three sides often
    * come from one embeddings table) without ambiguous-reference failures.
    * `excludeSelf` compares query ids against corpus ids — it only means
    * "drop the vector itself" when both sides draw ids from one id space;
    * pass `excludeSelf = false` when they don't.
    */
  def ivfSearch(
      queries: DataFrame, qidCol: String, qvecCol: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String,
      nprobe: Int, k: Int, excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(qidCol).as("_qid"), col(qvecCol).as("_qvec"))
    val c = corpus.select(col(idCol).as("_cdid"), col(vecCol).as("_cdvec"))
    val cents =
      centroids.select(col(cidCol).as("_cid"), col(cvecCol).as("_cvec"))
    // corpus side: nearest-centroid assignment (precomputed at scale)
    val assigned = ivfAssign(c, "_cdid", "_cdvec", cents, "_cid", "_cvec")
      .select(col("_cdid"), col("_cdvec"), col("_cid").as("_cluster"))
    // query side: top-nprobe centroids per query — queries × centroids is
    // tiny (both broadcast-sized), never the corpus
    val wProbe = Window.partitionBy(col("_qid"))
      .orderBy(round(col("_qcdist"), 6).asc, col("_cid").asc)
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("_qcdist", VectorOps.cosineDist(col("_qvec"), col("_cvec")))
      .withColumn("_pr", row_number().over(wProbe))
      .filter(col("_pr") <= nprobe)
      .select(col("_qid"), col("_qvec"), col("_cid").as("_cluster"))
    // equi-join on cluster id: each query sees only its probed clusters
    val cand = assigned.join(broadcast(probes), Seq("_cluster"))
      .withColumn("dist", VectorOps.cosineDist(col("_cdvec"), col("_qvec")))
    val filtered =
      if (excludeSelf) cand.filter(col("_qid") =!= col("_cdid")) else cand
    val wRank = Window.partitionBy(col("_qid"))
      .orderBy(round(col("dist"), 6).asc, col("_cdid").asc)
    filtered
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("_qid").as(qidCol), col("_cdid").as(idCol),
        col("rank"), col("dist"))
  }

  /** Sign-LSH bucket id: bit b set iff dot(vec, plane_b) > 0.
    * `planes`: broadcast-sized (bit, pvec) rows pivoted into columns first —
    * here expressed directly over a Seq of plane vector columns. */
  def signLshBucket(vec: Column, planes: Seq[Column]): Column =
    planes.zipWithIndex.map { case (p, b) =>
      when(VectorOps.dot(vec, p) > 0.0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Per-vector nearest neighbor WITHIN its bucket — the scale path for
    * embedding near-dup (composes with [[signLshBucket]] or [[ivfAssign]]).
    *
    * Unlike [[knnJoin]] with the corpus as the query side (which collects
    * and broadcasts every query vector to the driver), nothing here leaves
    * the executors: the self-join is an equi-join keyed on the bucket id
    * (one shuffle), so candidate pairs only form inside a bucket, and the
    * per-vector argmin is a window over each vector's own candidates.
    * Intermediate size is Σ n_b² over buckets — controlled by plane count
    * (more planes → smaller buckets) like the MinHash LSH pairs pipeline,
    * and BOUNDED by the `maxPerBucket` density guard: membership per bucket
    * is capped in ascending-id order ([[Dedup.MaxPerBucket]]'s recall
    * contract — boilerplate-dense corpora otherwise go quadratic inside
    * hot buckets). A capped-out vector emits no row, same as a solo vector.
    * Vectors alone in their bucket emit no row (no in-bucket candidate; at
    * scale those are "no near-dup" by construction). */
  def nearDupInBuckets(
      bucketed: DataFrame, idCol: String, vecCol: String,
      bucketCol: String, maxPerBucket: Int = Dedup.MaxPerBucket): DataFrame = {
    val capped = Dedup.capBuckets(
      bucketed.select(col(bucketCol).as("bucket"), col(idCol), col(vecCol)),
      idCol, Seq("bucket"), maxPerBucket)
    val a = capped.select(
      col("bucket"), col(idCol).as("vec_id"), col(vecCol).as("_va"))
    val b = capped.select(
      col("bucket"), col(idCol).as("nn_id"), col(vecCol).as("_vb"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(round(col("dist"), 6).asc, col("nn_id").asc)
    a.join(b, Seq("bucket"))
      .filter(col("vec_id") =!= col("nn_id"))
      .withColumn("dist", VectorOps.cosineDist(col("_va"), col("_vb")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("vec_id"), col("bucket"), col("nn_id"), col("dist"))
  }
}
