package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.ops.Similarity

/** The persisted IVF ANN index — the engine's counterpart of the reference's
  * HNSW index (reference `src/db.py:152-165`: `CREATE INDEX … USING HNSW`):
  * built once at index time, used by the online SEARCH path so the VSS leg
  * stops scanning the full corpus per query.
  *
  * Layout inside the index artifact (SURVEY.md §1.3):
  *
  * {{{
  *   <dir>/ann_centroids/  cid: int, cvec: array<float>     (K rows, tiny)
  *   <dir>/ann_postings/   cluster=<cid>/…  doc_id, embedding
  * }}}
  *
  * `ann_postings` is the classic IVF inverted-list file: every vector stored
  * under its nearest centroid, written `partitionBy("cluster")` so a query
  * that probes `nprobe` clusters reads ONLY those directories — a
  * partition-pruned parquet scan (`PartitionFilters: [cluster IN (…)]`),
  * touching ~`nprobe/K` of the corpus. At 100 TB that pruning is the entire
  * point: the exact heap scan ([[graft.search.HybridSearch.vssTopK]]) reads
  * every row once per query; this reads a fixed fraction, with exactness
  * traded for recall exactly like the reference's HNSW (recall < 1.0 when a
  * true neighbor lives in an unprobed cluster; `nprobe = K` degrades to the
  * exact result — pinned in AnnIndexSpec).
  */
final case class AnnIndex(centroids: DataFrame, postings: DataFrame) {

  /** Number of clusters (collected from the tiny centroid table). */
  lazy val numClusters: Int = centroids.count().toInt

  /** Top-`nprobe` clusters for a query vector, by the engine-wide
    * (rounded cosine distance, cid) order. The centroid table is K rows —
    * scalar-sized, so the collect here is the probe DECISION, not data
    * movement (the same class of driver scalar as the BPE argmax). Distances
    * are computed by the same codegen'd [[VectorOps.cosineDist]] expression
    * the corpus legs use, so probe selection can never drift from the
    * distributed math. */
  def probe(queryVec: Array[Float], nprobe: Int): Seq[Int] = {
    val qv = typedlit(queryVec.toSeq)
    centroids
      .select(col("cid"), VectorOps.cosineDist(col("cvec"), qv).as("d"))
      .orderBy(round(col("d"), 6).asc, col("cid").asc)
      .limit(nprobe)
      .select("cid").collect().map(_.getInt(0)).toSeq
  }

  /** Cache both datasets for a long-lived serving session. */
  def cached(): AnnIndex =
    copy(centroids = centroids.cache(), postings = postings.cache())

  /** BATCH probe search over the persisted lists: every query probes its
    * `nprobe` nearest centroids (queries × centroids is broadcast-sized),
    * then ONE equi-join on the cluster id scans the union of all probed
    * lists for the whole query set — the multi-query sibling of
    * [[graft.search.HybridSearch.vssTopKIvf]] (which driver-probes and
    * partition-prunes for a single query). Output:
    * (qidCol, doc_id, dist, rank), rank ≤ k per query, deterministic
    * (rounded-dist, doc_id) order. */
  def probeSearchBatch(queries: DataFrame, qidCol: String, qvecCol: String,
      nprobe: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(qidCol).as("_qid"), col(qvecCol).as("_qvec"))
    val wProbe = Window.partitionBy(col("_qid"))
      .orderBy(round(col("_qcd"), 6).asc, col("cid").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("_qcd", VectorOps.cosineDist(col("_qvec"), col("cvec")))
      .withColumn("_pr", row_number().over(wProbe))
      .filter(col("_pr") <= nprobe)
      .select(col("_qid"), col("_qvec"), col("cid").as("cluster"))
    val wRank = Window.partitionBy(col("_qid"))
      .orderBy(round(col("dist"), 6).asc, col("doc_id").asc)
    postings.join(broadcast(probes), Seq("cluster"))
      .withColumn("dist", VectorOps.cosineDist(col("embedding"), col("_qvec")))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("_qid").as(qidCol), col("doc_id"), col("dist"), col("rank"))
  }
}

object AnnIndex {

  val CentroidsDir = "ann_centroids"
  val PostingsDir = "ann_postings"

  /** Deterministic distributed k-means over an embedding column.
    * Returns (cid: int, cvec: array<float>).
    *
    * Determinism (the engine's reproducible-artifact rule — a re-index of
    * the same corpus must produce the same index):
    *  - seed centroids are the `k` vectors with the smallest ids (no RNG);
    *  - assignment argmin breaks ties on (rounded distance, cid) —
    *    [[Similarity.ivfAssign]]'s contract;
    *  - per-dimension means sum 1e-6-quantized longs, so the result is
    *    independent of partitioning/order (the q_kmeans_step kernel; a long
    *    holds ~9.2e12 rows per (cid,pos) at |v|≤1 — beyond that, widen to
    *    DECIMAL(38,0) like q_embed_whiten).
    *
    * Per round: one broadcast centroid join + windowed argmin + one
    * partial-agg'd (cid,pos) shuffle; only k×dim aggregated rows reach the
    * driver (the new centroids — scalar-sized by definition). Empty clusters
    * keep their previous centroid. */
  def fit(
      docs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val spark = docs.sparkSession
    val base = docs
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).as("_id"), col(vecCol).cast("array<float>").as("_vec"))
    var cents: Array[(Int, Seq[Float])] = base
      .orderBy(col("_id").asc).limit(k)
      .select("_vec").collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Float](0)) }
    require(cents.nonEmpty, "AnnIndex.fit: corpus has no embedded documents")
    var round = 0
    while (round < iters) {
      val assigned = Similarity.ivfAssign(
        base, "_id", "_vec", centroidDf(spark, cents), "cid", "cvec")
      val sums = assigned
        .select(col("cid"), posexplode(col("_vec")).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("v").cast("double") * 1e6 + 0.5).cast("long")).as("sv"))
        .collect()
      val byCid = sums.groupBy(_.getAs[Int]("cid"))
      cents = cents.map { case (cid, old) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val arr = new Array[Float](old.length)
            rows.foreach { r =>
              arr(r.getAs[Int]("pos")) =
                (r.getAs[Long]("sv").toDouble / (r.getAs[Long]("n").toDouble * 1e6)).toFloat
            }
            (cid, arr.toSeq)
          case None => (cid, old)
        }
      }
      round += 1
    }
    centroidDf(spark, cents)
  }

  private def centroidDf(spark: SparkSession, cents: Array[(Int, Seq[Float])]): DataFrame = {
    import spark.implicits._
    cents.toSeq.toDF("cid", "cvec")
  }

  /** The inverted lists: every embedded document under its nearest centroid.
    * One broadcast join + windowed argmin over the corpus — embarrassingly
    * parallel, never all-pairs. */
  def buildPostings(
      docs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    Similarity.ivfAssign(
        docs.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
          .select(col(idCol).as("doc_id"), col(vecCol).cast("array<float>").as("embedding")),
        "doc_id", "embedding", centroids, "cid", "cvec")
      .select(col("cid").as("cluster"), col("doc_id"), col("embedding"))

  /** Fit + assign + persist into an existing index artifact directory. */
  def buildAndWrite(
      docs: DataFrame, idCol: String, vecCol: String,
      dir: String, k: Int, iters: Int = 4): AnnIndex = {
    val spark = docs.sparkSession
    val centroids = fit(docs, idCol, vecCol, k, iters)
      // tiny (K rows) but read by every query — one file, materialized once
      .coalesce(1).localCheckpoint(true)
    centroids.write.mode("overwrite").parquet(s"$dir/$CentroidsDir")
    buildPostings(docs, idCol, vecCol, centroids)
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$dir/$PostingsDir")
    load(spark, dir).getOrElse(sys.error(s"AnnIndex write to $dir not readable back"))
  }

  /** Load the ANN sidecar if the artifact has one (indexes built without
    * `--ann-clusters` simply don't — the search path then uses the exact
    * heap scan). */
  def load(spark: SparkSession, dir: String): Option[AnnIndex] = {
    val p = new org.apache.hadoop.fs.Path(dir, CentroidsDir)
    val exists = p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    if (!exists) None
    else Some(AnnIndex(
      centroids = spark.read.parquet(s"$dir/$CentroidsDir"),
      postings = spark.read.parquet(s"$dir/$PostingsDir")))
  }
}
