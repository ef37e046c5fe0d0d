package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The persisted product-quantization sidecar — the codes-only serving
  * layout of the q_embed_pq / q_sim_pq_* surface, wired into the index
  * artifact so `search --ann pq[:shortlist]` can rank from codes instead of
  * raw vectors:
  *
  * {{{
  *   <dir>/ann_pq_codebooks/  j: long, cid: int, cv: array<float>   (m×K, tiny)
  *   <dir>/ann_pq_codes/      doc_id, codes: array<int>             (m ints/doc)
  * }}}
  *
  * m = ceil(dim/8) subspaces (a dim not divisible by 8 gets a narrower
  * final subspace, so EVERY dimension contributes to ADC ranking — dim 64
  * ⇒ 8 codes). A 64-float embedding compresses to 8 small ints; the query
  * builds an m×K lookup table of exact query-subvector→centroid distances,
  * and the approximate distance is a sum of m table lookups — no
  * per-vector float math. At 100 TB the codes dataset is ~1/32 the bytes of the raw vectors,
  * and the exact cosine kernel touches only the shortlist (`shortlist`
  * ids ride a broadcast back into the documents scan). `shortlist ≥ corpus`
  * reproduces the exact result (PqIndexSpec pins it). Composable with the
  * IVF sidecar in principle (probe first, ADC inside probed clusters); the
  * flat ADC scan is already the bytes-bound win this sidecar exists for.
  */
final case class PqIndex(codebooks: DataFrame, codes: DataFrame) {

  /** Collected codebooks: (j → cid → centroid), 8×K×8 floats — scalar-sized
    * by construction, cached for the serving session. */
  lazy val codebookArray: Map[(Long, Int), Array[Float]] =
    codebooks.collect()
      .map(r => (r.getAs[Long]("j"), r.getAs[Int]("cid")) -> r.getSeq[Float](2).toArray)
      .toMap

  /** Per-query ADC lookup table as a DENSE matrix `lutLongs(j)(cid)`: exact
    * L2 from the query's j-th subvector to each centroid, 1e-6-quantized to
    * longs (the order-independent-sum rule of the oracle-checked
    * q_sim_pq_adc). Dense by construction — [[PqIndex.fit]] seeds cids
    * 0..k-1 per subspace and empty cells keep their centroid — so ADC
    * ranking can run as a map-only literal lookup (`lutLongs(j)(codes(j))`)
    * instead of an (j, cid) join; an unseeded gap (sub-k corpus) fills with
    * 0, which no code references. */
  def lutLongs(queryVec: Array[Float]): Seq[Seq[Long]] = {
    val byJ = codebookArray.groupBy(_._1._1)
    if (byJ.isEmpty) return Seq.empty // empty artifact ⇒ codes scan is empty too
    (0L to byJ.keys.max).map { j =>
      val cells = byJ.getOrElse(j, Map.empty).map { case ((_, cid), cv) =>
        var acc = 0.0
        var i = 0
        while (i < cv.length) {
          val q = queryVec((j * PqIndex.SubDim + i).toInt).toDouble
          val d = q - cv(i).toDouble
          acc += d * d
          i += 1
        }
        cid -> math.floor(acc * 1e6 + 0.5).toLong
      }
      if (cells.isEmpty) Seq.empty[Long]
      else (0 to cells.keys.max).map(cid => cells.getOrElse(cid, 0L))
    }
  }

  /** [[lutLongs]] as (j, cid, lq) rows for join-shaped consumers. */
  def lut(spark: SparkSession, queryVec: Array[Float]): DataFrame = {
    import spark.implicits._
    val rows = lutLongs(queryVec).zipWithIndex.flatMap { case (cids, j) =>
      cids.zipWithIndex.map { case (lq, cid) => (j.toLong, cid, lq) }
    }
    rows.toDF("j", "cid", "lq")
  }

  def cached(): PqIndex =
    copy(codebooks = codebooks.cache(), codes = codes.cache())
}

object PqIndex {

  val CodebooksDir = "ann_pq_codebooks"
  val CodesDir = "ann_pq_codes"
  val SubDim = 8 // subspace width — the q_embed_pq layout

  /** Codebook-staleness settings keys, the PQ face of the ANN drift
    * contract ([[AnnIndex.DriftKey]]): mean per-subspace assignment
    * (reconstruction) error at fit time vs re-measured on each
    * frozen-codebook incremental merge. */
  val FitMeanErrKey = "pq_fit_meanerr"
  val MeanErrKey = "pq_meanerr"
  val DriftKey = "pq_drift"

  /** Slice an embedding column into 8-dim double subvectors:
    * (idCol, j, sv). Subspace count is ceil(dim/8), so a dim that is not a
    * multiple of 8 gets a narrower FINAL subspace covering the remainder
    * dims (`slice` truncates at the array end) — every dimension
    * contributes to ADC ranking. Floor division here would silently drop
    * the `dim mod 8` tail from the approximate stage: a recall nibble the
    * exact rerank can't see (PqIndexSpec pins a dim=100 fixture). */
  private def subspaces(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("_id"),
        explode(transform(
          sequence(lit(0),
            ceil(size(col(vecCol)).cast("double") / SubDim).cast("int") - 1),
          j => struct(j.cast("long").as("j"),
            slice(transform(col(vecCol), x => x.cast("double")),
              j * SubDim + 1, lit(SubDim)).as("sv")))).as("sub"))
      .select(col("_id"), col("sub.j").as("j"), col("sub.sv").as("sv"))

  private def l2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Deterministic per-subspace k-means codebooks (all 8 subspaces train in
    * ONE DataFrame job per iteration). Seeds are the k sub-vectors with the
    * smallest ids per subspace; argmin ties break on (rounded d, cid);
    * means sum 1e-6-quantized longs — the same reproducible-artifact rules
    * as [[AnnIndex.fit]]. Returns (j, cid, cv: array<float>). */
  def fit(docs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sub = docs
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).as("_did"), col(vecCol).as("_v"))
      .transform(d => subspaces(d, "_did", "_v"))
    // seed: k smallest-id subvectors per subspace
    val wSeed = Window.partitionBy(col("j")).orderBy(col("_id").asc)
    var books: Array[((Long, Int), Seq[Float])] = sub
      .withColumn("_rn", row_number().over(wSeed))
      .filter(col("_rn") <= k)
      .select(col("j"), (col("_rn") - 1).cast("int").as("cid"), col("sv"))
      .collect()
      .map(r => (r.getAs[Long]("j"), r.getAs[Int]("cid")) ->
        r.getSeq[Double](2).map(_.toFloat))
    var round = 0
    while (round < iters) {
      val cb = booksDf(spark, books)
      val sums = assign(sub, cb)
        .select(col("j"), col("cid"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy("j", "cid", "pos")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("v") * 1e6 + 0.5).cast("long")).as("sv"))
        .collect() // 8×K×8 aggregated rows — scalar-sized
      val byKey = sums.groupBy(r => (r.getAs[Long]("j"), r.getAs[Int]("cid")))
      books = books.map { case (key, old) =>
        byKey.get(key) match {
          case Some(rows) =>
            val arr = old.toArray
            rows.foreach { r =>
              arr(r.getAs[Int]("pos")) =
                (r.getAs[Long]("sv").toDouble / (r.getAs[Long]("n").toDouble * 1e6)).toFloat
            }
            key -> arr.toSeq
          case None => key -> old // empty cell keeps its centroid
        }
      }
      round += 1
    }
    booksDf(spark, books)
  }

  private def booksDf(spark: SparkSession,
      books: Array[((Long, Int), Seq[Float])]): DataFrame = {
    import spark.implicits._
    books.toSeq.map { case ((j, cid), cv) => (j, cid, cv) }.toDF("j", "cid", "cv")
  }

  /** Nearest codebook entry per (vector, subspace): struct-min argmin —
    * map-side partials, never a window over N×8×K candidates (the
    * q_embed_pq shape). Input `sub`: (_id, j, sv). Output:
    * (_id, j, cid, sv, aerr) — `aerr` is the chosen entry's UNROUNDED L2
    * (the per-subspace reconstruction error), carried out of the argmin the
    * pass already computed so the drift metric never re-runs it. The
    * rounded d6 leads the min struct for the deterministic (d6, cid)
    * tie-break; for a fixed (j, cid) candidate the trailing fields are
    * functionally determined, so including them cannot change the argmin. */
  private def assign(sub: DataFrame, codebooks: DataFrame): DataFrame =
    sub.join(broadcast(codebooks.withColumn("cvd",
        transform(col("cv"), x => x.cast("double")))), Seq("j"))
      .withColumn("_d", l2(col("sv"), col("cvd")))
      .groupBy("_id", "j")
      .agg(min(struct(round(col("_d"), 6).as("d6"), col("cid").as("cid"),
        col("_d").as("d"))).as("best"),
        first(col("sv")).as("sv"))
      .select(col("_id"), col("j"), col("best.cid").as("cid"), col("sv"),
        col("best.d").as("aerr"))

  /** Encode every embedded document as its 8 codebook codes, packed in
    * subspace order: (doc_id, codes: array<int>, err_sum). `err_sum` is the
    * summed per-subspace reconstruction error of the doc — a byproduct of
    * the encode argmin, persisted with the codes so the pq_drift
    * measurement is a column scan over the written codes
    * ([[meanCodesError]]), not a second corpus-wide encode pass. */
  def encode(docs: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame): DataFrame = {
    val sub = docs
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).as("_did"), col(vecCol).as("_v"))
      .transform(d => subspaces(d, "_did", "_v"))
    assign(sub, codebooks)
      .groupBy(col("_id").as("doc_id"))
      .agg(transform(array_sort(collect_list(struct(col("j"), col("cid")))),
        x => x.getField("cid")).as("codes"),
        sum(col("aerr")).as("err_sum"))
  }

  /** Mean per-(vector, subspace) reconstruction error read from the
    * `err_sum` column the codes dataset carries — sum of per-doc error sums
    * over the total subspace count, identical by algebra to
    * [[meanAssignError]]'s avg over assignment rows, at the cost of a
    * two-column scan of the (already tiny) codes parquet. `None` for codes
    * written before the column existed (callers fall back to the
    * recomputing [[meanAssignError]]). */
  def meanCodesError(codes: DataFrame): Option[Double] =
    if (!codes.columns.contains("err_sum")) None
    else Some(codes.agg(sum(col("err_sum")) / sum(size(col("codes"))))
      .head().getDouble(0))

  /** Mean assignment (reconstruction) error of the corpus under the given
    * codebooks: avg over (vector, subspace) of the L2 from the subvector to
    * its nearest codebook entry — the scalar the pq_drift staleness
    * contract tracks. One subspace explode + broadcast-argmin + avg (the
    * same pass shape encode() runs). This is the RECOMPUTING form, kept as
    * the fallback for codes written before `err_sum` existed and as the
    * spec's independent oracle for [[meanCodesError]]. */
  def meanAssignError(docs: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame): Double = {
    val sub = docs
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).as("_did"), col(vecCol).as("_v"))
      .transform(d => subspaces(d, "_did", "_v"))
    assign(sub, codebooks)
      .join(broadcast(codebooks.withColumn("cvd",
        transform(col("cv"), x => x.cast("double")))), Seq("j", "cid"))
      .agg(avg(l2(col("sv"), col("cvd"))))
      .head().getDouble(0)
  }

  /** Fit + encode + persist. When the artifact also has an IVF sidecar
    * (`clusterOf` = its (cluster, doc_id) assignment), the codes dataset is
    * written PARTITIONED BY the IVF cluster — the composed `--ann
    * ivf:np+pq:sl` path then partition-prunes the code files by probe
    * before a single lookup happens: the full 100 TB serving shape (prune
    * by IVF → rank by codes → exact-verify the shortlist). */
  def buildAndWrite(docs: DataFrame, idCol: String, vecCol: String,
      dir: String, k: Int = 16, iters: Int = 3,
      clusterOf: Option[DataFrame] = None): PqIndex = {
    val spark = docs.sparkSession
    val books = fit(docs, idCol, vecCol, k, iters).coalesce(1).localCheckpoint(true)
    books.write.mode("overwrite").parquet(s"$dir/$CodebooksDir")
    val codes = encode(docs, idCol, vecCol, books)
    clusterOf match {
      case Some(assign) =>
        AnnIndex.writeClusterPartitioned(
          codes.join(assign.select(col("cluster"), col("doc_id")), Seq("doc_id")),
          s"$dir/$CodesDir")
      case None =>
        codes.write.mode("overwrite").parquet(s"$dir/$CodesDir")
    }
    load(spark, dir).getOrElse(sys.error(s"PqIndex write to $dir not readable back"))
  }

  def load(spark: SparkSession, dir: String): Option[PqIndex] = {
    val fs = new org.apache.hadoop.fs.Path(dir, CodebooksDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def has(d: String) = fs.exists(new org.apache.hadoop.fs.Path(dir, d))
    // both or nothing — a crash between the codebooks and codes writes must
    // degrade to None, not fail every IndexData.load (see AnnIndex.load)
    if (!has(CodebooksDir) || !has(CodesDir)) {
      if (has(CodebooksDir) != has(CodesDir))
        System.err.println(s"[graft] warning: torn PQ sidecar at $dir " +
          "(one of codebooks/codes missing — crashed fit?); ignoring it. " +
          "Re-run with --pq-codes to rebuild.")
      None
    } else Some(PqIndex(
      codebooks = spark.read.parquet(s"$dir/$CodebooksDir"),
      codes = spark.read.parquet(s"$dir/$CodesDir")))
  }
}
