package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decade audit of the ANN serving leg (round-12): at what corpus size does
  * the IVF probe's byte pruning become a LATENCY win on this hardware?
  *
  * For clustered corpora of 100k / 400k / 1.6M vectors (the ServingLane
  * fixture geometry: 16 orthogonal blocks + deterministic noise), measures
  * p50 of the single-request VSS leg:
  *   - exact: heap scan over the CACHED embeddings (best-case exact);
  *   - probed-parquet: `cluster IN (…)` partition-pruned read of the
  *     on-disk inverted lists (the 100 TB posture);
  *   - probed-cached: the same probe over fully-cached lists (batch-stat
  *     pruning inside tasks).
  *
  *   sbt "runMain graft.tools.AnnServeProbe"
  */
object AnnServeProbe {

  private def clusteredEmbedding(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val c = pmod(xxhash64(id), lit(16))
    transform(sequence(lit(0), lit(63)), j =>
      (when(j >= c * 4 && j < c * 4 + 4, lit(1.0)).otherwise(lit(0.0)) +
        (pmod(xxhash64(id, j), lit(2001)) - lit(1000)).cast("double") / lit(10000.0))
        .cast("float"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftStrategies.install(spark)
    import spark.implicits._

    def p50(xs: Seq[Double]): Double = xs.sorted.apply((xs.length - 1) / 2)

    val sizes = sys.env.get("SPARK_GRAFT_ANN_SIZES")
      .map(_.split(",").toSeq.map(_.trim.toLong))
      .getOrElse(Seq(100000L, 400000L, 1600000L, 6400000L))
    sizes.foreach { n =>
      val emb = spark.range(n)
        .select(concat(lit("g"), col("id")).as("doc_id"))
        .select(col("doc_id"), clusteredEmbedding(col("doc_id")).as("embedding"))
        .repartition(32)
        .cache()
      emb.count()
      val dir = java.nio.file.Files.createTempDirectory(s"annprobe$n").toString
      val t0 = System.nanoTime()
      val ann = graft.index.AnnIndex.buildAndWrite(emb, "doc_id", "embedding", dir, 16, 3)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val annCached = ann.copy(postings = ann.postings.cache())
      annCached.postings.count()

      val qvecs = emb.orderBy(col("doc_id")).limit(10)
        .select(col("embedding")).as[Array[Float]].collect()

      def leg(kind: String)(qv: Array[Float]): DataFrame = kind match {
        case "exact" =>
          graft.search.HybridSearch.vssTopK(emb.filter(col("embedding").isNotNull), qv, 5)
        case "probed-parquet" => graft.search.HybridSearch.vssTopKIvf(ann, qv, 5, 1)
        case "probed-cached"  => graft.search.HybridSearch.vssTopKIvf(annCached, qv, 5, 1)
      }
      def measure(kind: String): Double = {
        qvecs.foreach(qv => leg(kind)(qv).collect()) // warmup
        p50((1 to 2).flatMap(_ => qvecs.map { qv =>
          val t = System.nanoTime()
          leg(kind)(qv).collect()
          (System.nanoTime() - t) / 1e6
        }))
      }
      println(f"[annprobe] n=$n%9d  build=${tBuild}%5.1fs  " +
        f"exact=${measure("exact")}%7.1fms  " +
        f"probed-parquet=${measure("probed-parquet")}%7.1fms  " +
        f"probed-cached=${measure("probed-cached")}%7.1fms")
      annCached.postings.unpersist(false)
      emb.unpersist(false)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
    spark.stop()
  }
}
