package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 directive #2 probe: adjudicate the disk-backed `ivf_auto`
  * cold-read spread (driver-run p50 992 ms vs builder pin 278 ms, ~7×
  * SLOWER than `disk_exact` in the same run — inverting the pruning win).
  *
  * Hypothesis: READ AMPLIFICATION from the `ann_postings` file layout —
  * `buildPostings(...).write.partitionBy("cluster")` writes one file per
  * (shuffle partition × cluster), so a 16-cluster artifact built at
  * local[32] carries up to ~512 tiny list files; an nprobe-wide probe on a
  * cold directory then pays a parquet footer round-trip per file, which
  * dominates the request when nothing is cached. The probe measures the
  * deterministic quantities (files per cluster dir, rows read per request)
  * alongside p50s on a COPIED artifact dir (the honest disk posture — same
  * as the bench lane).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 java … graft.tools.DiskAnnProbe
  */
object DiskAnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.parquet.pushdown.inFilterThreshold",
        graft.Cli.ServingInFilterThreshold)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftStrategies.install(spark)
    import spark.implicits._

    // same uniform-corpus artifact as the bench serving lane
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embAll = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val emb = embAll.select(col("vec_id").cast("string").as("doc_id"), col("embedding"))
    val d = java.nio.file.Files.createTempDirectory("diskann").toString
    val built = graft.index.IndexJob.fromTable(docs, "doc_id", "text",
      df => split(df("text"), " "), embeddings = Some(emb))
    graft.index.IndexData.write(built.documents, built.settings, d)
    graft.index.IndexJob.withAnn(
      graft.index.IndexData.load(spark, d), d, annClusters = 16, annIters = 3)

    def filesPerCluster(dir: String): Map[String, Int] = {
      val root = new java.io.File(s"$dir/${graft.index.AnnIndex.PostingsDir}")
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("cluster="))
        .map(c => c.getName -> c.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    }
    val fpc = filesPerCluster(d)
    println(s"[diskann] ann_postings files: total=${fpc.values.sum} " +
      s"clusters=${fpc.size} max/cluster=${if (fpc.isEmpty) 0 else fpc.values.max}")

    // honest disk posture: a COPY of the artifact dir (no cache-plan match)
    val diskDir = java.nio.file.Files.createTempDirectory("diskann-copy").toString
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(d), new java.io.File(diskDir))
    val diskIdx = graft.index.IndexData.load(spark, diskDir)
    val (autoNprobe, _) = graft.Cli.resolveAutoNprobe(diskIdx, (graft.Cli.AutoNprobe, 0))

    val texts = (0 until 10).map(i => s"query text number $i")
    val qvecs = embAll.orderBy(col("vec_id")).limit(10)
      .select(col("embedding")).as[Array[Float]].collect()
    val lookup = new graft.embed.LookupEmbedder(texts.zip(qvecs).toMap)
    def run(nprobe: Int)(q: String): Int =
      graft.search.ServeSearch.search(diskIdx, q,
        analyzer = graft.analyze.WhitespaceAnalyzer,
        embedder = Some(lookup),
        reranker = Some(new graft.rerank.TokenOverlapReranker()),
        opts = graft.search.HybridSearch.Options(k = 5, annNprobe = nprobe))
        .collect().length

    def p50(f: String => Int): Double = {
      texts.take(2).foreach(f)
      val lats = (1 to 2).flatMap(_ => texts.map { q =>
        val t0 = System.nanoTime(); f(q); (System.nanoTime() - t0) / 1e6
      }).sorted
      lats(lats.size / 2)
    }
    val exactP50 = p50(run(0))
    val ivfP50 = p50(run(autoNprobe))
    // deterministic rows-read of ONE probed request (post warmup)
    val (_, read) = graft.util.InputMetrics.rowsRead(spark, expectNonZero = true) {
      run(autoNprobe)(texts.head)
    }
    println(f"[diskann] disk_exact p50=$exactP50%.1fms disk_ivf(nprobe=$autoNprobe) " +
      f"p50=$ivfP50%.1fms rows_read/probed_request=$read")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(diskDir))
    spark.stop()
  }
}
