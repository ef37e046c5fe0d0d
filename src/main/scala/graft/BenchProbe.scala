package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler: run selected queries N times each to separate one-time
  * costs (codegen compile, JIT) from steady-state runtime.
  *
  * `runMain graft.BenchProbe serve` instead probes the ONLINE serve path:
  * it builds an index artifact from the SF documents+embeddings tables
  * (IVF sidecar included), caches it the way `graft serve` does, then
  * measures per-query latency of the full hybrid SEARCH (collect included)
  * in exact and `--ann` modes, reporting P50/P95 — the numbers PLANS.md
  * quotes for the cached MCP path. */
object BenchProbe {

  def main(args: Array[String]): Unit =
    if (args.headOption.contains("serve")) serveProbe() else queryProbe(args)

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def queryProbe(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_agg_pricing_summary", "q_o1_topk_desc", "q_o2_topk_asc", "q_v1_cosine_dist")
    for (name <- names; i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[probe] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }

  private def pct(sorted: Seq[Double], p: Double): Double =
    sorted((p * (sorted.length - 1)).round.toInt)

  private def serveProbe(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session()
    // match `graft serve`: AQE off for the ≤2k-row cached online plans
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-serve-probe").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("string").as("doc_id"), col("embedding"))
    val built = graft.index.IndexJob.fromTable(docs, "doc_id", "text",
      df => split(df("text"), " "), embeddings = Some(emb))
    graft.index.IndexData.write(built.documents, built.settings, dir)
    graft.index.IndexJob.withPq(
      graft.index.IndexJob.withAnn(graft.index.IndexData.load(spark, dir), dir,
        annClusters = 16, annIters = 3),
      dir, pqCodes = 16, pqIters = 3)

    // cache exactly the way `graft serve` does
    val index = graft.index.IndexData.load(spark, dir).cached()
    index.stats.count(); index.documents.count(); index.postings.count()
    index.termdf.count(); index.doclen.count()
    index.ann.foreach { a => a.centroids.count(); a.postings.count() }
    index.pq.foreach { p => p.codebookArray; p.codes.count() }

    // 10 query texts with real embedding-table vectors attached
    val qvecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 10)
      .select(col("vec_id").cast("string"), col("embedding"))
      .as[(String, Array[Float])].collect().toMap
    val texts = Seq("spark join merge", "window batch stream", "customer order value",
      "shuffle partition skew", "parquet scan filter", "broadcast hash join",
      "cosine vector search", "markdown header chunk", "token quality score",
      "stream watermark state")
    val lookup = new graft.embed.LookupEmbedder(
      texts.zipWithIndex.map { case (t, i) => t -> qvecs(i.toString) }.toMap)

    def runOnce(q: String, nprobe: Int, shortlist: Int): Double = {
      val t0 = System.nanoTime()
      graft.search.HybridSearch.search(index, q,
        analyzer = graft.analyze.WhitespaceAnalyzer,
        embedder = Some(lookup),
        reranker = Some(new graft.rerank.TokenOverlapReranker()),
        opts = graft.search.HybridSearch.Options(k = 5,
          annNprobe = nprobe, annPqShortlist = shortlist)).collect()
      (System.nanoTime() - t0) / 1e6 // ms
    }

    for (((nprobe, shortlist), mode) <- Seq(
        (0, 0) -> "exact", (2, 0) -> "ivf:2",
        (0, 50) -> "pq:50", (2, 50) -> "ivf:2+pq:50")) {
      texts.take(3).foreach(runOnce(_, nprobe, shortlist)) // codegen/JIT warmup
      val lats = (1 to 2).flatMap(_ => texts.map(runOnce(_, nprobe, shortlist))).sorted
      println(f"[serve-probe] sf=$sfDir mode=$mode n=${lats.length} " +
        f"p50=${pct(lats, 0.50)}%.0fms p95=${pct(lats, 0.95)}%.0fms " +
        f"min=${lats.head}%.0fms max=${lats.last}%.0fms")
    }
    spark.stop()
  }
}
