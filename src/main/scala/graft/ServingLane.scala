package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The Bench `serving` lane: p50/p95 per-request latency of the full hybrid
  * SEARCH (embed → FTS probe → VSS leg → fusion → fetch → rerank → collect)
  * over a warm cached artifact — the `graft serve` posture, where the
  * reference is an interactive CLI/MCP tool (`src/searcher.py`). The batch
  * lanes measure pipeline throughput; this lane measures the number a user
  * of the reference actually feels per query.
  *
  * Modes: `exact` (heap-scan VSS leg) and `ivf_auto` (`--ann ivf:auto`,
  * nprobe resolved from the artifact's fit-time recall curve exactly as the
  * CLI resolves it). The artifact builds once per bench run from the SF
  * documents+embeddings tables with an IVF sidecar, into a temp dir.
  */
object ServingLane {

  private def pct(sorted: Seq[Double], p: Double): Double =
    sorted((p * (sorted.length - 1)).round.toInt)

  private def ms1(v: Double): String =
    "%.1f".formatLocal(java.util.Locale.ROOT, v)

  /** Returns the lane's JSON object (latencies in ms). Throws on failure —
    * the caller degrades to `"serving": null`. */
  def run(spark: SparkSession, sfDir: String): String = {
    import spark.implicits._
    // match `graft serve`: AQE off for the ≤2k-row cached online plans
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // dir creation INSIDE the try: if tmp allocation throws, the finally
    // must still restore AQE for the rest of the bench process
    var dir: Option[java.nio.file.Path] = None
    var index: Option[graft.index.IndexData] = None
    try {
      dir = Some(java.nio.file.Files.createTempDirectory("graft-bench-serving"))
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val embAll = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val emb = embAll.select(col("vec_id").cast("string").as("doc_id"), col("embedding"))
      val built = graft.index.IndexJob.fromTable(docs, "doc_id", "text",
        df => split(df("text"), " "), embeddings = Some(emb))
      val d = dir.get.toString
      graft.index.IndexData.write(built.documents, built.settings, d)
      graft.index.IndexJob.withAnn(graft.index.IndexData.load(spark, d),
        d, annClusters = 16, annIters = 3)

      // cache exactly the way `graft serve` does
      val idx = graft.index.IndexData.load(spark, d).cached()
      index = Some(idx)
      idx.stats.count(); idx.documents.count(); idx.postings.count()
      idx.termdf.count(); idx.doclen.count()
      idx.ann.foreach { a => a.centroids.count(); a.postings.count() }

      // 10 query texts with real embedding-table vectors attached, so both
      // legs do real work (the FTS terms hit the corpus vocabulary; the
      // vectors are in-distribution); reuse the one embeddings scan
      val qvecs = embAll
        .filter(col("vec_id") < 10)
        .select(col("vec_id").cast("string"), col("embedding"))
        .as[(String, Array[Float])].collect().toMap
      val texts = Seq("spark join merge", "window batch stream", "customer order value",
        "shuffle partition skew", "parquet scan filter", "broadcast hash join",
        "cosine vector search", "markdown header chunk", "token quality score",
        "stream watermark state")
      val lookup = new graft.embed.LookupEmbedder(
        texts.zipWithIndex.map { case (t, i) => t -> qvecs(i.toString) }.toMap)

      def runOnce(q: String, nprobe: Int): Double = {
        val t0 = System.nanoTime()
        graft.search.HybridSearch.search(idx, q,
          analyzer = graft.analyze.WhitespaceAnalyzer,
          embedder = Some(lookup),
          reranker = Some(new graft.rerank.TokenOverlapReranker()),
          opts = graft.search.HybridSearch.Options(k = 5,
            annNprobe = nprobe)).collect()
        (System.nanoTime() - t0) / 1e6
      }

      // `--ann ivf:auto`, resolved the way the CLI resolves it: smallest
      // nprobe meeting the fit-time recall curve's 0.9 target
      val (autoNprobe, _) = Cli.resolveAutoNprobe(idx, (Cli.AutoNprobe, 0))

      def mode(name: String, nprobe: Int): String = {
        texts.take(3).foreach(runOnce(_, nprobe)) // codegen/JIT warmup
        val lats = (1 to 2).flatMap(_ => texts.map(runOnce(_, nprobe))).sorted
        val extra = if (nprobe > 0) s""""nprobe":$nprobe,""" else ""
        s""""$name":{$extra"p50":${ms1(pct(lats, 0.50))},"p95":${ms1(pct(lats, 0.95))}}"""
      }
      val exact = mode("exact", 0)
      val auto = mode("ivf_auto", autoNprobe)
      s"""{"unit":"ms","n":20,$exact,$auto}"""
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      // unpin the cached artifact (every dataset cached() pinned) and drop
      // the temp index dir — a bench run must not leave the SF index in
      // executor storage memory or a parquet copy on disk
      index.foreach { i =>
        Seq(i.documents, i.postings, i.termdf, i.doclen, i.stats, i.settings)
          .foreach(_.unpersist(false))
        i.ann.foreach { a => a.centroids.unpersist(false); a.postings.unpersist(false) }
        i.pq.foreach { p => p.codes.unpersist(false); p.codebooks.unpersist(false) }
      }
      dir.foreach(dd => org.apache.commons.io.FileUtils.deleteQuietly(dd.toFile))
    }
  }
}
