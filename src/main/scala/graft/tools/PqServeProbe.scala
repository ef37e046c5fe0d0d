package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does `--ann pq:auto` actually win? (round-19 follow-through on
  * directive #1.) At the bench SF the pq lane reads SLOWER than the exact
  * scan (163 vs 133 ms p50 at 2k embeddings) — at that size the ADC scan
  * + shortlist fetch can't beat a trivial full scan, and the win the
  * sidecar exists for is a BYTES win that only shows at scale. This probe
  * prices the serving modes over a DISK-BACKED artifact (no cache pins —
  * the 100 TB posture where bytes are the request cost) at whatever SF
  * dirs it's given, reporting p50 wall + rows + bytes read per request:
  *
  *   - exact: full embeddings scan per request;
  *   - pq:auto: codes scan (1/32 bytes/row) + resolved-shortlist exact
  *     fetch — bytes should undercut exact as the corpus grows even when
  *     the auto shortlist is large;
  *   - ivf:auto / ivf:auto+pq:auto: partition-pruned variants.
  *
  * Bytes are plan+data functions (pin RATIOS, not absolutes); query texts
  * deliberately tokenize to no corpus term so the BM25 leg stays a cheap
  * pushed-In probe and the mode delta isolates the VSS leg.
  *
  *   sbt "runMain graft.tools.PqServeProbe /tmp/sf1g /tmp/sf10g"
  */
object PqServeProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/sf1g")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.pushdown.inFilterThreshold",
        graft.Cli.ServingInFilterThreshold)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftStrategies.install(spark)
    import spark.implicits._

    dirs.foreach { sfDir =>
      val dir = java.nio.file.Files.createTempDirectory("graft-pqserve").toString
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id").cast("string").as("doc_id"), col("embedding"))
      val built = graft.index.IndexJob.fromTable(docs, "doc_id", "text",
        df => split(df("text"), " "), embeddings = Some(emb))
      graft.index.IndexData.write(built.documents, built.settings, dir)
      val withAnn = graft.index.IndexJob.withAnn(
        graft.index.IndexData.load(spark, dir), dir, annClusters = 16, annIters = 3)
      graft.index.IndexJob.withPq(withAnn, dir, pqCodes = 16)
      // DISK posture: fresh load, footers prewarmed, nothing cached
      val idx = graft.index.IndexData.load(spark, dir)
      graft.index.IndexData.prewarmFooters(spark, dir)
      val nEmb = idx.pq.get.codes.count()

      val qvecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .orderBy(col("vec_id")).limit(10)
        .select(col("embedding")).as[Array[Float]].collect()
      val texts = qvecs.indices.map(i => s"zq$i")
      val lookup = new graft.embed.LookupEmbedder(texts.zip(qvecs).toMap)

      val (nprobe, shortlist) = graft.Cli.resolveAutoAnn(
        idx, (graft.Cli.AutoNprobe, graft.Cli.AutoShortlist))
      val modes = Seq(
        ("exact", 0, 0),
        ("pq_auto", 0, shortlist),
        ("ivf_auto", nprobe, 0),
        ("ivf_pq_auto", nprobe, shortlist))

      modes.foreach { case (name, np, sl) =>
        def run(q: String): Unit = graft.search.ServeSearch.search(idx, q,
          analyzer = graft.analyze.WhitespaceAnalyzer,
          embedder = Some(lookup), reranker = None,
          opts = graft.search.HybridSearch.Options(k = 5,
            annNprobe = np, annPqShortlist = sl)).collect()
        texts.take(3).foreach(run) // codegen/JIT warmup
        val lats = (1 to 2).flatMap(_ => texts.map { q =>
          val t0 = System.nanoTime(); run(q); (System.nanoTime() - t0) / 1e6
        }).sorted
        // read accounting for ONE representative request, outside the
        // latency loop (listener drain must not pollute the walls)
        val (_, rows, _) = graft.util.InputMetrics.readProfile(
          spark, expectNonZero = true)(run(texts.head))
        val (_, bytes) = graft.util.InputMetrics.bytesRead(
          spark, expectNonZero = true)(run(texts.head))
        val p50 = lats((lats.size - 1) / 2)
        println(f"""{"dir":"$sfDir","n_emb":$nEmb,"mode":"$name",""" +
          f""""nprobe":$np,"shortlist":$sl,"p50_ms":$p50%.1f,""" +
          s""""rows":$rows,"bytes":$bytes}""")
      }
    }
    spark.stop()
  }
}
