package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does the ~300 ms fixed per-request serving latency actually go?
  * (round-11 verdict directive 2 — measure before attempting plan reuse.)
  *
  * Replicates the bench serving lane's warm-cached-artifact setup, then
  * breaks ONE request into its phases:
  *
  *   - build: `HybridSearch.search(...)` DataFrame construction — includes
  *     the EAGER `localCheckpoint(true)` of the ≤2k-row candidate frame
  *     (a full Spark job: both legs + fusion + fetch run here);
  *   - plan:  forcing `queryExecution.executedPlan` of the returned frame
  *     (Catalyst analysis/optimization/physical planning of the tail);
  *   - exec:  `collect()` of the final ≤k rows;
  *
  * and counts the Spark JOBS each phase schedules (a SparkListener) — the
  * per-job scheduling latency at local[32] is the suspected floor.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ServeProbe"
  */
object ServeProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", graft.Cli.ServingInFilterThreshold)
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftStrategies.install(spark)
    import spark.implicits._

    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobLog = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet()
        jobLog.add(js.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | "))
      }
    })

    val dir = java.nio.file.Files.createTempDirectory("graft-serveprobe").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embAll = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val emb = embAll.select(col("vec_id").cast("string").as("doc_id"), col("embedding"))
    val built = graft.index.IndexJob.fromTable(docs, "doc_id", "text",
      df => split(df("text"), " "), embeddings = Some(emb))
    graft.index.IndexData.write(built.documents, built.settings, dir)
    graft.index.IndexJob.withAnn(graft.index.IndexData.load(spark, dir),
      dir, annClusters = 16, annIters = 3)
    // GRAFT_SERVE_PROBE_DISK=1: the above-cache-budget serving posture
    // (Cli.serveReady past spark.graft.serve.cacheMaxBytes) — NO corpus-
    // sized caches, no impact-scored frame; every request leg is a pruned
    // parquet scan (term-clustered postings/termdf, doc_id-clustered
    // documents, dl denormalized so the FTS leg joins nothing corpus-sized)
    val diskBacked = sys.env.get("GRAFT_SERVE_PROBE_DISK").contains("1")
    val idx =
      if (diskBacked) graft.index.IndexData.load(spark, dir)
      else {
        val i = graft.index.IndexData.load(spark, dir).cached()
        i.stats.count(); i.documents.count(); i.postings.count()
        i.termdf.count(); i.doclen.count()
        i.ann.foreach { a => a.centroids.count(); a.postings.count() }
        graft.search.ServeSearch.scoredPostings(i) // warm serving posture
        i
      }
    if (diskBacked) println("[probe] DISK-BACKED serving posture (no corpus-sized caches)")

    val qvecs = embAll.orderBy(col("vec_id")).limit(10)
      .select(col("embedding")).as[Array[Float]].collect()
    val texts = Seq("spark join merge", "window batch stream", "customer order value",
      "shuffle partition skew", "parquet scan filter", "broadcast hash join",
      "cosine vector search", "markdown header chunk", "token quality score",
      "stream watermark state")
    val lookup = new graft.embed.LookupEmbedder(texts.zip(qvecs).toMap)

    def phase[T](f: => T): (T, Double, Int) = {
      val j0 = jobCount.get()
      val t0 = System.nanoTime()
      val r = f
      ((r, (System.nanoTime() - t0) / 1e6, jobCount.get() - j0))
    }

    def one(q: String, label: String): Unit = {
      val (df, tBuild, jBuild) = phase {
        graft.search.HybridSearch.search(idx, q,
          analyzer = graft.analyze.WhitespaceAnalyzer,
          embedder = Some(lookup),
          reranker = Some(new graft.rerank.TokenOverlapReranker()),
          opts = graft.search.HybridSearch.Options(k = 5))
      }
      val (_, tPlan, jPlan) = phase { df.queryExecution.executedPlan }
      val (rows, tExec, jExec) = phase { df.collect() }
      println(f"[probe] $label%-8s total=${tBuild + tPlan + tExec}%7.1fms  " +
        f"build=$tBuild%7.1fms/$jBuild%d jobs  plan=$tPlan%6.1fms/$jPlan%d  " +
        f"exec=$tExec%6.1fms/$jExec%d  rows=${rows.length}%d")
    }

    // warmup (codegen/JIT), then measured
    texts.take(3).foreach(one(_, "warmup"))
    println("[probe] --- measured (HybridSearch DAG path) ---")
    texts.foreach(one(_, "req"))

    def oneServe(q: String, label: String): Unit = {
      val (rows, t, j) = phase {
        graft.search.ServeSearch.search(idx, q,
          analyzer = graft.analyze.WhitespaceAnalyzer,
          embedder = Some(lookup),
          reranker = Some(new graft.rerank.TokenOverlapReranker()),
          opts = graft.search.HybridSearch.Options(k = 5)).collect()
      }
      println(f"[probe] $label%-8s total=$t%7.1fms/$j%d jobs  rows=${rows.length}%d")
    }
    texts.take(3).foreach(oneServe(_, "s-warm"))
    println("[probe] --- measured (ServeSearch path) ---")
    texts.foreach(oneServe(_, "serve"))

    // dissect the serve-path FTS leg exactly as ServeSearch builds it
    {
      import graft.search.{Bm25, ServeSearch}
      val terms = Seq("spark", "join", "merge")
      (1 to 3).foreach { i =>
        jobLog.clear()
        val (leg, tBuild, jBuild) = phase {
          Bm25.topK(Bm25.scores(terms, idx.postings,
            ServeSearch.localTermdf(idx.termdf, terms),
            ServeSearch.localIfBroadcastable(idx.doclen),
            ServeSearch.localStats(idx.stats)), 5)
            .select(col("doc_id"), col("score"))
        }
        val (_, tPlan, jPlan) = phase { leg.queryExecution.executedPlan }
        val (r, tRun, jRun) = phase { leg.collect() }
        println(f"[probe] fts-leg #$i: build=$tBuild%6.1fms/$jBuild%d  " +
          f"plan=$tPlan%6.1fms/$jPlan%d  run=$tRun%6.1fms/$jRun%d  rows=${r.length}%d")
        import scala.jdk.CollectionConverters._
        jobLog.asScala.foreach(j => println(s"[probe]   job: $j"))
        if (i == 1) println(leg.queryExecution.executedPlan.toString.take(2200))
      }
    }

    // raw job-scheduling floor: an empty 32-partition job, and a 1-partition job
    (1 to 3).foreach { i =>
      val (_, tJob32, _) = phase { spark.sparkContext.parallelize(1 to 32, 32).count() }
      val (_, tJob1, _) = phase { spark.sparkContext.parallelize(Seq(1), 1).count() }
      println(f"[probe] empty-job floor #$i: 32-part=$tJob32%6.1fms  1-part=$tJob1%6.1fms")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
