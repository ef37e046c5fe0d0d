package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decade grow-audit of the APPEND-MERGE LIVE VIEW (round-12 directive):
  * the segmented union + tombstone masking carries the pushed `In(term, …)`
  * probe through every segment scan (plan-pinned in AppendMergeSpec), but
  * its scale behavior was untested beyond sf0.01 specs. For each corpus
  * (sf0.1 and the 10× grown copy):
  *
  *   1. build the base artifact from 90% of docs (table-derived, stats rows
  *      carry file_path so the O(delta) append path applies);
  *   2. append the remaining docs in TWO segments, the second REPLACING a
  *      slice of the first batch's paths (tombstone + dead-stat subtraction
  *      exercised, not just pure appends);
  *   3. measure p50 per-request FTS search latency over the LIVE view
  *      (2 pending segments), assert result equality against the compacted
  *      artifact, then measure the same requests compacted.
  *
  * The claim under audit: live-view search stays inside the compacted
  * search envelope at every decade (the union adds two O(delta) segment
  * scans and one broadcast mask join, nothing corpus-proportional).
  *
  *   SPARK_GRAFT_STREAM_DIRS=/root/testdata/sf0.1,/tmp/sf1g \
  *     sbt "runMain graft.tools.AppendMergeProbe"
  */
object AppendMergeProbe {

  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_STREAM_DIRS",
      "/root/testdata/sf0.1,/tmp/sf1g").split(",").toSeq.map(_.trim)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false") // serving posture
      .config("spark.sql.parquet.pushdown.inFilterThreshold", graft.Cli.ServingInFilterThreshold)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftStrategies.install(spark)

    val queries = Seq("spark join merge", "customer order value",
      "parquet scan filter", "vector cosine search", "stream watermark state",
      "shuffle partition skew", "broadcast hash join", "token quality score")

    def p50(xs: Seq[Double]): Double = xs.sorted.apply((xs.length - 1) / 2)

    dirs.foreach { dir =>
      val idxDir = java.nio.file.Files.createTempDirectory("appmerge").toString + "/idx"
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val nDocs = docs.count()

      // documents-schema projection (what IndexJob.fromTable produces): the
      // table id doubles as file_path, which is the append path's merge key
      def asDocs(df: DataFrame): DataFrame = df.select(
        col("doc_id").cast("string").as("doc_id"),
        col("doc_id").cast("string").as("file_path"),
        lit("").as("header_path"), lit(1).as("line_start"), lit(1).as("line_end"),
        col("text").as("content"), split(col("text"), " ").as("tokens"))

      val bucket = pmod(xxhash64(col("doc_id")), lit(20))
      val base = asDocs(docs.filter(bucket < 18)) // 90%
      val batch1 = asDocs(docs.filter(bucket === 18)) // 5% pure append
      // 5% append; additionally REPLACE half of batch1's paths with
      // re-tagged content (same file_path, different text → tombstones)
      val replacedSrc = docs.filter(bucket === 18 && pmod(xxhash64(col("doc_id")), lit(2)) === 0)
        .select(col("doc_id"), concat(lit("revised edition "), col("text")).as("text"))
      val batch2 = asDocs(docs.filter(bucket === 19).unionByName(replacedSrc))

      import spark.implicits._
      val settings = Seq.empty[(String, String)].toDF("key", "value")
      def t(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"[appmerge] dir=$dir%-22s $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.1fs")
      }
      t("base_build") {
        graft.index.IndexData.write(base, settings, idxDir)
      }
      t("append_seg1") {
        graft.index.IndexJob.mergeAndWrite(spark, batch1, settings, idxDir,
          clear = false, mergeMode = "append")
      }
      t("append_seg2") {
        graft.index.IndexJob.mergeAndWrite(spark, batch2, settings, idxDir,
          clear = false, mergeMode = "append")
      }

      def searchP50(idx: graft.index.IndexData): (Double, Seq[Seq[String]]) = {
        def run(q: String): Seq[String] = graft.search.HybridSearch
          .search(idx, q, analyzer = graft.analyze.WhitespaceAnalyzer,
            opts = graft.search.HybridSearch.Options(k = 5))
          .select("doc_id").collect().map(_.getString(0)).toSeq
        queries.foreach(run) // warmup
        val timed = (1 to 2).flatMap(_ => queries.map { q =>
          val t0 = System.nanoTime()
          run(q)
          (System.nanoTime() - t0) / 1e6
        })
        (p50(timed), queries.map(run))
      }

      val live = graft.index.IndexData.load(spark, idxDir).cached()
      Seq(live.documents, live.postings, live.termdf, live.doclen, live.stats)
        .foreach(_.count())
      require(live.pendingSegments == 2, s"expected 2 segments, ${live.pendingSegments}")
      val (liveP50, liveResults) = searchP50(live)
      Seq(live.documents, live.postings, live.termdf, live.doclen, live.stats,
        live.settings).foreach(_.unpersist(false))

      t("compact") { graft.index.IndexJob.compact(spark, idxDir) }
      val comp = graft.index.IndexData.load(spark, idxDir).cached()
      Seq(comp.documents, comp.postings, comp.termdf, comp.doclen, comp.stats)
        .foreach(_.count())
      require(comp.pendingSegments == 0, "compaction left segments")
      val (compP50, compResults) = searchP50(comp)
      Seq(comp.documents, comp.postings, comp.termdf, comp.doclen, comp.stats,
        comp.settings).foreach(_.unpersist(false))
      require(liveResults == compResults,
        s"live view != compacted results at $dir")

      println(f"[appmerge] dir=$dir%-22s docs=$nDocs%8d " +
        f"live_p50=$liveP50%7.1fms compacted_p50=$compP50%7.1fms " +
        f"ratio=${liveP50 / compP50}%5.2f results=equal")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(idxDir).getParentFile)
    }
    spark.stop()
  }
}
