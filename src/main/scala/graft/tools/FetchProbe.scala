package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serving candidate-fetch ROWS-READ decades (round-13 finding #1): the
  * serve-path fetch is a pushed `doc_id IN (…)` scan of the documents table
  * ([[graft.search.ServeSearch]] job 3, and the PQ tail's exact rerank).
  * doc_ids are content-addressed — uniform-random — so before round 14 the
  * documents files carried full-range min/max stats in every file and the
  * fetch read the WHOLE corpus per request; at the 100 TB posture (where
  * the corpus is far too big to cache, so the fetch is a parquet scan) that
  * was the one remaining per-request full scan. [[graft.index.IndexData
  * .write]] now range-clusters + sorts documents by doc_id; this probe pins
  * the effect the way SessionConfSpec does — task input-metrics records
  * read — at whatever corpus SPARK_GRAFT_SF_DIR points at, for the
  * round-14 layout vs an unclustered control of the SAME table, across
  * request candidate-set widths (k·legs ≈ 5–40 typical; 500 a fat batch).
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1g SPARK_DRIVER_MEM=64g \
  *     sbt "runMain graft.tools.FetchProbe"
  */
object FetchProbe {

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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // artifact build with the production write path (doc_id-clustered) —
    // not part of any measured span
    val dir = java.nio.file.Files.createTempDirectory("graft-fetch").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val built = graft.index.IndexJob.fromTable(docs, "doc_id", "text",
      df => split(df("text"), " "))
    graft.index.IndexData.write(built.documents, built.settings, dir)
    val clustered = spark.read.parquet(s"$dir/documents")
    // unclustered control: the pre-round-14 layout of the same rows
    clustered.repartition(spark.sparkContext.defaultParallelism, col("content"))
      .write.mode("overwrite").parquet(s"$dir/documents_unclustered")
    val unclustered = spark.read.parquet(s"$dir/documents_unclustered")
    val nDocs = clustered.count()
    def files(d: DataFrame): Long =
      d.select(input_file_name()).distinct().count()
    println(s"[fetch] corpus=$sfDir docs=$nDocs files(clustered)=${files(clustered)} " +
      s"files(unclustered)=${files(unclustered)} artifact=$dir")

    // deterministic pseudo-random candidate ids, spread over the id space
    // like a real request's (uniform content-addressed ids)
    val allIds = clustered.select("doc_id")
      .orderBy(xxhash64(col("doc_id"))).limit(500)
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSeq

    def measured(d: DataFrame, ids: Seq[String]): (Long, Double) = {
      val ((n, ms), read) = graft.util.InputMetrics.rowsRead(spark) {
        val t0 = System.nanoTime()
        val n = d.filter(col("doc_id").isin(ids: _*))
          .select("doc_id", "file_path", "header_path", "line_start",
            "line_end", "content", "tokens")
          .collect().length
        (n, (System.nanoTime() - t0) / 1e6)
      }
      require(n == ids.size, s"fetch returned $n of ${ids.size}")
      (read, ms)
    }

    Seq(5, 40, 500).foreach { k =>
      val ids = allIds.take(k)
      Seq("clustered" -> clustered, "unclustered" -> unclustered).foreach {
        case (name, d) =>
          measured(d, ids) // warmup (JIT, footer cache)
          val runs = (1 to 3).map(_ => measured(d, ids))
          val rows = runs.map(_._1).sorted.apply(1)
          val ms = runs.map(_._2).sorted.apply(1)
          println(f"[fetch] layout=$name%-11s k=$k%4d rowsRead=$rows%9d " +
            f"(${100.0 * rows / nDocs}%6.2f%% of corpus) p50=$ms%7.1fms")
      }
    }

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
