package graft.tools

import org.apache.spark.sql.functions._

/** Fat-batch candidate-fetch decade audit (round-15): BatchSearch's rerank
  * stage fetches candidate content via ONE broadcast join — candidates
  * (bounded at |queries| × (2k + shortlist) rows by construction)
  * broadcast, documents STREAMED once for the whole batch (the explicit
  * hint added this round; without it the stat-less checkpointed candidate
  * frame planned a corpus-shuffling sort-merge join past the auto-broadcast
  * threshold). This probe measures the claim at whatever corpus
  * SPARK_GRAFT_SF_DIR points at: rows read off storage and wall time for a
  * 2-query vs a 20-query batch — reads must be FLAT in the query count
  * (~one corpus pass per batch), at any corpus size.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf10g SPARK_DRIVER_MEM=64g \
  *     sbt "runMain graft.tools.BatchFetchProbe"
  */
object BatchFetchProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", graft.Cli.ServingInFilterThreshold)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftStrategies.install(spark)

    val dir = java.nio.file.Files.createTempDirectory("graft-batchfetch").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val built = graft.index.IndexJob.fromTable(docs, "doc_id", "text",
      df => split(df("text"), " "))
    graft.index.IndexData.write(built.documents, built.settings, dir)
    val idx = graft.index.IndexData.load(spark, dir)
    val nDocs = idx.documents.count()
    // one-pass denominator: total rows across every artifact table the
    // pipeline touches (postings dominates — it is the token-exploded
    // corpus) — "1.0 passes" = each table read about once per batch
    val artifactRows = nDocs + idx.postings.count() + idx.termdf.count() +
      idx.doclen.count() + 1
    val vocab = idx.termdf.orderBy(desc("df"), asc("term")).limit(64)
      .select("term").as[String](org.apache.spark.sql.Encoders.STRING).collect()
    val v = vocab.length
    def queries(n: Int) = (0 until n).map(i =>
      s"q$i" -> Seq(vocab(i % v), vocab((i + 7) % v), vocab((i + 13) % v)).mkString(" "))
    val rr = new graft.rerank.TokenOverlapReranker()
    println(s"[batchfetch] corpus=$sfDir docs=$nDocs artifact=$dir")

    Seq(2, 20).foreach { n =>
      def once(): (Int, Long, Double) = {
        val t0 = System.nanoTime()
        val (cnt, read) = graft.util.InputMetrics.rowsRead(spark) {
          graft.search.BatchSearch.searchBatchReranked(idx, queries(n), rr,
            analyzer = graft.analyze.WhitespaceAnalyzer).collect().length
        }
        (cnt, read, (System.nanoTime() - t0) / 1e9)
      }
      once() // warmup (JIT, parquet footers)
      val runs = (1 to 3).map(_ => once())
      val rows = runs.map(_._2).sorted.apply(1)
      val sec = runs.map(_._3).sorted.apply(1)
      println(f"[batchfetch] batch=$n%3d results=${runs.head._1}%5d " +
        f"rowsRead=$rows%12d (${rows.toDouble / artifactRows}%5.2f artifact passes) " +
        f"p50=$sec%6.2fs")
    }

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
