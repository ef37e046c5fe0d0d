package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FTS-leg scale audit: is the BM25 probe still corpus-proportional?
  *
  * Builds a REAL on-disk artifact from the SF documents table (the layout
  * [[graft.index.IndexData.save]] writes: term-clustered, term-sorted
  * postings), then times the serving-path probe
  * ([[graft.search.Bm25.scores]] + topK, uncached — the disk path is what
  * the pruning claim is about) against an UNPRUNED control that joins the
  * full postings scan the way the pre-round-11 code did. Run at two SF
  * dirs and compare growth: the pruned probe should stay ~flat while the
  * control grows with the corpus.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.FtsProbe"
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1g           sbt "runMain graft.tools.FtsProbe"
  */
object FtsProbe {

  /** The pre-pruning formulation (broadcast join, no pushable predicate) —
    * kept here as the audit's control. */
  private def unprunedScores(
      terms: Seq[String], postings: DataFrame, termdf: DataFrame,
      doclen: DataFrame, stats: DataFrame): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val q = terms.distinct.toDF("term")
    // the control models the legacy three-table formulation: dl comes from
    // the doclen join, so drop the denormalized column modern artifacts
    // carry (it would be ambiguous after the join)
    postings.drop("dl")
      .join(broadcast(q), "term")
      .join(broadcast(termdf.join(broadcast(q), "term")), "term")
      .join(doclen, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(sum(graft.search.Bm25.termScore(
        $"tf", $"df", $"dl", $"n_docs", $"avgdl")).as("score"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // serving posture by default (pushed In survives >10 terms); set
    // SPARK_GRAFT_FTS_THRESHOLD=10 for a control run at the Spark default,
    // where the WIDE query's In degrades to a range predicate and the
    // pruned/unpruned gap collapses (SessionConfSpec pins the same cliff
    // by rows-read at unit scale)
    val inThreshold = sys.env.getOrElse("SPARK_GRAFT_FTS_THRESHOLD",
      graft.Cli.ServingInFilterThreshold)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", inThreshold)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft-fts-probe").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val built = graft.index.IndexJob.fromTable(docs, "doc_id", "text",
      df => split(df("text"), " "))
    graft.index.IndexData.write(built.documents, built.settings, dir)
    val index = graft.index.IndexData.load(spark, dir) // UNCACHED: disk probe
    val nPostings = index.postings.count()

    val querySets = Seq(
      Seq("spark", "join", "merge"),
      Seq("window", "batch", "stream"),
      Seq("customer", "order", "value"),
      Seq("parquet", "scan", "filter"))
    // natural-language query WIDTH: 12 distinct terms — past Spark's
    // default In-pushdown threshold of 10, so this set only keeps its
    // index-probe shape under the raised serving threshold (the audit the
    // q_f4_bm25_longquery comment cites)
    val wideSets = Seq(
      Seq("spark", "join", "merge", "window", "batch", "stream",
        "customer", "order", "value", "scan", "filter", "hash"),
      Seq("parquet", "shuffle", "partition", "broadcast", "cosine", "vector",
        "search", "token", "quality", "score", "stream", "state"))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def probe(pruned: Boolean, sets: Seq[Seq[String]]): Double = {
      val runs = (1 to 2).map { _ =>
        time(sets.foreach { ts =>
          val scored =
            if (pruned) graft.search.Bm25.scores(
              ts, index.postings, index.termdf, index.doclen, index.stats)
            else unprunedScores(
              ts, index.postings, index.termdf, index.doclen, index.stats)
          graft.search.Bm25.topK(scored, 10).collect()
        })
      }
      runs.min / sets.size
    }
    probe(pruned = true, querySets); probe(pruned = false, querySets) // warmup
    probe(pruned = true, wideSets); probe(pruned = false, wideSets)

    def j(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"sf":"$sfDir","postings_rows":$nPostings,""" +
      s""""in_threshold":$inThreshold,""" +
      s""""pruned_sec_per_query":${j(probe(pruned = true, querySets))},""" +
      s""""unpruned_sec_per_query":${j(probe(pruned = false, querySets))},""" +
      s""""wide12_pruned_sec_per_query":${j(probe(pruned = true, wideSets))},""" +
      s""""wide12_unpruned_sec_per_query":${j(probe(pruned = false, wideSets))}}""")
    spark.stop()
  }
}
