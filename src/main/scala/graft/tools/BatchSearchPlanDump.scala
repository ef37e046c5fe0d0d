package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-22 plan evidence for the BatchSearch term pushdown (round-21
  * verdict item #4): builds a real DISK index artifact (the `graft index`
  * layout), plans one composed batch over it, and writes the formatted
  * plan to `plans/<tag>/q_batch_search_artifact_<suffix>.txt`. The claim
  * the dump must show: the bounded query-term set reaches the postings
  * parquet scan as `PushedFilters: [In(term, …)]` — row-group pruning on
  * the term-clustered artifact — rather than only as a broadcast-join
  * probe above a full scan. Session posture matches serving
  * (ServingInFilterThreshold) so the dumped plan is the shape the serve
  * path runs.
  *
  * Usage: runMain graft.tools.BatchSearchPlanDump <tag> <suffix>
  */
object BatchSearchPlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.pushdown.inFilterThreshold",
        graft.Cli.ServingInFilterThreshold)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftStrategies.install(spark)
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("string").as("doc_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("bsplan").toString + "/idx"
    val built = graft.index.IndexJob.fromTable(docs, "doc_id", "text",
      df => split(df("text"), " "), embeddings = Some(emb))
    graft.index.IndexData.write(built.documents, built.settings, dir)
    val index = graft.index.IndexData.load(spark, dir)

    val texts = docs.orderBy("doc_id").limit(10)
      .select(col("text")).as[String].collect()
      .map(_.split(" ").filter(_.nonEmpty).take(2).mkString(" "))
    val qvecs = emb.orderBy(col("doc_id")).limit(10)
      .select(col("embedding")).as[Array[Float]].collect()
    val queries = texts.zipWithIndex.map { case (t, i) => (s"q$i", t) }.toSeq
    val lookup = new graft.embed.LookupEmbedder(texts.zip(qvecs).toMap)

    val df = graft.search.BatchSearch.searchBatch(index, queries,
      analyzer = graft.analyze.WhitespaceAnalyzer,
      embedder = Some(lookup),
      opts = graft.search.BatchSearch.Options(k = 5))
    val out = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val p = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.writeString(
      p.resolve(s"q_batch_search_artifact_$suffix.txt"), out)
    println(s"[bsplan] wrote plans/$tag/q_batch_search_artifact_$suffix.txt " +
      s"(${out.length} chars)")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir).getParentFile)
    spark.stop()
  }
}
