package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade audit for the batch-search claim (round-20 directive #4): `graft
  * search --queries FILE` runs the WHOLE query set as one composed job wave
  * — one postings scan + one kNN pass for the set — so rows read off the
  * artifact must grow far slower than the query count (per-query reads
  * AMORTIZE), where N per-request sessions would read the corpus N times.
  * The sf0.1 bench pins the wall-clock amortization; this probe pins the
  * scale-invariant quantity (rows read per query) on the grow corpora:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1g  sbt "runMain graft.tools.BatchSearchProbe"
  *   SPARK_GRAFT_SF_DIR=/tmp/sf10g sbt "runMain graft.tools.BatchSearchProbe"
  *
  * For query counts 10/100/1000 over one disk artifact (documents +
  * postings + embeddings, the `graft index` layout), runs
  * [[graft.search.BatchSearch.searchBatch]] once per count and reads the
  * rows-read/tasks counters. Claims asserted:
  *   - AMORTIZATION: per-query rows read at N=1000 ≤ 25% of per-query rows
  *     at N=10 (a per-request loop would hold this ratio at ~100%);
  *   - COMPOSITION: total rows at N=1000 ≤ 12× N=10's — reads may widen
  *     with the distinct-term count (more pushed-In postings row groups,
  *     more per-query candidate fetches) but never multiply by the query
  *     count (1000/10 = 100× is the per-request shape).
  */
object BatchSearchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.pushdown.inFilterThreshold",
        graft.Cli.ServingInFilterThreshold)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // one disk artifact, the `graft index` layout — NOT cached: the probe
    // measures storage reads, the quantity that survives a 100× scale-up
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("string").as("doc_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("batchprobe").toString + "/idx"
    val built = graft.index.IndexJob.fromTable(docs, "doc_id", "text",
      df => split(df("text"), " "), embeddings = Some(emb))
    graft.index.IndexData.write(built.documents, built.settings, dir)
    val index = graft.index.IndexData.load(spark, dir)
    val nDocs = index.documents.count()

    // deterministic query set: 2-token prefixes of the first maxN docs
    // (vocabulary terms, so the FTS leg does real matching work), query
    // vectors = a deterministic draw of maxN corpus embeddings paired
    // with the texts POSITIONALLY (the probe measures reads, not recall —
    // any in-distribution vector works; no doc↔vector match is claimed)
    val maxN = 1000
    val prefixes = docs.orderBy("doc_id").limit(maxN)
      .select(col("text")).as[String].collect()
      .map(_.split(" ").filter(_.nonEmpty).take(2).mkString(" "))
    require(prefixes.length >= maxN, s"corpus has <$maxN docs")
    val qvecs = emb.orderBy(col("doc_id")).limit(maxN)
      .select(col("embedding")).as[Array[Float]].collect()
    require(qvecs.length >= maxN, s"embeddings table has <$maxN rows")
    // the qid key keeps duplicate prefix TEXTS as distinct queries for the
    // FTS/fusion machinery; the embedder, being keyed by TEXT, maps all
    // duplicates of a prefix to ONE vector (the last positional pairing
    // wins) — intentional here: the probe's claim is rows-read
    // amortization, not per-query recall, and a shared vector only makes
    // the kNN leg's work an underestimate-free upper bound of distinct
    // queries (round-20 ADVICE: stated explicitly instead of implied)
    val queries = prefixes.zipWithIndex.map { case (t, i) => (s"q$i", t) }.toSeq
    val lookup = new graft.embed.LookupEmbedder(
      queries.map(_._2).zip(qvecs).toMap)

    def run(n: Int): (Long, Long, Double) = {
      def once(): Unit = graft.search.BatchSearch.searchBatch(
        index, queries.take(n),
        analyzer = graft.analyze.WhitespaceAnalyzer,
        embedder = Some(lookup),
        opts = graft.search.BatchSearch.Options(k = 5)).collect()
      once() // codegen/JIT warmup (also first-touch parquet footers)
      val t0 = System.nanoTime()
      val (_, rows, tasks) = graft.util.InputMetrics.readProfile(
        spark, expectNonZero = true)(once())
      (rows, tasks, (System.nanoTime() - t0) / 1e9)
    }

    val counts = Seq(10, 100, 1000)
    val measured = counts.map { n =>
      val (rows, tasks, sec) = run(n)
      println(f"[batch] docs=$nDocs%9d queries=$n%5d | rows=$rows%12d " +
        f"(${rows.toDouble / n}%10.1f/query) tasks=$tasks%5d ${sec}%7.2fs " +
        f"(${sec * 1000 / n}%6.1f ms/query)")
      n -> rows
    }.toMap

    val perQ10 = measured(10).toDouble / 10
    val perQ1000 = measured(1000).toDouble / 1000
    println(f"[batch] per-query amortization 10→1000: ${perQ1000 / perQ10}%5.3f " +
      f"(per-request shape would be ~1.0)")
    require(perQ1000 <= 0.25 * perQ10,
      f"per-query rows at N=1000 (${perQ1000}%.1f) > 25%% of N=10's " +
        f"(${perQ10}%.1f) — the composed wave is no longer amortizing")
    require(measured(1000) <= 12 * measured(10),
      s"total rows at N=1000 (${measured(1000)}) > 12× N=10's " +
        s"(${measured(10)}) — reads are multiplying with the query count")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir).getParentFile)
    spark.stop()
  }
}
