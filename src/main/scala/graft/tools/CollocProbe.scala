package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Collocation-mining scale audit over the PERSISTED positions sidecar
  * (round-17 directive #7): the r17 decade audit ran the oracle-comparable
  * formulation (positions DERIVED from the documents scan); this probe
  * closes the production claim — `graft colloc` mines the `positions/`
  * sidecar of a disk artifact WITHOUT touching documents.
  *
  * Builds a real artifact (IndexData.write → doc_id-clustered documents +
  * term-clustered positions sidecar) from the SF documents table, then
  * times [[graft.search.PhraseSearch.collocations]] over the loaded
  * sidecar with rows-read accounting. The claims to audit across decades:
  *   - wall grows LINEARLY in corpus tokens (the O(Σdl·window) pair
  *     explode is the dominant term; no superlinear component);
  *   - rows read ≈ 3 × |positions| (both pair-join legs + the unigram
  *     count — three scans of the sidecar) and NEVER include the
  *     documents table (reads ≤ 3.2× positions is the documents-untouched
  *     pin: one documents scan would push the ratio past 3.2 at any SF).
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1g sbt "runMain graft.tools.CollocProbe"
  */
object CollocProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val window = 2
    val minCount = 5L

    // a real disk artifact: documents + positions sidecar, the layout
    // `graft index` writes
    val dir = java.nio.file.Files.createTempDirectory("collocprobe").toString + "/idx"
    val built = graft.index.IndexJob.fromTable(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text",
      df => split(df("text"), " "))
    graft.index.IndexData.write(built.documents, built.settings, dir)
    val index = graft.index.IndexData.load(spark, dir)
    val positions = index.positions.getOrElse(sys.error("artifact has no positions/"))
    val nDocs = index.documents.count()
    val totalPos = positions.count()

    def mine(): Long = graft.search.PhraseSearch
      .collocations(positions, window, minCount).count()

    mine() // JIT/codegen warmup
    val t0 = System.nanoTime()
    val (pairs, read) =
      graft.util.InputMetrics.rowsRead(spark, expectNonZero = true)(mine())
    val sec = (System.nanoTime() - t0) / 1e9
    val ratio = read.toDouble / totalPos
    println(f"[colloc] docs=$nDocs%9d positions=$totalPos%11d pairs=$pairs%8d | " +
      f"read=$read%11d (${ratio}%4.2fx positions) ${sec}%6.2fs | " +
      f"documents-untouched=${ratio <= 3.2}%b")
    require(ratio <= 3.2,
      f"reads $ratio%.2fx positions — something beyond the three sidecar " +
        "scans (documents?) was read")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir).getParentFile)
    spark.stop()
  }
}
