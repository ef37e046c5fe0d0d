package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phrase-search scale audit (round-16): is the positional-postings probe
  * still df-proportional as the corpus grows?
  *
  * Builds the `positions/` layout ([[graft.index.IndexData]] artifact rule:
  * term-range-clustered, term-sorted, explicit partition count) from the SF
  * documents table, then measures the SAME phrase query two ways:
  *   - probe: [[graft.search.PhraseSearch.phraseMatches]] over the persisted
  *     positions — each leg a pruned `term = 'x'` parquet scan;
  *   - control: the q_phrase_match formulation — a full corpus token scan.
  * Rows read off storage + wall are printed for both. The claim to audit
  * across decades: probe reads track the PHRASE TERMS' occurrence counts
  * (a corpus fraction set by df), while the control reads every document
  * row — so the probe/control read ratio stays ≪ 1 and flat.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1g  java … graft.tools.PhraseProbe
  */
object PhraseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
    val nDocs = docs.count()
    val dir = java.nio.file.Files.createTempDirectory("phraseprobe").toString

    // the artifact positions layout, standalone
    graft.search.Bm25.positionalPostings(docs)
      .repartitionByRange(spark.sessionState.conf.numShufflePartitions, col("term"))
      .sortWithinPartitions("term", "doc_id", "pos")
      .write.mode("overwrite").parquet(dir)
    val positions = spark.read.parquet(dir)
    val totalPos = positions.count()

    val phrase = Seq("table", "value")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm the JIT/codegen once each, then measure with rows-read
    graft.search.PhraseSearch.phraseMatches(positions, phrase).collect()
    val ((probeHits, probeSec), probeRead) =
      graft.util.InputMetrics.rowsRead(spark, expectNonZero = true) {
        timed(graft.search.PhraseSearch.phraseMatches(positions, phrase)
          .collect().length)
      }
    def control() = docs.filter(size(col("tokens")) >= 2)
      .select(col("doc_id"),
        size(filter(sequence(lit(1), size(col("tokens")) - 1),
          i => element_at(col("tokens"), i) === phrase.head &&
            element_at(col("tokens"), i + 1) === phrase(1))).as("n"))
      .filter(col("n") > 0)
    control().collect()
    val ((ctrlHits, ctrlSec), ctrlRead) =
      graft.util.InputMetrics.rowsRead(spark, expectNonZero = true) {
        timed(control().collect().length)
      }
    require(probeHits == ctrlHits, s"parity: probe=$probeHits control=$ctrlHits")
    println(f"[phrase] docs=$nDocs%9d positions=$totalPos%11d hits=$probeHits%6d | " +
      f"probe read=$probeRead%10d (${probeRead * 100.0 / totalPos}%5.2f%% of pos) " +
      f"${probeSec}%5.2fs | control read=$ctrlRead%9d doc rows ${ctrlSec}%5.2fs")
    // the SLOPPY (proximity) probe — the `--near` serving restriction's
    // operator over the same persisted layout: same df-proportional claim,
    // the join keys on (doc_id, bucket) with 3-key fanout instead of
    // aligned positions (round-18: the serving mode's scale evidence)
    graft.search.PhraseSearch.sloppyPhraseMatches(positions, phrase, 4).collect()
    val ((nearHits, nearSec), nearRead) =
      graft.util.InputMetrics.rowsRead(spark, expectNonZero = true) {
        timed(graft.search.PhraseSearch.sloppyPhraseMatches(positions, phrase, 4)
          .collect().length)
      }
    println(f"[near]   docs=$nDocs%9d positions=$totalPos%11d hits=$nearHits%6d | " +
      f"probe read=$nearRead%10d (${nearRead * 100.0 / totalPos}%5.2f%% of pos) " +
      f"${nearSec}%5.2fs  (window=4, ordered)")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
