package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.search.{Bm25, PhraseSearch}

/** Streaming collocation counts ([[CollocStream]]): the array pair
  * formation must agree exactly with the batch positional-join operator,
  * and the streaming aggregation must converge to the batch counts across
  * multiple micro-batches (incremental correctness — not one lucky
  * single-batch pass). */
class CollocStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def tokenized(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), split(col("text"), " ").as("tokens"))

  private def countsOf(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("array pair formation ≡ the positional-join operator (fixture + " +
      "corpus, window 1 and 3)") {
    val fixture = Seq(
      1L -> Seq("a", "b", "a", "b"),
      2L -> Seq("a", "b", "c"),
      3L -> Seq("x"),
      4L -> Seq.empty[String]
    ).toDF("doc_id", "tokens")
    val corpus = tokenized(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    for (df <- Seq(fixture, corpus); w <- Seq(1, 3)) {
      val viaArray = countsOf(CollocStream.pairCounts(df, "tokens", w))
      val viaJoin = countsOf(
        PhraseSearch.collocations(Bm25.positionalPostings(df), w, minCount = 1)
          .select(col("term_a"), col("term_b"), col("n_ab")))
      assert(viaArray == viaJoin,
        s"w=$w: ${viaArray.size} array pairs vs ${viaJoin.size} join pairs")
      assert(viaArray.nonEmpty || df.isEmpty)
    }
  }

  test("streaming pair counts converge to the batch counts across " +
      "multiple micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("colloc-stream").toString
    val batchDocs = tokenized(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    // 4 files streamed one per trigger → 4 micro-batches of real data
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docsSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = CollocStream.pairCounts(tokenized(stream), "tokens", window = 2)
      .writeStream.outputMode("complete").format("memory").queryName("colloc")
      .start()
    q.processAllAvailable()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    assert(batches >= 2, s"wanted a multi-batch run, got $batches data batches")
    val streamed = countsOf(spark.table("colloc"))
    val batch = countsOf(CollocStream.pairCounts(batchDocs, "tokens", window = 2))
    assert(streamed == batch,
      s"${streamed.size} streamed pairs vs ${batch.size} batch pairs")
  }

  test("PMI projection over count snapshots matches the batch operator") {
    val docs = tokenized(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val viaSnapshot = CollocStream.pmiOver(
      CollocStream.pairCounts(docs, "tokens", window = 2),
      CollocStream.termCounts(docs, "tokens"), minCount = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val viaBatch = PhraseSearch.collocations(
        Bm25.positionalPostings(docs), window = 2, minCount = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(viaSnapshot.keySet == viaBatch.keySet)
    viaSnapshot.foreach { case (k, (n, pmi)) =>
      val (bn, bpmi) = viaBatch(k)
      assert(n == bn, k)
      assert(math.abs(pmi - bpmi) < 1e-12, k)
    }
    assert(viaSnapshot.nonEmpty)
  }
}
