package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class NearDupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def tokenized(df: org.apache.spark.sql.DataFrame) = df
    .select(col("doc_id"), split(col("text"), " ").as("tokens"))
    .filter(size(col("tokens")) >= 3)

  test("streaming LSH candidates equal the batch band-bucket pairs") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"

    val stream = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val q = NearDupStream.candidates(tokenized(stream), "tokens")
      .writeStream.outputMode("append").format("memory").queryName("neardup")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("neardup").as[NearDupStream.DupCandidate]
      .collect()
      .filter(_.dup_of >= 0) // no saturation expected at this corpus size
      .map(c => (math.min(c.doc_id, c.dup_of), math.max(c.doc_id, c.dup_of)))
      .toSet

    // batch truth: the self-joined band buckets (q_dedup_minhash_pairs's
    // candidate stage) over the same signature expressions
    val banded = NearDupStream.bandedDocs(
      tokenized(spark.read.parquet(s"$dir/documents.parquet")), "tokens")
    val b1 = banded.toDF("band", "bucket", "doc_a")
    val b2 = banded.toDF("band", "bucket", "doc_b")
    val batchPairs = b1.join(b2, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed == batchPairs)
    assert(batchPairs.nonEmpty)
  }

  test("a 1-2-token doc is filtered, not a poison pill: the banding guard " +
      "lives in the operator, not the caller") {
    import spark.implicits._
    // pre-fix, the 2-token doc crashed bandedDocs at runtime
    // (sequence(1, size-2) through 0 → element_at INVALID_INDEX_OF_ZERO)
    // and in a stream the failed micro-batch replayed forever
    val docs = Seq(
      (1L, Seq("just", "two")),
      (2L, Seq("one")),
      (3L, Seq.empty[String]),
      (4L, Seq("enough", "tokens", "to", "shingle")))
      .toDF("doc_id", "tokens")
    val banded = NearDupStream.bandedDocs(docs, "tokens").collect()
    assert(banded.nonEmpty)                      // the long doc bands
    assert(banded.map(_.doc_id).toSet == Set(4L)) // short docs simply don't
  }

  test("production-hash streaming candidates equal the production-hash batch pairs") {
    // the portable=false domain (what a production stream should run,
    // matching graft curate) keeps the same stream ≡ batch contract
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val stream = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val q = NearDupStream.candidates(tokenized(stream), "tokens", portable = false)
      .writeStream.outputMode("append").format("memory").queryName("neardup_prod")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("neardup_prod").as[NearDupStream.DupCandidate]
      .collect().filter(_.dup_of >= 0)
      .map(c => (math.min(c.doc_id, c.dup_of), math.max(c.doc_id, c.dup_of)))
      .toSet
    val banded = NearDupStream.bandedDocs(
      tokenized(spark.read.parquet(s"$dir/documents.parquet")), "tokens",
      portable = false)
    val b1 = banded.toDF("band", "bucket", "doc_a")
    val b2 = banded.toDF("band", "bucket", "doc_b")
    val batchPairs = b1.join(b2, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batchPairs)
    // the production domain is no more crowded than the portable one —
    // computed independently (no dependency on another test's memory sink)
    val portableBanded = NearDupStream.bandedDocs(
      tokenized(spark.read.parquet(s"$dir/documents.parquet")), "tokens")
    val p1 = portableBanded.toDF("band", "bucket", "doc_a")
    val p2 = portableBanded.toDF("band", "bucket", "doc_b")
    val portablePairs = p1.join(p2, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct().count()
    assert(streamed.size <= portablePairs)
  }

  test("bucket saturation freezes membership and emits one sentinel") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("neardup-sat").toString
    val text = "alpha beta gamma delta epsilon"
    (1L to 5L).map(i => (i, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(tmp)

    val stream = spark.readStream.schema(docsSchema).parquet(tmp)
    val q = NearDupStream.candidates(tokenized(stream), "tokens", maxPerBucket = 2)
      .writeStream.outputMode("append").format("memory").queryName("neardup_sat")
      .start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("neardup_sat").as[NearDupStream.DupCandidate].collect()

    // identical docs share both band buckets: per band one pair (2,1) then
    // the cap trips at doc 3 (one sentinel); docs 4-5 are silent
    val pairs = out.filter(_.dup_of >= 0)
    val sentinels = out.filter(_.dup_of == -1L)
    assert(pairs.toSet.map((c: NearDupStream.DupCandidate) => (c.band, c.doc_id, c.dup_of)) ==
      Set((0, 2L, 1L), (1, 2L, 1L)))
    assert(sentinels.map(c => (c.band, c.doc_id)).toSet == Set((0, 3L), (1, 3L)))
  }
}
