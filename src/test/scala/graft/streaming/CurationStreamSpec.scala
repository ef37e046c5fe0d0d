package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Stateless curation transforms are streaming-safe by construction — a
  * pure projection has no window/sort/aggregate, so the SAME function runs
  * under `readStream` unchanged. This spec pins that contract for the
  * quality gate: the streamed verdicts must equal the batch query's rows
  * exactly. */
class CurationStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def tokenized(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), split(col("text"), " ").as("tokens"))

  private def tokenizedWithText(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("text"), split(col("text"), " ").as("tokens"))

  private def docsStream(dir: String) =
    spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)

  test("streaming quality gate verdicts equal the batch query") {
    val dir = "/root/testdata/sf0.001"
    val stream = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val q = graft.queries.PipelineQueries.qualityGate(tokenized(stream))
      .writeStream.outputMode("append").format("memory").queryName("qgate")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("qgate").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("quality"), r.getAs[Double]("rep_ratio"),
        Option(r.getAs[String]("drop_reason")), r.getAs[Boolean]("keep"))).toSet

    val batch = graft.SparkEntry.queries("q_quality_gate")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("quality"), r.getAs[Double]("rep_ratio"),
        Option(r.getAs[String]("drop_reason")), r.getAs[Boolean]("keep"))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming gopher rules verdicts equal the batch query") {
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.MiningQueries.gopherRules(tokenizedWithText(docsStream(dir)))
      .writeStream.outputMode("append").format("memory").queryName("gopher")
      .start()
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"), r.getAs[Double]("mean_len"),
        r.getAs[Long]("n_stop"), r.getAs[Double]("frac_alpha"), r.getAs[Boolean]("pass"))
    val streamed = spark.table("gopher").collect().map(key).toSet
    val batch = graft.SparkEntry.queries("q_text_gopher_rules")(spark, dir)
      .collect().map(key).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming decontamination screen equals the batch query") {
    val dir = "/root/testdata/sf0.001"
    // benchmark side frozen up front from the batch corpus (docs 0-24 —
    // the q_decontaminate fixture rule); the stream screens the rest
    val (bloom, bench) = graft.ops.Decontam.benchSet(
      tokenized(spark.read.parquet(s"$dir/documents.parquet"))
        .filter(col("doc_id") < 25))
    val q = graft.ops.Decontam.screen(
        tokenized(docsStream(dir)).filter(col("doc_id") >= 25), bloom, bench)
      .writeStream.outputMode("append").format("memory").queryName("decontam")
      .start()
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_contaminated"), r.getAs[Double]("contamination"))
    val streamed = spark.table("decontam").collect().map(key).toSet
    val batch = graft.SparkEntry.queries("q_decontaminate")(spark, dir)
      .collect().map(key).toSet
    assert(streamed == batch && streamed.nonEmpty)
    assert(streamed.exists(_._3 > 0), "fixture should show real contamination")
  }

  test("streaming weighted sampling keeps exactly the batch keep set") {
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.CurationQueries.weightedSample(tokenizedWithText(docsStream(dir)))
      .writeStream.outputMode("append").format("memory").queryName("wsample")
      .start()
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Double]("keep_p"), r.getAs[Double]("u"))
    val streamed = spark.table("wsample").collect().map(key).toSet
    val batch = graft.SparkEntry.queries("q_sample_weighted")(spark, dir)
      .collect().map(key).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }
}
