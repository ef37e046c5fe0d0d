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
}
