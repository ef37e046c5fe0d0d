package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot diagnostic for the MinHash-LSH candidate stage: bucket-size
  * distribution, candidate-pair counts, and the equal-prefix share of the
  * Levenshtein verify input — the numbers the scale audit needs to separate
  * "pair set grew" from "kernel got slower".
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1g sbt "runMain graft.tools.DedupDiag"
  */
object DedupDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.queries.Q.docsTokens(spark, sfDir)
    val bands = graft.queries.PipelineQueries.minhashBands(docs)
    println(s"[diag] sf=$sfDir docs=${docs.count()} bandRows=${bands.count()}")
    val sizes = bands.groupBy("band", "bucket").count()
    sizes.groupBy().agg(count(lit(1)).as("n_buckets"), max("count").as("max_sz"),
      expr("percentile_approx(count, 0.5)").as("p50"),
      expr("percentile_approx(count, 0.9)").as("p90"),
      sum(expr("count * (count - 1) / 2")).as("uncapped_pairs")).show(false)
    sizes.orderBy(desc("count")).show(20, false)

    val pairs = graft.queries.PipelineQueries.minhashPairsOf(docs)
    val txt = docs.select(col("doc_id"), substring(col("text"), 1, 200).as("t200"))
    val j = pairs
      .join(txt.select(col("doc_id").as("doc_a"), col("t200").as("ta")), Seq("doc_a"))
      .join(txt.select(col("doc_id").as("doc_b"), col("t200").as("tb")), Seq("doc_b"))
    j.groupBy().agg(count(lit(1)).as("pairs"),
      sum(when(col("ta") === col("tb"), 1L).otherwise(0L)).as("equal_prefix"),
      avg(length(col("ta"))).as("avg_len")).show(false)

    // the PRODUCTION-hash (xxhash64) candidate stage on the same corpus —
    // the saturation comparison the tokHash scaladoc cites — plus the
    // wall-clock of the full verified-pairs stage under each hash
    val prodPairs = graft.queries.PipelineQueries
      .minhashPairsOf(docs, portable = false).count()
    println(s"[diag] prod-hash pairs=$prodPairs (portable above)")
    def time(portable: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.queries.PipelineQueries.minhashVerifiedPairsOf(docs, portable = portable)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[diag] verified-pairs wall-clock: portable=${time(true)}%.1fs " +
      f"prod=${time(false)}%.1fs")
    spark.stop()
  }
}
