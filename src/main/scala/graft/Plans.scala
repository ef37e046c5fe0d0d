package graft

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for the headline queries — the
  * plan-review loop: check PushedFilters reach the parquet scans, small
  * sides broadcast, top-k plans as TakeOrderedAndProject, and
  * WholeStageCodegen spans stay wide. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftStrategies.install(spark)
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_f4_bm25_topk", "q_v2_knn", "q_a4_hybrid_fusion", "q_j1_semi_join",
      "q_agg_pricing_summary", "q_agg_nation_revenue", "q_p4_threshold",
      "q_dedup_minhash_pairs", "q_sim_topk", "q_stream_tumbling_hourly")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
