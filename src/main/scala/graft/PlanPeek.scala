package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan inspector: print the executed plan of named queries at
  * sf0.001 (companion to [[BenchProbe]] — shape, not time). */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftStrategies.install(spark)
    for (n <- args) {
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
