package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone runner for the bench serving lane (iteration without paying
  * the full bench): prints the lane JSON for SPARK_GRAFT_SF_DIR. */
object ServingLaneRun {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", graft.Cli.ServingInFilterThreshold)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftStrategies.install(spark)
    val t0 = System.nanoTime()
    println(graft.ServingLane.run(spark, sfDir)._1)
    println(f"[lane] total wall ${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
