package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner: executes the flagship `SparkEntry.entry` hybrid-search
  * query (what the driver's t1 smoke does) and prints the hits. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"entry returned ${rows.length} rows:")
    df.show(20, 80, vertical = false)
    require(rows.nonEmpty, "entry must return rows")

    val rollup = graft.streaming.EventsStream.runOnce(spark, "/root/testdata/sf0.001")
    println(s"streaming hourly rollup: ${rollup.count()} buckets")
    rollup.orderBy("bucket_start", "event_type").show(5)
    spark.stop()
  }
}
