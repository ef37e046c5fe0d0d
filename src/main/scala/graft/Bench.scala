package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every declared query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  *
  * Queries are materialized through the `noop` sink — `count()` would let
  * Catalyst prune the computed columns and benchmark only the scan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftStrategies.install(spark)

    // JVM/codegen warmup: one full pass of EVERY query at the smallest scale
    // factor, so each measured plan has already paid its one-time
    // codegen-compile + JIT cost (a single-query warmup left every other
    // plan's first timed iteration carrying it — on this jittery host that
    // produced 20× phantom outliers in round 1).
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () } // failures surface in the timed loop
    }

    // Two timed iterations per query, report the min: the host VM's CPU
    // availability fluctuates heavily, and the first execution of a plan pays
    // one-time codegen-compile + JIT costs that aren't the query's cost.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None
        }
      }
      // min over SUCCESSFUL runs; -1 marks a query with no successful run
      // (elapsed-until-exception would read as a plausible timing)
      name -> times.minOption.getOrElse(-1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
