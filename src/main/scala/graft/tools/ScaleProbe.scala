package graft.tools

import org.apache.spark.sql.SparkSession

/** Targeted scale probe: time a named subset of the registry at one scale
  * dir (warmup pass at sf0.001, then two timed passes, min — the Bench
  * protocol, restricted so an audit iteration takes seconds not minutes).
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1g \
  *     sbt "runMain graft.tools.ScaleProbe q_dedup_lev_pairs q_dedup_exact"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_dedup_lev_pairs", "q_dedup_embed_lsh_knn", "q_dedup_embed_knn",
      "q_dedup_minhash_pairs", "q_dedup_exact", "q_split_leakage")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftStrategies.install(spark)
    val qs = names.map(n => n -> graft.SparkEntry.queries(n))
    qs.foreach { case (_, fn) =>
      fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    }
    def pass(): Map[String, Double] = qs.map { case (n, fn) =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      n -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val (p1, p2) = (pass(), pass())
    names.foreach(n => println(f"[probe] $n%-24s ${math.min(p1(n), p2(n))}%.2f s  (sf=$sfDir)"))
    spark.stop()
  }
}
