package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10× scale-up of the sf0.1 testdata into a local sf1-shape
  * dataset (for the AQE/plan-shape audit only — correctness stays gated on
  * the driver-provided sf0.01 tables, which are never modified).
  *
  * Each fact table is replicated `factor` times with primary keys shifted
  * by `i · (max_key + 1)` so referential joins stay consistent across
  * replicas; dimension tables (region/nation) keep their original keys.
  * Document texts get a per-replica marker token so the dedup operators see
  * a realistic duplicate rate instead of an artificial 10-way exact-dup
  * corpus; event user_ids shift so sessions scale in COUNT, not in
  * per-user depth.
  *
  *   SPARK_GRAFT_SCALE_OUT=/tmp/sf1 sbt "runMain graft.tools.ScaleTestData"
  */
object ScaleTestData {

  def main(args: Array[String]): Unit = {
    val in = sys.env.getOrElse("SPARK_GRAFT_SCALE_IN", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "/tmp/sf1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$in/$name.parquet")
    def save(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scale] $name -> ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    /** Replicate with the listed long key columns shifted per replica. */
    def rep(df: DataFrame, shiftCols: Seq[String], markerCol: Option[String] = None): DataFrame = {
      val spans = shiftCols.map { c => c -> (df.agg(max(col(c))).head().getLong(0) + 1L) }.toMap
      (0 until factor).map { i =>
        val shifted = spans.foldLeft(df) { case (d, (c, span)) =>
          d.withColumn(c, col(c) + lit(i * span))
        }
        markerCol match {
          case Some(mc) if i > 0 =>
            shifted.withColumn(mc, concat(col(mc), lit(s" rep$i")))
          case _ => shifted
        }
      }.reduce(_ unionByName _)
    }

    // dims: unchanged (their keys are referenced, never shifted)
    save(t("region"), "region")
    save(t("nation"), "nation")
    // facts: shift every key that participates in a join or a uniqueness rule
    save(rep(t("customer"), Seq("c_custkey")), "customer")
    save(rep(t("supplier"), Seq("s_suppkey")), "supplier")
    save(rep(t("part"), Seq("p_partkey")), "part")
    save(rep(t("orders"), Seq("o_orderkey", "o_custkey")), "orders")
    save(rep(t("lineitem"), Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    save(rep(t("events"), Seq("event_id", "user_id")), "events")
    save(rep(t("documents"), Seq("doc_id"), markerCol = Some("text")), "documents")
    save(rep(t("embeddings"), Seq("vec_id")), "embeddings")
    spark.stop()
  }
}
