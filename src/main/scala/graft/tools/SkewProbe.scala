package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Salted-join skew audit: measure the salted big×big join AGAINST its
  * unsalted sibling on a fixture with a genuinely HOT key — the scenario
  * the technique exists for (the round-10 audit measured only the uniform-
  * fixture replication cost; this tool measures the win).
  *
  * Fixture: `lineitem` replicated `REP`× (row-explode, deterministic),
  * with `HOT_FRAC` of the probe rows remapped onto ONE hot orderkey — the
  * canonical power-user/boilerplate-document shape. Build side = `orders`
  * (contains the hot key once, like any dimension-ish fact).
  *
  * Both variants run with AQE's skew-join split DISABLED: explicit salting
  * is the portable plan-level guarantee for KNOWN hot keys (it also works
  * on engines/plans where the runtime splitter can't — e.g. under
  * `spark.sql.adaptive.enabled=false` serving sessions); the point here is
  * to isolate the technique itself. An AQE-on pair is also reported for
  * honesty — at 100 TB you'd leave AQE on AND salt the known-hot keys.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.SkewProbe"
  */
object SkewProbe {

  /** Salted shape (mirrors q_skew_salted_join): probe side gets a
    * deterministic salt from a non-key column; build side replicates S×;
    * join key becomes (key, salt). */
  def salted(li: DataFrame, o: DataFrame, s: Int): DataFrame = {
    val probe = li.withColumn("_salt",
      pmod(col("l_linenumber").cast("long") + col("_rep"), lit(s.toLong)))
    val build = o.withColumn("_salt", explode(sequence(lit(0L), lit(s.toLong - 1))))
    probe.join(build.hint("merge"),
        probe("l_orderkey") === build("o_orderkey") && probe("_salt") === build("_salt"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).cast("long").as("n_items"),
        sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(28,4)")).cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  def unsalted(li: DataFrame, o: DataFrame): DataFrame =
    li.join(o.hint("merge"), li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).cast("long").as("n_items"),
        sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(28,4)")).cast("double").as("revenue"))
      .orderBy("o_orderpriority")

  /** `lineitem` × rep with `1/hotMod` of rows remapped to orderkey 1 —
    * the hot-key fixture. `_rep` rides along so the salt has entropy
    * beyond l_linenumber (≤7 distinct values). */
  def skewedProbeSide(li: DataFrame, rep: Int, hotMod: Int): DataFrame =
    li.withColumn("_rep", explode(sequence(lit(0L), lit(rep.toLong - 1))))
      .withColumn("l_orderkey",
        when(pmod(col("l_orderkey") + col("_rep"), lit(hotMod.toLong)) === 0, lit(1L))
          .otherwise(col("l_orderkey")))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = sys.env.getOrElse("SKEW_REP", "10").toInt
    val hotMod = sys.env.getOrElse("SKEW_HOT_MOD", "2").toInt // 1/2 of rows hot
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
    val li = skewedProbeSide(li0, rep, hotMod)

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def bestOf2(df: => DataFrame): Double = math.min(time(df), time(df))

    // results must be identical before any timing is worth reading
    val a = unsalted(li, o).collect().toSeq
    val b = salted(li, o, 8).collect().toSeq
    require(a == b, s"salted != unsalted:\n$a\n$b")

    for (skewFix <- Seq(false, true)) {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewFix.toString)
      val tu = bestOf2(unsalted(li, o))
      val ts = bestOf2(salted(li, o, 8))
      println("%s".formatLocal(java.util.Locale.ROOT,
        s"""{"aqe_skew_join":$skewFix,"rep":$rep,"hot_frac":"1/$hotMod",""" +
          s""""unsalted_sec":${"%.2f".formatLocal(java.util.Locale.ROOT, tu)},""" +
          s""""salted_sec":${"%.2f".formatLocal(java.util.Locale.ROOT, ts)},""" +
          s""""speedup":${"%.2f".formatLocal(java.util.Locale.ROOT, tu / ts)}}"""))
    }
    spark.stop()
  }
}
