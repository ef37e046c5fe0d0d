package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.tools.SkewProbe

/** Pins the salted-join skew technique on a HOT-KEY fixture (the round-10
  * audit only measured the uniform-fixture replication cost; SkewProbe
  * measures the wall-clock win at sf0.1 — PLANS.md round-11 carries the
  * numbers). Here: result equality and the plan shapes, which are the
  * non-flaky parts of the claim. */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def li = SkewProbe.skewedProbeSide(
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"),
    rep = 2, hotMod = 2)
  private def o = spark.read.parquet(s"$dir/orders.parquet")
    .select("o_orderkey", "o_orderpriority")

  test("salted ≡ unsalted on the hot-key fixture (every pair meets on exactly one salt)") {
    val a = SkewProbe.unsalted(li, o).collect().toSeq
    val b = SkewProbe.salted(li, o, 8).collect().toSeq
    assert(a == b, s"unsalted:\n$a\nsalted:\n$b")
    assert(a.nonEmpty)
    // the fixture is genuinely skewed: the hot key holds ~half the probe rows
    val counts = li.groupBy("l_orderkey").count().orderBy(desc("count"))
      .limit(1).collect().head
    val total = li.count()
    assert(counts.getLong(0) == 1L, "hot key must be orderkey 1")
    assert(counts.getLong(1) > total / 3, s"hot key holds ${counts.getLong(1)}/$total")
  }

  test("deterministic spread guard: salting cuts the hottest reducer's " +
      "shuffle-read records ≥2×, and the measure is bit-stable across runs") {
    // the bench skew guard's quantity (round-14 directive: record counts,
    // not wall-clock — host load cannot fail it, a de-salted plan still
    // does). AQE off: fixed hash partitioning makes the counts exact.
    // Partitions pinned to the Bench session's 32: at TestSpark's tiny 4,
    // the salted BUILD-side 8× replication (shuffle-read counts both join
    // sides) swamps the hot-key spread and the ratio is unrepresentative
    // of the serving config the guard actually runs under.
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val partsWas = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      def maxTask(df: => org.apache.spark.sql.DataFrame): Long =
        // expectNonZero: both plans shuffle; without it a slow listener
        // bus can hand back 0 and fail the maxU > 0 assert spuriously
        graft.util.InputMetrics.maxShuffleRead(spark, expectNonZero = true) {
          df.write.format("noop").mode("overwrite").save()
        }._2
      val maxU = maxTask(SkewProbe.unsalted(li, o))
      val maxS = maxTask(SkewProbe.salted(li, o, 8))
      assert(maxU > 0 && maxS > 0)
      assert(maxS * 2 <= maxU, s"salted max-task $maxS vs unsalted $maxU")
      // determinism: the exact property that makes this guard noise-proof
      assert(maxTask(SkewProbe.unsalted(li, o)) == maxU)
      assert(maxTask(SkewProbe.salted(li, o, 8)) == maxS)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.conf.set("spark.sql.shuffle.partitions", partsWas)
    }
  }

  test("plan shapes: unsalted funnels the bare key; salted shuffle keys carry the salt") {
    val pu = SkewProbe.unsalted(li, o).queryExecution.executedPlan.toString
    val smjU = "SortMergeJoin [^\n]*".r.findFirstIn(pu).getOrElse("")
    assert(smjU.contains("l_orderkey") && !smjU.contains("_salt"), smjU)
    val ps = SkewProbe.salted(li, o, 8).queryExecution.executedPlan.toString
    val smjS = "SortMergeJoin [^\n]*".r.findFirstIn(ps).getOrElse("")
    assert(smjS.contains("_salt"), smjS)
    assert(!ps.contains("CartesianProduct") && !ps.contains("BroadcastNestedLoopJoin"), ps.take(900))
  }
}
