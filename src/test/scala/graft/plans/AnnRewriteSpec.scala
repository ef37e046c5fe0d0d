package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.VectorOps

/** [[AnnTopKRewrite]]: fires on the canonical brute-force top-k shape with
  * bit-identical results, and declines every shape it can't prove safe. */
class AnnRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** RDD-backed, non-nullable schema: the IsNotNull proof is trivial and
    * `ConvertToLocalRelation` can't fold the plan away (a LocalRelation
    * fixture loses Filter nodes — and with them constraint evidence — before
    * the rewrite runs; real scans keep them, as PlanRegressionSpec's
    * q_v2_knn guard shows). */
  private def corpus(n: Int): DataFrame = {
    val rnd = new scala.util.Random(11)
    val rows = (0 until n).map(i => Row(i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1).toSeq))
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 5), schema)
  }

  /** The natural DataFrame formulation of exact kNN the rule targets. */
  private def bruteShape(c: DataFrame, k: Int) = {
    val qv = c.filter($"vec_id" === 3).select($"embedding".as("qv"))
    c.crossJoin(broadcast(qv))
      .select($"vec_id", VectorOps.cosineDist($"embedding", $"qv").as("dist"))
      .orderBy(round($"dist", 6).asc, $"vec_id".asc)
      .limit(k)
  }

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("rewrite fires on the canonical shape and results are unchanged") {
    val c = corpus(300)
    val df = bruteShape(c, 7)
    assert(physical(df).contains("CosineKnnJoin"), physical(df).take(800))

    def rows(d: DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val withRewrite = rows(df)
    spark.conf.set(AnnTopKRewrite.ConfKey, "false")
    val without = try rows(bruteShape(c, 7)) finally
      spark.conf.unset(AnnTopKRewrite.ConfKey)
    assert(withRewrite == without) // bit-identical, including raw dist
    assert(withRewrite.size == 7 && withRewrite.head._1 == 3L) // self first
  }

  test("kill switch disables the rewrite") {
    spark.conf.set(AnnTopKRewrite.ConfKey, "false")
    try assert(!physical(bruteShape(corpus(50), 5)).contains("CosineKnnJoin"))
    finally spark.conf.unset(AnnTopKRewrite.ConfKey)
  }

  test("fires through a projection pushed between Limit and Sort") {
    // an outer select pushes through the limit (PushProjectionThroughLimit),
    // giving the Limit(Project(Sort(...))) arrangement
    val df = bruteShape(corpus(100), 5).select(($"vec_id" + 1000L).as("id"), $"dist")
    assert(physical(df).contains("CosineKnnJoin"), physical(df).take(800))
    assert(df.collect().length == 5)
  }

  test("fires on a literal query vector (no join) with unchanged results") {
    val c = corpus(200)
    val rnd = new scala.util.Random(23)
    val q = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    def shape() = c
      .select($"vec_id", VectorOps.cosineDist($"embedding", typedlit(q.toSeq)).as("dist"))
      .orderBy(round($"dist", 6).asc, $"vec_id".asc)
      .limit(6)
    val df = shape()
    assert(physical(df).contains("CosineKnnJoin"), physical(df).take(800))
    def rows(d: DataFrame) = d.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val withRewrite = rows(df)
    spark.conf.set(AnnTopKRewrite.ConfKey, "false")
    val without = try rows(shape()) finally spark.conf.unset(AnnTopKRewrite.ConfKey)
    assert(withRewrite == without)
  }

  test("declines: zero-norm literal query vector (all-NaN distances)") {
    val df = corpus(50)
      .select($"vec_id",
        VectorOps.cosineDist($"embedding", typedlit(Seq.fill(16)(0f))).as("dist"))
      .orderBy(round($"dist", 6).asc, $"vec_id".asc)
      .limit(5)
    assert(!physical(df).contains("CosineKnnJoin"))
  }

  test("declines: missing id tiebreak (heap order would be nondeterministic)") {
    val c = corpus(60)
    val qv = c.filter($"vec_id" === 3).select($"embedding".as("qv"))
    val df = c.crossJoin(broadcast(qv))
      .select($"vec_id", VectorOps.cosineDist($"embedding", $"qv").as("dist"))
      .orderBy(round($"dist", 6).asc)
      .limit(5)
    assert(!physical(df).contains("CosineKnnJoin"))
  }

  test("declines: sort on the unrounded distance (pruning could break raw-order ties)") {
    val c = corpus(60)
    val qv = c.filter($"vec_id" === 3).select($"embedding".as("qv"))
    val df = c.crossJoin(broadcast(qv))
      .select($"vec_id", VectorOps.cosineDist($"embedding", $"qv").as("dist"))
      .orderBy($"dist".asc, $"vec_id".asc)
      .limit(5)
    assert(!physical(df).contains("CosineKnnJoin"))
  }

  test("fires on HybridSearch.vssTopK over a parquet-backed corpus (production leg)") {
    val rnd = new scala.util.Random(31)
    val tmp = java.nio.file.Files.createTempDirectory("ann-vss").toString
    (0 until 80).map(i => (s"doc$i", Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("doc_id", "embedding").write.mode("overwrite").parquet(tmp)
    // parquet round-trip: nullable columns, constraints must come from the
    // filters vssTopK itself adds
    val docs = spark.read.parquet(tmp)
    val df = graft.search.HybridSearch.vssTopK(docs, Array.fill(16)(0.5f), 5)
    assert(physical(df).contains("CosineKnnJoin"), physical(df).take(900))
    assert(df.collect().length == 5)
  }

  test("declines: unhinted unbounded query side (exec would collect it to the driver)") {
    val c = corpus(60)
    val qv = c.filter($"vec_id" === 3).select($"embedding".as("qv"))
    def shape(q: DataFrame) = c.crossJoin(q)
      .select($"vec_id", VectorOps.cosineDist($"embedding", $"qv").as("dist"))
      .orderBy(round($"dist", 6).asc, $"vec_id".asc)
      .limit(5)
    // no broadcast hint and no row-count bound: a large-large cartesian
    // cosine top-k must stay on the CartesianProduct path, not become a
    // driver-side collect
    assert(!physical(shape(qv)).contains("CosineKnnJoin"))
    // a LIMIT on the query side is a maxRows proof — fires without a hint
    assert(physical(shape(qv.limit(1))).contains("CosineKnnJoin"))
  }

  test("declines: nullable id without an IsNotNull proof (tiebreak can't compare nulls)") {
    val rnd = new scala.util.Random(9)
    val rows = (0 until 40).map(i => Row(i.toLong, Array.fill(16)(rnd.nextFloat()).toSeq))
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = true), // id NOT provably non-null
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
    val c = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    val qv = c.filter($"vec_id" === 3).select($"embedding".as("qv"))
    val df = c.crossJoin(broadcast(qv))
      .select($"vec_id", VectorOps.cosineDist($"embedding", $"qv").as("dist"))
      .orderBy(round($"dist", 6).asc, $"vec_id".asc)
      .limit(5)
    assert(!physical(df).contains("CosineKnnJoin"))
  }

  test("declines: nullable vector without an IsNotNull proof") {
    // toDF gives nullable columns; no isNotNull filter anywhere in the plan
    val rnd = new scala.util.Random(7)
    val c = (0 until 60).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val qv = c.filter($"vec_id" === 3).select($"embedding".as("qv"))
    val df = c.crossJoin(broadcast(qv))
      .select($"vec_id", VectorOps.cosineDist($"embedding", $"qv").as("dist"))
      .orderBy(round($"dist", 6).asc, $"vec_id".asc)
      .limit(5)
    assert(!physical(df).contains("CosineKnnJoin"))
  }
}
