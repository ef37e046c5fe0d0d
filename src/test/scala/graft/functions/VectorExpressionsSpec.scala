package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomVecs(n: Int, dim: Int) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
  }

  test("native codegen expressions are bit-identical to the HOF formulation") {
    val df = randomVecs(200, 64)
    val q = randomVecs(1, 64).select($"v".as("qv"))
    val both = df.crossJoin(q).select(
      VectorOps.cosineDist($"v", $"qv").as("native"),
      VectorOps.cosineDistHof($"v", $"qv").as("hof"),
      VectorOps.dot($"v", $"qv").as("dnative"),
      VectorOps.dotHof($"v", $"qv").as("dhof"))
    val rows = both.collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "cosine mismatch")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), "dot mismatch")
    }
  }

  test("null and length-mismatch semantics match") {
    val df = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(1f, 2f, 3f))), // length mismatch
      (None: Option[Seq[Float]], Some(Seq(1f, 2f)))) // null side
      .toDF("a", "b")
      .select(VectorOps.cosineDist($"a", $"b").as("native"),
        VectorOps.cosineDistHof($"a", $"b").as("hof"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1))
    }
  }

  test("l2 normalize: unit output, zero-vector passthrough, single-pass values") {
    val df = Seq(
      (1L, Some(Seq(3f, 4f))),
      (2L, Some(Seq(0f, 0f))),
      (3L, None: Option[Seq[Float]]))
      .toDF("id", "v")
      .select($"id", VectorOps.normalize($"v").as("nv"))
    val rows = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getSeq[Float](1))).toMap
    assert(rows(1L) == Seq(0.6f, 0.8f))
    assert(rows(2L) == Seq(0f, 0f)) // zero vector passes through
    assert(rows(3L) == null)
  }

  test("functions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    randomVecs(4, 8).createOrReplaceTempView("vex")
    val n = spark.sql(
      """SELECT a.id, cosine_distance(a.v, b.v) AS d, dot_product(a.v, b.v) AS p
        |FROM vex a JOIN vex b ON b.id = 0""".stripMargin).collect()
    assert(n.length == 4)
    val self = n.find(_.getLong(0) == 0L).get
    assert(math.abs(self.getDouble(1)) < 1e-12) // self-distance 0
  }
}
