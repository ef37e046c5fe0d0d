package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Similarity

class CosineKnnJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int, dim: Int, parts: Int) = {
    val rnd = new scala.util.Random(5)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding").repartition(parts)
  }

  test("custom operator matches the crossJoin+window brute force exactly") {
    val c = corpus(400, 32, 7)
    val qs = c.filter($"vec_id" < 4)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid"), col("nid"), col("rank"), round(col("dist"), 6).as("d"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet

    val viaOp = canon(Similarity.knnJoin(c, "vec_id", "embedding", qs, "qid", "qvec", 7)
      .withColumnRenamed("id", "nid"))
    val viaBrute = canon(Similarity.bruteForceTopK(qs, "qid", "qvec", c, "vec_id", "embedding", 7)
      .withColumnRenamed("vec_id", "nid"))
    assert(viaOp == viaBrute)
    assert(viaOp.size == 4 * 7)
  }

  test("null and zero-norm vectors never crowd out real neighbors") {
    val base = corpus(50, 8, 3)
    val degenerate = Seq(
      (1000L, Array.fill(8)(0f)), // zero norm -> NaN distance
      (1001L, Array.fill(8)(0f)),
      (1002L, Array.fill(8)(0f)))
      .toDF("vec_id", "embedding")
    val nulls = Seq(2000L).toDF("vec_id")
      .withColumn("embedding", org.apache.spark.sql.functions.lit(null)
        .cast("array<float>"))
    val c = base.unionByName(degenerate).unionByName(nulls)
    val qs = base.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val top = Similarity.knnJoin(c, "vec_id", "embedding", qs, "qid", "qvec", 5)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(top.size == 5)
    // no NaN-distance or null-embedding ids in the result
    assert(top.forall(_ < 1000L), s"degenerate ids leaked: $top")
  }

  test("physical plan contains the custom exec and no cartesian/window over the corpus") {
    val c = corpus(100, 8, 3)
    val qs = c.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val df = Similarity.knnJoin(c, "vec_id", "embedding", qs, "qid", "qvec", 3)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("CosineKnnJoin")) // exec nodeName strips "Exec"
    assert(!physical.contains("BroadcastNestedLoopJoin"))
    assert(!physical.contains("CartesianProduct"))
  }
}
