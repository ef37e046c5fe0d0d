package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[TopKDesc]]: bounded-heap typed aggregate — equals the window
  * formulation on random data across forced partial/merge boundaries. */
class AggregatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches window row_number top-k across many partitions") {
    val rnd = new scala.util.Random(17)
    val df = (0 until 5000)
      .map(i => (s"g${i % 7}", rnd.nextInt(1000).toDouble))
      .toDF("g", "v").repartition(13) // force map-side partials + merges
    val viaAgg = df.groupBy("g").agg(Aggregates.topkDesc($"v", 5).as("tk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v".desc)
    val viaWin = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .groupBy("g").agg(sort_array(collect_list($"v"), asc = false).as("tk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(viaAgg == viaWin)
    assert(viaAgg.values.forall(_.length == 5))
  }

  test("small groups, nulls and NaN: values skipped, result still sorted") {
    val df = Seq(
      ("a", Some(3.0)), ("a", None), ("a", Some(Double.NaN)), ("a", Some(1.0)),
      ("b", Some(9.0)))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(Aggregates.topkDesc($"v", 4).as("tk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") == Seq(3.0, 1.0)) // null + NaN contribute nothing
    assert(got("b") == Seq(9.0))
  }

  test("SQL registration: topk_desc usable from spark.sql") {
    GraftExtensions.register(spark)
    Seq((1, 5.0), (1, 2.0), (1, 9.0), (1, 7.0)).toDF("g", "v")
      .createOrReplaceTempView("tkv")
    val out = spark.sql("SELECT topk_desc(v, 2) AS tk FROM tkv GROUP BY g")
      .collect().head.getSeq[Double](0)
    assert(out == Seq(9.0, 7.0))
  }

  test("serialization round-trips the heap") {
    val agg = TopKDesc(org.apache.spark.sql.graftbridge.ColumnBridge.expression(lit(0.0)), 3)
    val b = agg.createAggregationBuffer()
    Seq(5.0, 1.0, 9.0, 7.0).foreach { v =>
      val other = agg.createAggregationBuffer(); other.enqueue(v)
      agg.merge(b, other)
    }
    val back = agg.deserialize(agg.serialize(b))
    assert(agg.eval(back).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .toDoubleArray().toSeq == Seq(9.0, 7.0, 5.0))
  }
}
