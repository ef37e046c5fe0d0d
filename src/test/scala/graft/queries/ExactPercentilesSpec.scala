package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins [[ExtraQueries.exactPercentiles]] bit-identical to the built-in
  * `percentile` aggregate it replaced in q_percentile_median /
  * q_approx_quantiles (round 22): same interpolation (position = p·(N−1),
  * (higher−position)·lowerKey + (position−lower)·higherKey), same early
  * returns, same null handling. Comparison is EXACT double equality — the
  * whole point of replicating the formula operand-for-operand. */
class ExactPercentilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ps = Seq(0.25, 0.5, 0.95)
  private val psSql = "array(0.25D, 0.5D, 0.95D)"

  private def viaBuiltin(df: org.apache.spark.sql.DataFrame): Map[String, (Seq[Any], Long)] =
    df.groupBy("g")
      .agg(expr(s"percentile(v, $psSql)").as("ex"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) Seq(null, null, null)
          else r.getSeq[Any](1)), r.getLong(2))).toMap

  private def viaCounts(df: org.apache.spark.sql.DataFrame): Map[String, (Seq[Any], Long)] =
    ExtraQueries.exactPercentiles(df, "g", "v", ps).collect()
      .map(r => r.getString(0) ->
        ((Seq(r.get(3), r.get(4), r.get(5)), r.getLong(1)))).toMap

  test("bit-identical to percentile on lineitem sf0.001 (real distribution)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    val expected = viaBuiltin(li)
    val got = viaCounts(li)
    assert(got == expected)
  }

  test("edge cases: ties, single-value group, N=1, nulls mixed in, all-null group") {
    val rows: Seq[(String, java.lang.Double)] = Seq(
      // ties + interpolation between distinct values
      "a" -> 1.0, "a" -> 1.0, "a" -> 2.5, "a" -> 2.5, "a" -> 7.25,
      // single distinct value repeated (lowerKey == higherKey early return)
      "b" -> 3.3, "b" -> 3.3, "b" -> 3.3,
      // N = 1
      "c" -> 42.0,
      // nulls ignored by percentile, counted by count(*)
      "d" -> 5.0, "d" -> null, "d" -> 9.0, "d" -> null,
      // all-null group: percentile null, count(*) = 2
      "e" -> null, "e" -> null,
      // even count, interpolated median
      "f" -> 1.0, "f" -> 2.0, "f" -> 3.0, "f" -> 4.0)
    val df = rows.toDF("g", "v")
    val expected = viaBuiltin(df)
    val got = viaCounts(df)
    assert(got == expected)
    assert(expected("e")._1 == Seq(null, null, null)) // sanity: the null path ran
  }
}
