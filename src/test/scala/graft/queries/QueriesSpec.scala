package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("every declared query executes and every oracle key has a query") {
    val qs = graft.SparkEntry.queries
    val oracles = graft.SparkEntry.oracleSql
    assert(oracles.keySet.subsetOf(qs.keySet))
    // duplicate names would silently shadow each other in the map
    val names = Seq(CoreQueries.all, SearchQueries.all, PipelineQueries.all,
      ExtraQueries.all, CurationQueries.all, MiningQueries.all).flatten.map(_.name)
    // the shadow guard must see every module SparkEntry registers
    assert(names.size == qs.size,
      s"module list out of sync with SparkEntry: ${names.size} != ${qs.size}")
    assert(names.distinct.size == names.size,
      names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }.mkString(","))
    // names are unique by construction of the map; spot-run a few cheap ones
    Seq("q_p1_projection", "q_histogram", "q_skew_salted_agg").foreach { n =>
      assert(qs(n)(spark, dir).limit(1).count() >= 0)
    }
  }

  test("every declared query analyzes and physically plans against the fixture") {
    // The round-8 outage class: fixture-encoding drift broke 5 queries at
    // ANALYSIS time, and the driver's correctness compare silently dropped
    // them (no result dir → no row) — a green-looking file shrank. Forcing
    // analysis + physical planning of the ENTIRE declared surface here makes
    // any such drift a loud suite failure instead. (Planning is cheap — no
    // execution — and catches every DATATYPE_MISMATCH / UNRESOLVED_COLUMN /
    // strategy-selection regression.)
    val bad = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).queryExecution.executedPlan; None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(bad.isEmpty, s"${bad.size} queries fail to plan:\n${bad.mkString("\n")}")
  }

  test("salted aggregation equals the direct groupBy") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    val direct = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("event_type").agg(count("*").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = graft.SparkEntry.queries("q_skew_salted_agg")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    assert(salted == direct)
  }

  test("approx_count_distinct is within 5% of exact") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val rows = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("a"),
        countDistinct(col("l_partkey")).as("e"))
      .collect()
    rows.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e < 0.05, s"approx $a vs exact $e")
    }
  }
}
