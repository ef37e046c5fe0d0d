package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SessionizeStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming sessionization matches batch sessions (closed sessions)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val gap = SessionizeStream.DefaultGapNs

    val streamed = SessionizeStream.runOnce(spark, dir, gap)
      .collect().map(s => (s.user_id, s.first_event, s.n_events, s.duration_s)).toSet

    // batch truth: same lag/flag/running-sum construction as q_sessionize
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val batch = graft.queries.Q.events(spark, dir)
      .withColumn("prev", lag($"ts", 1).over(w))
      .withColumn("news", when($"prev".isNull || $"ts" - $"prev" > gap, 1L).otherwise(0L))
      .withColumn("sid", sum($"news").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min($"event_id").as("first_event"), count("*").as("n_events"),
        max($"ts").as("maxts"), min($"ts").as("mints"))
      .withColumn("duration_s", expr("(maxts - mints) div 1000000000"))

    // the LAST session per user is still open in the streaming state
    val lastSid = batch.groupBy($"user_id".as("u")).agg(max($"sid").as("last_sid"))
    val closed = batch.join(lastSid,
        batch("user_id") === lastSid("u") && batch("sid") === lastSid("last_sid"), "left_anti")
      .select($"user_id", $"first_event", $"n_events", $"duration_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    assert(streamed == closed)
    assert(streamed.nonEmpty)
  }
}
