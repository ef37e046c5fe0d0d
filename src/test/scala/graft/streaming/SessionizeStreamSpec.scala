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

  test("a straggler gap-separated BEFORE the open session closes as its own " +
      "singleton instead of folding in") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val gap = SessionizeStream.DefaultGapNs
    val hour = 3600L * 1000 * 1000 * 1000
    // open session [10h, 10h+5min] already in state (built from batch 1)
    val state = new TestGroupState(Some(SessionizeStream.SessionState(
      10 * hour, 10 * hour + 300L * 1000 * 1000 * 1000, 2L, 100L)))
    // batch 2 delivers an 8h event — 2h BEFORE the session start with a
    // 30-min gap policy; pre-fix `e.ts - lastTs <= gap` was trivially true
    // for any earlier ts and the session silently stretched to 8h..10h05
    val out = SessionizeStream.updateState(gap, armTimeout = false)(
      7L, Iterator(SessionizeStream.Event(999L, 8 * hour, 7L, 1.0)), state)
      .toSeq
    assert(out == Seq(SessionizeStream.Session(7L, 999L, 1L, 0L)),
      s"straggler must close as a singleton, got $out")
    // the open session is untouched
    assert(state.updated.exists(_.startTs == 10 * hour), s"state=${state.updated}")
    assert(state.updated.exists(_.nEvents == 2L))
  }

  /** Minimal GroupState stand-in for driving updateState directly. */
  private class TestGroupState(initial: Option[SessionizeStream.SessionState])
      extends org.apache.spark.sql.streaming.GroupState[SessionizeStream.SessionState] {
    var updated: Option[SessionizeStream.SessionState] = initial
    override def exists: Boolean = updated.isDefined
    override def get: SessionizeStream.SessionState = updated.get
    override def getOption: Option[SessionizeStream.SessionState] = updated
    override def update(s: SessionizeStream.SessionState): Unit = updated = Some(s)
    override def remove(): Unit = updated = None
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(d: Long): Unit = ()
    override def setTimeoutDuration(d: String): Unit = ()
    override def setTimeoutTimestamp(t: Long): Unit = ()
    override def setTimeoutTimestamp(t: Long, add: String): Unit = ()
    override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
