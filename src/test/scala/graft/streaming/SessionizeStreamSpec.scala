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

  test("mutually gap-adjacent stragglers before the open session merge into " +
      "ONE closed session, like the batch sessionizer") {
    val gap = SessionizeStream.DefaultGapNs
    val hour = 3600L * 1000 * 1000 * 1000
    val min = 60L * 1000 * 1000 * 1000
    val state = new TestGroupState(Some(SessionizeStream.SessionState(
      10 * hour, 10 * hour + 5 * min, 2L, 100L)))
    // three stragglers at 8h00/8h10/8h20 — each within the 30-min gap of the
    // previous; pre-fix each closed as its own singleton, but the batch
    // sessionizer (globally ts-sorted) merges them into one 3-event session
    val out = SessionizeStream.updateState(gap, armTimeout = false)(
      7L, Iterator(
        SessionizeStream.Event(901L, 8 * hour, 7L, 1.0),
        SessionizeStream.Event(902L, 8 * hour + 10 * min, 7L, 1.0),
        SessionizeStream.Event(903L, 8 * hour + 20 * min, 7L, 1.0)), state)
      .toSeq
    assert(out == Seq(SessionizeStream.Session(7L, 901L, 3L, 1200L)),
      s"straggler run must close as one merged session, got $out")
    assert(state.updated.exists(st => st.startTs == 10 * hour && st.nEvents == 2L))
  }

  test("a pre-session straggler run split by a gap closes as two sessions") {
    val gap = SessionizeStream.DefaultGapNs
    val hour = 3600L * 1000 * 1000 * 1000
    val min = 60L * 1000 * 1000 * 1000
    val state = new TestGroupState(Some(SessionizeStream.SessionState(
      12 * hour, 12 * hour + 5 * min, 2L, 100L)))
    // 6h00 + 6h10 merge; 8h00 is >30min after 6h10 → its own session
    val out = SessionizeStream.updateState(gap, armTimeout = false)(
      7L, Iterator(
        SessionizeStream.Event(901L, 6 * hour, 7L, 1.0),
        SessionizeStream.Event(902L, 6 * hour + 10 * min, 7L, 1.0),
        SessionizeStream.Event(903L, 8 * hour, 7L, 1.0)), state)
      .toSeq
    assert(out == Seq(
      SessionizeStream.Session(7L, 901L, 2L, 600L),
      SessionizeStream.Session(7L, 903L, 1L, 0L)), s"got $out")
  }

  test("a bridging event folds the straggler run INTO the open session") {
    val gap = SessionizeStream.DefaultGapNs
    val hour = 3600L * 1000 * 1000 * 1000
    val min = 60L * 1000 * 1000 * 1000
    // open session [10h, 10h05]; stragglers at 9h10 and 9h25 (gap-separated
    // from 10h start), then 9h45 — adjacent to BOTH the run (20 min) and the
    // open session (15 min before start): one connected chain in batch order
    val state = new TestGroupState(Some(SessionizeStream.SessionState(
      10 * hour, 10 * hour + 5 * min, 2L, 100L)))
    val out = SessionizeStream.updateState(gap, armTimeout = false)(
      7L, Iterator(
        SessionizeStream.Event(901L, 9 * hour + 10 * min, 7L, 1.0),
        SessionizeStream.Event(902L, 9 * hour + 25 * min, 7L, 1.0),
        SessionizeStream.Event(903L, 9 * hour + 45 * min, 7L, 1.0)), state)
      .toSeq
    assert(out.isEmpty, s"bridged chain must stay open, got $out")
    assert(state.updated.contains(SessionizeStream.SessionState(
      9 * hour + 10 * min, 10 * hour + 5 * min, 5L, 100L)),
      s"state=${state.updated}")
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
