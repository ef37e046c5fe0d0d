package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via `flatMapGroupsWithState` — the
  * custom-state Structured Streaming surface (gap-based sessions per user,
  * the streaming twin of the batch `q_sessionize` query).
  *
  * State per user is one open session (bounded); a session closes and is
  * emitted when an event arrives more than `gapNs` after the previous one,
  * or when the processing-time timeout fires with no new events. At scale
  * the stream shuffles once on `user_id` and state lives in the state store,
  * checkpointed per micro-batch.
  */
object SessionizeStream {

  final case class Event(event_id: Long, ts: Long, user_id: Long, value: Double)

  /** `firstEvent` is the MINIMUM event_id in the session (not the id of the
    * earliest-ts event) — matching the batch `q_sessionize` aggregation so
    * the two surfaces agree even when ids are not assigned in ts order. */
  final case class SessionState(
      startTs: Long, lastTs: Long, nEvents: Long, firstEvent: Long)

  final case class Session(
      user_id: Long, first_event: Long, n_events: Long, duration_s: Long)

  val DefaultGapNs: Long = 1800000000000L // 30 min, mirrors q_sessionize

  private def toSession(userId: Long, st: SessionState): Session =
    Session(userId, st.firstEvent, st.nEvents, (st.lastTs - st.startTs) / 1000000000L)

  /** The per-group state transition. Events within a micro-batch arrive
    * unordered — sort by (ts, event_id) before folding. */
  def updateState(gapNs: Long, armTimeout: Boolean)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession(userId, _)).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(e => (e.ts, e.event_id))
    val closed = Seq.newBuilder[Session]
    var cur = state.getOption
    // pending run of gap-adjacent stragglers BEFORE the open session: a
    // burst of late events must fold into ONE session the way the batch
    // sessionizer (globally ts-sorted) would merge them — emitting one
    // singleton per event diverged from the stream-equals-batch contract
    // (round-14 ADVICE). The run stays pending while consecutive events
    // remain gap-adjacent to it and closes the moment an event is not
    // (events are sorted ascending, so a non-adjacent event ends the run
    // for good), or at batch end.
    var pre = Option.empty[SessionState]
    def flushPre(): Unit = {
      pre.foreach(p => closed += toSession(userId, p))
      pre = None
    }
    def single(e: Event) = SessionState(e.ts, e.ts, 1L, e.event_id)
    sorted.foreach { e =>
      val preAdjacent = pre.exists(p => e.ts - p.lastTs <= gapNs)
      cur match {
        case Some(st) if st.startTs - e.ts > gapNs =>
          // gap-separated BEFORE the open session (a very late straggler):
          // accumulate into the pending pre-session run (merging while
          // gap-adjacent) and KEEP the open one — closing the newer session
          // instead would mis-order the stream's session timeline
          if (preAdjacent) pre = pre.map(p => p.copy(
            lastTs = math.max(p.lastTs, e.ts),
            nEvents = p.nEvents + 1,
            firstEvent = math.min(p.firstEvent, e.event_id)))
          else { flushPre(); pre = Some(single(e)) }
        // merge iff the event is gap-adjacent to the OPEN INTERVAL: after
        // it (within gap of lastTs) or inside/within-gap-before it. A bare
        // `e.ts - st.lastTs <= gapNs` is trivially true for ANY earlier
        // event — a cross-batch straggler hours BEFORE the session would
        // silently fold in and stretch startTs across a gap the policy
        // says must split (the batch sessionizer, globally ts-sorted,
        // closes such an event as its own session).
        case Some(st) if e.ts - st.lastTs <= gapNs &&
            st.startTs - e.ts <= gapNs =>
          // min/max guards against cross-batch disorder: a late event must
          // not roll lastTs backwards (wrong gap decisions, negative
          // durations) or leave startTs after an earlier arrival
          val merged = st.copy(
            startTs = math.min(st.startTs, e.ts),
            lastTs = math.max(st.lastTs, e.ts),
            nEvents = st.nEvents + 1,
            firstEvent = math.min(st.firstEvent, e.event_id))
          // e may BRIDGE the pending straggler run and the open session
          // (adjacent to both): the batch sessionizer would see one
          // connected chain — fold the run in instead of closing it
          cur = pre match {
            case Some(p) if preAdjacent =>
              pre = None
              Some(merged.copy(
                startTs = math.min(p.startTs, merged.startTs),
                nEvents = merged.nEvents + p.nEvents,
                firstEvent = math.min(merged.firstEvent, p.firstEvent)))
            case _ => flushPre(); Some(merged)
          }
        case Some(st) =>
          flushPre()
          closed += toSession(userId, st)
          cur = Some(single(e))
        case None =>
          cur = Some(single(e))
      }
    }
    // a run still pending at batch end closes as one session (it cannot
    // persist — state holds exactly the open session). A straggler burst
    // SPLIT ACROSS micro-batches therefore closes per batch — and that
    // over-split is the ONLY divergence from the batch sessionizer, a
    // bound PINNED as the refinement property in SessionizeProperties:
    // under arbitrary cross-batch disorder the streamed sessions always
    // partition each batch session's event set exactly (never a merge
    // across two batch sessions, never a leaked count, never a span past
    // the chain's own)
    flushPre()
    cur match {
      case Some(st) =>
        state.update(st)
        if (armTimeout) state.setTimeoutDuration("1 hour")
      case None => ()
    }
    closed.result().iterator
  }

  /** Apply the stateful sessionization to a (possibly streaming) event
    * Dataset.
    *
    * `timeout`: production streams use `ProcessingTimeTimeout` so idle users'
    * open sessions eventually flush; the one-shot drain path uses `NoTimeout`
    * — with a processing-time timeout the engine keeps scheduling empty
    * micro-batches to honor pending timers, which never settles for a
    * finite source. */
  def sessionize(
      events: Dataset[Event], gapNs: Long = DefaultGapNs,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[Session] = {
    require(timeout != GroupStateTimeout.EventTimeTimeout,
      "event-time timeouts need setTimeoutTimestamp + a watermark; " +
        "this sessionizer supports NoTimeout and ProcessingTimeTimeout")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        updateState(gapNs, timeout != GroupStateTimeout.NoTimeout))
  }

  /** Drain the event files through the streaming sessionizer once; open
    * sessions stay in state (only closed sessions emit), so callers compare
    * against the batch result restricted to closed sessions. */
  def runOnce(spark: SparkSession, dir: String, gapNs: Long = DefaultGapNs,
      queryName: String = "sessions"): Dataset[Session] = {
    import spark.implicits._
    val events = EventsStream.readEventsStream(spark, dir)
      .selectExpr("event_id", "ts", "user_id", "value").as[Event]
    val q = sessionize(events, gapNs)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName).as[Session]
  }
}
