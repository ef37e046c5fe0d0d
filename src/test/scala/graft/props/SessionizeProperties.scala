package graft.props

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.streaming.SessionizeStream
import graft.streaming.SessionizeStream.{Event, Session, SessionState}

/** Property pins for the streaming sessionizer's state machine —
  * [[SessionizeStream.updateState]] is pure given a GroupState stand-in,
  * so the stream-equals-batch contract can be exercised over thousands of
  * random event sequences without a SparkSession.
  *
  * Contract (the one SessionizeStreamSpec pins by example): when events
  * arrive in GLOBAL ts order across micro-batches (arbitrary batch cut
  * points, arbitrary disorder WITHIN a batch — updateState sorts), the
  * closed sessions equal the batch sessionizer's, with only the final
  * session left open in state. Under CROSS-batch disorder (stragglers)
  * the semantics deliberately approximate (single-open-session state;
  * straggler runs close per batch), but conservation invariants must
  * still hold. */
object SessionizeProperties extends Properties("sessionize") {

  // second-scale nanos so duration_s is non-vacuous (ts ∈ [0, 120] s)
  private val Sec = 1000000000L
  private val Gap = 10L * Sec

  /** Reference batch sessionizer: globally ts-sorted gap splitting. */
  private def batchSessions(evts: Seq[Event]): Seq[Session] = {
    val sorted = evts.sortBy(e => (e.ts, e.event_id))
    if (sorted.isEmpty) return Nil
    val groups = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, e) =>
      if (e.ts - acc.head.head.ts <= Gap) (e :: acc.head) :: acc.tail
      else List(e) :: acc
    }.map(_.reverse).reverse
    groups.map { g =>
      Session(g.head.user_id, g.map(_.event_id).min, g.size.toLong,
        (g.last.ts - g.head.ts) / 1000000000L)
    }
  }

  /** Minimal GroupState stand-in (mirrors SessionizeStreamSpec's). */
  private final class FakeState extends
      org.apache.spark.sql.streaming.GroupState[SessionState] {
    var cur: Option[SessionState] = None
    override def exists: Boolean = cur.isDefined
    override def get: SessionState = cur.get
    override def getOption: Option[SessionState] = cur
    override def update(s: SessionState): Unit = cur = Some(s)
    override def remove(): Unit = cur = None
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

  private def drain(batches: Seq[Seq[Event]]): (Seq[Session], Option[SessionState]) = {
    val st = new FakeState
    val closed = batches.flatMap { b =>
      SessionizeStream.updateState(Gap, armTimeout = false)(7L, b.iterator, st).toSeq
    }
    (closed, st.cur)
  }

  // timestamps small enough that gaps actually occur; ids unique via index;
  // durations stay exact because ts values are plain longs (the /1e9 second
  // conversion truncates identically in both implementations)
  private val eventsGen: Gen[List[Event]] = for {
    n <- Gen.choose(1, 40)
    ts <- Gen.listOfN(n, Gen.choose(0L, 120L))
  } yield ts.zipWithIndex.map { case (t, i) => Event(i.toLong, t * Sec, 7L, 1.0) }

  private def cutsGen(n: Int): Gen[List[Int]] =
    Gen.listOf(Gen.choose(0, n)).map(_.distinct.sorted)

  private def splitAt(evts: Seq[Event], cuts: List[Int]): Seq[Seq[Event]] = {
    val bounds = (0 :: cuts ::: List(evts.size)).distinct.sorted
    bounds.zip(bounds.tail).map { case (a, b) => evts.slice(a, b) }
  }

  property("ts-ordered delivery across arbitrary batch cuts ≡ batch sessionizer") =
    forAll(eventsGen) { evts =>
      val sorted = evts.sortBy(e => (e.ts, e.event_id))
      forAll(cutsGen(sorted.size), Gen.long) { (cuts, seed) =>
        // shuffle WITHIN each batch (updateState must sort) with a
        // deterministic per-case permutation
        val rnd = new scala.util.Random(seed)
        val batches = splitAt(sorted, cuts).map(b => rnd.shuffle(b))
        val (closed, open) = drain(batches)
        val ref = batchSessions(evts)
        val refClosed = ref.dropRight(1)
        val refOpen = ref.lastOption
        (closed.sortBy(_.first_event) == refClosed.sortBy(_.first_event)) :|
          s"closed=$closed ref=$refClosed" &&
        (open.map(s => (s.nEvents, s.firstEvent, (s.lastTs - s.startTs) / Sec)) ==
          refOpen.map(s => (s.n_events, s.first_event, s.duration_s))) :|
          s"open=$open refOpen=$refOpen"
      }
    }

  /** The batch sessionizer's chains as MEMBER LISTS (the partition the
    * refinement property compares against). */
  private def batchChains(evts: Seq[Event]): List[List[Event]] = {
    val sorted = evts.sortBy(e => (e.ts, e.event_id))
    if (sorted.isEmpty) return Nil
    sorted.tail.foldLeft(List(List(sorted.head))) { (acc, e) =>
      if (e.ts - acc.head.head.ts <= Gap) (e :: acc.head) :: acc.tail
      else List(e) :: acc
    }.map(_.reverse).reverse
  }

  /** THE divergence bound (round-15 directive #5 — replaces the
    * "straggler runs split across micro-batches close per batch" residual
    * comment with a pinned contract): under ARBITRARY cross-batch disorder
    * the streamed sessions are a REFINEMENT of the batch partition —
    * every streamed session's events lie inside exactly one batch session,
    * and the streamed sessions anchored in a batch session partition it
    * exactly. Over-splitting (a straggler run closing per batch) is the
    * ONLY permitted divergence; merging events across two batch sessions,
    * leaking counts between chains, or stretching a session past its
    * chain's span can never happen. */
  property("cross-batch disorder only ever over-splits: streamed sessions " +
      "refine the batch session partition") =
    forAll(eventsGen, Gen.long) { (evts, seed) =>
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(evts)
      forAll(cutsGen(shuffled.size)) { cuts =>
        val (closed, open) = drain(splitAt(shuffled, cuts))
        val chains = batchChains(evts)
        val chainOf = chains.zipWithIndex
          .flatMap { case (c, i) => c.map(e => e.event_id -> i) }.toMap
        // streamed sessions as (anchor member, n, duration) — open included
        val streamed = closed.map(s => (s.first_event, s.n_events, s.duration_s)) ++
          open.map(s => (s.firstEvent, s.nEvents, (s.lastTs - s.startTs) / Sec)).toSeq
        val byChain = streamed.groupBy { case (anchor, _, _) => chainOf(anchor) }
        chains.zipWithIndex.forall { case (chain, i) =>
          val pieces = byChain.getOrElse(i, Nil)
          // exact cover: the pieces anchored here hold exactly this chain's
          // events (a cross-chain merge leaks counts between chains and
          // breaks this sum on both sides)
          pieces.map(_._2).sum == chain.size.toLong &&
          // no piece outlives its chain's span, and the earliest anchor is
          // the chain's own first event
          pieces.forall(_._3 <= (chain.last.ts - chain.head.ts) / Sec) &&
          (pieces.isEmpty || pieces.map(_._1).min == chain.map(_.event_id).min)
        } :| s"closed=$closed open=$open chains=${chains.map(_.map(_.event_id))}"
      }
    }

  property("arbitrary (cross-batch-disordered) delivery conserves events and " +
      "never emits a negative duration or an event-free session") =
    forAll(eventsGen, Gen.long) { (evts, seed) =>
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(evts)
      forAll(cutsGen(shuffled.size)) { cuts =>
        val (closed, open) = drain(splitAt(shuffled, cuts))
        val total = closed.map(_.n_events).sum + open.map(_.nEvents).sum
        (total == evts.size.toLong) :| s"conservation: $total != ${evts.size}" &&
        closed.forall(s => s.duration_s >= 0 && s.n_events >= 1) :| s"closed=$closed" &&
        open.forall(s => s.lastTs >= s.startTs && s.nEvents >= 1) :| s"open=$open"
      }
    }
}
