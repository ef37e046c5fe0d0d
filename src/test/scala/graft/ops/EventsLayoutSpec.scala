package graft.ops

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.queries.Q

/** Date-partitioned events layout: semantics-invisible (slices agree with
  * Q.eventsBetween row-for-row) and pruning-visible (the sliced scan reads
  * strictly fewer partitions than the layout holds, with the day predicate
  * in PartitionFilters — the property that turns a 100 TB scan into a
  * per-day one). */
class EventsLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  // 2024-01-05 → 2024-01-15 UTC, the q_events_time_slice bounds
  private val FromNs = 1704412800000000000L
  private val ToNs = 1705276800000000000L

  test("day derivation is exact at midnight boundaries and for pre-1970 ts") {
    // non-micro-aligned ts right at a UTC midnight: double division (ulp
    // 256 at 2024-era ns) would round the -100 ns row UP into the next
    // day's directory, where the exact floorDiv partition bounds of
    // readBetween would never look for it
    import spark.implicits._
    val midnight = 1704499200000000000L // 2024-01-06T00:00:00Z
    val rows = Seq(
      (1L, midnight - 100L), // 100 ns before midnight -> Jan 5
      (2L, midnight + 100L), // 100 ns after -> Jan 6
      (3L, -1L))             // 1 ns before the epoch -> 1969-12-31
      .toDF("event_id", "ts")
      .withColumn("user_id", lit(0L)).withColumn("event_type", lit("x"))
      .withColumn("value", lit(0.0))
    val p = java.nio.file.Files.createTempDirectory("events_midnight").toString
    EventsLayout.writePartitioned(rows, p)
    val days = new java.io.File(p).listFiles().map(_.getName)
      .filter(_.startsWith("event_date=")).toSet
    assert(days == Set("event_date=2024-01-05", "event_date=2024-01-06",
      "event_date=1969-12-31"), days)
    // and the slice bounded AT midnight returns exactly the pre-midnight row
    val got = EventsLayout.readBetween(spark, p, midnight - 1000000L, midnight)
      .select("event_id").as[Long].collect().toSet
    assert(got == Set(1L), got)
  }

  test("partitioned slice equals the raw-table slice row-for-row") {
    val p = java.nio.file.Files.createTempDirectory("events_bydate").toString
    EventsLayout.writePartitioned(Q.events(spark, dir), p)
    val viaLayout = EventsLayout.readBetween(spark, p, FromNs, ToNs)
      .select("event_id", "ts", "user_id", "event_type")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val viaRaw = Q.eventsBetween(spark, dir, FromNs, ToNs)
      .select("event_id", "ts", "user_id", "event_type")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(viaLayout.nonEmpty)
    assert(viaLayout.toSeq == viaRaw.toSeq)
  }

  test("slice scan prunes partitions: reads only the in-range days") {
    val p = java.nio.file.Files.createTempDirectory("events_bydate").toString
    EventsLayout.writePartitioned(Q.events(spark, dir), p)
    val allDays = spark.read.parquet(p).select("event_date").distinct().count()
    val scan = EventsLayout.readBetween(spark, p, FromNs, ToNs)
      .queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
    assert(scan.nonEmpty, "no FileSourceScanExec in the plan")
    val partsRead = scan.head.selectedPartitions.partitionCount
    // the fixture spans ~30 days; the slice covers 10 → strictly fewer
    assert(partsRead < allDays,
      s"no partition pruning: read $partsRead of $allDays day-partitions")
    assert(partsRead <= 10, s"slice of 10 days read $partsRead partitions")
    assert(scan.head.partitionFilters.map(_.toString).mkString
      .contains("event_date"), "day predicate not in partitionFilters")
  }

  test("streaming sink lands events in day directories; slice equals batch") {
    val src = java.nio.file.Files.createTempDirectory("events_src").toString
    val out = java.nio.file.Files.createTempDirectory("events_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("events_ckpt").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))
    val q = EventsLayout.sinkPartitioned(
      graft.streaming.EventsStream.readEventsStream(spark, src), out, ckpt)
    q.processAllAvailable(); q.stop()
    // day directories exist (event-time derived)
    val days = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("event_date=")).map(_.getName).sorted
    assert(days.length > 20, s"expected ~30 day dirs, got ${days.length}")
    // the streamed layout serves the same slice as the raw table
    val viaSink = EventsLayout.readBetween(spark, out, FromNs, ToNs)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val viaRaw = Q.eventsBetween(spark, dir, FromNs, ToNs)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(viaSink.nonEmpty && viaSink == viaRaw)
  }

  test("compaction folds a multi-file day into one; rows and slices survive") {
    val src = java.nio.file.Files.createTempDirectory("events_csrc").toString
    val out = java.nio.file.Files.createTempDirectory("events_cout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("events_cckpt").toString
    // two source files → the file-source stream commits them as separate
    // batch writes → ≥2 files per day directory (the small-file shape)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$src/a.parquet"))
    val q = EventsLayout.sinkPartitioned(
      graft.streaming.EventsStream.readEventsStream(spark, src, glob = "*.parquet"),
      out, ckpt)
    q.processAllAvailable()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$src/b.parquet"))
    q.processAllAvailable(); q.stop()

    def dayFiles(): Map[String, Int] =
      new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("event_date=")).map { d =>
          d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))
        }.toMap
    val before = dayFiles()
    assert(before.values.exists(_ >= 2), s"no multi-file day to compact: $before")
    val rowsBefore = spark.read.parquet(out).count()

    EventsLayout.compactPartitioned(spark, out)
    val after = dayFiles()
    assert(after.values.forall(_ == 1), s"day not folded to one file: $after")
    assert(spark.read.parquet(out).count() == rowsBefore)
    assert(EventsLayout.readBetween(spark, out, FromNs, ToNs).count() ==
      Q.eventsBetween(spark, dir, FromNs, ToNs).count() * 2) // two copies streamed
  }

  test("ts bounds still reach the parquet reader inside boundary days") {
    val p = java.nio.file.Files.createTempDirectory("events_bydate").toString
    EventsLayout.writePartitioned(Q.events(spark, dir), p)
    val plan = EventsLayout.readBetween(spark, p, FromNs, ToNs)
      .queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[[^\\]]*".r.findFirstIn(plan).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(ts") && pushed.contains("LessThan(ts"),
      s"ts range not pushed: $pushed")
  }
}
