package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class EventsStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming hourly rollup equals the batch rollup over the same files") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventsStream.runOnce(spark, dir)
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet

    val batch = EventsStream.hourlyRollup(
      graft.queries.Q.events(spark, dir))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("readEventsStream starts cleanly on a directory with no files yet") {
    // watch-before-first-write: the schema probe finds nothing and falls
    // back to the declared ns-long contract schema instead of failing
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-events").toString
    val q = EventsStream.hourlyRollup(EventsStream.readEventsStream(spark, dir))
      .writeStream.outputMode("complete").format("memory")
      .queryName("empty_events").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("empty_events").count() == 0)
  }

  test("watch-before-first-write: a file landing in the grace poll fixes " +
      "the stream on its REAL encoding — no restart needed") {
    // the round-9 ADVICE race: producer's first write lands milliseconds
    // after the watch starts; the schema probe must catch it (the fixture
    // currently ships timestamp[us], NOT the fallback's int64-ns) and the
    // stream must read + normalize it in the same run
    val dir = java.nio.file.Files.createTempDirectory("graft-late-events").toString
    val writer = new Thread(() => {
      Thread.sleep(300L)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
    })
    writer.start()
    val df = EventsStream.readEventsStream(spark, dir)
    writer.join()
    val q = df.writeStream.outputMode("append").format("memory")
      .queryName("late_events").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("late_events").count() == 1000)
    // ts came through the normalizer as epoch-ns longs in the 2024 range
    val ts = spark.table("late_events")
      .selectExpr("min(ts)", "max(ts)").head()
    assert(ts.getLong(0) > 1704000000000000000L &&
      ts.getLong(1) < 1707000000000000000L)
  }

  test("streaming dedup by event_id equals batch distinct") {
    val dir = "/root/testdata/sf0.001"
    val q = EventsStream.dedupedEvents(EventsStream.readEventsStream(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("dedup").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("dedup").count()
    val batch = graft.queries.Q.events(spark, dir)
      .dropDuplicates("event_id").count()
    assert(streamed == batch && streamed > 0)
  }
}
