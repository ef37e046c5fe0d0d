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
