package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The stream-stream interval join must produce EXACTLY the batch join's
  * pairs — the one function serves both, so this pins that the watermarked
  * incremental execution loses/duplicates nothing on a drained source. */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def key(r: org.apache.spark.sql.Row) =
    (r.getAs[Long]("user_id"), r.getAs[Long]("signup_id"),
      r.getAs[Long]("purchase_id"), r.getAs[Double]("amount"))

  test("streaming signup→purchase attribution equals the batch join") {
    val batchEvents = graft.queries.Q.events(spark, dir)
    val batch = EventsStream.signupPurchaseJoin(
      batchEvents.filter(col("event_type") === "signup"),
      batchEvents.filter(col("event_type") === "purchase")).collect().map(key)

    val se = EventsStream.readEventsStream(spark, dir)
      .filter(col("event_type") === "signup")
    val pe = EventsStream.readEventsStream(spark, dir)
      .filter(col("event_type") === "purchase")
    val q = EventsStream.signupPurchaseJoin(se, pe)
      .writeStream.outputMode("append").format("memory").queryName("sjoin")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sjoin").collect().map(key)

    assert(batch.nonEmpty, "fixture must contain signup→purchase pairs in-window")
    assert(streamed.toSet == batch.toSet)
    assert(streamed.length == batch.length) // no duplicate emission either
  }

  test("batch attribution pairs really fall inside the hour window") {
    val batchEvents = graft.queries.Q.events(spark, dir)
    val rows = EventsStream.signupPurchaseJoin(
      batchEvents.filter(col("event_type") === "signup"),
      batchEvents.filter(col("event_type") === "purchase")).collect()
    rows.foreach { r =>
      val s = r.getAs[java.sql.Timestamp]("s_ts").getTime
      val p = r.getAs[java.sql.Timestamp]("p_ts").getTime
      assert(p >= s && p <= s + 3600 * 1000L, s"pair outside window: $r")
    }
  }
}
