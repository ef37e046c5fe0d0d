package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.10: the reference has no
  * streaming — this is the optional incremental extension, built purely from
  * Structured Streaming built-ins).
  *
  * The transforms are defined once and shared by batch and streaming — the
  * same `DataFrame => DataFrame` function runs under `spark.read` (batch
  * backfill / the oracle-checked `q_stream_tumbling_hourly` shape) and
  * `spark.readStream` (incremental with watermarked state eviction). At
  * scale, the windowed aggregate shuffles on (window, event_type) with
  * map-side partial aggregation, and the watermark bounds state size.
  */
object EventsStream {

  /** events schema when ns timestamps are read as epoch-nano longs
    * (`spark.sql.legacy.parquet.nanosAsLong`). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Shared transform: hourly tumbling counts + sums per event type.
    * Input needs (ts: long epoch-nanos, event_type, value). */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ets", "2 hours")
      .groupBy(window(col("ets"), "1 hour"), col("event_type"))
      .agg(count("*").as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exactly-once dedup by event id — the streaming twin of the
    * batch exact-dedup operator. `dropDuplicatesWithinWatermark` evicts an
    * id's state once the watermark passes its event time, so memory really
    * is bounded on a long-running stream (plain `dropDuplicates("event_id")`
    * would keep every id forever: state only ages out when the event-time
    * column is part of the dedup key). Duplicates are therefore only
    * guaranteed to be dropped while they arrive within the watermark delay
    * of the first occurrence — the standard at-scale dedup contract. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ets", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .drop("ets")

  /** Open a streaming source over a directory of event parquet files. */
  def readEventsStream(spark: SparkSession, dir: String, glob: String = "events.parquet"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", glob)
      .parquet(dir)
  }

  /** Run the streaming rollup over whatever files are in `dir` and block
    * until the source drains (local smoke path: memory sink). Returns the
    * result table. */
  def runOnce(spark: SparkSession, dir: String, queryName: String = "events_rollup"): DataFrame = {
    // complete mode: a finite file source never advances the watermark past
    // the last window, so append would emit nothing in a one-shot drain.
    val q = hourlyRollup(readEventsStream(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
