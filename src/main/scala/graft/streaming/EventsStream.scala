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

  /** events schema under the engine-wide `ts` contract (BIGINT epoch-nanos,
    * [[graft.queries.Q.normalizeTs]]) — what every downstream transform
    * sees AFTER normalization, whatever the files physically store. */
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

  /** Stream-stream interval join: each purchase matched to every signup by
    * the SAME user within the preceding hour — the attribution-window join.
    * Defined once for batch and streaming: `withWatermark` is a no-op under
    * `spark.read`, so the identical function backfills in batch and runs
    * incrementally under `readStream` (StreamJoinSpec pins batch-equality).
    *
    * Scale posture: a stream-stream inner join keys state by `user_id` and
    * the watermarks + the time-range predicate BOUND both state stores —
    * signups age out one hour past the watermark, purchases immediately at
    * it (the interval condition tells Spark exactly how long each side can
    * still match). Without the time bound the join would buffer both
    * streams forever. Batch shape: one hash shuffle per side on user_id.
    */
  def signupPurchaseJoin(signups: DataFrame, purchases: DataFrame): DataFrame = {
    val s = signups
      .withColumn("s_ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("s_ts", "2 hours")
      .select(col("user_id").as("s_user"), col("event_id").as("signup_id"), col("s_ts"))
    val p = purchases
      .withColumn("p_ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("p_ts", "2 hours")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("value").as("amount"), col("p_ts"))
    s.join(p, col("s_user") === col("p_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("s_user").as("user_id"), col("signup_id"), col("purchase_id"),
        col("amount"), col("s_ts"), col("p_ts"))
  }

  /** Open a streaming source over a directory of event parquet files,
    * normalized to the BIGINT-epoch-nanos `ts` contract ([[eventsSchema]]).
    *
    * `readStream` requires a user-declared schema, and the fixture's
    * physical `ts` encoding has drifted across regenerations (int64-ns vs
    * timestamp[us]) — so the PHYSICAL schema is probed from a one-off batch
    * read of the same files (driver-side footer read, no data scan), the
    * stream is declared with that, and [[graft.queries.Q.normalizeTs]]
    * converts on the stream. Downstream transforms are encoding-agnostic. */
  def readEventsStream(spark: SparkSession, dir: String, glob: String = "events.parquet"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // no matching files yet (a watch started before the producer's first
    // write): re-probe briefly — the common race is the producer's first
    // file landing milliseconds after the watch starts, and catching it
    // here means the stream fixes on the file's ACTUAL encoding instead of
    // an assumed one. If the dir is still empty after the grace window,
    // fall back to the declared ns-long contract schema with a LOUD
    // warning: file-source schemas are fixed at start, so files that later
    // arrive in a different physical encoding (the fixture has shipped
    // timestamp[us]!) will mismatch until the stream is restarted
    // (round-9 ADVICE — the fallback must never be silent).
    def probe(): Option[org.apache.spark.sql.types.StructType] =
      try Some(spark.read.option("pathGlobFilter", glob).parquet(dir).schema)
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    val physical = probe()
      // grace poll: 4 × 250 ms before committing to the assumed encoding
      .orElse((1 to 4).iterator
        .map { _ => Thread.sleep(250L); probe() }
        .collectFirst { case Some(s) => s })
      .getOrElse {
        System.err.println(
          s"[graft] WARN: no files matching $glob in $dir yet — stream " +
            "schema fixed to the declared int64-ns contract; if the " +
            "producer writes a different ts encoding (e.g. timestamp[us]) " +
            "the stream must be restarted to pick it up")
        eventsSchema
      }
    val raw = spark.readStream
      .schema(physical)
      .option("pathGlobFilter", glob)
      .parquet(dir)
    graft.queries.Q.normalizeTs(raw)
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
