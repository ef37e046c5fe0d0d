package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned storage layout for the events table — the 100 TB
  * posture for time-sliced analytics. `Q.eventsBetween` proves the range
  * predicate reaches the parquet reader and prunes ROW GROUPS inside a
  * file; at cluster scale the table should additionally be laid out as one
  * `event_date=YYYY-MM-DD/` directory per UTC day, so a time-sliced query
  * prunes whole PARTITIONS at planning time — unmatched days are never
  * listed, never footer-read, never scanned. Partition pruning gets the
  * scan to the right days; the pushed ts bounds then prune row groups
  * inside the two boundary days. One day of a 100 TB year-span table is
  * ~0.3% of the data; this layout makes that the I/O ceiling for a
  * one-day slice instead of a best case.
  *
  * All ts values follow the engine-wide BIGINT-epoch-nanos contract
  * ([[graft.queries.Q.normalizeTs]]); the partition column is derived, the
  * stored `ts` stays exact.
  */
object EventsLayout {

  private val DayNs = 86400L * 1000000000L

  /** Write a normalized events frame (ts = BIGINT epoch-ns) as a
    * date-partitioned parquet layout.
    *
    * The frame is shuffled BY the partition column first: without it,
    * every input task holds rows of every day and `partitionBy` writes
    * tasks × days small files (the classic file-explosion failure at
    * 1000 executors × 365 days); with it, each day's rows land in one
    * task. At real scale add a second repartition key (e.g. a hash bucket
    * of user_id) so one hot day spreads over N tasks — one file per
    * (day, bucket) is still listing-friendly. Rows are sorted by ts within
    * partitions so row-group min/max stats stay tight for intra-day
    * slicing. */
  /** ns → UTC day, in EXACT integer arithmetic AND independent of the
    * session time zone. `/` on two longs is DOUBLE division in Spark, and
    * at 2024-era epoch-ns the double ulp is 256 — a row 100 ns before
    * midnight would round UP into the next day's directory while
    * [[readBetween]]'s exact `Math.floorDiv` bounds exclude that directory:
    * the row silently vanishes from slices. pmod-floor keeps negative
    * (pre-1970) ts on the correct day too. The day number is floor(ts/day)
    * added to the 1970-01-01 DATE rather than `to_date(timestamp_…)`:
    * to_date interprets a timestamp in the SESSION zone, so in a non-UTC
    * session (this is a library surface; only graft's own entry points pin
    * UTC) a near-midnight row would land in a directory the UTC
    * floorDiv-bounded [[readBetween]] prunes away — the same silent-vanish
    * failure, through the zone instead of the ulp. */
  private def eventDateCol =
    date_add(to_date(lit("1970-01-01")),
      expr(s"cast((ts - pmod(ts, ${DayNs}L)) div ${DayNs}L as int)"))

  def writePartitioned(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", eventDateCol)
      .repartition(col("event_date"))
      .sortWithinPartitions("ts")
      .write.partitionBy("event_date").mode("overwrite").parquet(path)

  /** Streaming ingestion INTO the date-partitioned layout — the production
    * path that keeps the layout current without batch rewrites: a
    * normalized events stream ([[graft.streaming.EventsStream
    * .readEventsStream]] output, ts = BIGINT epoch-ns) lands as
    * `event_date=…/part-…` files, exactly-once via the checkpoint. Late
    * events land in their OWN day's directory (the partition column derives
    * from event time, not arrival time), so [[readBetween]] pruning stays
    * correct under out-of-order arrival; a slice query just sees the late
    * day gain a file. Returns the started query; callers own its
    * lifecycle (`processAllAvailable` to drain in tests, `awaitTermination`
    * in a service). */
  def sinkPartitioned(events: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events
      .withColumn("event_date", eventDateCol)
      // same day-clustering as [[writePartitioned]] (legal in append mode):
      // without it every input task holds rows of every day and each
      // micro-batch commits tasks × days small files — a backlogged first
      // trigger over months fragments into thousands of files and creates
      // the listing problem compactPartitioned exists to fix
      .repartition(col("event_date"))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("event_date")
      .outputMode("append")
      .start()

  /** Small-file compaction for a (typically stream-fed) partitioned layout:
    * every micro-batch [[sinkPartitioned]] commits adds one file per
    * touched day, and at 1000 executors × months of days the listing cost
    * alone eats the pruning win — so the standard maintenance job rewrites
    * each day into one ts-sorted file (restoring the [[writePartitioned]]
    * shape) and swaps directories. The swap NEVER deletes the live copy
    * before its replacement is in place: write `._compacting` → rename live
    * aside to `._precompact` → rename `._compacting` in → delete the aside.
    * A crash in any window leaves a state the next run's heal recognizes
    * and finishes, so re-running is always safe. Concurrent readers of the
    * SAME path still see a rename window — at real scale this runs under a
    * table-format transaction (Iceberg/Delta); here it documents the
    * maintenance contract the layout needs. */
  def compactPartitioned(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "._compacting")
    val aside = new org.apache.hadoop.fs.Path(path + "._precompact")
    // heal a crashed prior swap: the live dir only ever disappears AFTER a
    // complete tmp exists (rename-aside window) — finish that swap; a
    // leftover aside next to a live dir is a crash after the swap — drop it
    if (!fs.exists(p) && fs.exists(tmp) && fs.exists(aside)) {
      if (!fs.rename(tmp, p))
        throw new IllegalStateException(s"compaction heal failed: $tmp -> $p")
      fs.delete(aside, true)
    } else if (fs.exists(aside) && fs.exists(p)) {
      fs.delete(aside, true)
    }
    spark.read.parquet(path)
      .repartition(col("event_date"))
      .sortWithinPartitions("ts")
      .write.partitionBy("event_date").mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(p, aside))
      throw new IllegalStateException(s"compaction swap failed: $p -> $aside")
    if (!fs.rename(tmp, p))
      throw new IllegalStateException(s"compaction swap failed: $tmp -> $p")
    fs.delete(aside, true)
  }

  /** Read a [[writePartitioned]] layout restricted to `[fromNs, toNs)`
    * epoch-nanos. The day-range predicate binds to the PARTITION column
    * (directory pruning, visible as `PartitionFilters` in the plan —
    * pinned by PlanRegressionSpec); the exact ns bounds bind to the stored
    * `ts` column (row-group pruning inside the boundary days, visible as
    * `PushedFilters`). Returns the normalized events columns with the
    * derived partition column dropped, so downstream code is
    * layout-agnostic. */
  def readBetween(spark: SparkSession, path: String,
      fromNs: Long, toNs: Long): DataFrame = {
    val fromDay = java.time.LocalDate.ofEpochDay(Math.floorDiv(fromNs, DayNs))
    val toDay = java.time.LocalDate.ofEpochDay(Math.floorDiv(toNs - 1, DayNs))
    spark.read.parquet(path)
      .filter(col("event_date") >= lit(java.sql.Date.valueOf(fromDay)) &&
        col("event_date") <= lit(java.sql.Date.valueOf(toDay)))
      .filter(col("ts") >= lit(fromNs) && col("ts") < lit(toNs))
      .drop("event_date")
  }
}
