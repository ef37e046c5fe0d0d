package graft.queries

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the engine-wide `ts` contract against fixture-encoding drift: the
  * shared testdata has shipped `events.ts` as int64 TIMESTAMP(NANOS) in some
  * rounds and as TIMESTAMP(MICROS, isAdjustedToUTC=false) (pandas/pyarrow
  * default) in others, and round 8 proved a hard-coded assumption silently
  * takes out every downstream ns-arithmetic query. [[Q.events]] /
  * [[Q.normalizeTs]] must yield the IDENTICAL BIGINT-epoch-nanos frame from
  * every encoding that can appear on disk.
  *
  * Spark cannot WRITE TIMESTAMP(NANOS) parquet, so the legacy-ns case is
  * pinned at the contract boundary instead: a raw BIGINT `ts` column is
  * byte-for-byte what the nanosAsLong scan of a NANOS file produces
  * (the LongType pass-through branch).
  */
class TsEncodingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // fixed instants (ns since epoch, micro-aligned like every real fixture)
  private val ns = Seq(1700000000000000000L, 1700000123456789000L, 1700086400000000000L)

  private def baseDf: DataFrame = {
    import spark.implicits._
    ns.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, i.toLong % 2, s"type$i", i * 1.5, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def writeAndRead(df: DataFrame): Seq[Row] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ts-enc").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    Q.events(spark, dir).orderBy("event_id").collect().toSeq
  }

  test("all on-disk encodings normalize to the identical BIGINT-ns frame") {
    val fromLong = writeAndRead(baseDf)

    // Spark-written TIMESTAMP (MICROS, isAdjustedToUTC=true)
    val ltz = baseDf.withColumn("ts", timestamp_micros((col("ts") / 1000).cast(LongType)))
    val fromLtz = writeAndRead(ltz)

    // pandas-style TIMESTAMP (MICROS, isAdjustedToUTC=false) — the round-8
    // regenerated-fixture case
    val ntz = baseDf.withColumn("ts",
      timestamp_micros((col("ts") / 1000).cast(LongType)).cast(TimestampNTZType))
    val fromNtz = writeAndRead(ntz)

    assert(fromLong.map(_.getLong(1)) == ns)
    assert(fromLtz == fromLong, "LTZ-micros file must normalize identically")
    assert(fromNtz == fromLong, "NTZ-micros file must normalize identically")
    assert(fromLong.head.schema("ts").dataType == LongType)
  }

  test("normalizeTs handles an NTZ-typed frame directly (inference re-enabled path)") {
    // if some session re-enables NTZ inference, the scan yields
    // TIMESTAMP_NTZ and the cast-under-pinned-UTC branch must still be exact
    val ntzFrame = baseDf.withColumn("ts",
      timestamp_micros((col("ts") / 1000).cast(LongType)).cast(TimestampNTZType))
    assert(ntzFrame.schema("ts").dataType == TimestampNTZType)
    val out = Q.normalizeTs(ntzFrame).orderBy("event_id").collect().toSeq
    assert(out.map(_.getLong(1)) == ns)
  }

  test("eventsBetween selects identical rows from every encoding, " +
      "including non-micro-aligned ns bounds") {
    def sliceOf(df: DataFrame, from: Long, to: Long): Seq[Long] = {
      val dir = java.nio.file.Files.createTempDirectory("graft-ts-slice").toString
      df.write.mode("overwrite").parquet(s"$dir/events.parquet")
      Q.eventsBetween(spark, dir, from, to)
        .orderBy("event_id").collect().map(_.getLong(1)).toSeq
    }
    val ltz = baseDf.withColumn("ts",
      timestamp_micros((col("ts") / 1000).cast(LongType)))
    val ntz = ltz.withColumn("ts", col("ts").cast(TimestampNTZType))
    // half-open [from, to): to-bound excludes the last row; a from-bound
    // 1ns below a stored value must still include it (ceil translation)
    val from = ns(1) - 1L
    val to = ns(2)
    Seq(baseDf, ltz, ntz).foreach { df =>
      assert(sliceOf(df, from, to) == Seq(ns(1)), df.schema("ts").dataType.toString)
    }
    // exact-bound inclusivity: from == stored value is included
    assert(sliceOf(baseDf, ns(1), ns(2) + 1) == Seq(ns(1), ns(2)))
  }

  test("eventsBetween bound translation is exact for pre-1970 instants") {
    // truncating division would ceil wrong for negative micros (round
    // toward zero), shifting the slice edge by 1us on pre-epoch data
    import spark.implicits._
    val negNs = Seq(-2000000000L, -1000000000L, 0L, 1000000L)
    def df = negNs.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, 0L, "t", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def slice(d: DataFrame, from: Long, to: Long): Seq[Long] = {
      val dir = java.nio.file.Files.createTempDirectory("graft-ts-neg").toString
      d.write.mode("overwrite").parquet(s"$dir/events.parquet")
      Q.eventsBetween(spark, dir, from, to)
        .orderBy("event_id").collect().map(_.getLong(1)).toSeq
    }
    val ltz = df.withColumn("ts",
      timestamp_micros((col("ts") / 1000).cast(LongType)))
    // [-1s, 0): exactly the -1s row, from both encodings — including a
    // from-bound 1ns below the stored value
    Seq[(DataFrame, String)](df -> "long", ltz -> "ltz").foreach { case (d, label) =>
      assert(slice(d, -1000000000L, 0L) == Seq(-1000000000L), label)
      assert(slice(d, -1000000001L, 0L) == Seq(-1000000000L), label)
      assert(slice(d, -999999999L, 1000001L) == Seq(0L, 1000000L), label)
    }
  }

  test("normalizeTs rejects an unusable encoding loudly, not silently") {
    val bad = baseDf.withColumn("ts", col("ts").cast(StringType))
    val e = intercept[IllegalStateException](Q.normalizeTs(bad))
    assert(e.getMessage.contains("encoding"))
  }

  test("date-typed TPC-H columns produce identical results under both NTZ " +
      "inference settings") {
    // orders/lineitem date columns are ALSO timestamp[us] in the current
    // fixture; queries touching them must not depend on whether the scan
    // yields TIMESTAMP or TIMESTAMP_NTZ (Q.events flips the session conf,
    // so both states occur within one session depending on query order)
    val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val prev = spark.conf.getOption(key)
    def run() = graft.SparkEntry.queries("q_profile_lineitem")(
      spark, "/root/testdata/sf0.001").collect().toSeq
    try {
      spark.conf.set(key, "true")
      val ntz = run()
      spark.conf.set(key, "false")
      val ltz = run()
      assert(ntz == ltz, "shipdate formatting diverges across inference settings")
      assert(ntz.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("the shipped fixture itself round-trips through the contract") {
    val dir = "/root/testdata/sf0.001"
    val df = Q.events(spark, dir)
    assert(df.schema("ts").dataType == LongType)
    val n = df.count()
    assert(n > 0)
    // ns values must be micro-aligned instants in a sane range (2020–2040),
    // i.e. actual normalized nanos rather than micros or seconds
    val r = df.agg(min("ts"), max("ts"), sum(expr("ts % 1000"))).head()
    assert(r.getLong(0) > 1577836800000000000L && r.getLong(1) < 2208988800000000000L,
      s"ts out of ns range: ${r.getLong(0)}..${r.getLong(1)}")
    assert(r.getLong(2) == 0L, "ts not micro-aligned — wrong unit?")
  }
}
