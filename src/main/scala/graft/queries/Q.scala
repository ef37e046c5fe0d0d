package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{lit, round}

/** One declared query of the engine's public surface (SURVEY.md §2.12):
  * a Spark implementation plus (when SQL-expressible) a DuckDB oracle that
  * must produce the identical result on the same parquet tables.
  *
  * Determinism rules (the driver hash-compares after sorting columns by
  * name):
  *  - every computed column is aliased identically in both engines;
  *  - every float column is `round(x, 6)` in both engines, with identical
  *    double-precision expression structure so the pre-rounding values agree
  *    to ~1 ulp;
  *  - money/quantity sums go through exact DECIMAL arithmetic, then cast to
  *    double;
  *  - every ORDER BY carries a unique-key tiebreak, and LIMIT queries order
  *    by the ROUNDED score so the cut line is identical in both engines.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** [[t]] + [[spreadScan]] — for call sites whose downstream MAP work is
    * heavy enough that the adaptive post-scan spread measurably wins (the
    * shingle/minhash pipelines). The default read stays unspread: a
    * round-21 full-bench A/B showed the unconditional spread costs
    * +0.3–1.5 s per LIGHT query at fixture scale (the exchange turns
    * 1-task map-only plans into 65-task plans — scheduling overhead, and
    * REPARTITION_BY_NUM blocks AQE coalescing), while only the
    * kernel-heavy pipelines gain. */
  def tSpread(spark: SparkSession, dir: String, name: String): DataFrame =
    spreadScan(spark, spark.read.parquet(s"$dir/$name.parquet"),
      s"$dir/$name.parquet")

  /** Adaptive scan-spread (guide §2.5 "input skew: one huge unsplittable
    * file"): a parquet table whose byte footprint yields fewer scan splits
    * than the session's parallelism executes its ENTIRE map phase —
    * tokenize, shingle, hash, per-row kernels — on that handful of cores
    * (the fixture ships every table as one row group: measured 1.34 s for
    * the minhash signature pass at sf0.1, single-core, vs ~0.15 s spread).
    * One cheap round-robin exchange right after the read restores
    * parallelism. The condition derives from data size, never from a
    * constant tuned to this host: when splits ≥ parallelism (any real
    * corpus) this is the IDENTITY and no exchange is added. Tables under
    * [[SpreadFloorBytes]] are left alone — for dimension-sized inputs the
    * exchange costs more than the map work it spreads. Filters/column
    * pruning still reach the scan: Catalyst pushes both through
    * Repartition nodes. Correctness is partitioning-independent by the
    * engine's own determinism rules (exact-decimal/quantized sums,
    * order-independent aggregates — the driver already re-runs the bench
    * at a different core count). */
  private val SpreadFloorBytes = 256L * 1024
  def spreadScan(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    val cores = spark.sparkContext.defaultParallelism
    // A stat failure (FS without getContentSummary, permission error) must
    // degrade to the IDENTITY, never to a spread: bytes = -1 fails the floor
    // check below. (The old Long.MaxValue sentinel overflowed the ceil
    // division to splits = 1 and force-spread arbitrarily large tables —
    // a full-corpus shuffle on exactly the deployments that can least
    // afford one.)
    val bytes =
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.getContentSummary(p).getLength
      } catch { case _: Throwable => -1L }
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val splits = math.max(1L, bytes / maxSplit + (if (bytes % maxSplit == 0) 0 else 1))
    if (bytes >= SpreadFloorBytes && splits < cores) df.repartition(cores)
    else df
  }

  /** The events table, normalized to the engine-wide `ts` contract:
    * **BIGINT epoch-nanoseconds** — the ONE place that adapts to whatever
    * physical parquet encoding the fixture was generated with. Downstream
    * ns arithmetic (sessionize gaps, funnel windows, cohort days, tumbling
    * buckets) never has to care how `ts` was stored.
    *
    * Encodings handled (both have shipped in `/root/testdata` across
    * rounds, so both are load-bearing):
    *  - int64 TIMESTAMP(NANOS): readable only with
    *    `spark.sql.legacy.parquet.nanosAsLong` (scan yields BIGINT ns —
    *    already the contract; without the flag the scan fails with
    *    PARQUET_TYPE_ILLEGAL);
    *  - TIMESTAMP(MICROS), adjusted-to-UTC or not (pandas/pyarrow default
    *    is not): the scan yields TimestampType or TimestampNTZType
    *    depending on the session's NTZ-inference setting, and
    *    [[normalizeTs]] recovers the stored micros × 1000 from either —
    *    exactly what DuckDB's `epoch_ns(ts)` yields on the same naive
    *    timestamp, so oracles stay unchanged. (The NTZ branch interprets
    *    the wall clock in the session zone; every entry point pins UTC.)
    *
    * Entry-point builders also arm the legacy flag; setting it here as well
    * keeps ad-hoc sessions working. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // nanosAsLong is required to SCAN legacy int64-ns files at all (it is
    // additive — NANOS parquet appears only in events fixtures). The NTZ
    // inference conf is deliberately NOT touched: normalizeTs handles both
    // TimestampType and TimestampNTZType, so other tables' scan types never
    // depend on whether an events query ran first (order independence).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(t(spark, dir, "events"))
  }

  /** Time-sliced events scan with the range predicate applied to the RAW
    * `ts` column BEFORE [[normalizeTs]] — so it reaches the parquet reader
    * as a pushed filter and prunes row groups, whatever the physical
    * encoding. (A predicate written against the normalized ns column would
    * sit above the `unix_micros*1000` projection and scan everything — the
    * difference between reading one day and reading the 100 TB table.)
    *
    * Bounds are `[fromNs, toNs)` epoch-nanos. For micros-encoded files the
    * ns bounds translate exactly because stored values are micro-aligned:
    * `ts_us*1000 >= fromNs ⇔ ts_us >= ceil(fromNs/1000)` and
    * `ts_us*1000 < toNs ⇔ ts_us < ceil(toNs/1000)`. */
  def eventsBetween(spark: SparkSession, dir: String,
      fromNs: Long, toNs: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(spark, dir, "events")
    // floorDiv-based ceil: truncating division would round toward zero for
    // pre-1970 bounds and silently shift the slice by one microsecond
    def ceilUs(ns: Long): Long = Math.floorDiv(ns + 999L, 1000L)
    val pruned = raw.schema("ts").dataType match {
      case LongType =>
        raw.filter(col("ts") >= fromNs && col("ts") < toNs)
      case TimestampType =>
        raw.filter(col("ts") >= timestamp_micros(lit(ceilUs(fromNs))) &&
          col("ts") < timestamp_micros(lit(ceilUs(toNs))))
      case TimestampNTZType =>
        raw.filter(
          col("ts") >= timestamp_micros(lit(ceilUs(fromNs))).cast(TimestampNTZType) &&
            col("ts") < timestamp_micros(lit(ceilUs(toNs))).cast(TimestampNTZType))
      case other =>
        throw new IllegalStateException(s"unsupported events.ts encoding: $other")
    }
    normalizeTs(pruned)
  }

  /** Normalize a `ts` column to BIGINT epoch-nanos whatever type the scan
    * produced. The TimestampNTZ branch is a safety net for sessions where
    * NTZ inference was re-enabled: the NTZ→LTZ cast interprets the wall
    * clock in the session zone, so it is exact only under the pinned-UTC
    * sessions every entry point builds (DuckDB treats naive timestamps as
    * UTC wall clock). */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(colName).dataType match {
      case LongType => df
      case TimestampType =>
        df.withColumn(colName, unix_micros(col(colName)) * lit(1000L))
      case TimestampNTZType =>
        df.withColumn(colName,
          unix_micros(col(colName).cast(TimestampType)) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"unsupported events.$colName encoding: $other")
    }
  }

  /** The documents corpus with its tokenization — the ONE Spark-side
    * counterpart of [[toksCte]] (`split(text, ' ')` ≡ `string_split`).
    * Every query module must tokenize through this helper so the
    * tokens-are-data contract can never drift per module. */
  def docsTokens(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, split}
    t(spark, dir, "documents").select(col("doc_id"), col("text"),
      split(col("text"), " ").as("tokens"))
  }

  /** [[docsTokens]] over a [[tSpread]] scan — for the shingle/minhash/gram
    * pipelines whose per-row kernels dominate the fixture's single-task
    * scan (see [[tSpread]] for the measured opt-in rule). */
  def docsTokensSpread(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, split}
    tSpread(spark, dir, "documents").select(col("doc_id"), col("text"),
      split(col("text"), " ").as("tokens"))
  }

  /** Shared DuckDB CTE fragments for the documents corpus. Tokenization is
    * `string_split(text, ' ')` — identical to Spark's `split(text, ' ')` on
    * this single-space-joined corpus (SURVEY.md §7.4: tokens are data; both
    * engines must consume the same tokens). */
  val toksCte: String =
    "toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)"

  val doclenCte: String =
    "doclen AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks)"

  val statsCte: String =
    "stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, " +
      "CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM doclen)"

  val postingCte: String =
    "posting AS (SELECT doc_id, unnest(toks) AS term FROM toks)"

  val tfCte: String =
    "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf " +
      "FROM posting GROUP BY doc_id, term)"

  val dfCte: String =
    "tdf AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)"

  /** All BM25 statistics CTEs chained. */
  val bm25Ctes: String =
    Seq(toksCte, doclenCte, statsCte, postingCte, tfCte, dfCte).mkString(", ")

  /** Per-(term,doc) BM25 contribution in DuckDB SQL — mirrors
    * [[graft.search.Bm25.termScore]] term for term (k1=1.2, b=0.75,
    * Okapi idf; SURVEY.md §2.4 F4). */
  val bm25TermSql: String =
    "ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0) " +
      "* (CAST(tf AS DOUBLE) * 2.2) " +
      "/ (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))"

  /** BM25 scores CTE for a query term list like `['spark','join']`. */
  def bm25ScoresCte(termsSqlList: String): String =
    s"q AS (SELECT unnest($termsSqlList) AS term), " +
      s"scores AS (SELECT tf.doc_id, sum($bm25TermSql) AS score " +
      "FROM tf JOIN q USING (term) JOIN tdf USING (term) " +
      "JOIN doclen ON tf.doc_id = doclen.doc_id CROSS JOIN stats GROUP BY tf.doc_id)"

  /** DuckDB double-precision dot product of two FLOAT[] lists, summed in
    * element order — bit-compatible with [[graft.functions.VectorOps.dot]]. */
  /** Upper bound for oracle-side dimension unrolling
    * (`generate_series(1, dimBound)` + `WHERE i <= len(col)`): must be ≥ the
    * fixture's embedding_dim (64, TESTDATA.md) or the oracle would silently
    * truncate dimensions the Spark posexplode side scores. ONE constant so a
    * dim change can't desynchronize the two engines; the guarded WHERE makes
    * an over-estimate harmless. */
  val dimBound: Int = 64

  /** The shared `generate_series` fragment for per-dimension oracle CTEs. */
  def dimSeriesSql: String = s"generate_series(1, $dimBound)"

  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, len($a)), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  def cosineDistSql(a: String, b: String): String =
    s"1.0 - ${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** DuckDB element-order L2 of two 8-dim subvector lists — the PQ subspace
    * kernel (shared by the q_embed_pq and q_sim_pq_* oracles; one
    * definition so the quantization layout can never drift per module). */
  def l2Sql8(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, 8), " +
      s"i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) " +
      s"* (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))"

  /** Projection-safe rounding: `round(x, p) + 0.0` canonicalizes IEEE `-0.0`
    * to `+0.0` (`-0.0 + 0.0 == +0.0`). Needed because DuckDB's `round`
    * preserves the sign of a tiny negative (`round(-1e-16, 6) = -0.0`) while
    * Spark's BigDecimal-based `round` does not, and the driver hashes
    * FORMATTED values ("-0.0" != "0.0"). Use for every projected rounded
    * column whose pre-rounding value can be a tiny negative: cosine
    * distances (self-distance is `1 - x/(√x·√x)` ≈ ±1e-16), lag deltas,
    * variance/correlation residuals, running sums. Must be applied to BOTH
    * engines so nonzero values stay bit-identical. */
  def r6(c: Column): Column = round(c, 6) + lit(0.0)

  def r4(c: Column): Column = round(c, 4) + lit(0.0)

  def r6Sql(x: String): String = s"(round($x, 6) + 0.0)"

  def r4Sql(x: String): String = s"(round($x, 4) + 0.0)"
}
