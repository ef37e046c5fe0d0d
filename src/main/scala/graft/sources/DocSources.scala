package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document-corpus readers beyond parquet: JSONL (the lingua franca of
  * web-scale text dumps) and headered CSV, normalized to the pipeline's
  * documents contract (`doc_id` BIGINT, `text` STRING, optional `lang`,
  * `source`).
  *
  * 100 TB posture: NO schema inference, ever. `spark.read.json` without an
  * explicit schema runs a full inference pass over the data — a second
  * complete scan before any real work. JSONL therefore reads with the
  * pinned contract schema (unknown fields are simply never parsed, which
  * also prunes their decode cost); CSV reads the header line only and types
  * every column string, then casts the contract columns — both are
  * single-pass. Compressed variants (.gz/.zst) come free from the Hadoop
  * codec layer.
  */
object DocSources {

  /** The contract columns, in output order. */
  private val Contract: Seq[(String, DataType)] = Seq(
    "doc_id" -> LongType, "text" -> StringType,
    "lang" -> StringType, "source" -> StringType)

  /** The pinned JSONL read schema (also the streaming-source schema —
    * streaming reads REQUIRE one up front, which is the same no-inference
    * discipline the batch path keeps by choice). */
  val JsonSchema: StructType = StructType(Contract.map { case (n, t) =>
    StructField(n, t, nullable = true)
  })

  /** Infer a format from the path when `--format` is absent. (`.tsv` must
    * map to "tsv", not "csv" — the separator choice keys off the format.) */
  def formatOf(path: String): String = {
    val base = path.toLowerCase.stripSuffix(".gz").stripSuffix(".zst")
    if (base.endsWith(".jsonl") || base.endsWith(".json")) "jsonl"
    else if (base.endsWith(".tsv")) "tsv"
    else if (base.endsWith(".csv")) "csv"
    else "parquet"
  }

  /** Read a documents corpus as `doc_id, text[, lang, source]`.
    * Fails loudly when the contract columns are missing or unfilled —
    * a silent all-null `text` column would sail through the quality gate
    * dropping everything with no visible cause.
    *
    * CSV/TSV contract: ONE RECORD PER LINE. The default read keeps
    * `multiLine=false` because that is what makes a 100 TB CSV splittable
    * (every worker can start at any line boundary); the price is that a
    * QUOTED text field containing raw newlines — common in document
    * corpora — splits into malformed continuation rows. Those rows null
    * out under the pinned cast (continuation fragments don't parse a
    * doc_id), so the probe below counts them and fails loudly with a
    * pointer at `multiLine = true` instead of silently dropping documents.
    * Callers with such a corpus opt in via `multiLine = true` (CLI
    * `--multiline`), accepting that each FILE then parses as one split —
    * parallelism comes from file count, the standard Spark trade. */
  def read(spark: SparkSession, path: String, format: Option[String] = None,
      multiLine: Boolean = false): DataFrame = {
    val fmt = format.map(_.toLowerCase).getOrElse(formatOf(path))
    val raw = fmt match {
      case "parquet" => spark.read.parquet(path)
      case "jsonl" | "json" =>
        // columnNameOfCorruptRecord would need a schema slot; PERMISSIVE +
        // pinned schema nulls out malformed rows instead, and the loud
        // checks below catch a corpus that is malformed wholesale
        spark.read.schema(JsonSchema).json(path)
      case "csv" | "tsv" =>
        spark.read
          .option("header", "true")
          .option("sep", if (fmt == "tsv") "\t" else ",")
          .option("multiLine", multiLine.toString)
          .csv(path) // header-typed strings: no inference scan
      case other => sys.error(s"unknown --format '$other' (parquet|jsonl|csv|tsv)")
    }
    val cols = raw.columns.toSet
    val missing = Seq("doc_id", "text").filterNot(cols.contains)
    if (missing.nonEmpty)
      sys.error(s"$path ($fmt) is missing required column(s) ${missing.mkString(", ")} " +
        s"— found [${raw.columns.mkString(", ")}]; documents need doc_id + text")
    // id decode: try_cast so ANSI mode can't throw a bare CAST_INVALID_INPUT
    // mid-scan — but for the string-typed csv/tsv read an id that fails
    // the CONTRACT (absent — empty field reads as null — or unparseable)
    // raises OUR actionable error instead, AT ANY ROW DEPTH, not just
    // inside the probe's 1000-row window: quoted-newline continuation
    // fragments, non-integer ids, and empty-first-field fragments past
    // the window would otherwise be silently nulled and skipped. Zero
    // extra scan — the check rides the projection. RESIDUAL (documented,
    // row-locally undetectable): a continuation fragment whose first
    // field happens to parse as an integer produces a bogus row — only
    // the one-record-per-line contract (or --multiline) rules that out.
    // jsonl keeps the probe-only contract: PERMISSIVE nulls the whole
    // malformed row, leaving no raw value to distinguish absent from
    // broken.
    val tryId = expr("try_cast(doc_id AS BIGINT)")
    val idExpr =
      if (fmt == "csv" || fmt == "tsv")
        when(col("doc_id").isNull || tryId.isNull,
          raise_error(concat(lit(s"$path ($fmt): missing/unparseable doc_id '"),
            coalesce(col("doc_id"), lit("<empty>")),
            lit("' — ids must be present integers; if quoted text fields " +
              "contain raw newlines, re-read with --multiline"))))
          .otherwise(tryId)
      else tryId
    val out = raw.select(
      idExpr.as("doc_id"),
      col("text").cast(StringType).as("text"),
      (if (cols.contains("lang")) col("lang").cast(StringType) else lit(null).cast(StringType))
        .as("lang"),
      (if (cols.contains("source")) col("source").cast(StringType) else lit(null).cast(StringType))
        .as("source"))
    // One cheap aggregate over the first rows to catch wholesale breakage
    // (wrong separator, schema drift, ids that don't parse as integers)
    // before a full pipeline run silently drops everything. LIMIT-bounded:
    // this is a sample probe, not a corpus pass.
    val probe = out.limit(1000)
      .agg(count(lit(1)).as("n"),
        count(col("doc_id")).as("n_id"),
        count(col("text")).as("n_text"))
      .head()
    val (n, nId, nText) = (probe.getLong(0), probe.getLong(1), probe.getLong(2))
    if (n > 0 && nId == 0)
      sys.error(s"$path ($fmt): doc_id is null/unparseable in all of the first $n rows " +
        "— wrong format/separator, or ids that are not integers?")
    if (n > 0 && nText == 0)
      sys.error(s"$path ($fmt): text is null in all of the first $n rows " +
        "— wrong format/separator?")
    // (csv/tsv partial malformation never reaches here: the in-projection
    // raise_error above fires on the first missing/unparseable id — inside
    // the probe window or at any depth beyond it)
    out
  }
}
