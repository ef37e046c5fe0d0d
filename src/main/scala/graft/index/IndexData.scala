package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.search.Bm25

/** The index artifact: what the reference keeps as one DuckDB file (tables +
  * FTS + HNSW indexes, reference `src/db.py:103-167`) becomes a directory of
  * Parquet datasets (SURVEY.md §1.3):
  *
  * {{{
  *   <dir>/documents/   doc_id, file_path, header_path, line_start, line_end,
  *                      content, tokens: array<string>, embedding: array<float>
  *   <dir>/postings/    term, doc_id, tf         (hash-partitioned by term)
  *   <dir>/termdf/      term, df
  *   <dir>/doclen/      doc_id, dl
  *   <dir>/stats/       n_docs, avgdl            (single row)
  *   <dir>/settings/    key, value               (embedding_model/_dim, …)
  * }}}
  *
  * The FTS inverted index is replaced by the postings/termdf/doclen/stats
  * statistics tables (SURVEY.md §2.4); the HNSW index by brute-force top-k
  * over `documents.embedding` (exact — SURVEY.md §2.5 V2).
  */
final case class IndexData(
    documents: DataFrame,
    postings: DataFrame,
    termdf: DataFrame,
    doclen: DataFrame,
    stats: DataFrame,
    settings: DataFrame,
    // IVF sidecar (the HNSW role, reference `src/db.py:152-165`) — present
    // when the index was built with ANN enabled; None degrades the VSS leg
    // to the exact heap scan
    ann: Option[AnnIndex] = None,
    // PQ sidecar: codes-only ADC shortlist + exact rerank (`--ann pq`)
    pq: Option[PqIndex] = None) {

  /** Cache the search-path datasets for a long-lived serving session
    * (SURVEY.md §3.3). */
  def cached(): IndexData = copy(
    documents = documents.cache(),
    postings = postings.cache(),
    termdf = termdf.cache(),
    doclen = doclen.cache(),
    stats = stats.cache(),
    settings = settings.cache(),
    ann = ann.map(_.cached()),
    pq = pq.map(_.cached()))

  /** S6-style point lookup (reference `src/db.py:181-196`). */
  def setting(key: String): Option[String] =
    settings.filter(col("key") === key).select("value")
      .collect().headOption.map(_.getString(0))

  /** S5: keyed upsert into the settings dataset (reference
    * `INSERT OR REPLACE`, `src/db.py:170-178`) — read-modify-write of the
    * small sidecar, returning the updated artifact. */
  def upsertSetting(key: String, value: String): IndexData = {
    val spark = settings.sparkSession
    import spark.implicits._
    val updated = IndexData.upsertSettings(
        settings, Seq((key, value)).toDF("key", "value"))
      // materialize: the lineage reads $dir/settings, which a subsequent
      // save(dir) overwrites — read-before-overwrite needs a checkpoint
      // (settings is a handful of rows)
      .localCheckpoint(true)
    copy(settings = updated)
  }

  /** Persist an artifact whose DataFrames are already cheap to recompute (or
    * cached). For artifacts rooted in an expensive pipeline (chunk + embed),
    * use [[IndexData.write]] — it materializes documents ONCE and derives
    * the stats tables from the written parquet instead of re-running the
    * upstream lineage per dataset. */
  def save(dir: String): Unit = {
    documents.write.mode("overwrite").parquet(s"$dir/documents")
    // Partition postings by term hash so a query's broadcast-join probe and
    // any term-keyed maintenance touch co-located partitions at 100 TB scale.
    postings.repartition(col("term")).write.mode("overwrite").parquet(s"$dir/postings")
    termdf.write.mode("overwrite").parquet(s"$dir/termdf")
    doclen.write.mode("overwrite").parquet(s"$dir/doclen")
    stats.coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    settings.coalesce(1).write.mode("overwrite").parquet(s"$dir/settings")
  }
}

object IndexData {

  /** THE keyed settings upsert (S5, reference `INSERT OR REPLACE`,
    * `src/db.py:170-178`): rows of `existing` whose key appears in `fresh`
    * are replaced by the fresh rows; everything else is kept. Every settings
    * merge in the engine — in-memory ([[IndexData.upsertSetting]]),
    * merge-time ([[IndexJob.mergeAndWrite]]), on-disk drift updates
    * (`IndexJob.upsertSettingsOnDisk`) — routes through this one
    * definition. Both frames are a handful of rows. */
  def upsertSettings(existing: DataFrame, fresh: DataFrame): DataFrame =
    existing.join(fresh.select("key"), Seq("key"), "left_anti")
      .unionByName(fresh)

  /** Write a full artifact from a documents DataFrame with an expensive
    * lineage: documents parquet first, then every stats table derived from
    * the re-read parquet — the chunk/embed pipeline executes exactly once
    * instead of once per derived dataset. */
  def write(documents: DataFrame, settings: DataFrame, dir: String): IndexData = {
    val spark = documents.sparkSession
    documents.write.mode("overwrite").parquet(s"$dir/documents")
    val docsOnDisk = spark.read.parquet(s"$dir/documents")
    val derived = fromDocuments(docsOnDisk, settings)
    derived.postings.repartition(col("term")).write.mode("overwrite").parquet(s"$dir/postings")
    derived.termdf.write.mode("overwrite").parquet(s"$dir/termdf")
    derived.doclen.write.mode("overwrite").parquet(s"$dir/doclen")
    derived.stats.coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    settings.coalesce(1).write.mode("overwrite").parquet(s"$dir/settings")
    load(spark, dir)
  }

  def load(spark: SparkSession, dir: String): IndexData = IndexData(
    documents = spark.read.parquet(s"$dir/documents"),
    postings = spark.read.parquet(s"$dir/postings"),
    termdf = spark.read.parquet(s"$dir/termdf"),
    doclen = spark.read.parquet(s"$dir/doclen"),
    stats = spark.read.parquet(s"$dir/stats"),
    settings = spark.read.parquet(s"$dir/settings"),
    ann = AnnIndex.load(spark, dir),
    pq = PqIndex.load(spark, dir))

  /** Derive the full artifact from a `documents` DataFrame that already has
    * (doc_id, tokens[, embedding]) columns — the F1–F3 stats build
    * (SURVEY.md §2.4). */
  def fromDocuments(documents: DataFrame, settings: DataFrame): IndexData = {
    val doclen = Bm25.docLengths(documents)
    val posting = Bm25.postings(documents)
    IndexData(
      documents = documents,
      postings = posting,
      termdf = Bm25.docFreq(posting),
      doclen = doclen,
      stats = Bm25.corpusStats(doclen),
      settings = settings)
  }
}
