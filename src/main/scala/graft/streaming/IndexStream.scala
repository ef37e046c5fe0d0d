package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.analyze.{Analyzer, DefaultAnalyzer}
import graft.embed.Embedder
import graft.index.IndexJob

/** Streaming incremental INDEX: a file stream of markdown documents feeds
  * the SAME chunk → embed → merge pipeline as the batch [[IndexJob]], one
  * micro-batch at a time — drop files into the watched directory and the
  * index artifact follows.
  *
  * Structure: the `binaryFile` source discovers new `*.md` files (the
  * checkpoint's file log guarantees exactly-once per file; `maxFileAge` is
  * disabled so old-mtime files copied in later — `cp -p`, `rsync -a` — are
  * still picked up), and `foreachBatch` runs the batch pipeline on each
  * arrival set, ending in [[IndexJob.mergeAndWrite]] — the identical
  * replace-by-path merge the batch job uses, so a drained stream over a set
  * of files produces the same artifact as a batch run over them
  * (content-addressed ids make this exact; IndexStreamSpec asserts it).
  *
  * Semantics are APPEND-ONLY PER PATH: Spark's file source never re-emits a
  * path it has already processed, so an in-place EDIT of an indexed file is
  * not picked up — re-indexing changed content needs a batch
  * `IndexJob.run(clear = false)` (whose replace-by-path merge handles it)
  * or writing the new content under a new path. This is the file source's
  * contract, stated here so nobody infers CDC semantics that aren't there.
  *
  * Scale posture: per micro-batch the chunk+embed work is proportional to
  * NEW files only; the merge anti-joins existing documents by `file_path`
  * (one shuffle keyed on path) and the BM25 stats tables re-derive from the
  * merged corpus — one aggregation pass, the same cost the reference pays
  * rebuilding FTS stats on incremental insert. For huge corpora with tiny
  * per-batch deltas, widen `trigger` so stats amortize over more files.
  */
object IndexStream {

  /** `binaryFile`'s fixed schema, stated explicitly (streaming sources
    * require one up front). */
  val binaryFileSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Watch `docsDir` and fold every new markdown file into the index at
    * `indexDir`. Blockable via the returned query (`processAllAvailable`
    * to drain in tests/one-shot use). */
  def start(
      spark: SparkSession,
      docsDir: String,
      indexDir: String,
      embedder: Embedder,
      analyzer: Analyzer = DefaultAnalyzer,
      opts: IndexJob.Options = IndexJob.Options(),
      checkpointDir: Option[String] = None): StreamingQuery = {
    val chunker = IndexJob.chunkerFor(opts, analyzer)
    // source config and settings shared with the batch job — one contract
    val settings = IndexJob.settingsFor(spark, embedder)

    val files = IndexJob.decodeMarkdownFiles(
      spark.readStream.format("binaryFile")
        .option("pathGlobFilter", IndexJob.MarkdownGlob)
        .option("recursiveFileLookup", "true")
        // default is 7 days: files with mtimes older than (newest seen − 7d)
        // would silently never index
        .option("maxFileAge", "36500d")
        .schema(binaryFileSchema)
        .load(docsDir))

    files.writeStream
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$indexDir/_index_checkpoint"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val fresh = IndexJob.embedChunks(
            IndexJob.chunkFiles(batch.toDF(), chunker), embedder, opts)
          // clear=false always: each micro-batch merges into what exists
          IndexJob.mergeAndWrite(batch.sparkSession, fresh, settings, indexDir,
            clear = false)
          ()
        }
      }
      .start()
  }
}
