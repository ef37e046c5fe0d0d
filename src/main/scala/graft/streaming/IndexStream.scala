package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.analyze.{Analyzer, DefaultAnalyzer}
import graft.core.Schemas.Setting
import graft.embed.Embedder
import graft.index.{IndexData, IndexJob}

/** Streaming incremental INDEX: a file stream of markdown documents feeds
  * the SAME chunk → embed → merge pipeline as the batch [[IndexJob]], one
  * micro-batch at a time — drop files into the watched directory and the
  * index artifact follows.
  *
  * Structure: the `binaryFile` source discovers new `*.md` files (the
  * checkpoint's file log guarantees exactly-once per file), and
  * `foreachBatch` runs the batch pipeline on each arrival set, ending in
  * [[IndexJob.mergeAndWrite]] — the identical replace-by-path merge the
  * batch job uses, so a drained stream's artifact is byte-equal to a batch
  * run over the same files (content-addressed ids make this exact;
  * IndexStreamSpec asserts it).
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
    import spark.implicits._
    val chunker = IndexJob.chunkerFor(opts, analyzer)
    val settings = Seq(
      Setting("embedding_model", embedder.name),
      Setting("embedding_dim", embedder.dim.toString)).toDF()

    val files = spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.md")
      .option("recursiveFileLookup", "true")
      .schema(binaryFileSchema)
      .load(docsDir)
      .select(col("path").as("file_path"), decode(col("content"), "UTF-8").as("text"))

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
