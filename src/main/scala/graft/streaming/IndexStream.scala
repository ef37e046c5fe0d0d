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

  private def markdownSource(spark: SparkSession, docsDir: String) =
    IndexJob.decodeMarkdownFiles(
      spark.readStream.format("binaryFile")
        .option("pathGlobFilter", IndexJob.MarkdownGlob)
        .option("recursiveFileLookup", "true")
        // default is 7 days: files with mtimes older than (newest seen − 7d)
        // would silently never index
        .option("maxFileAge", "36500d")
        .schema(binaryFileSchema)
        .load(docsDir))

  private def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Settings marker set by every frozen-model micro-batch merge and cleared
    * by a re-fit (the refit rewrites settings wholesale, so the key is
    * simply absent afterwards). Lives in the ARTIFACT, not driver memory or
    * the checkpoint: it survives restarts and makes the re-fit cadence a
    * function of "is there unrefitted data", not of which batchId happened
    * to carry rows. */
  val TfIdfDirtyKey = "tfidf_dirty"

  /** [[TfIdfDirtyKey]]'s Word2Vec twin (same artifact-persisted contract). */
  val W2vDirtyKey = "w2v_dirty"

  private def modelDirty(spark: SparkSession, indexDir: String, key: String): Boolean =
    pathExists(spark, s"$indexDir/settings") &&
      !spark.read.parquet(s"$indexDir/settings")
        .filter(org.apache.spark.sql.functions.col("key") === key &&
          org.apache.spark.sql.functions.col("value") === "true")
        .isEmpty

  private def tfidfDirty(spark: SparkSession, indexDir: String): Boolean =
    modelDirty(spark, indexDir, TfIdfDirtyKey)

  /** THE per-micro-batch merge tail, shared by every watch surface (files,
    * rows, tfidf, word2vec): one [[IndexJob.mergeAndWrite]] with the full
    * option forwarding, then the LSM fold cadence (`--compact-every N` —
    * a long-lived append-mode watch otherwise accumulates segments without
    * bound and every query pays base ∪ all segments; segment count, not
    * batchId, drives the trigger so empty batches never fold). One
    * definition so a forwarded option or the compaction tail cannot be
    * missed in some copies — startTfIdf/startWord2Vec had exactly that
    * drift (their --compact-every was silently dropped). */
  private def mergeBatch(sp: SparkSession, fresh: org.apache.spark.sql.DataFrame,
      settings: org.apache.spark.sql.DataFrame, indexDir: String,
      opts: IndexJob.Options): Unit = {
    IndexJob.mergeAndWrite(sp, fresh, settings, indexDir,
      clear = false, annClusters = opts.annClusters, annIters = opts.annIters,
      pqCodes = opts.pqCodes, pqIters = opts.pqIters,
      layout = opts.layout, layoutFiles = opts.layoutFiles,
      mergeMode = opts.mergeMode)
    if (opts.mergeMode == "append" && opts.compactEvery > 0 &&
        graft.index.IndexData.segments(sp, indexDir).size >= opts.compactEvery) {
      IndexJob.compact(sp, indexDir, opts.layout, opts.layoutFiles)
      ()
    }
  }

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
    // (analyzer name included: a --watch --analyzer bigram index must be
    // searchable by the same resolution rule as a batch one)
    val settings = IndexJob.settingsFor(spark, embedder, analyzer)

    val files = markdownSource(spark, docsDir)

    files.writeStream
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$indexDir/_index_checkpoint"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val fresh = IndexJob.embedChunks(
            IndexJob.chunkFiles(batch.toDF(), chunker), embedder, opts)
          // clear=false always: each micro-batch merges into what exists.
          // Sidecar/layout options forward so the FIRST batch builds the
          // ANN/PQ sidecars and every later batch re-derives them from the
          // merged corpus under frozen centroids/codebooks (the
          // IndexJob.withAnn/withPq incremental contract — `--ann` search
          // over a watched index never misses newly streamed docs).
          mergeBatch(batch.sparkSession, fresh, settings, indexDir, opts)
          ()
        }
      }
      .start()
  }

  /** [[start]]'s ROW-CORPUS sibling: watch a directory for JSONL drops
    * (`*.jsonl`, one `{doc_id, text[, lang, source]}` object per line — the
    * DocSources contract, read with its pinned schema) and fold each new
    * file's rows into the index: one row = one chunk, no splitter
    * ([[IndexJob.runRows]] semantics). Same exactly-once-per-FILE source
    * contract as the markdown watch; additionally, because the merge
    * replaces by path and a row's path is `<source-or-"doc">:<doc_id>`, a
    * later drop that re-ships a (source, doc_id) REPLACES the earlier row —
    * per-document upsert across drops, which the markdown watch cannot do
    * (its unit of replacement is the file). Within one micro-batch the
    * latest drop file wins per document (see the foreachBatch dedup). */
  def startRows(
      spark: SparkSession,
      docsDir: String,
      indexDir: String,
      embedder: Embedder,
      analyzer: Analyzer = DefaultAnalyzer,
      opts: IndexJob.Options = IndexJob.Options(),
      checkpointDir: Option[String] = None): StreamingQuery = {
    val settings = IndexJob.settingsFor(spark, embedder, analyzer)
    val rows = spark.readStream
      .schema(graft.sources.DocSources.JsonSchema)
      .option("maxFileAge", "36500d") // as in [[markdownSource]]
      // `*.jsonl*` so compressed drops (.jsonl.gz/.jsonl.zst) match too;
      // recursive like the markdown watch — producers date-partition drops
      .option("pathGlobFilter", "*.jsonl*")
      .option("recursiveFileLookup", "true")
      .json(docsDir)
      // which file each row came from + its mtime, for the within-batch
      // winner below (mtime first: arrival order, not name order)
      .withColumn("_src", org.apache.spark.sql.functions.col("_metadata.file_path"))
      .withColumn("_mtime",
        org.apache.spark.sql.functions.col("_metadata.file_modification_time"))
    rows.writeStream
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$indexDir/_index_checkpoint"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          import org.apache.spark.sql.functions._
          // Two drops re-shipping the same doc_id can land in ONE
          // micro-batch (backlog at stream start, files between triggers);
          // the path-keyed merge only replaces across batches, so resolve
          // within the batch first: latest file wins per doc key, ordered
          // by file MODIFICATION TIME with SHORTLEX path as tiebreak —
          // lexicographic path order alone is not arrival order ('drop10'
          // < 'drop9', so a restart backlog could index the stale
          // version), and a plain-lex tiebreak would resurrect exactly
          // that bug when mtimes TIE (tar/rsync-copied drops with
          // preserved identical timestamps, second-granularity object
          // stores). Shortlex (length first, then lex) orders numbered
          // sequences correctly across digit-count boundaries: drop10 >
          // drop9 because it is longer. Malformed
          // PERMISSIVE-nulled rows (null text) must not shadow a valid
          // same-batch row either, so they are dropped before the merge —
          // a doc whose ONLY row is malformed simply never indexes, same
          // as the batch path. Ties within one file are a malformed
          // corpus; a single arbitrary row survives.
          // the shortlex tiebreak ranks the BASENAME, not the full path:
          // recursiveFileLookup is on, so equal-mtime drops can live at
          // different depths, and a full-path length comparison would order
          // by directory depth (picking the stale file in nested layouts)
          // instead of the drop-sequence number the basename carries. Full
          // path stays as the last component purely as a deterministic
          // tiebreak for identical basenames in different directories.
          val bn = substring_index(col("_src"), "/", -1)
          val latest = batch.toDF()
            .filter(col("doc_id").isNotNull && col("text").isNotNull)
            .groupBy(col("doc_id"), coalesce(col("source"), lit("doc")).as("source"))
            .agg(max_by(struct(col("text"), col("lang")),
              struct(col("_mtime"), length(bn), bn, col("_src"))).as("r"))
            .select(col("doc_id"), col("r.text").as("text"),
              col("r.lang").as("lang"), col("source"))
          val fresh = IndexJob.embedChunks(
            IndexJob.rowChunks(latest, analyzer), embedder, opts)
          mergeBatch(batch.sparkSession, fresh, settings, indexDir, opts)
          ()
        }
      }
      .start()
  }

  /** Watch with the TF-IDF embedder — the whole-corpus-fit model made
    * incremental by an explicit STALENESS CONTRACT:
    *
    *  - between re-fits, NEW files are embedded by the FROZEN current model
    *    (idf weights from the last fit) — geometry consistent with the
    *    already-indexed corpus, slightly stale w.r.t. the true corpus idf;
    *  - at every `refitEvery`-th stride boundary (by the CHECKPOINTED
    *    batchId, so the cadence survives stream restarts) that finds
    *    unrefitted merged data (the artifact-persisted [[TfIdfDirtyKey]] —
    *    empty boundary batches still fire the check, idle streams never
    *    re-fit a clean artifact; and on an explicit [[tfidfRefit]] barrier)
    *    the model re-fits over the MERGED corpus and
    *    EVERY document re-embeds under the new model — after a barrier the
    *    artifact is exactly what a batch [[IndexJob.runTfIdf]] over the same
    *    files produces (IndexStreamSpec pins the equality), INCLUDING the
    *    ANN/PQ sidecars, which a re-fit rebuilds from scratch in the new
    *    embedding space (frozen old-space centroids/codebooks would be
    *    wholesale-invalid, not merely stale);
    *  - bootstrap: with no persisted model, the first arrival set IS the
    *    corpus, so the model fits on it (batch semantics at that point).
    *
    * This lifts the former CLI restriction (`--watch` refused `--embedder
    * tfidf`) without pretending a global fit can be per-row incremental.
    * `refitEvery <= 0` disables automatic re-fits (barrier-only). */
  def startTfIdf(
      spark: SparkSession,
      docsDir: String,
      indexDir: String,
      dim: Int = 256,
      analyzer: Analyzer = DefaultAnalyzer,
      opts: IndexJob.Options = IndexJob.Options(),
      refitEvery: Int = 4,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val chunker = IndexJob.chunkerFor(opts, analyzer)
    val modelPath = s"$indexDir/tfidf_model"
    val files = markdownSource(spark, docsDir)

    files.writeStream
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$indexDir/_index_checkpoint"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sp = batch.sparkSession
        if (!batch.isEmpty) {
          import sp.implicits._
          val chunks = IndexJob.chunkFiles(batch.toDF(), chunker)
          if (!pathExists(sp, modelPath)) {
            // bootstrap fit on the first arrival set — the model IS the
            // corpus fit at this point, so the artifact starts clean
            val (embedded, model) =
              graft.embed.TfIdfEmbed.fitTransform(chunks.toDF(), "tokens", dim)
            model.save(sp, modelPath)
            mergeBatch(sp, IndexJob.chunksToDocs(embedded, opts),
              IndexJob.settingsOf(sp, model.name, dim,
                graft.analyze.Analyzers.nameOf(analyzer)), indexDir, opts)
          } else {
            // frozen-model embedding of the delta (per-row reproduction of
            // the fitted pipeline — same hash buckets, idf, L2 norm); the
            // merge marks the artifact dirty-for-refit
            val model = graft.embed.TfIdfEmbed.load(sp, modelPath)
            val fresh = IndexJob.embedChunks(
              chunks, model.embedder(analyzer.tokenize), opts)
            mergeBatch(sp, fresh,
              IndexJob.settingsOf(sp, model.name, dim,
                  graft.analyze.Analyzers.nameOf(analyzer))
                .unionByName(Seq((TfIdfDirtyKey, "true")).toDF("key", "value")),
              indexDir, opts)
          }
          ()
        }
        // Cadence keys off the CHECKPOINTED batchId (monotonic across stream
        // restarts, stable under foreachBatch retries — a driver-side
        // counter would reset on restart and double-count retries), checked
        // OUTSIDE the empty-batch guard: a stride boundary consumed by an
        // empty micro-batch must still fire, or a stream whose empty batches
        // recur on the stride would never auto-refit while data keeps
        // merging between boundaries. The artifact-persisted [[TfIdfDirtyKey]]
        // gates the actual work, so an IDLE stream crossing boundaries never
        // pays a no-op corpus re-fit — the contract is "a re-fit happens at
        // the first stride boundary at-or-after unrefitted data".
        if (refitEvery > 0 && (batchId + 1) % refitEvery == 0 &&
            tfidfDirty(sp, indexDir)) {
          tfidfRefit(sp, indexDir, dim, opts)
          ()
        }
      }
      .start()
  }

  /** Watch with the TRAINED Word2Vec embedder — [[startTfIdf]]'s staleness
    * contract applied to the skip-gram model: bootstrap fit on the first
    * arrival set; later files embed under the FROZEN word vectors (the
    * shared [[graft.embed.Word2VecEmbed.meanVector]] kernel, geometry
    * consistent with the indexed corpus, stale w.r.t. unseen vocabulary —
    * an OOV-heavy delta embeds toward zero until the next re-fit); at every
    * `refitEvery`-th checkpointed-batchId boundary that finds unrefitted
    * merged data ([[W2vDirtyKey]]) the model re-trains over the merged
    * corpus and every document re-embeds — after a barrier the artifact is
    * bit-identical to a batch [[IndexJob.runWord2Vec]] over the same files
    * (sorted deterministic fit input; IndexStreamSpec pins the equality).
    * `refitEvery <= 0` disables automatic re-fits (barrier-only). */
  def startWord2Vec(
      spark: SparkSession,
      docsDir: String,
      indexDir: String,
      dim: Int = 64,
      analyzer: Analyzer = DefaultAnalyzer,
      opts: IndexJob.Options = IndexJob.Options(),
      refitEvery: Int = 4,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val chunker = IndexJob.chunkerFor(opts, analyzer)
    val modelPath = s"$indexDir/w2v_model"
    val files = markdownSource(spark, docsDir)

    files.writeStream
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$indexDir/_index_checkpoint"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sp = batch.sparkSession
        if (!batch.isEmpty) {
          import sp.implicits._
          val chunks = IndexJob.chunkFiles(batch.toDF(), chunker)
          if (!pathExists(sp, modelPath)) {
            // bootstrap fit on the first arrival set (sorted fit input so
            // the model is a deterministic function of the file set)
            val (embedded, model) = graft.embed.Word2VecEmbed.fitTransform(
              chunks.toDF(), "tokens", dim, sortCols = Seq("filePath", "lineStart"))
            model.save(sp, modelPath)
            mergeBatch(sp, IndexJob.chunksToDocs(embedded, opts),
              IndexJob.settingsOf(sp, model.name, dim,
                graft.analyze.Analyzers.nameOf(analyzer)), indexDir, opts)
          } else {
            // frozen-model embedding of the delta; the merge marks the
            // artifact dirty-for-refit
            val model = graft.embed.Word2VecEmbed.load(sp, modelPath,
              expectedDim = Some(dim))
            val fresh = IndexJob.embedChunks(
              chunks, model.embedder(analyzer.tokenize), opts)
            mergeBatch(sp, fresh,
              IndexJob.settingsOf(sp, model.name, dim,
                  graft.analyze.Analyzers.nameOf(analyzer))
                .unionByName(Seq((W2vDirtyKey, "true")).toDF("key", "value")),
              indexDir, opts)
          }
          ()
        }
        // same cadence contract as startTfIdf (see the comment there)
        if (refitEvery > 0 && (batchId + 1) % refitEvery == 0 &&
            modelDirty(sp, indexDir, W2vDirtyKey)) {
          w2vRefit(sp, indexDir, dim, opts)
          ()
        }
      }
      .start()
  }

  /** The re-fit barrier: fit idf over the merged corpus tokens, re-embed
    * EVERY document under the new model, rewrite artifact + model. After
    * this, the artifact equals a batch `runTfIdf` over the same files —
    * sidecars included.
    *
    * A re-fit changes the embedding SPACE wholesale: frozen centroids /
    * codebooks fit in the old space are invalid afterwards (every distance
    * `--ann` search would compute against them is against the wrong
    * geometry — not the documented gradual drift). So the barrier deletes
    * the sidecar dirs and re-fits them over the re-embedded corpus. Sidecar
    * shape comes from `opts` when set, else is carried over from what the
    * artifact already had (K clusters from `ann_centroids`, K codes from
    * the codebook), so an explicit barrier can never silently downgrade an
    * ANN-enabled index to exact-only. */
  def tfidfRefit(spark: SparkSession, indexDir: String, dim: Int,
      opts: IndexJob.Options = IndexJob.Options()): graft.embed.TfIdfEmbed.TfIdfModel = {
    var out: graft.embed.TfIdfEmbed.TfIdfModel = null
    refitRewrite(spark, indexDir, dim, opts, docs => {
      val (embedded, model) = graft.embed.TfIdfEmbed.fitTransform(docs, "tokens", dim)
      model.save(spark, s"$indexDir/tfidf_model")
      out = model
      (embedded, model.name)
    })
    out
  }

  /** [[tfidfRefit]]'s Word2Vec twin: re-train skip-gram vectors over the
    * merged corpus (sorted fit input, so the barrier result is
    * bit-identical to a batch [[IndexJob.runWord2Vec]] over the same
    * files), re-embed everything, rewrite artifact + model + sidecars. */
  def w2vRefit(spark: SparkSession, indexDir: String, dim: Int,
      opts: IndexJob.Options = IndexJob.Options()): graft.embed.Word2VecEmbed.W2vModel = {
    var out: graft.embed.Word2VecEmbed.W2vModel = null
    refitRewrite(spark, indexDir, dim, opts, docs => {
      val (embedded, model) = graft.embed.Word2VecEmbed.fitTransform(
        docs, "tokens", dim, sortCols = Seq("file_path", "line_start"))
      model.save(spark, s"$indexDir/w2v_model")
      out = model
      (embedded, model.name)
    })
    out
  }

  /** The model-agnostic rewrite tail of a re-fit barrier: materialize the
    * LIVE doc view (append segments included), run the model-specific
    * `fit` (re-embeds every doc and persists the model, returning the
    * embedded frame + model name), then rewrite the artifact with the
    * analyzer setting carried over and the ANN/PQ sidecars rebuilt in the
    * NEW embedding space (frozen old-space sidecars would be wholesale
    * invalid — see [[tfidfRefit]]'s scaladoc for the full contract). */
  private def refitRewrite(spark: SparkSession, indexDir: String, dim: Int,
      opts: IndexJob.Options,
      fit: org.apache.spark.sql.DataFrame => (org.apache.spark.sql.DataFrame, String)): Unit = {
    import graft.index.{AnnIndex, PqIndex}
    // the LIVE view (an append-mode watch may have pending segments whose
    // docs the refit must not lose), materialized before overwriting the
    // parquet dirs being read
    val loaded = graft.index.IndexData.load(spark, indexDir)
    // a refit rewrites settings wholesale — carry over which analyzer
    // produced the stored tokens (resetting it to the default would break
    // query-time resolution for a bigram/whitespace index)
    val analyzerName = loaded.setting("analyzer")
      .getOrElse(graft.analyze.Analyzers.DefaultName)
    val docs = loaded.documents
      .drop("embedding").localCheckpoint(true)
    val (embedded, modelName) = fit(docs)
    // carry over the existing sidecar shape before deleting (K rows / 8×K
    // rows — scalar-sized reads)
    val annK =
      if (opts.annClusters > 0) opts.annClusters
      else AnnIndex.load(spark, indexDir).map(_.numClusters).getOrElse(0)
    val pqK =
      if (opts.pqCodes > 0) opts.pqCodes
      else PqIndex.load(spark, indexDir)
        .map(_.codebooks.select("cid").distinct().count().toInt).getOrElse(0)
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(AnnIndex.CentroidsDir, AnnIndex.PostingsDir,
      PqIndex.CodebooksDir, PqIndex.CodesDir).foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(indexDir, d), true)
    }
    // staged atomic rewrite ([[graft.index.IndexData.writeStagedSwap]]):
    // the full re-embed folds any pending append segments into the
    // rewritten base (docs was the live view); the committed swap retires
    // seg/ atomically with that base — a crash mid-refit leaves the live
    // artifact (segments included) untouched instead of losing them
    val laidOut =
      if (opts.layout == "none") embedded
      else graft.ops.Layout.cluster(embedded, opts.layout, "file_path", "line_start", opts.layoutFiles)
    val written = graft.index.IndexData.writeStagedSwap(laidOut,
      IndexJob.settingsOf(spark, modelName, dim, analyzerName), indexDir,
      clusterById = opts.layout == "none")
    IndexJob.withPq(IndexJob.withAnn(written, indexDir, annK, opts.annIters),
      indexDir, pqK, opts.pqIters)
  }
}
