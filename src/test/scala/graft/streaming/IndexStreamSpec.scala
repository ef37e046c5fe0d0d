package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.embed.HashingEmbedder
import graft.index.{IndexData, IndexJob}

class IndexStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def write(dir: String, name: String, text: String): Unit =
    Files.writeString(Paths.get(dir, name), text)

  private def canonDocs(df: DataFrame) = {
    import org.apache.spark.sql.functions._
    df.select(col("doc_id"), col("file_path"), col("header_path"),
        col("line_start"), col("line_end"), col("content"))
      .collect().map(_.toSeq).toSet
  }

  test("drip-fed stream converges to the batch-built index") {
    val docs = Files.createTempDirectory("idxstream-docs").toString
    val streamIdx = Files.createTempDirectory("idxstream-s").toString + "/idx"
    val batchIdx = Files.createTempDirectory("idxstream-b").toString + "/idx"
    val embedder = new HashingEmbedder(dim = 16)

    write(docs, "a.md", "# Alpha\n\nspark merges sorted runs fast\n")
    val q = IndexStream.start(spark, docs, streamIdx, embedder)
    try {
      q.processAllAvailable()

      // first file indexed and searchable mid-stream
      val mid = IndexData.load(spark, streamIdx)
      assert(mid.documents.count() >= 1)

      // two more files arrive in a later micro-batch
      write(docs, "b.md", "# Beta\n\nvector cosine search embedding space\n\n## Sub\n\nmore body text\n")
      write(docs, "c.md", "plain text body with no headers at all\n")
      q.processAllAvailable()
    } finally q.stop() // a failed assertion must not leak the stream

    val streamed = IndexData.load(spark, streamIdx)
    val batch = IndexJob.run(spark, Seq(docs), batchIdx, new HashingEmbedder(dim = 16))

    // content-addressed ids ⇒ exact equality of the artifacts
    assert(canonDocs(streamed.documents) == canonDocs(batch.documents))
    assert(streamed.documents.count() == batch.documents.count())
    // derived BM25 stats agree too
    val sStats = streamed.stats.collect().map(_.toSeq).toSet
    val bStats = batch.stats.collect().map(_.toSeq).toSet
    assert(sStats == bStats)
  }

  test("append-mode watch: micro-batches land as segments, live view equals batch") {
    val docs = Files.createTempDirectory("idxstream-ap-docs").toString
    val streamIdx = Files.createTempDirectory("idxstream-ap-s").toString + "/idx"
    val batchIdx = Files.createTempDirectory("idxstream-ap-b").toString + "/idx"
    val embedder = new HashingEmbedder(dim = 16)
    val opts = IndexJob.Options(mergeMode = "append")

    write(docs, "a.md", "# Alpha\n\nspark merges sorted runs fast\n")
    val q = IndexStream.start(spark, docs, streamIdx, embedder, opts = opts)
    try {
      q.processAllAvailable()
      write(docs, "b.md", "# Beta\n\nvector cosine search embedding space\n")
      write(docs, "c.md", "plain text body with no headers at all\n")
      q.processAllAvailable()
    } finally q.stop()

    val streamed = IndexData.load(spark, streamIdx)
    // the first batch bootstrapped the base; later arrivals are segments
    assert(streamed.pendingSegments >= 1, s"segments: ${streamed.pendingSegments}")
    val batch = IndexJob.run(spark, Seq(docs), batchIdx, new HashingEmbedder(dim = 16))
    assert(canonDocs(streamed.documents) == canonDocs(batch.documents))
    assert(streamed.stats.collect().map(_.toSeq).toSet
      == batch.stats.collect().map(_.toSeq).toSet)
    // compaction folds the watch's segments into the canonical base
    val compacted = IndexJob.compact(spark, streamIdx)
    assert(compacted.pendingSegments == 0)
    assert(canonDocs(compacted.documents) == canonDocs(batch.documents))
  }

  test("append-mode watch with --compact-every folds segments automatically") {
    val docs = Files.createTempDirectory("idxstream-ce-docs").toString
    val streamIdx = Files.createTempDirectory("idxstream-ce-s").toString + "/idx"
    val embedder = new HashingEmbedder(dim = 16)
    val opts = IndexJob.Options(mergeMode = "append", compactEvery = 2)

    write(docs, "a.md", "# Alpha\n\nspark merges sorted runs fast\n")
    val q = IndexStream.start(spark, docs, streamIdx, embedder, opts = opts)
    try {
      q.processAllAvailable()
      write(docs, "b.md", "# Beta\n\nvector cosine search embedding space\n")
      q.processAllAvailable() // segment 1 — below the fold threshold
      write(docs, "c.md", "plain text body with no headers at all\n")
      q.processAllAvailable() // segment 2 — reaches it, the stream folds
    } finally q.stop()

    val streamed = IndexData.load(spark, streamIdx)
    assert(streamed.pendingSegments < 2,
      s"expected auto-fold at 2 segments, found ${streamed.pendingSegments} pending")
    val batch = IndexJob.run(spark, Seq(docs),
      Files.createTempDirectory("idxstream-ce-b").toString + "/idx",
      new HashingEmbedder(dim = 16))
    assert(canonDocs(streamed.documents) == canonDocs(batch.documents))
  }

  test("watched index with ANN sidecar: lists re-derive each batch, --ann finds new docs") {
    import org.apache.spark.sql.functions._
    val docs = Files.createTempDirectory("idxstream-ann-docs").toString
    val idxDir = Files.createTempDirectory("idxstream-ann-s").toString + "/idx"
    val embedder = new HashingEmbedder(dim = 16)

    write(docs, "a.md", "# Alpha\n\nspark merges sorted runs fast\n")
    val q = IndexStream.start(spark, docs, idxDir, embedder,
      opts = IndexJob.Options(annClusters = 2, annIters = 2))
    try {
      q.processAllAvailable()
      assert(IndexData.load(spark, idxDir).ann.isDefined) // built on batch 1
      write(docs, "b.md", "# Beta\n\nvector cosine search embedding space\n")
      q.processAllAvailable()
    } finally q.stop()

    val idx = IndexData.load(spark, idxDir)
    val ann = idx.ann.getOrElse(fail("ann sidecar missing"))
    // frozen-centroid re-assignment covered the batch-2 doc: every merged
    // document is in exactly one inverted list
    assert(ann.postings.count() == idx.documents.count())
    // and --ann search (probing ALL clusters) can reach the new doc
    val hits = graft.search.HybridSearch.search(idx, "vector cosine",
      embedder = Some(embedder),
      opts = graft.search.HybridSearch.Options(k = 3, rerank = false,
        annNprobe = ann.numClusters))
      .select("file_path").collect().map(_.getString(0))
    assert(hits.exists(_.endsWith("b.md")), hits.mkString(","))
    // the drift contract rides the same mergeAndWrite path: every watched
    // micro-batch re-measures staleness against the fit-time baseline
    assert(idx.setting(graft.index.AnnIndex.FitMeanDistKey).isDefined)
    assert(idx.setting(graft.index.AnnIndex.DriftKey).isDefined)
  }

  test("tfidf watch: frozen-model deltas, re-fit barrier restores batch equality") {
    import org.apache.spark.sql.functions._
    val docs = Files.createTempDirectory("idxstream-tf-docs").toString
    val streamIdx = Files.createTempDirectory("idxstream-tf-s").toString + "/idx"
    val batchIdx = Files.createTempDirectory("idxstream-tf-b").toString + "/idx"
    val dim = 32

    write(docs, "a.md", "# Alpha\n\nspark merges sorted runs fast\n")
    // refitEvery = 0: no automatic re-fit, so the second batch demonstrably
    // embeds under the FROZEN bootstrap model before the explicit barrier
    val q = IndexStream.startTfIdf(spark, docs, streamIdx, dim, refitEvery = 0)
    try {
      q.processAllAvailable()
      assert(IndexData.load(spark, streamIdx).documents.count() >= 1)
      write(docs, "b.md", "# Beta\n\nvector cosine search embedding space\n")
      write(docs, "c.md", "plain spark text body with cosine vector terms\n")
      q.processAllAvailable()
    } finally q.stop()

    // before the barrier: b/c docs carry the bootstrap model's (stale) idf —
    // the documented contract, not an accident. The barrier re-fits over the
    // merged corpus and re-embeds everything.
    IndexStream.tfidfRefit(spark, streamIdx, dim)

    val streamed = IndexData.load(spark, streamIdx)
    val batch = IndexJob.runTfIdf(spark, Seq(docs), batchIdx, dim)

    assert(canonDocs(streamed.documents) == canonDocs(batch.documents))
    // embeddings must be bit-identical after the barrier: both sides are
    // one fitTransform over the same (content-addressed) corpus
    def embs(df: DataFrame) = df
      .select(col("doc_id"), col("embedding"))
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(embs(streamed.documents) == embs(batch.documents))
    // and the persisted models agree
    val sm = graft.embed.TfIdfEmbed.load(spark, s"$streamIdx/tfidf_model")
    val bm = graft.embed.TfIdfEmbed.load(spark, s"$batchIdx/tfidf_model")
    assert(sm.dim == bm.dim && sm.idf.toSeq == bm.idf.toSeq)
    // the analyzer setting survives both the watch merges and the refit
    // barrier (a refit rewrites settings wholesale; losing the analyzer
    // would break query-time token resolution)
    assert(streamed.setting("analyzer").contains("default"))
    assert(batch.setting("analyzer").contains("default"))
  }

  test("word2vec watch: frozen-model deltas, re-fit barrier restores batch equality") {
    import org.apache.spark.sql.functions._
    val docs = Files.createTempDirectory("idxstream-w2v-docs").toString
    val streamIdx = Files.createTempDirectory("idxstream-w2v-s").toString + "/idx"
    val batchIdx = Files.createTempDirectory("idxstream-w2v-b").toString + "/idx"
    val dim = 16

    write(docs, "a.md", "# Alpha\n\nspark merges sorted runs fast\n")
    val q = IndexStream.startWord2Vec(spark, docs, streamIdx, dim, refitEvery = 0)
    try {
      q.processAllAvailable()
      assert(IndexData.load(spark, streamIdx).documents.count() >= 1)
      write(docs, "b.md", "# Beta\n\nvector cosine search embedding space\n")
      q.processAllAvailable()
      // frozen-model interval: the dirty marker is set, and b.md's tokens
      // (all OOV to the bootstrap vocab) embed to the zero vector — the
      // documented staleness, not an accident
      val interim = IndexData.load(spark, streamIdx)
      assert(interim.setting(IndexStream.W2vDirtyKey).contains("true"))
    } finally q.stop()

    IndexStream.w2vRefit(spark, streamIdx, dim)

    val streamed = IndexData.load(spark, streamIdx)
    val batch = IndexJob.runWord2Vec(spark, Seq(docs), batchIdx, dim)
    assert(canonDocs(streamed.documents) == canonDocs(batch.documents))
    // bit-identical embeddings after the barrier: both sides are one
    // deterministic sorted-input fit over the same content-addressed corpus
    def embs(df: DataFrame) = df
      .select(col("doc_id"), col("embedding"))
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(embs(streamed.documents) == embs(batch.documents))
    // persisted word vectors agree, and the dirty marker is gone
    val sm = graft.embed.Word2VecEmbed.load(spark, s"$streamIdx/w2v_model")
    val bm = graft.embed.Word2VecEmbed.load(spark, s"$batchIdx/w2v_model")
    assert(sm.dim == bm.dim && sm.vectors.keySet == bm.vectors.keySet)
    sm.vectors.foreach { case (w, v) => assert(bm.vectors(w).toSeq == v.toSeq) }
    assert(streamed.setting(IndexStream.W2vDirtyKey).isEmpty)
    assert(streamed.setting("embedding_model").contains(s"w2v-$dim"))
  }

  test("tfidf refit barrier rebuilds ANN/PQ sidecars in the NEW embedding space") {
    import org.apache.spark.sql.functions._
    val docs = Files.createTempDirectory("idxstream-tfann-docs").toString
    val streamIdx = Files.createTempDirectory("idxstream-tfann-s").toString + "/idx"
    val batchIdx = Files.createTempDirectory("idxstream-tfann-b").toString + "/idx"
    val dim = 32
    val opts = IndexJob.Options(annClusters = 2, annIters = 2, pqCodes = 4, pqIters = 2)

    write(docs, "a.md", "# Alpha\n\nspark merges sorted runs fast\n")
    val q = IndexStream.startTfIdf(spark, docs, streamIdx, dim, opts = opts, refitEvery = 0)
    try {
      q.processAllAvailable()
      write(docs, "b.md", "# Beta\n\nvector cosine search embedding space\n")
      write(docs, "c.md", "plain spark text body with cosine vector terms\n")
      write(docs, "d.md", "# Delta\n\nhybrid ranking fuses lexical and dense scores\n")
      q.processAllAvailable()
    } finally q.stop()

    // explicit barrier with the watch opts: sidecars re-fit at the requested
    // shape in the new space (the bootstrap batch had 1 doc, so the streamed
    // sidecar could only seed 1 centroid — the refit over the 3-doc merged
    // corpus reaches the full K=2)
    IndexStream.tfidfRefit(spark, streamIdx, dim, opts)

    val streamed = IndexData.load(spark, streamIdx)
    val ann = streamed.ann.getOrElse(fail("ann sidecar missing after refit"))
    val pq = streamed.pq.getOrElse(fail("pq sidecar missing after refit"))
    assert(ann.numClusters == 2)
    assert(pq.codebooks.select("cid").distinct().count() == 4)
    // sidecar vectors live in the NEW space: every posting's embedding is
    // bit-identical to the re-embedded document it indexes
    val docEmb = streamed.documents.select(col("doc_id"), col("embedding"))
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    val postEmb = ann.postings.select(col("doc_id"), col("embedding"))
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(postEmb == docEmb) // stale old-space postings would differ
    // and the barrier equals a batch runTfIdf with the same sidecar opts —
    // deterministic fits over an identical corpus give identical sidecars
    val batch = IndexJob.runTfIdf(spark, Seq(docs), batchIdx, dim, opts = opts)
    val bAnn = batch.ann.getOrElse(fail("batch ann sidecar missing"))
    def cents(a: graft.index.AnnIndex) = a.centroids.collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    assert(cents(ann) == cents(bAnn))
    def books(p: graft.index.PqIndex) = p.codebooks.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[Float](2)).toMap
    assert(books(pq) == books(batch.pq.getOrElse(fail("batch pq missing"))))

    // a later barrier WITHOUT explicit sidecar opts carries the shape over
    // from the artifact — a refit can never silently downgrade an
    // ANN-enabled index to exact-only
    IndexStream.tfidfRefit(spark, streamIdx, dim)
    val again = IndexData.load(spark, streamIdx)
    assert(again.ann.map(_.numClusters).contains(2))
    assert(again.pq.map(_.codebooks.select("cid").distinct().count()).contains(4L))
  }

  test("tfidf auto-refit: dirty marker set by frozen merges, cleared by the refit") {
    import org.apache.spark.sql.functions._
    val docs = Files.createTempDirectory("idxstream-dirty-docs").toString
    val streamIdx = Files.createTempDirectory("idxstream-dirty-s").toString + "/idx"
    val batchIdx = Files.createTempDirectory("idxstream-dirty-b").toString + "/idx"
    val dim = 32

    def dirty(): Option[String] =
      IndexData.load(spark, streamIdx).setting(IndexStream.TfIdfDirtyKey)

    // refitEvery = 0 first, to observe the marker between merges
    write(docs, "a.md", "# Alpha\n\nspark merges sorted runs fast\n")
    val q0 = IndexStream.startTfIdf(spark, docs, streamIdx, dim, refitEvery = 0)
    try {
      q0.processAllAvailable()
      // bootstrap fit IS the corpus fit: clean
      assert(dirty().isEmpty, s"bootstrap must not mark dirty: ${dirty()}")
      write(docs, "b.md", "# Beta\n\nvector cosine search embedding space\n")
      q0.processAllAvailable()
      // frozen-model merge: unrefitted data present
      assert(dirty().contains("true"), s"frozen merge must mark dirty: ${dirty()}")
    } finally q0.stop()

    // the explicit barrier clears the marker (settings rewrite drops it)
    IndexStream.tfidfRefit(spark, streamIdx, dim)
    assert(dirty().isEmpty, s"refit must clear the marker: ${dirty()}")

    // refitEvery = 1: every stride boundary checks the marker, so after
    // draining a new-file batch the artifact must equal a batch runTfIdf
    // over the same files — the auto-refit actually fired
    write(docs, "c.md", "plain spark text body with cosine vector terms\n")
    val q1 = IndexStream.startTfIdf(spark, docs, streamIdx, dim, refitEvery = 1)
    try q1.processAllAvailable() finally q1.stop()
    assert(dirty().isEmpty, s"auto-refit must clear the marker: ${dirty()}")
    val streamed = IndexData.load(spark, streamIdx)
    val batch = IndexJob.runTfIdf(spark, Seq(docs), batchIdx, dim)
    def embs(df: DataFrame) = df.select(col("doc_id"), col("embedding"))
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(embs(streamed.documents) == embs(batch.documents))
  }

  test("jsonl row-corpus watch: drops fold in; a re-shipped doc_id upserts") {
    import org.apache.spark.sql.functions.col
    val drops = Files.createTempDirectory("idxstream-jsonl").toString
    val idx = Files.createTempDirectory("idxstream-jidx").toString + "/idx"
    val embedder = new HashingEmbedder(dim = 16)

    write(drops, "drop1.jsonl",
      """{"doc_id": 1, "text": "alpha beta original content", "source": "web/a"}
        |{"doc_id": 2, "text": "gamma delta second doc"}
        |""".stripMargin)
    val q = IndexStream.startRows(spark, drops, idx, embedder)
    try {
      q.processAllAvailable()
      val v1 = IndexData.load(spark, idx)
      assert(v1.documents.count() == 2)

      // second drop: new doc 3, and doc 1 re-shipped with NEW text — the
      // path-keyed merge must REPLACE it (per-doc upsert across drops)
      write(drops, "drop2.jsonl",
        """{"doc_id": 1, "text": "alpha beta REVISED content", "source": "web/a"}
          |{"doc_id": 3, "text": "epsilon zeta third doc"}
          |""".stripMargin)
      q.processAllAvailable()
    } finally q.stop()

    val v2 = IndexData.load(spark, idx)
    assert(v2.documents.count() == 3)
    val byPath = v2.documents.collect()
      .map(r => r.getAs[String]("file_path") -> r.getAs[String]("content")).toMap
    assert(byPath("web/a:1").contains("REVISED"))
    assert(byPath.keySet == Set("web/a:1", "doc:2", "doc:3"))
    // stats rebuilt over the merged corpus, not the last batch
    assert(v2.stats.select(col("n_docs")).head().getLong(0) == 3L)
  }

  test("jsonl watch: re-shipped doc_id in the SAME micro-batch — latest drop file wins") {
    // a backlog at stream start lands multiple drops in one batch; the
    // path-keyed merge only replaces ACROSS batches, so the foreachBatch
    // dedup must resolve within it (max file path = latest drop)
    val drops = Files.createTempDirectory("idxstream-jb").toString
    val idx = Files.createTempDirectory("idxstream-jbidx").toString + "/idx"
    write(drops, "drop1.jsonl",
      """{"doc_id": 7, "text": "version one of the doc"}
        |{"doc_id": 8, "text": "untouched sibling doc"}
        |""".stripMargin)
    write(drops, "drop2.jsonl",
      """{"doc_id": 7, "text": "version two wins here"}
        |""".stripMargin)
    val q = IndexStream.startRows(spark, drops, idx, new HashingEmbedder(16))
    try q.processAllAvailable() finally q.stop()
    val docs = IndexData.load(spark, idx).documents.collect()
      .map(r => r.getAs[String]("file_path") -> r.getAs[String]("content")).toMap
    assert(docs.size == 2, docs.keySet)
    assert(docs("doc:7").contains("version two"))
  }

  test("same-batch dedup orders by file MTIME, not name; malformed rows cannot shadow valid ones") {
    // two adversarial backlog shapes in one batch:
    //  - name order contradicts arrival order ('drop10.jsonl' < 'drop9.jsonl'
    //    lexicographically, but drop10 is the NEWER file) — the winner must
    //    follow modification time, or a restart backlog indexes stale text;
    //  - the newest file re-ships a doc as a PERMISSIVE-nulled malformed row
    //    (null text) — it must not shadow the older VALID row, or the doc
    //    silently never indexes.
    val drops = Files.createTempDirectory("idxstream-jm").toString
    val idx = Files.createTempDirectory("idxstream-jmidx").toString + "/idx"
    write(drops, "drop9.jsonl",
      """{"doc_id": 7, "text": "stale version from drop nine"}
        |{"doc_id": 8, "text": "valid text for doc eight"}
        |""".stripMargin)
    write(drops, "drop10.jsonl",
      """{"doc_id": 7, "text": "fresh version from drop ten"}
        |{"doc_id": 8, "text": null}
        |""".stripMargin)
    // pin arrival order explicitly: drop9 is a minute older than drop10
    import java.nio.file.attribute.FileTime
    val now = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(drops, "drop10.jsonl")).toMillis
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(drops, "drop9.jsonl"), FileTime.fromMillis(now - 60000))
    val q = IndexStream.startRows(spark, drops, idx, new HashingEmbedder(16))
    try q.processAllAvailable() finally q.stop()
    val docs = IndexData.load(spark, idx).documents.collect()
      .map(r => r.getAs[String]("file_path") -> r.getAs[String]("content")).toMap
    assert(docs.size == 2, docs.keySet)
    assert(docs("doc:7").contains("fresh version"), docs("doc:7"))
    assert(docs("doc:8").contains("valid text"), docs("doc:8"))
  }

  test("equal mtimes: the SHORTLEX path tiebreak keeps drop10 over drop9") {
    // tar/rsync-extracted backlogs preserve identical mtimes; a plain-lex
    // tiebreak would pick 'drop9.jsonl' > 'drop10.jsonl' and resurrect the
    // stale version. Shortlex (length, then lex) orders numbered sequences
    // correctly across digit-count boundaries.
    val drops = Files.createTempDirectory("idxstream-tie").toString
    val idx = Files.createTempDirectory("idxstream-tieidx").toString + "/idx"
    write(drops, "drop9.jsonl",
      """{"doc_id": 7, "text": "stale version from drop nine"}
        |""".stripMargin)
    write(drops, "drop10.jsonl",
      """{"doc_id": 7, "text": "fresh version from drop ten"}
        |""".stripMargin)
    import java.nio.file.attribute.FileTime
    val t = FileTime.fromMillis(1700000000000L)
    Seq("drop9.jsonl", "drop10.jsonl").foreach { f =>
      java.nio.file.Files.setLastModifiedTime(java.nio.file.Paths.get(drops, f), t)
    }
    val q = IndexStream.startRows(spark, drops, idx, new HashingEmbedder(16))
    try q.processAllAvailable() finally q.stop()
    val content = IndexData.load(spark, idx).documents.collect()
      .map(_.getAs[String]("content")).mkString
    assert(content.contains("fresh version"), content)
  }

  test("equal mtimes across NESTED drop dirs: the shortlex tiebreak ranks the " +
      "BASENAME, not the full path (round-11 ADVICE)") {
    // recursiveFileLookup is on, so drops can land at different depths. A
    // full-path shortlex would rank by directory depth — here the STALE
    // drop9 sits deeper, so path-length order would pick it. The basename
    // tiebreak must still pick drop10.
    val drops = Files.createTempDirectory("idxstream-nest").toString
    val idx = Files.createTempDirectory("idxstream-nestidx").toString + "/idx"
    Files.createDirectories(Paths.get(drops, "deep", "nested", "backlog"))
    write(drops, "drop10.jsonl",
      """{"doc_id": 7, "text": "fresh version from drop ten"}
        |""".stripMargin)
    write(s"$drops/deep/nested/backlog", "drop9.jsonl",
      """{"doc_id": 7, "text": "stale version from drop nine"}
        |""".stripMargin)
    import java.nio.file.attribute.FileTime
    val t = FileTime.fromMillis(1700000000000L)
    Seq(Paths.get(drops, "drop10.jsonl"),
        Paths.get(drops, "deep", "nested", "backlog", "drop9.jsonl"))
      .foreach(java.nio.file.Files.setLastModifiedTime(_, t))
    val q = IndexStream.startRows(spark, drops, idx, new HashingEmbedder(16))
    try q.processAllAvailable() finally q.stop()
    val content = IndexData.load(spark, idx).documents.collect()
      .map(_.getAs[String]("content")).mkString
    assert(content.contains("fresh version"), content)
  }
}
