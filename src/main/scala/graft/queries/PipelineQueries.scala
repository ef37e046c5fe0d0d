package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.queries.Q.t

/** The training-data-pipeline surface (BASELINE.json north star): dedup
  * (exact / MinHash+LSH / SimHash / n-gram Jaccard / embedding near-dup),
  * similarity search (brute-force, IVF, sign-LSH), text analysis, multimodal
  * plumbing, windowed/event analytics.
  */
object PipelineQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Q.docsTokens(s, d)

  /** Spread-scan tokenization for the shingle/minhash/gram pipelines —
    * call sites chosen by bench measurement (see Q.tSpread scaladoc). */
  private def docsSpread(s: SparkSession, d: String): DataFrame =
    Q.docsTokensSpread(s, d)

  /** events with ts as epoch-nanos long (Spark has no nanosecond timestamp;
    * the oracle mirrors with `epoch_ns(ts)`). */
  private def events(s: SparkSession, d: String): DataFrame = Q.events(s, d)

  private val HourNs = 3600000000000L

  /** Uncapped (doc_id, band, bucket) membership rows — the input both
    * oversized-bucket policies (cap, sub-split) draw from. */
  private def rawBands(tokenized: DataFrame,
      portable: Boolean = true): DataFrame = {
    val sig = Dedup.withMinhashSignature(
      tokenized.filter(size(col("tokens")) >= 3), "tokens", portable)
    sig.select(col("doc_id"), explode(array(
      struct(lit(0).as("band"), col("band0").as("bucket")),
      struct(lit(1).as("band"), col("band1").as("bucket")))).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** [[rawBands]] with the batch bucket-density guard applied: membership
    * per (band, bucket) capped at `maxPerBucket` in ascending-id order
    * ([[Dedup.MaxPerBucket]]'s recall contract — the streaming
    * `maxPerBucket` brought to batch, so Σ n_b² in-bucket pair growth stays
    * bounded on boilerplate-dense corpora). The symmetric-pair consumers
    * (pairs, curate chain) draw from this frame; the oracle's
    * [[minhashBandsCtes]] applies the identical cap as `bands`. The
    * incremental screen caps only its EXISTING side (a screened doc is
    * never dropped). */
  private[graft] def minhashBands(tokenized: DataFrame,
      maxPerBucket: Int = Dedup.MaxPerBucket,
      portable: Boolean = true): DataFrame =
    Dedup.capBuckets(rawBands(tokenized, portable), "doc_id",
      Seq("band", "bucket"), maxPerBucket)

  /** LSH candidate pairs (doc_a < doc_b) of an already-tokenized
    * (doc_id, tokens) frame, formed ONLY inside a band bucket — never an
    * all-pairs join, and never more than C(C−1)/2 pairs per bucket (the
    * [[minhashBands]] density guard). DataFrame-parameterized so the
    * oracle-checked queries and the curate CLI chain run the ONE
    * implementation. */
  private[graft] def minhashPairsOf(tokenized: DataFrame,
      maxPerBucket: Int = Dedup.MaxPerBucket,
      portable: Boolean = true): DataFrame =
    // single-pipeline candidate stage (guide §2.4 "remove shuffles
    // outright"): the old bands self-join executed the signature pipeline
    // twice (broadcast build side — no exchange reuse); inBucketPairs
    // derives the same pair set from ONE pipeline, map-side
    Dedup.inBucketPairs(
      minhashBands(tokenized, maxPerBucket, portable), "doc_id",
      Seq("band", "bucket"))

  /** [[minhashPairsOf]] verified with exact Jaccard (rounded) over distinct
    * shingle sets. The exact `array_intersect` over two ~L-element shingle
    * sets is the same CPU-dense per-pair class as the Levenshtein verify,
    * so the kernel input spreads via [[Dedup.spreadForKernel]].
    * `bucketPolicy` selects the oversized-bucket candidate stage: `cap`
    * ([[minhashPairsOf]], the default) or `subsplit`
    * ([[minhashSubsplitPairsOf]]). */
  private[graft] def minhashVerifiedPairsOf(tokenized: DataFrame,
      bucketPolicy: String = "cap",
      portable: Boolean = true): DataFrame = {
    val pairs = bucketPolicy match {
      case "cap"      => minhashPairsOf(tokenized, portable = portable)
      case "subsplit" => minhashSubsplitPairsOf(tokenized, portable = portable)
      case other => sys.error(s"unknown bucket policy '$other' (expected cap or subsplit)")
    }
    val shingleSets = tokenized.filter(size(col("tokens")) >= 3)
      .select(col("doc_id"), Dedup.distinctShingles(col("tokens")).as("ds"))
    // spread the SKINNY pairs, attach arrays after: the kernel inherits
    // its parallelism from the pair exchange (if the pairs stream) or from
    // the spread scan (if they broadcast), and the ds-array-laden frame
    // never takes an extra exchange — the round-20 attach→spread order
    // re-shuffled the attached arrays through the kernel repartition
    // (measured: the dense containment case moved ~300k pairs × two
    // ~52-element string arrays through that exchange)
    Dedup.spreadForKernel(pairs)
      .join(shingleSets.select(col("doc_id").as("doc_a"), col("ds").as("dsa")), Seq("doc_a"))
      .join(shingleSets.select(col("doc_id").as("doc_b"), col("ds").as("dsb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(Dedup.jaccardSorted(col("dsa"), col("dsb")), 6).as("jaccard"))
  }

  /** LSH candidate pairs under the SUB-SPLIT oversized-bucket policy
    * ([[Dedup.subSplitBuckets]]): every banded doc keeps forming pairs, but
    * only inside its ⌈n/C⌉-way block — pairs per bucket grow linearly in
    * bucket size instead of quadratically, with no membership loss (the
    * cap's trade-off inverted; see the policy scaladoc). */
  private[graft] def minhashSubsplitPairsOf(tokenized: DataFrame,
      maxPerBucket: Int = Dedup.MaxPerBucket,
      portable: Boolean = true): DataFrame =
    // same single-pipeline swap as [[minhashPairsOf]]; the sub-split block
    // id joins the bucket key, and per-(bucket, sub) membership is ≤ C by
    // construction, so the collected member arrays stay bounded
    Dedup.inBucketPairs(
      Dedup.subSplitBuckets(
        rawBands(tokenized, portable), "doc_id", Seq("band", "bucket"), maxPerBucket),
      "doc_id", Seq("band", "bucket", "_sub"))

  /** Incremental dedup screen: every doc with id ≥ `newFrom` is screened
    * against the existing corpus (id < `newFrom`) through the shared LSH
    * bands. The density cap applies ONLY to the EXISTING side — it bounds
    * per-new-doc work at ≤C old candidates per band, but a doc being
    * screened must never itself be capped out of its bucket: a joint cap
    * would report is_dup=false for a genuine duplicate of an oversized
    * boilerplate family, the exact corpus shape the cap targets
    * (OpsSpec pins the regression). */
  private[graft] def incrementalScreen(tokenized: DataFrame, newFrom: Long,
      maxPerBucket: Int = Dedup.MaxPerBucket): DataFrame = {
    val base = tokenized.filter(size(col("tokens")) >= 3)
    // ONE banding pipeline for both sides (round 21): the old formulation
    // derived `oldBands` and the new-side probe from two separate rawBands
    // subtrees — two full scan+signature passes with only the cap window's
    // exchange reusable. Both sides now branch off the SAME windowed frame:
    // old ids sort before `newFrom`, so for an old row the bucket-wide
    // row_number IS its rank among old rows and `_bn <= cap` reproduces the
    // old-only cap exactly (the oracle comment's identity). The old side
    // collapses to a bounded member array per bucket (cap ≤ C) and the new
    // side stays row-level, so the bucket join explodes ≤ C old candidates
    // per new-doc row — the same per-new-doc work bound as before, one
    // pipeline instead of two.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket")).orderBy(col("doc_id").asc)
    val withRn = rawBands(tokenized).withColumn("_bn", row_number().over(w))
    val oldArr = withRn
      .filter(col("doc_id") < newFrom && col("_bn") <= maxPerBucket)
      .groupBy("band", "bucket")
      .agg(collect_list(col("doc_id")).as("_olds"))
    val pairs = withRn.filter(col("doc_id") >= newFrom)
      .join(oldArr, Seq("band", "bucket"))
      .select(col("doc_id").as("new_id"), explode(col("_olds")).as("old_id"))
      .distinct()
    val shingleSets = base
      .select(col("doc_id"), Dedup.distinctShingles(col("tokens")).as("ds"))
    val verified = Dedup.spreadForKernel(pairs)
      .join(shingleSets.select(col("doc_id").as("new_id"), col("ds").as("dsn")), Seq("new_id"))
      .join(shingleSets.select(col("doc_id").as("old_id"), col("ds").as("dso")), Seq("old_id"))
      .select(col("new_id"), col("old_id"),
        round(Dedup.jaccardSorted(col("dsn"), col("dso")), 6).as("j"))
      .filter(col("j") >= 0.3)
    val best = verified.groupBy("new_id")
      .agg(count(lit(1)).as("nm"),
        min(struct((-col("j")).as("nj"), col("old_id").as("a"))).as("best"))
    base.filter(col("doc_id") >= newFrom).select(col("doc_id").as("new_id"))
      .join(best, Seq("new_id"), "left")
      .select(col("new_id").as("doc_id"),
        coalesce(col("nm"), lit(0L)).as("n_matches"),
        col("best.a").as("best_match"),
        Q.r6(-col("best.nj")).as("best_jaccard"),
        col("nm").isNotNull.as("is_dup"))
      .orderBy("doc_id")
  }

  /** Candidate pairs under the CONTAINMENT-calibrated band layout
    * ([[Dedup.containmentBands]], the LSH Ensemble (b=8, r=1) swap): same
    * cap policy, same in-bucket-only pair join — only the band layout
    * differs from [[minhashPairsOf]]. Any 4-row-band collision implies 4
    * single-row collisions, so this candidate set is a SUPERSET of the
    * jaccard layout's (before capping); the new pairs are exactly the
    * low-jaccard/high-containment ones. */
  private[graft] def containmentBandPairsOf(tokenized: DataFrame,
      maxPerBucket: Int = Dedup.MaxPerBucket,
      portable: Boolean = true): DataFrame = {
    val sig = Dedup.withMinhashSignature(
      tokenized.filter(size(col("tokens")) >= 3), "tokens", portable)
    // single-pipeline candidate stage, as [[minhashPairsOf]]
    Dedup.inBucketPairs(
      Dedup.capBuckets(
        Dedup.containmentBands(sig), "doc_id", Seq("band", "bucket"), maxPerBucket),
      "doc_id", Seq("band", "bucket"))
  }

  /** LSH candidate pairs over the documents corpus (query-surface shape). */
  private[queries] def minhashCandidatePairs(s: SparkSession, d: String): DataFrame =
    minhashPairsOf(docsSpread(s, d))

  private def minhashVerifiedPairs(s: SparkSession, d: String): DataFrame =
    minhashVerifiedPairsOf(docsSpread(s, d))

  /** Session-scoped materialize-once of the shared cluster-resolution
    * prefix: verified pairs → jaccard ≥ 0.5 edges → connected components.
    * Three declared queries (canonical pick, keep-longest, cluster-safe
    * split) consume the IDENTICAL components frame; re-deriving the LSH
    * pair machinery per consumer is exactly what a production engine would
    * not do (the curate chain already materializes once via localCheckpoint
    * — this extends the same rule to the query surface). Keyed by
    * (application, sfDir, corpus fingerprint) — the fingerprint is a
    * driver-side listing hash of the documents parquet (names + lengths +
    * mtimes, no data scan), so a corpus regenerated IN PLACE invalidates
    * the memo instead of silently serving stale components (round-9
    * ADVICE); a new session or different corpus recomputes as before. The
    * map is bounded: beyond [[MaxMemoEntries]] the eldest entry is evicted
    * and its checkpoint blocks freed, so a long-lived session touching many
    * corpora cannot pin unbounded storage. Determinism: the cached frame is
    * the same deterministic computation every consumer ran before, so
    * oracle results are unchanged. */
  private val componentsMemo =
    new java.util.LinkedHashMap[String, DataFrame]()

  private val MaxMemoEntries = 4

  /** Listing fingerprint of `d`'s documents table: per-file name, length
    * and modification time, MD5'd. Pure driver-side metadata — at 100 TB
    * this is one namenode listing, never a data pass. */
  private def corpusFingerprint(s: SparkSession, d: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$d/documents.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val stats =
      if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
      else Seq(fs.getFileStatus(p))
    val listing = stats.sortBy(_.getPath.toString)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .mkString(",")
    java.security.MessageDigest.getInstance("MD5")
      .digest(listing.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  private def componentsOf(s: SparkSession, d: String): DataFrame = {
    val key = s.sparkContext.applicationId + "|" + d + "|" + corpusFingerprint(s, d)
    componentsMemo.synchronized {
      Option(componentsMemo.get(key)).getOrElse {
        val edges = minhashVerifiedPairs(s, d).filter(col("jaccard") >= 0.5)
        val nodes = t(s, d, "documents").select(col("doc_id"))
        val comp = graft.ops.Components.connectedComponents(
          nodes, "doc_id", edges, "doc_a", "doc_b").localCheckpoint(true)
        componentsMemo.put(key, comp)
        if (componentsMemo.size > MaxMemoEntries) {
          val it = componentsMemo.entrySet().iterator()
          val eldest = it.next()
          // CAUTION for long-lived sessions: unpersisting frees the evicted
          // frame's checkpoint blocks, and localCheckpoint truncated its
          // lineage — a caller still HOLDING a trio DataFrame for the
          // evicted corpus cannot execute it afterwards. Holding a result
          // across > MaxMemoEntries other corpora means collecting it
          // first; the alternative (skip the unpersist) leaks checkpoint
          // storage without bound, which is worse for the long-lived case
          // the bound exists to protect.
          try eldest.getValue.unpersist(blocking = false)
          catch { case _: Throwable => () }
          it.remove()
        }
        comp
      }
    }
  }

  /** Evict every memoized components frame and free its checkpoint blocks.
    * Bench calls this before each timed pass so the one-time prefix build
    * is re-paid (and separately timed) per pass instead of hiding behind
    * min-of-passes warmth (round-9 ADVICE); long-lived library sessions can
    * call it to release storage. */
  def clearComponentsMemo(): Unit = componentsMemo.synchronized {
    componentsMemo.values().forEach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    componentsMemo.clear()
  }

  /** Materialize the shared cluster-resolution prefix for `d` NOW (the
    * memoized eager localCheckpoint), so callers that want the one-time
    * build cost measured where it's spent — Bench's
    * `infra_components_build` lane — can trigger and time it explicitly
    * rather than letting it land inside whichever trio query runs first. */
  def prebuildComponents(s: SparkSession, d: String): Unit = {
    componentsOf(s, d); ()
  }

  /** Oracle CTE prefix shared by every MinHash-LSH query: tokenize →
    * shingle sets → signatures → exploded `bands(doc_id, band, bucket)`,
    * with the SAME per-(band,bucket) membership cap as [[minhashBands]] —
    * the density guard is operator semantics, so the oracle reproduces it
    * row-for-row rather than diffing against an uncapped candidate set. */
  private[queries] val minhashBandsCtes: String = {
    val sh = Dedup.shinglesSql("toks")
    val hs = s"list_transform($sh, s -> ${Dedup.tokHashSql("s")})"
    val mhs = (0 until Dedup.NumHashes).map(j => s"${Dedup.minhashSql("hs", j)} AS mh$j")
    s"${Q.toksCte}, " +
      s"shc AS (SELECT doc_id, list_distinct($sh) AS ds, $hs AS hs FROM toks WHERE len(toks) >= 3), " +
      s"mh AS (SELECT doc_id, ${mhs.mkString(", ")} FROM shc), " +
      s"bands0 AS (SELECT doc_id, 0 AS band, ${Dedup.bandBucketSql((0 until 8).map(j => s"mh$j"), 0)} AS bucket FROM mh " +
      s"UNION ALL SELECT doc_id, 1, ${Dedup.bandBucketSql((0 until 8).map(j => s"mh$j"), 1)} FROM mh), " +
      "bands AS (SELECT doc_id, band, bucket FROM (SELECT doc_id, band, bucket, " +
      "row_number() OVER (PARTITION BY band, bucket ORDER BY doc_id) AS bn FROM bands0) " +
      s"WHERE bn <= ${Dedup.MaxPerBucket})"
  }

  /** Oracle mirror of [[minhashCandidatePairs]]: CTE chain ending in
    * `pairs(doc_a, doc_b)`. */
  private[queries] val minhashCandCtes: String =
    s"$minhashBandsCtes, " +
      "pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a JOIN bands b " +
      "ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)"

  /** Oracle mirror of [[minhashVerifiedPairs]]: CTE chain ending in
    * `verified(doc_a, doc_b, jaccard)`. */
  private[queries] val minhashPairsCtes: String =
    s"$minhashCandCtes, " +
      "verified AS (SELECT doc_a, doc_b, " +
      s"round(${Dedup.jaccardSql("sa.ds", "sb.ds")}, 6) AS jaccard " +
      "FROM pairs JOIN shc sa ON pairs.doc_a = sa.doc_id JOIN shc sb ON pairs.doc_b = sb.doc_id)"

  /** The quality-gate verdict as a pure projection over (doc_id, tokens) —
    * no window, no sort, no aggregate, which makes it streaming-safe
    * unchanged: the SAME function serves the batch query and `readStream`
    * inputs (asserted batch-equal in CurationStreamSpec). */
  private[graft] def qualityGate(tokenized: DataFrame): DataFrame = {
    val base = tokenized.filter(size(col("tokens")) >= 3)
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
      .withColumn("stop_ratio",
        TextAnalysis.stopwordCount(col("tokens")).cast("double") /
          col("n_tokens").cast("double"))
      .withColumn("quality",
        Q.r6(TextAnalysis.qualityScore(col("n_tokens"), col("stop_ratio"))))
      .withColumn("sh", Dedup.shingles(col("tokens")))
      .withColumn("rep_ratio", Q.r6(lit(1.0) -
        size(array_distinct(col("sh"))).cast("double") /
          size(col("sh")).cast("double")))
    base.select(col("doc_id"), col("n_tokens"), col("quality"), col("rep_ratio"),
        when(col("n_tokens") < 20, "too_short")
          .when(col("quality") < 0.5, "low_quality")
          .when(col("rep_ratio") > 0.2, "repetitive").as("drop_reason"))
      .withColumn("keep", col("drop_reason").isNull)
  }

  /** Shared 8-gram kernel of the chunk-dedup query pair (round-20
    * self-review: the detection and excision queries had drifted into two
    * in-file copies): positioned md5'd windows (doc_id, pos 1-based,
    * gram) over docs with ≥ 8 tokens, plus the cross-document repeated
    * set (grams in ≥ 2 DISTINCT docs). Both frames are SKINNY — 32 B
    * hashes and ints, never token payload. */
  private val RepeatedGramN = 8
  private def repeatedGramFrames(tok: DataFrame): (DataFrame, DataFrame) = {
    // the gram id is INTERNAL to this query pair (both outputs are per-doc
    // counts / md5s of the cleaned token stream, never the gram id), so it
    // rides the fused xxhash64 window kernel: one compiled pass per row
    // instead of two interpreted transforms (window-string build + md5),
    // and an 8-byte long through every downstream shuffle/join instead of
    // a 32-char hex string (guide §2.3 "narrower types"). Equality of the
    // repeated set vs the string windows holds up to xxhash64 collisions
    // (~(#windows)²/2⁶⁵ ≈ 1e-8 at sf0.1 — and the oracle parity run
    // re-proves the results on every fixture).
    // NOTE (round-22 ADVICE): the id domains are ASYMMETRIC across engines
    // — this side keys grams by 64-bit xxhash64, the DuckDB mirror below
    // by 128-bit md5 — so oracle parity additionally assumes BOTH hash
    // domains are collision-free on the compared fixture; the per-fixture
    // oracle run is the guard.
    val grams = tok.filter(size(col("tokens")) >= RepeatedGramN)
      .select(col("doc_id"), posexplode(
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.functions.ShingleHashes64(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("tokens")),
            RepeatedGramN))).as(Seq("p0", "gram")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("gram"))
    // `first` = the corpus-wide first occurrence (min (doc_id, pos)) rides
    // the SAME aggregation as the repeated-set filter: the excision query
    // used to re-derive it with row_number() over Window.partitionBy(gram)
    // — a second full-gram shuffle whose per-gram sort turns a ubiquitous
    // boilerplate gram into one hot partition at scale (round-20 ADVICE).
    // min(struct) is a partial-aggregable scalar — skew-free by
    // construction. Consumers that only need the set (detection) project
    // `gram` alone and Catalyst prunes the min away.
    val rep = grams.groupBy("gram")
      .agg(countDistinct("doc_id").as("nd"),
        min(struct(col("doc_id").as("d"), col("pos").as("p"))).as("first"))
      .filter(col("nd") >= 2)
      .select(col("gram"), col("first"))
    (grams, rep)
  }

  /** The oracle mirror of [[repeatedGramFrames]]: CTEs `g2` (positioned
    * md5 grams) and `rep` (cross-document repeated set); assumes the
    * `toks` CTE ([[Q.toksCte]]) precedes. */
  private def repeatedGramCtes: String =
    "gm AS (SELECT doc_id, unnest(generate_series(1, len(toks) - 7)) AS pos, toks " +
      "FROM toks WHERE len(toks) >= 8), " +
      "g2 AS (SELECT doc_id, pos, md5(array_to_string(toks[pos : pos + 7], ' ')) AS gram FROM gm), " +
      "rep AS (SELECT gram FROM g2 GROUP BY gram HAVING count(DISTINCT doc_id) >= 2)"

  val all: Seq[Q] = Seq(

    // ---- Deduplication ----

    // Exact dedup: hash-groupBy on content hash (32-byte shuffle key)
    Q("q_dedup_exact",
      (s, d) => Dedup.exactGroups(docs(s, d), "doc_id", "text").orderBy("keep_id"),
      Some("SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, " +
        "CAST(count(*) AS BIGINT) AS n_dups FROM documents GROUP BY md5(text) ORDER BY keep_id")),

    // MinHash signatures + LSH band buckets (bounded sample of the corpus)
    Q("q_dedup_minhash_sig",
      (s, d) => Dedup.withMinhashSignature(
          docs(s, d).filter(size(col("tokens")) >= 3 && col("doc_id") < 100), "tokens")
        .select(Seq(col("doc_id")) ++
          (0 until Dedup.NumHashes).map(j => col(s"mh$j")) ++
          Seq(col("band0"), col("band1")): _*)
        .orderBy("doc_id"),
      Some {
        val sh = Dedup.shinglesSql("toks")
        val hs = s"list_transform($sh, s -> ${Dedup.tokHashSql("s")})"
        val mhs = (0 until Dedup.NumHashes).map(j => s"${Dedup.minhashSql("hs", j)} AS mh$j")
        val bands = Seq(
          Dedup.bandBucketSql((0 until 8).map(j => s"mh$j"), 0) + " AS band0",
          Dedup.bandBucketSql((0 until 8).map(j => s"mh$j"), 1) + " AS band1")
        s"WITH ${Q.toksCte}, hsh AS (SELECT doc_id, $hs AS hs FROM toks WHERE len(toks) >= 3 AND doc_id < 100), " +
          s"mh AS (SELECT doc_id, ${mhs.mkString(", ")} FROM hsh) " +
          s"SELECT doc_id, ${(0 until 8).map(j => s"mh$j").mkString(", ")}, ${bands.mkString(", ")} " +
          "FROM mh ORDER BY doc_id"
      }),

    // LSH candidate pairs + exact-Jaccard verification (full corpus).
    // Candidates only form inside a band bucket — never an all-pairs join.
    Q("q_dedup_minhash_pairs",
      (s, d) => minhashVerifiedPairs(s, d).orderBy("doc_a", "doc_b"),
      Some(s"WITH $minhashPairsCtes " +
        "SELECT doc_a, doc_b, jaccard FROM verified ORDER BY doc_a, doc_b")),

    // The SUB-SPLIT oversized-bucket policy as a first-class query: same
    // LSH candidate stage, but oversized buckets split into deterministic
    // C-sized blocks instead of capping membership — every doc keeps
    // pairing, pairs per bucket grow linearly in bucket size. C is pinned
    // small (4) so the policy is exercised at every sf, not just on
    // boilerplate-dense corpora; production callers pass Dedup.MaxPerBucket.
    Q("q_dedup_subsplit_pairs",
      (s, d) => {
        val verified = {
          val tokenized = docsSpread(s, d)
          val shingleSets = tokenized.filter(size(col("tokens")) >= 3)
            .select(col("doc_id"), Dedup.distinctShingles(col("tokens")).as("ds"))
          Dedup.spreadForKernel(minhashSubsplitPairsOf(tokenized, 4))
            .join(shingleSets.select(col("doc_id").as("doc_a"), col("ds").as("dsa")), Seq("doc_a"))
            .join(shingleSets.select(col("doc_id").as("doc_b"), col("ds").as("dsb")), Seq("doc_b"))
            .select(col("doc_a"), col("doc_b"),
              round(Dedup.jaccardSorted(col("dsa"), col("dsb")), 6).as("jaccard"))
        }
        verified.orderBy("doc_a", "doc_b")
      },
      Some(s"WITH $minhashBandsCtes, " +
        "subs AS (SELECT doc_id, band, bucket, CAST(floor((row_number() OVER " +
        "(PARTITION BY band, bucket ORDER BY doc_id) - 1) / 4) AS BIGINT) AS sub FROM bands0), " +
        "spairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM subs a JOIN subs b " +
        "ON a.band = b.band AND a.bucket = b.bucket AND a.sub = b.sub AND a.doc_id < b.doc_id) " +
        s"SELECT doc_a, doc_b, round(${Dedup.jaccardSql("sa.ds", "sb.ds")}, 6) AS jaccard " +
        "FROM spairs JOIN shc sa ON spairs.doc_a = sa.doc_id JOIN shc sb ON spairs.doc_b = sb.doc_id " +
        "ORDER BY doc_a, doc_b")),

    // Asymmetric CONTAINMENT verification over the same LSH candidates:
    // |A∩B|/|A| in both directions. This is the sub-document-duplication
    // measure Jaccard misses — a short doc fully embedded in a boilerplate
    // page has jaccard ≈ |A|/|B| (arbitrarily small) but containment 1.0,
    // and training pipelines drop exactly those. Candidates still come from
    // the band buckets (never all-pairs); the honest caveat is that
    // minhash-LSH recall is calibrated to JACCARD, so very-low-jaccard
    // containment pairs can miss the candidate stage — the at-scale fix is
    // containment-calibrated banding (LSH Ensemble, Zhu et al., VLDB'16),
    // which swaps the band layout, not this verify dataflow — implemented
    // as q_dedup_containment_lshe below. The ≥0.5 gate
    // compares ROUNDED values so the cut line is identical cross-engine.
    Q("q_dedup_containment",
      (s, d) => {
        val tokenized = docsSpread(s, d)
        val shingleSets = tokenized.filter(size(col("tokens")) >= 3)
          .select(col("doc_id"), Dedup.distinctShingles(col("tokens")).as("ds"))
        // |A∩B| = |B∩A| on distinct-element arrays, so ONE intersection
        // serves both containment directions (the kernel was the measured
        // dominant cost of this query family — two array_intersect per
        // pair halved to one, bit-identical quotients)
        Dedup.spreadForKernel(minhashPairsOf(tokenized))
          .join(shingleSets.select(col("doc_id").as("doc_a"), col("ds").as("dsa")), Seq("doc_a"))
          .join(shingleSets.select(col("doc_id").as("doc_b"), col("ds").as("dsb")), Seq("doc_b"))
          .withColumn("_i", Dedup.intersectSizeOnce(col("dsa"), col("dsb")).cast("double"))
          .select(col("doc_a"), col("doc_b"),
            round(col("_i") / size(col("dsa")).cast("double"), 6).as("cont_ab"),
            round(col("_i") / size(col("dsb")).cast("double"), 6).as("cont_ba"))
          .filter(greatest(col("cont_ab"), col("cont_ba")) >= 0.5)
          .orderBy("doc_a", "doc_b")
      },
      Some(s"WITH $minhashCandCtes, " +
        "cont AS (SELECT doc_a, doc_b, " +
        s"round(${Dedup.containmentSql("sa.ds", "sb.ds")}, 6) AS cont_ab, " +
        s"round(${Dedup.containmentSql("sb.ds", "sa.ds")}, 6) AS cont_ba " +
        "FROM pairs JOIN shc sa ON pairs.doc_a = sa.doc_id JOIN shc sb ON pairs.doc_b = sb.doc_id) " +
        "SELECT doc_a, doc_b, cont_ab, cont_ba FROM cont " +
        "WHERE greatest(cont_ab, cont_ba) >= 0.5 ORDER BY doc_a, doc_b")),

    // The at-scale fix the previous query's caveat names, implemented: the
    // CONTAINMENT-calibrated band layout (LSH Ensemble, Zhu et al. VLDB'16
    // — the (b=2, r=4) → (b=8, r=1) swap; see Dedup.containmentBands for
    // the calibration math). Candidates now collide on ANY shared minhash
    // (prob 1−(1−j)⁸, alive at the low jaccard a short-doc-inside-
    // boilerplate pair has) instead of a full 4-row band (prob j⁴, dead
    // there); the verify stage and the ≥0.5 rounded containment gate are
    // identical. DedupSpec pins a pair the jaccard bands provably miss and
    // these bands catch. Buckets are denser by construction — the LSH
    // Ensemble trade — so the density cap TIGHTENS with the layout: 64
    // members per (band, bucket) instead of 256 (the r=1 bucket count is
    // 8× the jaccard layout's and single-minhash buckets crowd under the
    // portable oracle hash; 64 bounds pairs at ~2k/bucket and kept this
    // query out of the bench's expensive tier while surfacing the same
    // sf0.01 containment pairs). The oracle applies the identical cap —
    // the 100 TB posture (in-bucket-only, never all-pairs) is unchanged,
    // and the PRODUCTION consumer of these bands (curate --containment)
    // runs the saturation-free xxhash64 domain where buckets are true
    // min-shingle families.
    Q("q_dedup_containment_lshe",
      (s, d) => {
        val tokenized = docsSpread(s, d)
        val shingleSets = tokenized.filter(size(col("tokens")) >= 3)
          .select(col("doc_id"), Dedup.distinctShingles(col("tokens")).as("ds"))
        // one shared intersection for both directions (see
        // q_dedup_containment) — this query is the family's dense case
        // (297k candidate pairs at sf0.1), where the duplicate
        // intersection was ~40% of the whole runtime
        Dedup.spreadForKernel(containmentBandPairsOf(tokenized, maxPerBucket = 64))
          .join(shingleSets.select(col("doc_id").as("doc_a"), col("ds").as("dsa")), Seq("doc_a"))
          .join(shingleSets.select(col("doc_id").as("doc_b"), col("ds").as("dsb")), Seq("doc_b"))
          .withColumn("_i", Dedup.intersectSizeOnce(col("dsa"), col("dsb")).cast("double"))
          .select(col("doc_a"), col("doc_b"),
            round(col("_i") / size(col("dsa")).cast("double"), 6).as("cont_ab"),
            round(col("_i") / size(col("dsb")).cast("double"), 6).as("cont_ba"))
          .filter(greatest(col("cont_ab"), col("cont_ba")) >= 0.5)
          .orderBy("doc_a", "doc_b")
      },
      Some(s"WITH $minhashBandsCtes, " +
        "cbands0 AS (" +
        (0 until Dedup.NumHashes).map(j =>
          s"SELECT doc_id, $j AS band, mh$j AS bucket FROM mh").mkString(" UNION ALL ") +
        "), " +
        "cbands AS (SELECT doc_id, band, bucket FROM (SELECT doc_id, band, bucket, " +
        "row_number() OVER (PARTITION BY band, bucket ORDER BY doc_id) AS bn FROM cbands0) " +
        "WHERE bn <= 64), " +
        "cpairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM cbands a " +
        "JOIN cbands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id), " +
        "ccont AS (SELECT doc_a, doc_b, " +
        s"round(${Dedup.containmentSql("sa.ds", "sb.ds")}, 6) AS cont_ab, " +
        s"round(${Dedup.containmentSql("sb.ds", "sa.ds")}, 6) AS cont_ba " +
        "FROM cpairs JOIN shc sa ON cpairs.doc_a = sa.doc_id JOIN shc sb ON cpairs.doc_b = sb.doc_id) " +
        "SELECT doc_a, doc_b, cont_ab, cont_ba FROM ccont " +
        "WHERE greatest(cont_ab, cont_ba) >= 0.5 ORDER BY doc_a, doc_b")),

    // Dup-CLUSTER resolution: connected components over the verified LSH
    // pairs (jaccard ≥ 0.5 edges). Pairwise near-dup hits aren't a dedup
    // decision yet — if A≈B and B≈C all three are one cluster and exactly
    // one canonical doc (min id) survives. Alternating large-star/small-star
    // (Kiveris et al.), ~log(component size) rounds of one groupBy(min) +
    // one equi-join each (see graft.ops.Components for the 100 TB posture).
    // Dup-cluster size HISTOGRAM — the corpus-health view of the same
    // components frame: how many clusters of each size, and how much of
    // the corpus sits in them (singletons = unique docs; a heavy tail =
    // boilerplate families dominating the crawl). Two scalar-output
    // aggregations over the memoized components — at 100 TB this is the
    // report you run after every dedup pass, for the cost of two
    // partial-agg'd groupBys.
    Q("q_dedup_cluster_histogram",
      (s, d) => componentsOf(s, d)
        .groupBy("comp").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size")
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("cluster_size")).as("n_docs"))
        .orderBy("cluster_size"),
      Some(s"WITH RECURSIVE $minhashPairsCtes, " +
        "edges AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.5), " +
        "sym AS (SELECT doc_a AS a, doc_b AS b FROM edges UNION SELECT doc_b, doc_a FROM edges), " +
        "reach(x, r) AS (SELECT doc_id, doc_id FROM documents " +
        "UNION SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.x), " +
        "comp AS (SELECT x AS doc_id, min(r) AS component FROM reach GROUP BY x), " +
        "cs AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY component) " +
        "SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters, " +
        "CAST(sum(cluster_size) AS BIGINT) AS n_docs " +
        "FROM cs GROUP BY cluster_size ORDER BY cluster_size")),

    Q("q_dedup_components",
      (s, d) => {
        val comp = componentsOf(s, d)
        val sizes = comp.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
        comp.join(sizes, Seq("comp"))
          .select(col("id").as("doc_id"), col("comp").as("component"),
            col("cluster_size"), (col("id") === col("comp")).as("is_canonical"))
          .orderBy("doc_id")
      },
      Some(s"WITH RECURSIVE $minhashPairsCtes, " +
        "edges AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.5), " +
        "sym AS (SELECT doc_a AS a, doc_b AS b FROM edges UNION SELECT doc_b, doc_a FROM edges), " +
        "reach(x, r) AS (SELECT doc_id, doc_id FROM documents " +
        "UNION SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.x), " +
        "comp AS (SELECT x AS doc_id, min(r) AS component FROM reach GROUP BY x), " +
        "cs AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY component) " +
        "SELECT doc_id, component, cluster_size, doc_id = component AS is_canonical " +
        "FROM comp JOIN cs USING (component) ORDER BY doc_id")),

    // Canonical-representative selection over the near-dup clusters — the
    // step that turns "we found the duplicates" into "this is the training
    // set": within each connected component keep the LONGEST document
    // (the standard keep-best policy; n_chars stands in for a quality
    // score), ties to the smaller doc_id. One row_number window PARTITIONED
    // BY component — the per-cluster sort never sees more rows than the
    // cluster, so the pass scales with the largest dup cluster, not the
    // corpus.
    Q("q_dedup_keep_longest",
      (s, d) => {
        val comp = componentsOf(s, d)
        val sized = comp.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
        val w = Window.partitionBy("comp")
          .orderBy(col("n_chars").desc, col("doc_id").asc)
        comp.join(t(s, d, "documents").select(col("doc_id"), col("n_chars")),
            comp("id") === col("doc_id"))
          .join(sized, Seq("comp"))
          .withColumn("kept", row_number().over(w) === 1)
          .select(col("doc_id"), col("comp").as("component"),
            col("cluster_size"), col("n_chars"), col("kept"))
          .orderBy("doc_id")
      },
      Some(s"WITH RECURSIVE $minhashPairsCtes, " +
        "edges AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.5), " +
        "sym AS (SELECT doc_a AS a, doc_b AS b FROM edges UNION SELECT doc_b, doc_a FROM edges), " +
        "reach(x, r) AS (SELECT doc_id, doc_id FROM documents " +
        "UNION SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.x), " +
        "comp AS (SELECT x AS doc_id, min(r) AS component FROM reach GROUP BY x), " +
        "cs AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY component), " +
        "rk AS (SELECT c.doc_id, c.component, cs.cluster_size, dd.n_chars, " +
        "row_number() OVER (PARTITION BY c.component ORDER BY dd.n_chars DESC, c.doc_id ASC) AS rn " +
        "FROM comp c JOIN cs USING (component) JOIN documents dd ON dd.doc_id = c.doc_id) " +
        "SELECT doc_id, component, cluster_size, n_chars, rn = 1 AS kept " +
        "FROM rk ORDER BY doc_id")),

    // Leakage-safe split assignment — the constructive fix the
    // q_split_leakage audit checks for: train/val/test is drawn per
    // near-dup CLUSTER (md5-uniform on the component id), so every member
    // of a duplicate family lands in the same split by construction and
    // near-identical docs can never straddle the train/test boundary. The
    // draw is the engine's deterministic md5-uniform rule keyed on the
    // component — no RNG, reproducible and resumable at 100 TB.
    Q("q_split_by_cluster",
      (s, d) => {
        val comp = componentsOf(s, d)
        val uSql = (0 until 8).map { i =>
          s"CAST(instr('0123456789abcdef', substr(md5(concat('split:', " +
            s"CAST(component AS STRING))), ${i + 1}, 1)) - 1 AS BIGINT) " +
            s"* ${1L << (4 * (7 - i))}"
        }.mkString("(", " + ", ") / 4294967296.0")
        comp.select(col("id").as("doc_id"), col("comp").as("component"))
          .withColumn("u", expr(uSql))
          .withColumn("split",
            when(col("u") < 0.9, "train").when(col("u") < 0.95, "val")
              .otherwise("test"))
          .select(col("doc_id"), col("component"), Q.r6(col("u")).as("u"),
            col("split"))
          .orderBy("doc_id")
      },
      Some {
        val uSql = (0 until 8).map { i =>
          s"CAST(instr('0123456789abcdef', substr(md5(concat('split:', " +
            s"CAST(component AS STRING))), ${i + 1}, 1)) - 1 AS BIGINT) " +
            s"* ${1L << (4 * (7 - i))}"
        }.mkString("(", " + ", ") / 4294967296.0")
        s"WITH RECURSIVE $minhashPairsCtes, " +
          "edges AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.5), " +
          "sym AS (SELECT doc_a AS a, doc_b AS b FROM edges UNION SELECT doc_b, doc_a FROM edges), " +
          "reach(x, r) AS (SELECT doc_id, doc_id FROM documents " +
          "UNION SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.x), " +
          "comp AS (SELECT x AS doc_id, min(r) AS component FROM reach GROUP BY x), " +
          s"dr AS (SELECT doc_id, component, $uSql AS u FROM comp) " +
          "SELECT doc_id, component, " +
          s"${Q.r6Sql("u")} AS u, " +
          "CASE WHEN u < 0.9 THEN 'train' WHEN u < 0.95 THEN 'val' ELSE 'test' END AS split " +
          "FROM dr ORDER BY doc_id"
      }),

    // 16-bit SimHash signatures (bounded sample)
    Q("q_dedup_simhash",
      (s, d) => docs(s, d).filter(col("doc_id") < 100)
        .withColumn("hs", transform(col("tokens"), t => Dedup.tokHash(t)))
        .select(col("doc_id"), Dedup.simhash(col("hs")).as("simhash"))
        .orderBy("doc_id"),
      Some(s"WITH ${Q.toksCte}, " +
        s"th AS (SELECT doc_id, list_transform(toks, t -> ${Dedup.tokHashSql("t")}) AS hs " +
        "FROM toks WHERE doc_id < 100) " +
        s"SELECT doc_id, CAST(${Dedup.simhashSql("hs")} AS BIGINT) AS simhash FROM th ORDER BY doc_id")),

    // n-gram Jaccard between consecutive documents (the pairwise-verify
    // kernel, driven by a deterministic pairing)
    Q("q_dedup_ngram_jaccard",
      (s, d) => {
        val ss = docsSpread(s, d).filter(size(col("tokens")) >= 3)
          .select(col("doc_id"), Dedup.distinctShingles(col("tokens")).as("ds"))
        ss.select(col("doc_id").as("doc_a"), col("ds").as("dsa"))
          .join(ss.select((col("doc_id") - 1).as("doc_a"), col("doc_id").as("doc_b"), col("ds").as("dsb")), Seq("doc_a"))
          .select(col("doc_a"), col("doc_b"),
            round(Dedup.jaccardSorted(col("dsa"), col("dsb")), 6).as("jaccard"))
          .orderBy("doc_a")
      },
      Some(s"WITH ${Q.toksCte}, " +
        s"shc AS (SELECT doc_id, list_distinct(${Dedup.shinglesSql("toks")}) AS ds FROM toks WHERE len(toks) >= 3) " +
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        s"round(${Dedup.jaccardSql("a.ds", "b.ds")}, 6) AS jaccard " +
        "FROM shc a JOIN shc b ON b.doc_id = a.doc_id + 1 ORDER BY doc_a")),

    // Cross-document repeated n-gram spans — the EXACT-substring dedup
    // kernel (the published chunk-dedup recipe: hash every 8-token window
    // stride 1, a window repeated in ≥2 DISTINCT docs marks boilerplate/
    // verbatim reuse; per-doc duplicate-token fraction is the curation
    // signal). Spark-native formulation of what suffix-array pipelines
    // compute: windows ride one map-only explode into a SKINNY
    // (doc_id, md5) frame, the repeated set is one hash aggregation with
    // map-side partial countDistinct, and the rollup re-joins on the hash
    // — no token payload ever shuffles, so the shuffle bytes are
    // ~32 B/window regardless of token width. At 100 TB this is the same
    // two-shuffle shape per partition-pruned slice; fixture non-vacuity
    // checked in DuckDB (sf0.01: 1,015 repeated grams / 2,101 positions /
    // 47 docs of 500).
    Q("q_dedup_repeated_ngrams",
      (s, d) => {
        val (grams, rep) = repeatedGramFrames(docsSpread(s, d))
        // one left join + one rollup (instead of separate total/repeated
        // aggregations) so the window explode materializes twice, not
        // three times — at 100 TB that's one fewer full corpus pass
        grams.join(rep.select(col("gram"), lit(1).as("rep")), Seq("gram"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_windows"),
            count(col("rep")).cast("long").as("n_repeated"))
          .select(col("doc_id"), col("n_windows"), col("n_repeated"),
            round(col("n_repeated") / col("n_windows"), 6).as("dup_frac"))
          .orderBy("doc_id")
      },
      Some(s"WITH ${Q.toksCte}, $repeatedGramCtes, " +
        "tot AS (SELECT doc_id, count(*) AS nw FROM g2 GROUP BY doc_id), " +
        "rc AS (SELECT doc_id, count(*) AS nr FROM g2 " +
        "WHERE gram IN (SELECT gram FROM rep) GROUP BY doc_id) " +
        "SELECT t.doc_id, CAST(t.nw AS BIGINT) AS n_windows, " +
        "CAST(COALESCE(rc.nr, 0) AS BIGINT) AS n_repeated, " +
        "round(COALESCE(rc.nr, 0) / t.nw, 6) AS dup_frac " +
        "FROM tot t LEFT JOIN rc ON rc.doc_id = t.doc_id ORDER BY t.doc_id")),

    // The repeated-span EXCISION transform the detection signal above
    // feeds (the published chunk-dedup recipe's second half): each
    // cross-doc-repeated 8-gram's corpus-wide FIRST occurrence
    // (min (doc_id, pos) per gram) is EXEMPT from excision; every other
    // occurrence's token span [pos, pos+7] is excised, and the cleaned
    // doc is the position-ordered remainder. Union-of-spans semantics,
    // as published: an exempt first occurrence can still lose tokens to
    // a DIFFERENT gram's overlapping excised span, so "one copy always
    // survives" holds per excision decision, not as a global invariant —
    // the transform is a lossy cleanup, not a reversible dedup (round-20
    // self-review #1). Shapes: grams/rep/covered ride skinny
    // (doc_id, pos, md5) frames; covered positions aggregate to ONE
    // per-doc int set, and the excision itself is expression-level over
    // the docs scan (filter the position sequence against the set) —
    // token strings never shuffle at all (self-review #3 replaced a
    // token-payload anti-join + reassembly pair with this). Output stays
    // skinny: counts + an md5 of the cleaned token stream, hash-proving
    // the transform cross-engine. Deterministic: row_number keys on
    // (doc_id, pos), both unique per gram.
    Q("q_dedup_excise_spans",
      (s, d) => {
        val n = RepeatedGramN
        val tok = docsSpread(s, d)
        val (grams, rep) = repeatedGramFrames(tok)
        // exempt-first-occurrence via the aggregation-carried min (doc_id,
        // pos) instead of row_number() over Window.partitionBy(gram): same
        // rows excised (rn > 1 ⇔ (doc_id, pos) ≠ the per-gram minimum —
        // both keys are unique per gram), one full-gram shuffle+sort
        // removed, and no per-gram hot-partition sort at scale (round-20
        // ADVICE fix)
        val excise = grams.join(rep, Seq("gram"))
          .filter(col("doc_id") =!= col("first.d") || col("pos") =!= col("first.p"))
        val covered = excise.select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
          .groupBy("doc_id").agg(collect_set("p").as("cov"))
        tok.join(covered, Seq("doc_id"), "left")
          .withColumn("cov", coalesce(col("cov"),
            array().cast(org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.IntegerType))))
          // two-arg filter (element, 0-based index) — total on empty
          // token arrays, where sequence(1, size) would go descending
          .withColumn("keptToks", filter(col("tokens"),
            (t, i) => !array_contains(col("cov"), i + 1)))
          .select(col("doc_id"),
            size(col("tokens")).cast("long").as("n_tokens"),
            size(col("cov")).cast("long").as("n_removed"),
            md5(concat_ws(" ", col("keptToks"))).as("cleaned_md5"))
          .orderBy("doc_id")
      },
      Some(s"WITH ${Q.toksCte}, $repeatedGramCtes, " +
        "exc AS (SELECT doc_id, pos FROM (SELECT doc_id, pos, " +
        "row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn " +
        "FROM g2 WHERE gram IN (SELECT gram FROM rep)) WHERE rn > 1), " +
        "cov AS (SELECT DISTINCT doc_id, p FROM " +
        "(SELECT doc_id, unnest(generate_series(pos, pos + 7)) AS p FROM exc)), " +
        "tokp AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS p, toks FROM toks), " +
        "tp AS (SELECT doc_id, p, toks[p] AS token FROM tokp), " +
        "kept AS (SELECT t.doc_id, t.p, t.token FROM tp t " +
        "WHERE NOT EXISTS (SELECT 1 FROM cov c WHERE c.doc_id = t.doc_id AND c.p = t.p)), " +
        "ka AS (SELECT doc_id, count(*) AS n_kept, " +
        "md5(array_to_string(list(token ORDER BY p), ' ')) AS cleaned_md5 " +
        "FROM kept GROUP BY doc_id) " +
        "SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens, " +
        "CAST(len(t.toks) - COALESCE(ka.n_kept, 0) AS BIGINT) AS n_removed, " +
        "COALESCE(ka.cleaned_md5, md5('')) AS cleaned_md5 " +
        "FROM toks t LEFT JOIN ka ON ka.doc_id = t.doc_id ORDER BY t.doc_id")),

    // Embedding-cosine near-duplicates over a deterministic pairing
    Q("q_dedup_embed_neardup",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("va"))
        val b = e.select((col("vec_id") - 1).as("vec_a"), col("vec_id").as("vec_b"), col("embedding").as("vb"))
        a.join(b, Seq("vec_a"))
          .withColumn("sim", lit(1.0) - graft.functions.VectorOps.cosineDist(col("va"), col("vb")))
          .filter(round(col("sim"), 6) > 0.2)
          .select(col("vec_a"), col("vec_b"), round(col("sim"), 6).as("sim"))
          .orderBy("vec_a")
      },
      Some("WITH p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, " +
        s"1.0 - (${Q.cosineDistSql("a.embedding", "b.embedding")}) AS sim " +
        "FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1) " +
        "SELECT vec_a, vec_b, round(sim, 6) AS sim FROM p WHERE round(sim, 6) > 0.2 ORDER BY vec_a")),

    // Semantic near-dup via nearest neighbor: every vector's single nearest
    // other vector (through the custom kNN operator — one map-only pass),
    // flagged as near-duplicate under a distance threshold. The real
    // embedding-dedup shape: at 100 TB the same operator runs per
    // IVF/LSH bucket instead of globally.
    Q("q_dedup_embed_knn",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val qs = e.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.knnJoin(e, "vec_id", "embedding", qs, "qid", "qvec", 1)
          .select(col("qid").as("vec_id"), col("id").as("nn_id"),
            Q.r6(col("dist")).as("nn_dist"),
            (round(col("dist"), 6) < 0.45).as("near_dup"))
          .orderBy("vec_id")
      },
      Some("WITH dd AS (SELECT q.vec_id AS vec_id, e.vec_id AS nn_id, " +
        s"${Q.cosineDistSql("e.embedding", "q.embedding")} AS dist " +
        "FROM embeddings e CROSS JOIN embeddings q WHERE e.vec_id != q.vec_id), " +
        "rr AS (SELECT vec_id, nn_id, dist, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY round(dist, 6), nn_id) AS rn FROM dd) " +
        s"SELECT vec_id, nn_id, ${Q.r6Sql("dist")} AS nn_dist, round(dist, 6) < 0.45 AS near_dup " +
        "FROM rr WHERE rn = 1 ORDER BY vec_id")),

    // Bucketed near-dup — the 100 TB shape of the query above: sign-LSH
    // bucket (4 hyperplanes = embeddings 0..3, as q_sim_lsh_buckets) →
    // per-bucket nearest neighbor → threshold. Candidates only form inside
    // a bucket (equi-join on bucket id, ONE shuffle); the corpus is never
    // collected to the driver or broadcast, unlike the global kNN operator
    // whose query side must stay bounded.
    Q("q_dedup_embed_lsh_knn",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val planes = (0 until 4).map(i =>
          e.filter(col("vec_id") === i).select(col("embedding").as(s"p$i")))
        val bucketed = planes.foldLeft(e)((acc, p) => acc.crossJoin(broadcast(p)))
          .withColumn("bucket",
            Similarity.signLshBucket(col("embedding"), (0 until 4).map(i => col(s"p$i"))))
          .select(col("vec_id"), col("embedding"), col("bucket"))
        Dedup.nearDupByLsh(bucketed, "vec_id", "embedding", "bucket", 0.45)
          .select(col("vec_id"), col("bucket"), col("nn_id"),
            Q.r6(col("dist")).as("nn_dist"), col("near_dup"))
          .orderBy("vec_id")
      },
      Some {
        val planes = (0 until 4).map(i =>
          s"p$i AS (SELECT embedding AS pv$i FROM embeddings WHERE vec_id = $i)")
        val bits = (0 until 4).map(i =>
          s"(CASE WHEN ${Q.dotSql("embedding", s"pv$i")} > 0.0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)")
        s"WITH ${planes.mkString(", ")}, " +
          s"bk0 AS (SELECT vec_id, embedding, ${bits.mkString(" + ")} AS bucket " +
          "FROM embeddings CROSS JOIN p0 CROSS JOIN p1 CROSS JOIN p2 CROSS JOIN p3), " +
          // the same per-bucket membership cap as Similarity.nearDupInBuckets
          "bk AS (SELECT vec_id, embedding, bucket FROM (SELECT vec_id, embedding, bucket, " +
          "row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn FROM bk0) " +
          s"WHERE bn <= ${graft.ops.Dedup.MaxPerBucket}), " +
          "dd AS (SELECT a.vec_id, a.bucket, b.vec_id AS nn_id, " +
          s"${Q.cosineDistSql("a.embedding", "b.embedding")} AS dist " +
          "FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id != b.vec_id), " +
          "rr AS (SELECT vec_id, bucket, nn_id, dist, row_number() OVER " +
          "(PARTITION BY vec_id ORDER BY round(dist, 6), nn_id) AS rn FROM dd) " +
          s"SELECT vec_id, bucket, nn_id, ${Q.r6Sql("dist")} AS nn_dist, " +
          "round(dist, 6) < 0.45 AS near_dup FROM rr WHERE rn = 1 ORDER BY vec_id"
      }),

    // Incremental dedup: screen a NEW batch (doc_id ≥ 400) against the
    // EXISTING corpus (doc_id < 400) — the shape a daily ingest actually
    // runs, where re-deduping 100 TB from scratch per batch is a non-
    // starter. Candidates only form where a new doc shares an LSH band
    // bucket with an existing doc (equi-join, never new×existing), exact
    // Jaccard verifies, and the per-new-doc best match is a partial-agg'd
    // struct-min. At scale the existing side's signatures/buckets are a
    // precomputed table partitioned by (band, bucket).
    Q("q_dedup_incremental",
      (s, d) => incrementalScreen(docsSpread(s, d), 400),
      // new side draws from the UNCAPPED bands0 (a screened doc is never
      // capped out); old side from the capped bands — which restricted to
      // doc_id < 400 equals an old-only cap, since old ids sort first.
      Some(s"WITH $minhashBandsCtes, " +
        "pairs AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id " +
        "FROM bands0 a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket " +
        "AND a.doc_id >= 400 AND b.doc_id < 400), " +
        s"ver AS (SELECT new_id, old_id, round(${Dedup.jaccardSql("sn.ds", "so.ds")}, 6) AS j " +
        "FROM pairs JOIN shc sn ON pairs.new_id = sn.doc_id " +
        "JOIN shc so ON pairs.old_id = so.doc_id), " +
        "vf AS (SELECT * FROM ver WHERE j >= 0.3), " +
        "best AS (SELECT new_id, old_id, j, " +
        "CAST(count(*) OVER (PARTITION BY new_id) AS BIGINT) AS nm, " +
        "row_number() OVER (PARTITION BY new_id ORDER BY j DESC, old_id) AS rn FROM vf) " +
        "SELECT n.doc_id, coalesce(b.nm, CAST(0 AS BIGINT)) AS n_matches, " +
        "b.old_id AS best_match, " +
        s"${Q.r6Sql("b.j")} AS best_jaccard, b.nm IS NOT NULL AS is_dup " +
        "FROM (SELECT doc_id FROM toks WHERE len(toks) >= 3 AND doc_id >= 400) n " +
        "LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON n.doc_id = b.new_id " +
        "ORDER BY doc_id")),

    // ---- Similarity search ----

    // Brute-force cosine top-k for a batch of query vectors
    Q("q_sim_topk",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val qs = e.filter(col("vec_id").isin(0, 1, 2))
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.bruteForceTopK(qs, "qid", "qvec", e, "vec_id", "embedding", 5)
          .select(col("qid"), col("vec_id"), col("rank"), Q.r6(col("dist")).as("dist"))
          .orderBy("qid", "rank")
      },
      Some("WITH qs AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id IN (0, 1, 2)), " +
        s"dd AS (SELECT qid, vec_id, ${Q.cosineDistSql("embedding", "qvec")} AS dist " +
        "FROM embeddings CROSS JOIN qs WHERE vec_id != qid), " +
        "rr AS (SELECT qid, vec_id, dist, CAST(row_number() OVER " +
        "(PARTITION BY qid ORDER BY round(dist, 6), vec_id) AS BIGINT) AS rank FROM dd) " +
        s"SELECT qid, vec_id, rank, ${Q.r6Sql("dist")} AS dist FROM rr WHERE rank <= 5 ORDER BY qid, rank")),

    // Same result through the custom CosineKnnJoin operator (LogicalPlan +
    // Strategy + heap-pruned Exec) — the no-shuffle top-k-pushdown plan
    Q("q_sim_knn_join",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val qs = e.filter(col("vec_id").isin(0, 1, 2))
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.knnJoin(e, "vec_id", "embedding", qs, "qid", "qvec", 5)
          .select(col("qid"), col("id").as("vec_id"), col("rank"), Q.r6(col("dist")).as("dist"))
          .orderBy("qid", "rank")
      },
      Some("WITH qs AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id IN (0, 1, 2)), " +
        s"dd AS (SELECT qid, vec_id, ${Q.cosineDistSql("embedding", "qvec")} AS dist " +
        "FROM embeddings CROSS JOIN qs WHERE vec_id != qid), " +
        "rr AS (SELECT qid, vec_id, dist, CAST(row_number() OVER " +
        "(PARTITION BY qid ORDER BY round(dist, 6), vec_id) AS BIGINT) AS rank FROM dd) " +
        s"SELECT qid, vec_id, rank, ${Q.r6Sql("dist")} AS dist FROM rr WHERE rank <= 5 ORDER BY qid, rank")),

    // IVF coarse quantization: nearest-centroid assignment → cluster sizes
    Q("q_sim_ivf_clusters",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val cent = e.filter(col("vec_id") < 4)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        Similarity.ivfAssign(e, "vec_id", "embedding", cent, "cid", "cvec")
          .groupBy("cid").agg(count("*").cast("long").as("n"))
          .orderBy("cid")
      },
      Some("WITH cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 4), " +
        s"dd AS (SELECT vec_id, cid, ${Q.cosineDistSql("embedding", "cvec")} AS cdist " +
        "FROM embeddings CROSS JOIN cent), " +
        "asg AS (SELECT vec_id, cid, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY round(cdist, 6), cid) AS rn FROM dd) " +
        "SELECT cid, CAST(count(*) AS BIGINT) AS n FROM asg WHERE rn = 1 GROUP BY cid ORDER BY cid")),

    // Full IVF query path: probe each query's 2 nearest centroids, search
    // only vectors assigned to a probed cluster — the partition-pruned ANN
    // layout (at scale the assignment is precomputed and the corpus is
    // bucketed BY cluster, so this equi-join reads nprobe/K of the data).
    // Recall < 1 by design; the oracle replays the same probe rule, so the
    // approximate result is still deterministic and hash-checked.
    Q("q_sim_ivf_search",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val cent = e.filter(col("vec_id") < 4)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        val qs = e.filter(col("vec_id").isin(0, 1, 2))
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.ivfSearch(qs, "qid", "qvec", e, "vec_id", "embedding",
            cent, "cid", "cvec", nprobe = 2, k = 5)
          .select(col("qid"), col("vec_id"), col("rank"), Q.r6(col("dist")).as("dist"))
          .orderBy("qid", "rank")
      },
      Some("WITH cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 4), " +
        "qs AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id IN (0, 1, 2)), " +
        s"ad AS (SELECT e.vec_id, e.embedding, c.cid, ${Q.cosineDistSql("e.embedding", "c.cvec")} AS cdist " +
        "FROM embeddings e CROSS JOIN cent c), " +
        "adr AS (SELECT vec_id, embedding, cid, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY round(cdist, 6), cid) AS rn FROM ad), " +
        "asg AS (SELECT vec_id, embedding, cid FROM adr WHERE rn = 1), " +
        s"pd AS (SELECT qid, qvec, cid, ${Q.cosineDistSql("qvec", "cvec")} AS qcdist " +
        "FROM qs CROSS JOIN cent), " +
        "pdr AS (SELECT qid, qvec, cid, row_number() OVER " +
        "(PARTITION BY qid ORDER BY round(qcdist, 6), cid) AS pr FROM pd), " +
        "probes AS (SELECT qid, qvec, cid FROM pdr WHERE pr <= 2), " +
        s"dd AS (SELECT p.qid, a.vec_id, ${Q.cosineDistSql("a.embedding", "p.qvec")} AS dist " +
        "FROM asg a JOIN probes p ON a.cid = p.cid WHERE a.vec_id != p.qid), " +
        "rr AS (SELECT qid, vec_id, dist, CAST(row_number() OVER " +
        "(PARTITION BY qid ORDER BY round(dist, 6), vec_id) AS BIGINT) AS rank FROM dd) " +
        s"SELECT qid, vec_id, rank, ${Q.r6Sql("dist")} AS dist FROM rr WHERE rank <= 5 ORDER BY qid, rank")),

    // Sign-LSH bucketing: 4 hyperplanes → 16 buckets → histogram
    Q("q_sim_lsh_buckets",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val planes = (0 until 4).map(i =>
          e.filter(col("vec_id") === i).select(col("embedding").as(s"p$i")))
        val withPlanes = planes.foldLeft(e)((acc, p) => acc.crossJoin(broadcast(p)))
        withPlanes
          .withColumn("bucket",
            Similarity.signLshBucket(col("embedding"), (0 until 4).map(i => col(s"p$i"))))
          .groupBy("bucket").agg(count("*").cast("long").as("n"))
          .orderBy("bucket")
      },
      Some {
        val planes = (0 until 4).map(i =>
          s"p$i AS (SELECT embedding AS pv$i FROM embeddings WHERE vec_id = $i)")
        val bits = (0 until 4).map(i =>
          s"(CASE WHEN ${Q.dotSql("embedding", s"pv$i")} > 0.0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)")
        s"WITH ${planes.mkString(", ")}, " +
          s"bk AS (SELECT vec_id, ${bits.mkString(" + ")} AS bucket " +
          "FROM embeddings CROSS JOIN p0 CROSS JOIN p1 CROSS JOIN p2 CROSS JOIN p3) " +
          "SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM bk GROUP BY bucket ORDER BY bucket"
      }),

    // ---- Text analysis ----

    Q("q_text_langid",
      (s, d) => docs(s, d)
        .withColumn("n_the", TextAnalysis.markerCount(col("tokens"), "the"))
        .withColumn("n_a", TextAnalysis.markerCount(col("tokens"), "a"))
        .withColumn("n_data", TextAnalysis.markerCount(col("tokens"), "data"))
        .select(col("doc_id"), col("n_the"), col("n_a"), col("n_data"),
          TextAnalysis.langId(col("n_the"), col("n_a"), col("n_data")).as("pred_lang"))
        .orderBy("doc_id"),
      Some(s"WITH ${Q.toksCte}, m AS (SELECT doc_id, " +
        s"${TextAnalysis.markerCountSql("toks", "the")} AS n_the, " +
        s"${TextAnalysis.markerCountSql("toks", "a")} AS n_a, " +
        s"${TextAnalysis.markerCountSql("toks", "data")} AS n_data FROM toks) " +
        s"SELECT doc_id, n_the, n_a, n_data, ${TextAnalysis.langIdSql("n_the", "n_a", "n_data")} AS pred_lang " +
        "FROM m ORDER BY doc_id")),

    Q("q_text_quality",
      (s, d) => docs(s, d)
        .withColumn("n_tok", size(col("tokens")).cast("long"))
        .withColumn("n_stop", TextAnalysis.stopwordCount(col("tokens")))
        .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tok").cast("double"))
        .select(col("doc_id"), col("n_tok"), col("n_stop"),
          round(TextAnalysis.avgTokenLen(col("text"), col("n_tok")), 6).as("avg_tok_len"),
          round(col("stop_ratio"), 6).as("stop_ratio"),
          round(TextAnalysis.qualityScore(col("n_tok"), col("stop_ratio")), 6).as("quality"))
        .orderBy("doc_id"),
      Some(s"WITH ${Q.toksCte}, m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok, " +
        s"${TextAnalysis.stopwordCountSql("toks")} AS n_stop, " +
        s"${TextAnalysis.avgTokenLenSql("d.text", "len(toks)")} AS avg_tok_len " +
        "FROM toks JOIN documents d USING (doc_id)), " +
        "r AS (SELECT doc_id, n_tok, n_stop, avg_tok_len, " +
        "CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE) AS stop_ratio FROM m) " +
        "SELECT doc_id, n_tok, n_stop, round(avg_tok_len, 6) AS avg_tok_len, " +
        "round(stop_ratio, 6) AS stop_ratio, " +
        s"round(${TextAnalysis.qualityScoreSql("n_tok", "stop_ratio")}, 6) AS quality " +
        "FROM r ORDER BY doc_id")),

    // Repetition ratio (Gopher-style rep-3gram): fraction of a doc's 3-gram
    // occurrences that are duplicates — high values flag boilerplate/looped
    // generations. Map-only list arithmetic, no shuffle.
    Q("q_text_repetition",
      (s, d) => docsSpread(s, d).filter(size(col("tokens")) >= 3)
        .withColumn("sh", Dedup.shingles(col("tokens")))
        .select(col("doc_id"),
          size(col("sh")).cast("long").as("n_ngrams"),
          size(array_distinct(col("sh"))).cast("long").as("n_distinct"))
        .select(col("doc_id"), col("n_ngrams"), col("n_distinct"),
          Q.r6(lit(1.0) - col("n_distinct").cast("double") / col("n_ngrams").cast("double"))
            .as("rep_ratio"))
        .orderBy("doc_id"),
      Some(s"WITH ${Q.toksCte}, " +
        s"sh AS (SELECT doc_id, ${Dedup.shinglesSql("toks")} AS sh FROM toks WHERE len(toks) >= 3), " +
        "m AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_ngrams, " +
        "CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct FROM sh) " +
        "SELECT doc_id, n_ngrams, n_distinct, " +
        s"${Q.r6Sql("1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_ngrams AS DOUBLE)")} AS rep_ratio " +
        "FROM m ORDER BY doc_id")),

    // The curation DECISION: compose length, quality-score and repetition
    // signals into keep/drop + first-failing-reason — the single-pass filter
    // verdict a pretraining pipeline applies before anything expensive
    // (dedup, embedding) runs. Thresholds compare ROUNDED signals so both
    // engines agree at rule boundaries.
    Q("q_quality_gate",
      (s, d) => qualityGate(docsSpread(s, d)).orderBy("doc_id"),
      Some(s"WITH ${Q.toksCte}, " +
        "m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, " +
        s"${TextAnalysis.stopwordCountSql("toks")} AS n_stop, " +
        s"${Dedup.shinglesSql("toks")} AS sh FROM toks WHERE len(toks) >= 3), " +
        "r AS (SELECT doc_id, n_tokens, " +
        s"${Q.r6Sql(TextAnalysis.qualityScoreSql("n_tokens", "CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)"))} AS quality, " +
        s"${Q.r6Sql("1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / CAST(len(sh) AS DOUBLE)")} AS rep_ratio FROM m), " +
        "v AS (SELECT doc_id, n_tokens, quality, rep_ratio, " +
        "CASE WHEN n_tokens < 20 THEN 'too_short' WHEN quality < 0.5 THEN 'low_quality' " +
        "WHEN rep_ratio > 0.2 THEN 'repetitive' END AS drop_reason FROM r) " +
        "SELECT doc_id, n_tokens, quality, rep_ratio, drop_reason, " +
        "drop_reason IS NULL AS keep FROM v ORDER BY doc_id")),

    // Token counting: whitespace + regex ("BPE-ish" fixed-width pieces)
    Q("q_text_tokencount",
      (s, d) => docs(s, d)
        .select(col("doc_id"),
          size(col("tokens")).cast("long").as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit("([a-z]+)"), lit(1))).cast("long").as("word_tokens"),
          size(regexp_extract_all(col("text"), lit("([a-z]{1,4})"), lit(1))).cast("long").as("bpe_pieces"))
        .orderBy("doc_id"),
      Some(s"WITH ${Q.toksCte} SELECT doc_id, CAST(len(toks) AS BIGINT) AS ws_tokens, " +
        "CAST(len(regexp_extract_all(text, '([a-z]+)', 1)) AS BIGINT) AS word_tokens, " +
        "CAST(len(regexp_extract_all(text, '([a-z]{1,4})', 1)) AS BIGINT) AS bpe_pieces " +
        "FROM toks JOIN documents USING (doc_id) ORDER BY doc_id")),

    // Document fingerprints: order-sensitive rolling-style hash + md5
    Q("q_text_fingerprint",
      (s, d) => docs(s, d)
        .withColumn("hs", transform(col("tokens"), t => Dedup.tokHash(t)))
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("hs")).as("fp"),
          md5(col("text")).as("content_md5"))
        .orderBy("doc_id"),
      Some(s"WITH ${Q.toksCte} SELECT doc_id, " +
        s"${TextAnalysis.fingerprintSql("toks")} AS fp, md5(text) AS content_md5 " +
        "FROM toks JOIN documents USING (doc_id) ORDER BY doc_id")),

    // ---- Corpus curation ----

    // Deterministic stratified sampling: md5-prefix threshold with a
    // per-language rate (en downsampled to ~25%, the rest ~50%). Map-only,
    // no RNG state — the same doc is kept on every run, on any cluster, so
    // a 100 TB sample is reproducible and resumable shard by shard.
    Q("q_sample_stratified",
      (s, d) => t(s, d, "documents")
        .withColumn("h", substring(md5(col("text")), 1, 8))
        .filter(col("h") < when(col("lang") === "en", lit("40000000"))
          .otherwise(lit("80000000")))
        .select(col("doc_id"), col("lang"), col("h"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, lang, substr(md5(text), 1, 8) AS h FROM documents " +
        "WHERE substr(md5(text), 1, 8) < CASE WHEN lang = 'en' THEN '40000000' ELSE '80000000' END " +
        "ORDER BY doc_id")),

    // Sequence packing for pretraining: docs stream into fixed token-budget
    // packs (budget 2048) in deterministic doc_id order WITHIN each language
    // partition — the shuffle key is the partition column, the cumsum is a
    // per-group window, and no global ordering is ever required (a single
    // global cumsum would serialize the corpus through one reducer).
    Q("q_pack_sequences",
      (s, d) => {
        val w = Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .withColumn("cum", sum(col("n_tokens")).over(w))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            floor((col("cum") - col("n_tokens")) / lit(2048.0)).cast("long").as("pack_id"))
          .orderBy("doc_id")
      },
      Some(s"WITH ${Q.toksCte}, " +
        "tk AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens " +
        "FROM toks JOIN documents USING (doc_id)), " +
        "c AS (SELECT doc_id, lang, n_tokens, sum(n_tokens) OVER " +
        "(PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM tk) " +
        "SELECT doc_id, lang, n_tokens, CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id " +
        "FROM c ORDER BY doc_id")),

    // Benchmark decontamination: fraction of each training doc's distinct
    // shingles that appear anywhere in the benchmark subset (docs 0-24
    // stand in for an eval set). The standard pretraining hygiene pass:
    // explode shingles once, broadcast the (small) benchmark shingle set,
    // count hits per doc — at 100 TB the only shuffle is the per-doc
    // aggregation; the benchmark side stays a broadcast however big the
    // corpus grows.
    Q("q_decontaminate",
      (s, d) => {
        val sh = docs(s, d).filter(size(col("tokens")) >= 3)
          .select(col("doc_id"),
            explode(array_distinct(Dedup.shingles(col("tokens")))).as("sh"))
        val bench = sh.filter(col("doc_id") < 25).select("sh").distinct()
        sh.filter(col("doc_id") >= 25)
          .join(broadcast(bench.withColumn("hit", lit(1L))), Seq("sh"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
          .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
            Q.r6(col("n_contaminated").cast("double") / col("n_shingles").cast("double"))
              .as("contamination"))
          .orderBy("doc_id")
      },
      Some(s"WITH ${Q.toksCte}, " +
        s"shx AS (SELECT doc_id, unnest(list_distinct(${Dedup.shinglesSql("toks")})) AS sh " +
        "FROM toks WHERE len(toks) >= 3), " +
        "bench AS (SELECT DISTINCT sh FROM shx WHERE doc_id < 25), " +
        "tr AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles, " +
        "CAST(sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated " +
        "FROM shx s LEFT JOIN bench b ON s.sh = b.sh WHERE s.doc_id >= 25 GROUP BY s.doc_id) " +
        "SELECT doc_id, n_shingles, n_contaminated, " +
        s"${Q.r6Sql("CAST(n_contaminated AS DOUBLE) / CAST(n_shingles AS DOUBLE)")} AS contamination " +
        "FROM tr ORDER BY doc_id")),

    // Bloom-prefiltered decontamination — same RESULT as q_decontaminate
    // (a Bloom filter has no false negatives, and the exact verify join
    // kills its false positives, so the output is hash-identical), but the
    // regime it exists for is the one where the benchmark shingle set is
    // too big to broadcast as a HASH RELATION yet trivial as a BLOOM:
    // ~10 bits/key vs ≥30-100 bytes/key means a 100M-shingle eval suite is
    // a ~120 MB bloom where the broadcast-hash-join relation would be
    // 10+ GB. The train side is pruned MAP-SIDE by the bloom (no shuffle,
    // no join) down to the ~contaminated fraction, and only those
    // survivors pay the exact verify join. The bloom membership probe is a
    // broadcast-closure UDF over spark.util.sketch.BloomFilter — one
    // non-codegen filter stage, accepted deliberately: it replaces the
    // entire big-side join input, which at 100 TB is the difference
    // between joining every shingle and joining ~1% of them.
    Q("q_decontaminate_bloom",
      (s, d) => {
        val sh = docs(s, d).filter(size(col("tokens")) >= 3)
          .select(col("doc_id"),
            explode(array_distinct(Dedup.shingles(col("tokens")))).as("sh"))
        val bench = sh.filter(col("doc_id") < 25).select("sh").distinct()
          .localCheckpoint(true) // sized once, probed twice (bloom + verify)
        val bf = bench.stat.bloomFilter("sh", math.max(bench.count(), 1L), 0.01)
        val bfB = s.sparkContext.broadcast(bf)
        val mightContain = udf((x: String) => x != null && bfB.value.mightContainString(x))
        val train = sh.filter(col("doc_id") >= 25)
        val counts = train.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
        val contaminated = train.filter(mightContain(col("sh")))
          .join(bench, Seq("sh")) // exact verify of the bloom survivors
          .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
        counts.join(contaminated, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_shingles"),
            coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
            Q.r6(coalesce(col("n_contaminated"), lit(0L)).cast("double")
              / col("n_shingles").cast("double")).as("contamination"))
          .orderBy("doc_id")
      },
      Some(s"WITH ${Q.toksCte}, " +
        s"shx AS (SELECT doc_id, unnest(list_distinct(${Dedup.shinglesSql("toks")})) AS sh " +
        "FROM toks WHERE len(toks) >= 3), " +
        "bench AS (SELECT DISTINCT sh FROM shx WHERE doc_id < 25), " +
        "tr AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles, " +
        "CAST(sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated " +
        "FROM shx s LEFT JOIN bench b ON s.sh = b.sh WHERE s.doc_id >= 25 GROUP BY s.doc_id) " +
        "SELECT doc_id, n_shingles, n_contaminated, " +
        s"${Q.r6Sql("CAST(n_contaminated AS DOUBLE) / CAST(n_shingles AS DOUBLE)")} AS contamination " +
        "FROM tr ORDER BY doc_id")),

    // Embedding QA: per-(label, dimension) centroid and variance — the
    // drift/collapse monitor for an embedding pipeline. Floats are
    // quantized to 1e-6 integers BEFORE summing (floor(v·1e6 + 0.5), exact
    // long arithmetic), so the aggregate is order-independent: Spark's
    // partial/final aggregation tree and DuckDB's sequential sum get the
    // SAME integer, and the round-6 oracle can never flake on double
    // summation order. One explode + one partial-agg'd groupBy; no window.
    Q("q_embed_centroids",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val nD = col("n")
        e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .select(col("label"), col("pos").cast("long").as("pos"),
            floor(col("v").cast("double") * 1e6 + 0.5).cast("long").as("sv"))
          .groupBy("label", "pos")
          .agg(count(lit(1)).cast("double").as("n"),
            sum(col("sv")).cast("double").as("s"),
            // sv² ~ 1e12: widen to DECIMAL(38,0) (BIGINT sum overflows at
            // ~9.2M vectors per group; DuckDB widens to HUGEINT)
            sum((col("sv") * col("sv")).cast("decimal(38,0)")).cast("double").as("ss"))
          .select(col("label"), col("pos"),
            Q.r6(col("s") / (nD * 1e6)).as("centroid"),
            Q.r6((col("ss") - col("s") * col("s") / nD) / ((nD - 1.0) * 1e12)).as("dim_var"))
          .orderBy("label", "pos")
      },
      Some("WITH ex AS (SELECT label, CAST(i - 1 AS BIGINT) AS pos, " +
        "CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS sv " +
        s"FROM embeddings CROSS JOIN ${Q.dimSeriesSql} AS g(i) WHERE i <= len(embedding)), " +
        "ag AS (SELECT label, pos, CAST(count(*) AS DOUBLE) AS n, " +
        "CAST(sum(sv) AS DOUBLE) AS s, CAST(sum(sv * sv) AS DOUBLE) AS ss " +
        "FROM ex GROUP BY label, pos) " +
        s"SELECT label, pos, ${Q.r6Sql("s / (n * 1e6)")} AS centroid, " +
        s"${Q.r6Sql("(ss - s * s / n) / ((n - 1.0) * 1e12)")} AS dim_var " +
        "FROM ag ORDER BY label, pos")),

    // ---- Multimodal plumbing ----

    // Binary payload + batched stub decode via mapPartitions (the
    // mapInPandas-shaped plumbing oracle; the REAL decodes live in
    // q_mm_decode_real / q_mm_decode_wav — the stub remains the seam for
    // media kinds whose decode genuinely needs codec libs this container
    // lacks: video frames, compressed audio)
    Q("q_mm_decode_stub",
      (s, d) => {
        val payload = t(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        Multimodal.decodeMeta(payload, "doc_id", "payload", Multimodal.StubDecoder)
          .toDF().orderBy("doc_id")
      },
      Some("SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        "64 + CAST(octet_length(encode(text)) AS BIGINT) % 577 AS width, " +
        "64 + (CAST(octet_length(encode(text)) AS BIGINT) * 7) % 481 AS height, " +
        "1 + CAST(octet_length(encode(text)) AS BIGINT) % 4 AS channels " +
        "FROM documents ORDER BY doc_id")),

    // REAL image decode (round-15 directive #1): deterministic PNG / JPEG /
    // GIF fixture payloads with closed-form dimensions, parsed back by the
    // pure-Scala header parsers ([[Multimodal.HeaderParseDecoder]] — actual
    // container bytes in, actual IHDR/SOFn/screen-descriptor fields out;
    // garbage payloads → nulls). The oracle restates the fixtures'
    // closed-form metadata in SQL, so a parser reading the wrong offset,
    // endianness, or segment is a hash mismatch — not a vacuous pass.
    Q("q_mm_decode_real",
      (s, d) => {
        import s.implicits._
        val gen = t(s, d, "documents").select(col("doc_id").cast("long")).as[Long]
          .map(id => (id, Multimodal.ImageFixtures.payload(id)))
          .toDF("doc_id", "payload")
        Multimodal.decodeImageMeta(gen, "doc_id", "payload")
          .toDF().orderBy("doc_id")
      },
      Some("SELECT doc_id, " +
        "CAST(CASE doc_id % 4 WHEN 0 THEN 33 WHEN 1 THEN 41 WHEN 2 THEN 14 " +
        "ELSE 16 END AS BIGINT) AS n_bytes, " +
        "CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif' " +
        "ELSE NULL END AS format, " +
        "CASE WHEN doc_id % 4 = 3 THEN NULL ELSE 1 + (doc_id * 7) % 640 END AS width, " +
        "CASE WHEN doc_id % 4 = 3 THEN NULL ELSE 1 + (doc_id * 13) % 480 END AS height, " +
        "CASE WHEN doc_id % 4 = 3 THEN NULL ELSE 3 END AS channels " +
        "FROM documents ORDER BY doc_id")),

    // REAL audio metadata decode: RIFF/WAVE chunk scan (fmt + data, with a
    // LIST chunk spliced between so the scan skips a real foreign chunk) —
    // the audio face of q_mm_decode_real, same closed-form-oracle rigor.
    // Every 5th payload is garbage → nulls, pinning the total contract
    // cross-engine.
    Q("q_mm_decode_wav",
      (s, d) => {
        import s.implicits._
        val gen = t(s, d, "documents").select(col("doc_id").cast("long")).as[Long]
          .map { id =>
            val payload =
              if (id % 5 == 4) Multimodal.ImageFixtures.garbage(id)
              else Multimodal.ImageFixtures.wav(
                (8000L + (id * 7) % 36000).toInt,
                (1L + id % 2).toInt,
                (1L + (id * 13) % 97).toInt)
            (id, payload)
          }
          .toDF("doc_id", "payload")
        Multimodal.decodeAudioMeta(gen, "doc_id", "payload")
          .toDF().orderBy("doc_id")
      },
      Some("SELECT doc_id, " +
        "CAST(CASE WHEN doc_id % 5 = 4 THEN 16 " +
        "ELSE 56 + (1 + (doc_id * 13) % 97) * (1 + doc_id % 2) * 2 END AS BIGINT) AS n_bytes, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL ELSE 'wav' END AS format, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL ELSE 8000 + (doc_id * 7) % 36000 END AS sample_rate, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL ELSE 1 + doc_id % 2 END AS channels, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL ELSE CAST(16 AS BIGINT) END AS bits, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL ELSE 1 + (doc_id * 13) % 97 END AS n_samples " +
        "FROM documents ORDER BY doc_id")),

    // REAL compressed-audio metadata decode (round-16 directive #5,
    // extended round 18): MPEG-1/2/2.5 Layer III frame headers — ID3v2
    // skip, version-indexed bitrate/sample-rate table lookups, the spec's
    // per-version frame-length arithmetic tiling the payload exactly, and
    // a Xing VBR header lane (doc_id % 7 = 3: a leading audio-free header
    // frame whose frames field the parser cross-checks against the walk).
    // The oracle restates the fixture stream's closed-form size and
    // metadata in SQL, so a wrong table entry, a wrong per-version
    // coefficient, a broken ID3 skip, or a miscounted VBR header frame is
    // a hash mismatch. Every 5th payload is garbage → nulls (the
    // total-decode contract, cross-engine).
    Q("q_mm_decode_mp3",
      (s, d) => {
        import s.implicits._
        val gen = t(s, d, "documents").select(col("doc_id").cast("long")).as[Long]
          .map { id =>
            val payload =
              if (id % 5 == 4) Multimodal.ImageFixtures.garbage(id)
              else Multimodal.ImageFixtures.mp3(
                (id % 3).toInt, (id % 4).toInt,
                (1 + id % 7).toInt, (id % 17).toInt, mono = id % 2 == 0,
                version = ((id / 5) % 3).toInt, vbr = id % 7 == 3)
            (id, payload)
          }
          .toDF("doc_id", "payload")
        Multimodal.decodeMp3Meta(gen, "doc_id", "payload")
          .toDF().orderBy("doc_id")
      },
      Some("WITH f AS (SELECT doc_id, (doc_id // 5) % 3 AS vi, " +
        "CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS sr1, " +
        "CASE doc_id % 4 WHEN 0 THEN 96 WHEN 1 THEN 128 WHEN 2 THEN 192 ELSE 256 END AS br1, " +
        "1 + doc_id % 7 AS nf FROM documents), " +
        "g AS (SELECT doc_id, nf, " +
        "sr1 // (CASE vi WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END) AS sr, " +
        "br1 // (CASE vi WHEN 0 THEN 1 ELSE 2 END) AS br, " +
        "CASE vi WHEN 0 THEN 144000 ELSE 72000 END AS coef, " +
        "CASE vi WHEN 0 THEN 1152 ELSE 576 END AS spf, " +
        "nf + CASE WHEN doc_id % 7 = 3 THEN 1 ELSE 0 END AS tot FROM f) " +
        "SELECT doc_id, " +
        "CAST(CASE WHEN doc_id % 5 = 4 THEN 16 " +
        "ELSE 10 + doc_id % 17 + tot * ((coef * br) // sr) END AS BIGINT) AS n_bytes, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL ELSE 'mp3' END AS format, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL ELSE sr END AS sample_rate, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL ELSE 1 + doc_id % 2 END AS channels, " +
        "CAST(NULL AS BIGINT) AS bits, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL ELSE nf * spf END AS n_samples " +
        "FROM g ORDER BY doc_id")),

    // REAL video-container metadata decode (round-16 directive #5):
    // ISO-BMFF box walk — ftyp sanity, moov/mvhd timescale+duration,
    // moov/trak/tkhd 16.16 width/height. Same closed-form-oracle rigor;
    // every 5th payload garbage → nulls.
    Q("q_mm_decode_mp4",
      (s, d) => {
        import s.implicits._
        val gen = t(s, d, "documents").select(col("doc_id").cast("long")).as[Long]
          .map { id =>
            val payload =
              if (id % 5 == 4) Multimodal.ImageFixtures.garbage(id)
              else Multimodal.ImageFixtures.mp4(
                (1 + (id * 7) % 1920).toInt, (1 + (id * 13) % 1080).toInt,
                (600 * (1 + id % 4)).toInt, (1 + (id * 11) % 100000).toInt)
            (id, payload)
          }
          .toDF("doc_id", "payload")
        Multimodal.decodeVideoMeta(gen, "doc_id", "payload")
          .toDF().orderBy("doc_id")
      },
      Some("SELECT doc_id, " +
        "CAST(CASE WHEN doc_id % 5 = 4 THEN 16 ELSE 232 END AS BIGINT) AS n_bytes, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL ELSE 'mp4' END AS format, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL ELSE 1 + (doc_id * 7) % 1920 END AS width, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL ELSE 1 + (doc_id * 13) % 1080 END AS height, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL ELSE 600 * (1 + doc_id % 4) END AS timescale, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL ELSE 1 + (doc_id * 11) % 100000 END AS duration " +
        "FROM documents ORDER BY doc_id")),

    // Frame sampling: one row per sampled frame with deterministic stride —
    // the one-to-many media op (explode of a generated index range)
    Q("q_mm_frame_sample",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), (col("n_chars") % 30 + 1).as("n_frames"))
        .select(col("doc_id"), col("n_frames"),
          explode(sequence(lit(0L), col("n_frames") - 1, lit(5L))).as("frame_idx"))
        .orderBy("doc_id", "frame_idx"),
      Some("SELECT doc_id, n_chars % 30 + 1 AS n_frames, " +
        "unnest(generate_series(0, n_chars % 30, 5)) AS frame_idx " +
        "FROM documents ORDER BY doc_id, frame_idx")),

    // Feature extraction stub: fixed-size feature vector derived from the
    // payload hash (stands in for an audio/image feature net); projected to
    // scalars for comparison. Feeds the same similarity machinery as real
    // embeddings.
    Q("q_mm_feature_hash",
      (s, d) => {
        val feat = transform(sequence(lit(1), lit(32)),
          j => ascii(substring(md5(col("text")), j, lit(1))).cast("double") / 128.0)
        t(s, d, "documents")
          .withColumn("f", feat)
          .select(col("doc_id"),
            round(element_at(col("f"), 1), 6).as("f0"),
            round(element_at(col("f"), 17), 6).as("f16"),
            round(graft.functions.VectorOps.l2NormHof(col("f")), 6).as("fnorm"))
          .orderBy("doc_id")
      },
      Some("WITH ft AS (SELECT doc_id, list_transform(generate_series(1, 32), " +
        "j -> CAST(ascii(substr(md5(text), j, 1)) AS DOUBLE) / 128.0) AS f FROM documents) " +
        "SELECT doc_id, round(f[1], 6) AS f0, round(f[17], 6) AS f16, " +
        "round(sqrt(list_sum(list_transform(generate_series(1, len(f)), " +
        "i -> CAST(f[i] AS DOUBLE) * CAST(f[i] AS DOUBLE)))), 6) AS fnorm " +
        "FROM ft ORDER BY doc_id")),

    // Multimodal CURATION GATE (round 18): keep corpus rows BY decoded
    // metadata — the media face of the text quality gate (a real training
    // pipeline drops undecodable payloads and below-minimum media before
    // any expensive feature pass). Shape at 100 TB: the decode is a
    // map-only mapPartitions over the payload column; the gate is a
    // doc_id semi join of the passing meta back into the source rows —
    // no shuffle beyond the join, the filter prunes BEFORE downstream
    // work. The oracle restates the fixtures' closed-form pass/fail
    // arithmetic in SQL, so a wrong decode OR a wrong gate bound is a
    // hash mismatch (garbage payloads fail format IS NOT NULL).
    Q("q_mm_quality_gate",
      (s, d) => {
        import s.implicits._
        val gen = t(s, d, "documents").select(col("doc_id").cast("long")).as[Long]
          .map(id => (id, Multimodal.ImageFixtures.payload(id)))
          .toDF("doc_id", "payload")
        val meta = Multimodal.decodeImageMeta(gen, "doc_id", "payload").toDF()
        val passing = meta.filter(
          col("format").isNotNull &&
            col("width") >= 64 && col("height") >= 64 &&
            col("channels") === 3)
          .select(col("doc_id"), col("format"), col("width"), col("height"))
        // the GATE: original payload rows surviving by meta verdict
        gen.join(passing, Seq("doc_id"))
          .select(col("doc_id"), col("format"), col("width"), col("height"),
            length(col("payload")).cast("long").as("n_bytes"))
          .orderBy("doc_id")
      },
      Some("SELECT doc_id, " +
        "CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS format, " +
        "1 + (doc_id * 7) % 640 AS width, 1 + (doc_id * 13) % 480 AS height, " +
        "CAST(CASE doc_id % 4 WHEN 0 THEN 33 WHEN 1 THEN 41 ELSE 14 END AS BIGINT) AS n_bytes " +
        "FROM documents WHERE doc_id % 4 <> 3 " +
        "AND 1 + (doc_id * 7) % 640 >= 64 AND 1 + (doc_id * 13) % 480 >= 64 " +
        "ORDER BY doc_id")),

    // The audio/video face of the curation gate (round-18 directive #5):
    // each training sample carries BOTH an audio clip and a video clip
    // (the multimodal-pair shape), and the gate keeps a sample only when
    // BOTH modalities decode and pass their floors — sample-rate ≥ 16 kHz
    // and ≥ 24 samples for the audio; ≥ 640×360 and ≥ 10 s for the video
    // (duration_s = mvhd duration / timescale). Garbage stripes differ per
    // modality (audio id%5=4, video id%3=2) so the intersection is doing
    // real work. Plan shape mirrors q_mm_quality_gate: two map-only
    // decodes → predicates → one key join of the two pruned verdict sets —
    // at 100 TB this is a per-modality scan plus a join of the tiny
    // survivor sets, never a corpus-wide shuffle of payload bytes.
    Q("q_mm_quality_gate_av",
      (s, d) => {
        import s.implicits._
        val ids = t(s, d, "documents").select(col("doc_id").cast("long")).as[Long]
        // multipliers chosen to SPREAD across each floor within the
        // testdata id range (the decode queries' ×7/×13 stay below the
        // 16 kHz floor for every id < 1144 — a gate over them would pass
        // vacuously on 0 rows at every test SF)
        val aud = ids.map { id =>
            val payload =
              if (id % 5 == 4) Multimodal.ImageFixtures.garbage(id)
              else Multimodal.ImageFixtures.wav(
                (8000L + (id * 97) % 36000).toInt,
                (1L + id % 2).toInt,
                (1L + (id * 13) % 97).toInt)
            (id, payload)
          }.toDF("doc_id", "payload")
        val vid = ids.map { id =>
            val payload =
              if (id % 3 == 2) Multimodal.ImageFixtures.garbage(id)
              else Multimodal.ImageFixtures.mp4(
                (1 + (id * 17) % 1920).toInt, (1 + (id * 29) % 1080).toInt,
                (600 * (1 + id % 4)).toInt, (1 + (id * 331) % 100000).toInt)
            (id, payload)
          }.toDF("doc_id", "payload")
        val audPass = Multimodal.decodeAudioMeta(aud, "doc_id", "payload").toDF()
          .filter(col("format").isNotNull &&
            col("sample_rate") >= 16000 && col("n_samples") >= 24)
          .select(col("doc_id"), col("sample_rate"), col("n_samples"))
        val vidPass = Multimodal.decodeVideoMeta(vid, "doc_id", "payload").toDF()
          .filter(col("format").isNotNull &&
            col("width") >= 640 && col("height") >= 360 &&
            col("duration").cast("double") / col("timescale") >= 10.0)
          .select(col("doc_id"), col("width"), col("height"),
            Q.r6(col("duration").cast("double") / col("timescale")).as("duration_s"))
        audPass.join(vidPass, Seq("doc_id")).orderBy("doc_id")
      },
      Some("WITH a AS (SELECT doc_id, 8000 + (doc_id * 97) % 36000 AS sample_rate, " +
        "1 + (doc_id * 13) % 97 AS n_samples FROM documents " +
        "WHERE doc_id % 5 <> 4 AND 8000 + (doc_id * 97) % 36000 >= 16000 " +
        "AND 1 + (doc_id * 13) % 97 >= 24), " +
        "v AS (SELECT doc_id, 1 + (doc_id * 17) % 1920 AS width, " +
        "1 + (doc_id * 29) % 1080 AS height, " +
        s"${Q.r6Sql("CAST(1 + (doc_id * 331) % 100000 AS DOUBLE) / (600 * (1 + doc_id % 4))")} AS duration_s " +
        "FROM documents WHERE doc_id % 3 <> 2 " +
        "AND 1 + (doc_id * 17) % 1920 >= 640 AND 1 + (doc_id * 29) % 1080 >= 360 " +
        "AND CAST(1 + (doc_id * 331) % 100000 AS DOUBLE) / (600 * (1 + doc_id % 4)) >= 10.0) " +
        "SELECT doc_id, sample_rate, n_samples, width, height, duration_s " +
        "FROM a JOIN v USING (doc_id) ORDER BY doc_id")),

    // ---- Event / windowed analytics ----

    // Running aggregates per key (ordered by unique event_id; ns timestamps
    // are not portable between engines, so ordering avoids them)
    Q("q_w1_running_sum",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d).filter(col("user_id") < 20)
          .select(col("user_id"), col("event_id"),
            row_number().over(Window.partitionBy(col("user_id")).orderBy(col("event_id"))).cast("long").as("rn"),
            Q.r4(sum(col("value")).over(w)).as("run_value"))
          .orderBy("user_id", "event_id")
      },
      Some("SELECT user_id, event_id, " +
        "CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS rn, " +
        s"${Q.r4Sql("sum(value) OVER (PARTITION BY user_id ORDER BY event_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS run_value " +
        "FROM events WHERE user_id < 20 ORDER BY user_id, event_id")),

    // Tumbling-window aggregation (the batch shape of the Structured
    // Streaming job in graft.streaming; buckets on epoch-nanos so both
    // engines agree without a nanosecond timestamp type)
    Q("q_stream_tumbling_hourly",
      (s, d) => events(s, d)
        .withColumn("bucket", expr(s"ts div $HourNs") * HourNs)
        .groupBy("bucket", "event_type")
        .agg(
          count("*").cast("long").as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
        .orderBy("bucket", "event_type"),
      Some(s"SELECT (epoch_ns(ts) // $HourNs) * $HourNs AS bucket, event_type, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1, 2 ORDER BY bucket, event_type")),

    // JSON property extraction from the event payload
    Q("q_json_extract",
      (s, d) => events(s, d).filter(col("event_id") < 500)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id"),
      Some("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k " +
        "FROM events WHERE event_id < 500 ORDER BY event_id")),

    // T2/X2/X3: the markdown chunker run as a flatMap UDTF over synthetic
    // two-section markdown built from each document; the oracle predicts
    // chunk boundaries, header paths, 1-indexed line numbers and token
    // counts (DefaultAnalyzer ≡ lowercase [a-z0-9]+ runs on this ASCII
    // corpus) in plain SQL.
    Q("q_t2_chunker",
      (s, d) => {
        import s.implicits._
        val chunker = new graft.analyze.MarkdownChunker()
        t(s, d, "documents").select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
          .flatMap { case (id, src, text) =>
            val md = s"# $src\n\n$text\n\n## tail\n\n${text.take(50)}"
            chunker.chunk(src, md).map(c =>
              (id, c.filePath, c.headerPath, c.lineStart, c.lineEnd, c.tokens.size.toLong))
          }
          .toDF("doc_id", "file_path", "header_path", "line_start", "line_end", "n_tokens")
          .orderBy("doc_id", "line_start")
      },
      Some {
        def toks(e: String) =
          s"CAST(len(regexp_extract_all(lower($e), '([a-z0-9]+)', 1)) AS BIGINT)"
        "SELECT doc_id, source AS file_path, source AS header_path, " +
          "1 AS line_start, 3 AS line_end, " +
          toks("'# ' || source || chr(10) || chr(10) || text") + " AS n_tokens " +
          "FROM documents " +
          "UNION ALL " +
          "SELECT doc_id, source, source || '/tail', 5, 7, " +
          toks("'## tail' || chr(10) || chr(10) || substr(text, 1, 50)") +
          " FROM documents ORDER BY doc_id, line_start"
      }),

    // T2 twin for the SECOND splitter strategy (chonkie-recursive,
    // reference splitter.py:126-218): constant-shaped markdown per document
    // whose 11 tokens exceed the budget of 8, forcing the header-level
    // recursive split into two predictable chunks. Exercises the strategy's
    // observable differences: a chunk's own leading header is excluded from
    // its header_path, and there is no overlap.
    Q("q_t2_chunker_recursive",
      (s, d) => {
        import s.implicits._
        val chunker = new graft.analyze.RecursiveChunker(chunkSize = 8)
        t(s, d, "documents").select(col("doc_id"), col("source"))
          .as[(Long, String)]
          .flatMap { case (id, src) =>
            val md = s"# sec$id\n\nalpha beta gamma\n\n## sub\n\none two three four five six"
            chunker.chunk(src, md).map(c =>
              (id, c.filePath, c.headerPath, c.lineStart, c.lineEnd, c.tokens.size.toLong))
          }
          .toDF("doc_id", "file_path", "header_path", "line_start", "line_end", "n_tokens")
          .orderBy("doc_id", "line_start")
      },
      Some("SELECT doc_id, source AS file_path, '' AS header_path, " +
        "1 AS line_start, 3 AS line_end, CAST(4 AS BIGINT) AS n_tokens FROM documents " +
        "UNION ALL " +
        "SELECT doc_id, source, 'sec' || doc_id, 5, 7, CAST(7 AS BIGINT) " +
        "FROM documents ORDER BY doc_id, line_start")),

    // MLlib BucketedRandomProjectionLSH approximate kNN — the library ANN
    // scale path, in its BATCH shape: three query vectors resolved in ONE
    // `approxSimilarityJoin` job (queries hash once, candidates only form
    // in colliding buckets) instead of one driver-side
    // `approxNearestNeighbors` job per query. Oracle-checked by CONTRACT
    // (the q_approx_distinct / q_approx_quantiles pattern, round-13/14
    // directive): the LSH candidate set is engine-specific (MLlib hash
    // internals, seed 42), but the contract is cross-engine — every approx
    // neighbor is a corpus member, and recall@10 against the exact top-10
    // meets the bound. Compared columns are the EXACT top-10 per query
    // (full rank/dist parity — the same brute-force window SQL as
    // q_sim_knn_join) plus the two per-query bound checks, computed
    // Spark-side and hardcoded `true` in the oracle. The 100 TB production
    // path is the LSH join alone (candidates form only inside colliding
    // buckets); the exact side exists to EXPRESS the check, exactly like
    // q_approx_distinct's countDistinct.
    Q("q_sim_approx_lsh",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val qs = e.filter(col("vec_id") < 3)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        // excludeSelf on BOTH sides: queries are corpus members, and the
        // exact side (knnJoin) excludes the self-pair too
        val approx = graft.ops.ApproxKnn.approxTopKBatch(e, "vec_id", "embedding",
          qs, "qid", "qvec", k = 10, bucketLength = 2.0, numHashTables = 8,
          excludeSelf = true)
        val exact = Similarity.knnJoin(e, "vec_id", "embedding", qs, "qid", "qvec", 10)
          .select(col("qid"), col("id").as("vec_id"), col("rank"),
            Q.r6(col("dist")).as("dist"))
        val checks = approx.select("qid", "vec_id")
          .join(e.select(col("vec_id")).distinct().withColumn("_inc", lit(1)),
            Seq("vec_id"), "left")
          .join(exact.select(col("qid"), col("vec_id")).withColumn("_hit", lit(1)),
            Seq("qid", "vec_id"), "left")
          .groupBy("qid")
          .agg(count(lit(1)).as("n_approx"),
            sum(coalesce(col("_inc"), lit(0))).as("n_in_corpus"),
            sum(coalesce(col("_hit"), lit(0))).as("n_recalled"))
          .select(col("qid"),
            (col("n_approx") === col("n_in_corpus")).as("in_corpus_ok"),
            // 8 hash tables at bucketLength 2.0 recall the exact top-10
            // in full on the test corpora; ≥9/10 leaves one tie-boundary
            // miss of headroom without weakening the contract
            (col("n_recalled") >= 9).as("recall_ok"))
        exact.join(checks, "qid")
          .select(col("qid"), col("vec_id"), col("rank"), col("dist"),
            col("in_corpus_ok"), col("recall_ok"))
          .orderBy("qid", "rank")
      },
      Some("WITH qs AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3), " +
        s"dd AS (SELECT qid, vec_id, ${Q.cosineDistSql("embedding", "qvec")} AS dist " +
        "FROM embeddings CROSS JOIN qs WHERE vec_id != qid), " +
        "rr AS (SELECT qid, vec_id, dist, CAST(row_number() OVER " +
        "(PARTITION BY qid ORDER BY round(dist, 6), vec_id) AS BIGINT) AS rank FROM dd) " +
        s"SELECT qid, vec_id, rank, ${Q.r6Sql("dist")} AS dist, " +
        "true AS in_corpus_ok, true AS recall_ok " +
        "FROM rr WHERE rank <= 10 ORDER BY qid, rank")),

    // X9: id generation — inherently non-deterministic, rows-only check
    // (SURVEY.md §2.8 X9)
    Q("q_x9_idgen",
      (s, d) => t(s, d, "documents").select(col("doc_id"), expr("uuid()").as("gen_id")),
      None))
}
