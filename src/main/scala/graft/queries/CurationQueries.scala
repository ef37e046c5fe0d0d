package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Q.t

/** Output-side curation operators a pretraining pipeline needs between
  * "corpus is filtered/deduped" and "tokens hit the trainer": deterministic
  * shard layout, embedding quantization, vocabulary/BPE statistics, and
  * PII redaction. All map-only or single partial-agg shapes — each scales
  * linearly and none ever needs a global sort or a driver-side collect.
  */
object CurationQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Q.docsTokens(s, d)

  /** Portable 0..15 hash: one hex nibble of md5, decoded with `instr` so
    * both engines evaluate the identical expression (Spark's `hash()` and
    * DuckDB's `hash()` are engine-specific). One nibble IS the full hash
    * for 16 shards — any wider hex prefix mod 16 reduces to its last
    * digit. A different shard count wants ceil(log16(count)) nibbles and
    * a count that isn't a power of 16, or every high nibble is dead. */
  private[queries] val nibbleHashSql: String =
    "instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1"

  /** Portable uniform-[0,1) draw from the first 8 md5 nibbles of `text`,
    * decoded with `instr` (the [[nibbleHashSql]] trick, widened to 32 bits:
    * Σ nibble_i · 16^(7−i) / 2^32). Both engines evaluate the IDENTICAL
    * expression string, so per-row draws agree bit-for-bit — the foundation
    * of every deterministic sampling operator here (no RNG state, so a
    * 100 TB sample is reproducible and resumable shard by shard). */
  private[queries] val unitHashSql: String =
    (0 until 8).map { i =>
      s"CAST(instr('0123456789abcdef', substr(md5(text), ${i + 1}, 1)) - 1 AS BIGINT) " +
        s"* ${1L << (4 * (7 - i))}"
    }.mkString("(", " + ", ") / 4294967296.0")

  /** Quality-weighted keep decision as a pure projection+filter over
    * (doc_id, text, tokens) — stateless, so the SAME function runs under
    * `readStream` unchanged (CurationStreamSpec pins batch-equality). */
  private[graft] def weightedSample(tokenized: DataFrame): DataFrame = {
    val base = tokenized
      .withColumn("n_tok", size(col("tokens")).cast("long"))
      .withColumn("stop_ratio",
        graft.ops.TextAnalysis.stopwordCount(col("tokens")).cast("double") /
          col("n_tok").cast("double"))
      .withColumn("quality", round(
        graft.ops.TextAnalysis.qualityScore(col("n_tok"), col("stop_ratio")), 6))
      .withColumn("keep_p", greatest(lit(0.1), least(lit(1.0), col("quality"))))
      .withColumn("u", expr(unitHashSql))
    base.filter(col("u") < col("keep_p"))
      .select(col("doc_id"), Q.r6(col("keep_p")).as("keep_p"), Q.r6(col("u")).as("u"))
  }

  val all: Seq[Q] = Seq(

    // ---- Training-output shard layout ----

    // Deterministic shard assignment: content-hash modulo shard count, with
    // the per-shard balance histogram a writer would use to validate layout.
    // The assignment is a map-only expression (no RNG, no row ordering), so
    // resharding 100 TB is reproducible and restartable; the histogram is one
    // partial-agg'd groupBy on a 16-value key. The real write is then
    // `df.repartition(col("shard_id")).write.partitionBy("shard_id")` —
    // benchmarked through the same noop sink as every other query.
    Q("q_shard_assign",
      (s, d) => docs(s, d)
        .withColumn("shard_id", expr(nibbleHashSql))
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("tokens")).cast("long")).as("n_tokens"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy("shard_id"),
      Some(s"WITH ${Q.toksCte}, " +
        s"sh AS (SELECT doc_id, len(toks) AS nt, $nibbleHashSql AS shard_id " +
        "FROM toks JOIN documents USING (doc_id)) " +
        "SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(nt) AS BIGINT) AS n_tokens, " +
        "min(doc_id) AS min_doc, max(doc_id) AS max_doc " +
        "FROM sh GROUP BY shard_id ORDER BY shard_id")),

    // Seeded epoch shuffle: every training epoch wants a DIFFERENT global
    // order, reproducibly, without moving a byte of document data. Each
    // (epoch, doc) gets an md5 position key; shard = first nibble, order
    // within shard = (position key, doc_id). Re-shuffling 100 TB for epoch
    // N+1 is then a metadata pass — recompute ranks, leave the shard files
    // where they are; the rank window is PARTITIONED by shard, so no
    // global sort ever exists. The shard count is the parallelism knob:
    // per-reducer sort cost is corpus/shards, so a real 100 TB run widens
    // the key to enough nibbles that a shard fits a reducer (the plan is
    // identical at 16 or 65536 shards; 16 keeps the oracle compact). Two
    // epochs emitted side by side to pin that the orders actually differ
    // while both stay deterministic.
    Q("q_epoch_shuffle",
      (s, d) => {
        def h(e: String) = s"md5(concat('$e:', CAST(doc_id AS STRING)))"
        def shard(e: String) =
          s"instr('0123456789abcdef', substr(${h(e)}, 1, 1)) - 1"
        val w1 = Window.partitionBy(col("shard_e1"))
          .orderBy(col("h1").asc, col("doc_id").asc)
        val w2 = Window.partitionBy(col("shard_e2"))
          .orderBy(col("h2").asc, col("doc_id").asc)
        t(s, d, "documents")
          .select(col("doc_id"),
            expr(h("ep1")).as("h1"), expr(shard("ep1")).as("shard_e1"),
            expr(h("ep2")).as("h2"), expr(shard("ep2")).as("shard_e2"))
          .withColumn("rank_e1", row_number().over(w1).cast("long"))
          .withColumn("rank_e2", row_number().over(w2).cast("long"))
          .select("doc_id", "shard_e1", "rank_e1", "shard_e2", "rank_e2")
          .orderBy("doc_id")
      },
      Some("WITH k AS (SELECT doc_id, " +
        "md5(concat('ep1:', CAST(doc_id AS STRING))) AS h1, " +
        "md5(concat('ep2:', CAST(doc_id AS STRING))) AS h2 FROM documents), " +
        "sh AS (SELECT doc_id, h1, h2, " +
        "instr('0123456789abcdef', substr(h1, 1, 1)) - 1 AS shard_e1, " +
        "instr('0123456789abcdef', substr(h2, 1, 1)) - 1 AS shard_e2 FROM k) " +
        "SELECT doc_id, shard_e1, " +
        "CAST(row_number() OVER (PARTITION BY shard_e1 ORDER BY h1, doc_id) AS BIGINT) AS rank_e1, " +
        "shard_e2, " +
        "CAST(row_number() OVER (PARTITION BY shard_e2 ORDER BY h2, doc_id) AS BIGINT) AS rank_e2 " +
        "FROM sh ORDER BY doc_id")),

    // Corpus-global boilerplate detection — the C4/CCNet repeated-line
    // rule, at 8-token-window granularity (the corpus has no line
    // structure): hash every non-overlapping window, count global
    // occurrences, flag each doc's fraction of windows that appear
    // elsewhere. Shapes like exact dedup: one shuffle keyed on the window
    // hash (32-byte key, map-side combined), one per-doc agg — no
    // pairwise anything, so the pass is linear in corpus tokens at 100 TB.
    Q("q_boilerplate_windows",
      (s, d) => {
        graft.ops.CuratePipeline.windowHashFreq(docs(s, d))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_windows"),
            sum(when(col("wf") > 1, 1L).otherwise(0L)).as("n_boiler"))
          .select(col("doc_id"), col("n_windows"), col("n_boiler"),
            Q.r6(col("n_boiler").cast("double") / col("n_windows").cast("double"))
              .as("boiler_ratio"))
          .orderBy("doc_id")
      },
      Some(s"WITH ${Q.toksCte}, " +
        "w AS (SELECT doc_id, md5(array_to_string(list_slice(toks, (i-1)*8+1, i*8), ' ')) AS wh " +
        "FROM toks CROSS JOIN (SELECT unnest(range(1, (SELECT CAST(ceil(max(len(toks)) / 8.0) AS BIGINT) + 1 FROM toks))) AS i) g " +
        "WHERE len(toks) >= 1 AND (i-1)*8 < len(toks)), " +
        "f AS (SELECT wh, count(*) AS wf FROM w GROUP BY wh) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows, " +
        "CAST(sum(CASE WHEN wf > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler, " +
        s"${Q.r6Sql("CAST(sum(CASE WHEN wf > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)")} AS boiler_ratio " +
        "FROM w JOIN f USING (wh) GROUP BY doc_id ORDER BY doc_id")),

    // Corpus snapshot diff: classify every doc across two corpus versions
    // as added / removed / changed / same by content hash — the ingest
    // bookkeeping pass that decides what an incremental pipeline actually
    // reprocesses. Versions derive deterministically from the corpus, with
    // split points as FRACTIONS of max(doc_id) (v1 = lowest 90% of the id
    // range, v2 = ids above the 10% mark, every 10th doc edited) so the
    // diff keeps its added/removed/changed/same mix at every scale factor
    // instead of degenerating to all-'added' beyond the fixture size. One
    // full-outer equi-join on the id, comparing 32-byte hashes, never
    // content; at 100 TB both sides shuffle once on doc_id and the texts
    // themselves stay in their scans (the max(doc_id) scalar rides a
    // broadcast).
    Q("q_corpus_diff",
      (s, d) => {
        val base = t(s, d, "documents").select(col("doc_id"), col("text"))
        val cuts = base.agg(expr("max(doc_id) * 9 div 10").as("c1"),
          expr("max(doc_id) div 10").as("c2"))
        val b = base.crossJoin(broadcast(cuts))
        val v1 = b.filter(col("doc_id") < col("c1"))
          .select(col("doc_id"), md5(col("text")).as("h1"))
        val v2 = b.filter(col("doc_id") >= col("c2"))
          .select(col("doc_id"),
            md5(when(col("doc_id") % 10 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text"))).as("h2"))
        v1.join(v2, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            when(col("h2").isNull, "removed")
              .when(col("h1").isNull, "added")
              .when(col("h1") =!= col("h2"), "changed")
              .otherwise("same").as("status"))
          .orderBy("doc_id")
      },
      Some("WITH c AS (SELECT max(doc_id) * 9 // 10 AS c1, max(doc_id) // 10 AS c2 FROM documents), " +
        "v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents, c WHERE doc_id < c1), " +
        "v2 AS (SELECT doc_id, md5(CASE WHEN doc_id % 10 = 0 THEN text || ' v2' ELSE text END) AS h2 " +
        "FROM documents, c WHERE doc_id >= c2) " +
        "SELECT doc_id, CASE WHEN h2 IS NULL THEN 'removed' WHEN h1 IS NULL THEN 'added' " +
        "WHEN h1 != h2 THEN 'changed' ELSE 'same' END AS status " +
        "FROM v1 FULL OUTER JOIN v2 USING (doc_id) ORDER BY doc_id")),

    // Corpus health report in ONE pass: per-language totals, per-
    // (language, length-decile) breakdown, and the grand total via
    // GROUPING SETS — Spark expands the sets before a single shuffle, so
    // the 100 TB corpus is scanned once for every rollup level instead of
    // once per report row. Group keys are coalesced to sentinels ('<all>',
    // -1) because the engines disagree on NULL sort order and the corpus
    // can't contain the sentinels.
    Q("q_corpus_report",
      (s, d) => {
        val base = t(s, d, "documents").select(col("lang"),
          expr("n_chars div 100").as("len_bucket"),
          size(split(col("text"), " ")).cast("long").as("nt"))
        base.groupingSets(
            Seq(Seq(col("lang")), Seq(col("lang"), col("len_bucket")), Seq()),
            col("lang"), col("len_bucket"))
          .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
          .select(coalesce(col("lang"), lit("<all>")).as("lang"),
            coalesce(col("len_bucket"), lit(-1L)).as("len_bucket"),
            col("n_docs"), col("n_tokens"))
          .orderBy("lang", "len_bucket")
      },
      Some(s"WITH ${Q.toksCte}, " +
        "base AS (SELECT lang, n_chars // 100 AS len_bucket, " +
        "CAST(len(toks) AS BIGINT) AS nt FROM toks JOIN documents USING (doc_id)) " +
        "SELECT coalesce(lang, '<all>') AS lang, " +
        "coalesce(len_bucket, CAST(-1 AS BIGINT)) AS len_bucket, " +
        "CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens " +
        "FROM base GROUP BY GROUPING SETS ((lang), (lang, len_bucket), ()) " +
        "ORDER BY lang, len_bucket")),

    // Quality-weighted deterministic sampling: each doc's keep probability
    // is its (rounded) quality score clamped to [0.1, 1], and the keep
    // decision compares that against the doc's own md5-derived uniform draw
    // — importance sampling that upweights clean text without any RNG
    // state. Map-only except the tokenize; the same doc survives every
    // rerun on any cluster. Thresholds compare the ROUNDED quality (rule
    // boundaries) and the exact rational hash draw (k/2^32), so both
    // engines make identical keep decisions.
    Q("q_sample_weighted",
      (s, d) => weightedSample(docs(s, d)).orderBy("doc_id"),
      Some(s"WITH ${Q.toksCte}, m AS (SELECT doc_id, text, " +
        "CAST(len(toks) AS BIGINT) AS n_tok, " +
        s"${graft.ops.TextAnalysis.stopwordCountSql("toks")} AS n_stop " +
        "FROM toks JOIN documents USING (doc_id)), " +
        "r AS (SELECT doc_id, text, " +
        s"round(${graft.ops.TextAnalysis.qualityScoreSql("n_tok", "CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE)")}, 6) AS quality " +
        "FROM m), " +
        "k AS (SELECT doc_id, greatest(0.1, least(1.0, quality)) AS keep_p, " +
        s"$unitHashSql AS u FROM r) " +
        s"SELECT doc_id, ${Q.r6Sql("keep_p")} AS keep_p, ${Q.r6Sql("u")} AS u " +
        "FROM k WHERE u < keep_p ORDER BY doc_id")),

    // Source-mix rebalancing: resample every source toward a UNIFORM target
    // mix (rate_s = min(1, fair-share / count_s)) with the same
    // deterministic per-doc draw — the "mixture weights" pass a pretraining
    // pipeline runs before writing shards (upsample rare sources is a
    // rate > 1 in real life; here rates cap at 1 so the op stays a filter).
    // Shape: one tiny per-source count (partial-agg'd), rates broadcast
    // back, map-only keep decision, one final count — the corpus itself
    // shuffles zero times.
    Q("q_mix_rebalance",
      (s, d) => {
        val dd = t(s, d, "documents")
        val counts = dd.groupBy("source").agg(count(lit(1)).as("n_before"))
        val tot = counts.agg(sum(col("n_before")).as("total"),
          count(lit(1)).as("n_src"))
        val rates = counts.crossJoin(broadcast(tot))
          .withColumn("rate", least(lit(1.0),
            (col("total").cast("double") / col("n_src").cast("double")) /
              col("n_before").cast("double")))
          .select(col("source"), col("n_before"), col("rate"))
        dd.join(broadcast(rates), Seq("source"))
          .withColumn("u", expr(unitHashSql))
          .filter(col("u") < col("rate"))
          .groupBy("source")
          .agg(max(col("n_before")).as("n_before"),
            Q.r6(max(col("rate"))).as("rate"),
            count(lit(1)).as("n_after"))
          .orderBy("source")
      },
      Some("WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_before FROM documents GROUP BY source), " +
        "t AS (SELECT CAST(sum(n_before) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n_src FROM c), " +
        "r AS (SELECT source, n_before, least(1.0, (CAST(total AS DOUBLE) / CAST(n_src AS DOUBLE)) / CAST(n_before AS DOUBLE)) AS rate FROM c, t), " +
        s"k AS (SELECT d.source, r.n_before, r.rate, $unitHashSql AS u " +
        "FROM documents d JOIN r ON d.source = r.source) " +
        "SELECT source, max(n_before) AS n_before, " +
        s"${Q.r6Sql("max(rate)")} AS rate, CAST(count(*) AS BIGINT) AS n_after " +
        "FROM k WHERE u < rate GROUP BY source ORDER BY source")),

    // α-temperature source mixing — the multinomial-sampling recipe
    // (p_s ∝ n_s^α, α = 0.3 here) that upweights rare domains relative to
    // their raw token share, applied as deterministic per-doc keep rates
    // toward a 50%-of-corpus token budget. Differs from q_mix_rebalance
    // (uniform target) in both the target distribution and the unit: this
    // one budgets TOKENS, the currency a trainer actually consumes. The
    // keep rate is rounded to 6 decimals BEFORE the u < rate cut in both
    // engines — the deterministic cut-line convention — and the corpus
    // never shuffles: per-source token totals partial-agg to ~|sources|
    // rows, rates broadcast back, the keep decision is map-only.
    Q("q_mix_temperature",
      (s, d) => {
        val dd = t(s, d, "documents")
          .select(col("doc_id"), col("text"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
        val counts = dd.groupBy("source").agg(sum(col("n_tok")).as("tok_before"))
        val tot = counts.agg(
          sum(pow(col("tok_before").cast("double"), lit(0.3))).as("sum_pow"),
          sum(col("tok_before")).as("tok_total"))
        val rates = counts.crossJoin(broadcast(tot))
          .withColumn("rate", round(least(lit(1.0),
            (pow(col("tok_before").cast("double"), lit(0.3)) / col("sum_pow")) *
              lit(0.5) * col("tok_total").cast("double") /
              col("tok_before").cast("double")), 6))
          .select(col("source"), col("tok_before"), col("rate"))
        dd.join(broadcast(rates), Seq("source"))
          .withColumn("u", expr(unitHashSql))
          .filter(col("u") < col("rate"))
          .groupBy("source")
          .agg(max(col("tok_before")).as("tok_before"),
            Q.r6(max(col("rate"))).as("rate"),
            count(lit(1)).as("n_after"),
            sum(col("n_tok")).as("tok_after"))
          .orderBy("source")
      },
      Some("WITH n AS (SELECT doc_id, text, source, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents), " +
        "c AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS tok_before FROM n GROUP BY source), " +
        "t AS (SELECT sum(pow(CAST(tok_before AS DOUBLE), 0.3)) AS sum_pow, " +
        "CAST(sum(tok_before) AS BIGINT) AS tok_total FROM c), " +
        "r AS (SELECT source, tok_before, round(least(1.0, " +
        "(pow(CAST(tok_before AS DOUBLE), 0.3) / sum_pow) * 0.5 * " +
        "CAST(tok_total AS DOUBLE) / CAST(tok_before AS DOUBLE)), 6) AS rate FROM c, t), " +
        s"k AS (SELECT n.source, r.tok_before, r.rate, n.n_tok, $unitHashSql AS u " +
        "FROM n JOIN r ON n.source = r.source) " +
        "SELECT source, max(tok_before) AS tok_before, " +
        s"${Q.r6Sql("max(rate)")} AS rate, CAST(count(*) AS BIGINT) AS n_after, " +
        "CAST(sum(n_tok) AS BIGINT) AS tok_after " +
        "FROM k WHERE u < rate GROUP BY source ORDER BY source")),

    // URL canonicalization + dedup — the CommonCrawl-style ingest step that
    // collapses scheme/case/www/query-string/trailing-slash variants of one
    // resource before any content processing runs. URLs are synthesized
    // deterministically (4 messy variants per canonical target, the
    // q_pii_redact synthesize-then-verify pattern), normalized by a regex
    // chain that is byte-identical in both engines, then grouped — one
    // 32-byte-keyed shuffle, texts never move.
    Q("q_url_canonical_dedup",
      (s, d) => {
        val variant = col("doc_id") % 4
        // integer division (`div`), matching the oracle's `//` — a double
        // divide-then-truncate would diverge past 2^53
        val k = expr("doc_id div 4")
        val url = when(variant === 0, concat(lit("https://www.example.com/path"), k, lit("/")))
          .when(variant === 1, concat(lit("http://example.com/path"), k))
          .when(variant === 2, concat(lit("https://example.com/path"), k, lit("?utm_source=x")))
          .otherwise(concat(lit("HTTPS://EXAMPLE.COM/PATH"), k))
        t(s, d, "documents")
          .withColumn("url", url)
          .withColumn("canonical",
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(
              lower(col("url")), "^https?://", ""), "^www\\.", ""), "\\?.*$", ""), "/$", ""))
          .groupBy("canonical")
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
          .orderBy("keep_id")
      },
      Some("WITH u AS (SELECT doc_id, CASE doc_id % 4 " +
        "WHEN 0 THEN 'https://www.example.com/path' || (doc_id // 4) || '/' " +
        "WHEN 1 THEN 'http://example.com/path' || (doc_id // 4) " +
        "WHEN 2 THEN 'https://example.com/path' || (doc_id // 4) || '?utm_source=x' " +
        "ELSE 'HTTPS://EXAMPLE.COM/PATH' || (doc_id // 4) END AS url FROM documents), " +
        "n AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        "lower(url), '^https?://', ''), '^www\\.', ''), '\\?.*$', ''), '/$', '') AS canonical FROM u) " +
        "SELECT canonical, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups " +
        "FROM n GROUP BY canonical ORDER BY keep_id")),

    // ---- Embedding quantization ----

    // Per-vector int8 quantization (symmetric, scale = max|v|): the standard
    // compression step before ANN serving / shipping embeddings to a trainer.
    // Map-only HOFs over the array column — `floor(x + 0.5)` instead of
    // `round` so both engines share one tie-break rule, quantized values
    // summed as exact longs, reconstruction MSE summed in element order
    // (same left-fold both engines, like the dot-product kernels).
    Q("q_embed_quantize",
      (s, d) => {
        val vd = transform(col("embedding"), x => x.cast("double"))
        val scale = array_max(transform(vd, x => abs(x)))
        val qv = transform(vd, x =>
          floor(x / col("scale") * 127.0 + 0.5).cast("long"))
        val deq = (q: org.apache.spark.sql.Column) =>
          q.cast("double") / 127.0 * col("scale")
        t(s, d, "embeddings")
          .withColumn("scale", scale)
          .filter(col("scale") > 0.0) // all-zero vectors are unquantizable
          .withColumn("qv", qv)
          .select(col("vec_id"), Q.r6(col("scale")).as("scale"),
            aggregate(col("qv"), lit(0L), (acc, x) => acc + x).as("qsum"),
            Q.r6(
              aggregate(
                zip_with(col("qv"), transform(col("embedding"), x => x.cast("double")),
                  (q, v) => (deq(q) - v) * (deq(q) - v)),
                lit(0.0), (acc, x) => acc + x) / size(col("qv")).cast("double"))
              .as("mse"))
          .orderBy("vec_id")
      },
      Some("WITH sc AS (SELECT vec_id, embedding, " +
        "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale " +
        "FROM embeddings), " +
        "qz AS (SELECT vec_id, embedding, scale, " +
        "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / scale * 127.0 + 0.5) AS BIGINT)) AS qv " +
        "FROM sc WHERE scale > 0.0) " +
        s"SELECT vec_id, ${Q.r6Sql("scale")} AS scale, " +
        "CAST(list_sum(qv) AS BIGINT) AS qsum, " +
        s"${Q.r6Sql("list_sum(list_transform(generate_series(1, len(qv)), " +
          "i -> (CAST(qv[i] AS DOUBLE) / 127.0 * scale - CAST(embedding[i] AS DOUBLE)) " +
          "* (CAST(qv[i] AS DOUBLE) / 127.0 * scale - CAST(embedding[i] AS DOUBLE)))) " +
          "/ CAST(len(qv) AS DOUBLE)")} AS mse " +
        "FROM qz ORDER BY vec_id")),

    // Per-dimension embedding whitening (standardization): subtract the
    // corpus mean and divide by the corpus std per dimension — the
    // retrieval-quality post-processing step that stops dominant dimensions
    // from drowning the cosine. Two-phase: per-dim stats from exact
    // 1e-6-quantized integer sums (the q_embed_centroids rule — order-
    // independent), broadcast back onto the posexploded corpus, and
    // per-vector results re-aggregate with per-element quantization before
    // the cross-row sum. At 100 TB the stats table is d rows and the
    // whitening pass is map-only against a broadcast.
    Q("q_embed_whiten",
      (s, d) => {
        val ex = t(s, d, "embeddings")
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .select(col("vec_id"), col("pos").cast("long").as("pos"),
            col("v").cast("double").as("v"),
            floor(col("v").cast("double") * 1e6 + 0.5).cast("long").as("sv"))
        // sv ~ ±1e6 so sv² ~ 1e12: the squared sum MUST widen beyond BIGINT
        // (overflows at ~9.2M vectors/dim); DECIMAL(38,0) matches DuckDB's
        // HUGEINT-widened sum exactly
        val stats = ex.groupBy("pos")
          .agg(count(lit(1)).cast("double").as("n"),
            sum(col("sv")).cast("double").as("s"),
            sum((col("sv") * col("sv")).cast("decimal(38,0)")).cast("double").as("ss"))
          // a constant dimension has no standardization: its variance
          // numerator rounds to a tiny NEGATIVE double, where DuckDB's
          // sqrt hard-errors and Spark NaN-poisons every w — guard the
          // numerator and drop such dimensions in BOTH engines
          .withColumn("_vn", col("ss") - col("s") * col("s") / col("n"))
          .filter(col("_vn") > 0.0 && col("n") > 1.0)
          .select(col("pos"), (col("s") / (col("n") * 1e6)).as("mu"),
            sqrt(col("_vn") / ((col("n") - 1.0) * 1e12)).as("sd"))
        ex.join(broadcast(stats), Seq("pos"))
          .withColumn("w", (col("v") - col("mu")) / col("sd"))
          .groupBy("vec_id")
          .agg(
            Q.r6(sum(floor(col("w") * 1e6 + 0.5).cast("long")).cast("double") / 1e6)
              .as("w_sum"),
            Q.r6(sqrt(sum(floor(col("w") * col("w") * 1e6 + 0.5).cast("long"))
              .cast("double") / 1e6)).as("w_norm"))
          .orderBy("vec_id")
      },
      Some("WITH ex AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos, " +
        "CAST(embedding[i] AS DOUBLE) AS v, " +
        "CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS sv " +
        s"FROM embeddings CROSS JOIN ${Q.dimSeriesSql} AS g(i) WHERE i <= len(embedding)), " +
        "st AS (SELECT pos, CAST(count(*) AS DOUBLE) AS n, " +
        "CAST(sum(sv) AS DOUBLE) AS s, CAST(sum(sv * sv) AS DOUBLE) AS ss FROM ex GROUP BY pos), " +
        "vn AS (SELECT pos, n, s, ss - s * s / n AS vnum FROM st), " +
        "ms AS (SELECT pos, s / (n * 1e6) AS mu, " +
        "sqrt(vnum / ((n - 1.0) * 1e12)) AS sd FROM vn WHERE vnum > 0.0 AND n > 1.0), " +
        "wh AS (SELECT vec_id, (v - mu) / sd AS w FROM ex JOIN ms ON ex.pos = ms.pos) " +
        "SELECT vec_id, " +
        s"${Q.r6Sql("CAST(sum(CAST(floor(w * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6")} AS w_sum, " +
        s"${Q.r6Sql("sqrt(CAST(sum(CAST(floor(w * w * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6)")} AS w_norm " +
        "FROM wh GROUP BY vec_id ORDER BY vec_id")),

    // Product quantization (PQ): split each 64-dim vector into 8 subvectors
    // of 8 dims; assign every subvector to its nearest codebook entry
    // (codebook = the matching subvectors of vecs 0..15, trained k-means at
    // scale — the assignment machinery is identical). 64 dims compress to
    // 8 codes; the per-vector output is the code checksum + reconstruction
    // MSE. Shape: one explode (×8) + a broadcast equi-join on the subspace
    // id + struct-min argmin with map-side partials + one rollup — at
    // 100 TB the codebook stays a broadcast (K×8 rows) and the shuffles
    // carry ≤ 8 skinny rows per vector, never the N×8×K candidate set.
    Q("q_embed_pq",
      (s, d) => {
        val e = t(s, d, "embeddings")
        // subspace count and MSE divisor derive from the data (size of the
        // embedding column), not a hardcoded 64 — a regenerated table with
        // another dimension keeps the math right instead of silently
        // slicing short
        def subspaces(df: DataFrame, idAs: String, vecAs: String): DataFrame =
          df.select(col("vec_id").as(idAs),
              size(col("embedding")).cast("long").as("nd"),
              // cast to double ONCE per vector, not once per subspace slice
              transform(col("embedding"), x => x.cast("double")).as("_dv"))
            .select(col(idAs), col("nd"),
              explode(transform(
                // Column `/` is double division; dims are exact multiples
                // of 8 so the cast back to int is lossless
                sequence(lit(0), (size(col("_dv")) / 8).cast("int") - 1),
                j => struct(j.as("j"),
                  slice(col("_dv"), j * 8 + 1, lit(8)).as("sv")))).as("sub"))
            .select(col(idAs), col("nd"), col("sub.j").as("j"), col("sub.sv").as(vecAs))
        val sub = subspaces(e, "vec_id", "sv")
        val code = subspaces(e.filter(col("vec_id") < 16), "cid", "cv").drop("nd")
        // codegen'd Σ(a−b)² — bit-identical to the zip_with/aggregate fold
        val l2 = {
          import org.apache.spark.sql.graftbridge.ColumnBridge
          ColumnBridge.column(graft.functions.SquaredL2(
            ColumnBridge.expression(col("sv")), ColumnBridge.expression(col("cv"))))
        }
        // argmin as min(struct(rounded_d, cid, d)) rather than a window:
        // lexicographic struct-min has a map-side partial, so the shuffle
        // carries ≤ one row per (vec, subspace) per partition instead of
        // all N×8×K candidate rows. (d6, cid) is unique per (vec, j) —
        // cid is the codebook key — so the min is well-defined.
        sub.join(broadcast(code), Seq("j"))
          .withColumn("_d", l2)
          .groupBy("vec_id", "j")
          .agg(min(struct(round(col("_d"), 6).as("d6"), col("cid").as("cid"),
            col("_d").as("d"))).as("best"),
            max(col("nd")).as("nd"))
          .groupBy("vec_id")
          // distances quantized to 1e-6 longs BEFORE the cross-row sum
          // (q_embed_centroids rule: double sums across rows are order-
          // dependent; exact integer sums are not)
          .agg(sum(col("best.cid") * (col("j") + 1)).as("code_sum"),
            Q.r6(sum(floor(col("best.d") * 1e6 + 0.5).cast("long")).cast("double")
              / (max(col("nd")).cast("double") * lit(1e6))).as("mse"))
          .orderBy("vec_id")
      },
      Some {
        def l2Sql(a: String, b: String) = Q.l2Sql8(a, b)
        "WITH sj AS (SELECT vec_id, CAST(len(embedding) AS BIGINT) AS nd, " +
          "unnest(generate_series(0, len(embedding) // 8 - 1)) AS j, embedding FROM embeddings), " +
          "sub AS (SELECT vec_id, nd, j, embedding[j * 8 + 1 : j * 8 + 8] AS sv FROM sj), " +
          "code AS (SELECT vec_id AS cid, j, sv AS cv FROM sub WHERE vec_id < 16), " +
          s"dd AS (SELECT s.vec_id, s.nd, s.j, c.cid, ${l2Sql("s.sv", "c.cv")} AS d " +
          "FROM sub s JOIN code c ON s.j = c.j), " +
          "rr AS (SELECT vec_id, nd, j, cid, d, row_number() OVER " +
          "(PARTITION BY vec_id, j ORDER BY round(d, 6), cid) AS rn FROM dd) " +
          "SELECT vec_id, CAST(sum(cid * (j + 1)) AS BIGINT) AS code_sum, " +
          s"${Q.r6Sql("CAST(sum(CAST(floor(d * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / (CAST(max(nd) AS DOUBLE) * 1e6)")} AS mse " +
          "FROM rr WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id"
      }),

    // Z-order layout key: interleave the bits of two scan predicates'
    // columns so range-partitioning on the derived key co-locates rows
    // that 2-D predicates co-access — the Delta/Iceberg Z-ORDER technique,
    // expressed as plain arithmetic (div/mod, portable to the oracle; no
    // engine bit intrinsics). Map-only key computation + one partial-agg'd
    // histogram over the key ranges; the production write is
    // `repartitionByRange(col("z"))` so each output file covers one
    // compact Z-curve segment.
    Q("q_zorder_layout",
      (s, d) => {
        // the graft.ops.Layout.zorderKey kernel — the SAME expression the
        // production clustered write (`--layout zorder`) range-partitions on
        Q.events(s, d)
          .select(col("event_id"), (col("user_id") % 256).cast("long").as("x"),
            (col("event_id") % 256).cast("long").as("y"))
          .withColumn("z", graft.ops.Layout.zorderKey(col("x"), col("y")))
          .groupBy(expr("z div 4096").as("z_range"))
          .agg(count(lit(1)).as("n"), min(col("z")).as("z_min"),
            max(col("z")).as("z_max"))
          .orderBy("z_range")
      },
      Some {
        val terms = (0 until 8).map { b =>
          s"((x // ${1 << b}) % 2) * ${1L << (2 * b + 1)} + " +
            s"((y // ${1 << b}) % 2) * ${1L << (2 * b)}"
        }.mkString(" + ")
        "WITH xy AS (SELECT event_id, user_id % 256 AS x, event_id % 256 AS y FROM events), " +
          s"zz AS (SELECT event_id, $terms AS z FROM xy) " +
          "SELECT z // 4096 AS z_range, CAST(count(*) AS BIGINT) AS n, " +
          "min(z) AS z_min, max(z) AS z_max FROM zz GROUP BY 1 ORDER BY z_range"
      }),

    // Hilbert-curve layout key — the stronger-locality sibling of
    // q_zorder_layout (a Hilbert walk never teleports across the plane the
    // way Z-order's seams do, so range-partitioned files cover tighter 2-D
    // rectangles). The classic xy→d loop has loop-carried state (the
    // quadrant rotation rewrites x/y each level); both engines run it
    // UNROLLED — 8 chained projections in Spark, 8 chained CTEs in the
    // oracle — all integer CASE/bit arithmetic, so the key is hash-exact
    // cross-engine. Map-only + one partial-agg'd histogram, like Z-order;
    // the production write is `repartitionByRange(col("h"))`.
    Q("q_hilbert_layout",
      (s, d) => {
        // the graft.ops.Layout.withHilbertKey kernel (8 unrolled chained
        // projections) — the SAME expression the production clustered write
        // (`--layout hilbert`) range-partitions on
        val e = Q.events(s, d)
          .select(col("event_id"),
            (col("user_id") % 256).cast("long").as("x"),
            (col("event_id") % 256).cast("long").as("y"))
        graft.ops.Layout.withHilbertKey(e, col("x"), col("y"), "h")
          .groupBy(expr("h div 4096").as("h_range"))
          .agg(count(lit(1)).as("n"), min(col("h")).as("h_min"),
            max(col("h")).as("h_max"))
          .orderBy("h_range")
      },
      Some {
        def step(k: Int, prev: String, cur: String): String = {
          val sv = 1L << k
          s"$cur AS (SELECT event_id, " +
            s"CASE WHEN (y & $sv) = 0 THEN CASE WHEN (x & $sv) > 0 THEN ${sv - 1} - y ELSE y END ELSE x END AS x, " +
            s"CASE WHEN (y & $sv) = 0 THEN CASE WHEN (x & $sv) > 0 THEN ${sv - 1} - x ELSE x END ELSE y END AS y, " +
            s"h + ${sv * sv} * xor((CASE WHEN (x & $sv) > 0 THEN 1 ELSE 0 END) * 3, " +
            s"CASE WHEN (y & $sv) > 0 THEN 1 ELSE 0 END) AS h FROM $prev)"
        }
        // name chain: h8 -> s7 -> s6 -> ... -> s0
        "WITH h8 AS (SELECT event_id, user_id % 256 AS x, event_id % 256 AS y, " +
          "CAST(0 AS BIGINT) AS h FROM events), " +
          (7 to 0 by -1).map { k =>
            val prev = if (k == 7) "h8" else s"s${k + 1}"
            step(k, prev, s"s$k")
          }.mkString(", ") +
          " SELECT h // 4096 AS h_range, CAST(count(*) AS BIGINT) AS n, " +
          "min(h) AS h_min, max(h) AS h_max FROM s0 GROUP BY 1 ORDER BY h_range"
      }),

    // ---- Vocabulary / BPE statistics ----

    // Global top-50 vocabulary: one explode + one partial-agg'd count + a
    // TakeOrderedAndProject top-k (never a global sort). The first step of
    // building a tokenizer vocab over a corpus.
    Q("q_vocab_top",
      (s, d) => docs(s, d)
        .select(explode(col("tokens")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(50),
      Some(s"WITH ${Q.toksCte}, " +
        "tok AS (SELECT unnest(toks) AS token FROM toks) " +
        "SELECT token, CAST(count(*) AS BIGINT) AS n " +
        "FROM tok GROUP BY token ORDER BY n DESC, token LIMIT 50")),

    // BPE-style adjacent-pair counts: the inner statistic of byte-pair-
    // encoding training (which pair to merge next). Pairs are generated
    // per-document with an index-range transform (map-only, no self-join),
    // then counted with map-side partial aggregation; top-k cuts on
    // (count, pair) so the merge choice is deterministic.
    Q("q_bpe_pairs",
      (s, d) => docs(s, d)
        .filter(size(col("tokens")) >= 2)
        .select(explode(transform(
          sequence(lit(1), size(col("tokens")) - 1),
          i => concat_ws(" ", element_at(col("tokens"), i), element_at(col("tokens"), i + 1))))
          .as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(50),
      Some(s"WITH ${Q.toksCte}, " +
        "pr AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1), " +
        "i -> toks[i] || ' ' || toks[i + 1])) AS pair FROM toks WHERE len(toks) >= 2) " +
        "SELECT pair, CAST(count(*) AS BIGINT) AS n FROM pr " +
        "GROUP BY pair ORDER BY n DESC, pair LIMIT 50")),

    // BPE APPLY: encode every word under the pinned ordered merge table
    // (graft.ops.BpeEncode — greedy left-to-right merge passes as a pure
    // expression fold, no UDF) and report per-doc symbol counts + the
    // compression ratio a tokenizer budget planner needs. This is the
    // missing half of the BPE story next to q_bpe_train: train fits the
    // table, THIS op applies one — and because the table is a compile-time
    // artifact, the DuckDB oracle replays the identical fold row-for-row
    // (a real oracle check, where the iterative trainer can only get a
    // local-replay spec). Map-only, no shuffle, O(|merges|·|word|)/word.
    Q("q_bpe_encode",
      (s, d) => {
        val words = t(s, d, "documents")
          .filter(instr(col("text"), "|") === 0)
          .select(col("doc_id"),
            explode(filter(split(col("text"), " "), w => length(w) > 0)).as("w"))
        // the per-word merge chain is a CPU-dense kernel over skinny rows —
        // spread it (Dedup.spreadForKernel doctrine: the corpus byte-size
        // underfills the scan splits, but the kernel cost is per-row CPU)
        graft.ops.BpeEncode.encodeWords(
            graft.ops.Dedup.spreadForKernel(words), "w", "s")
          .groupBy("doc_id")
          .agg(sum(length(col("w"))).cast("long").as("n_chars"),
            count(lit(1)).as("ws_tokens"),
            sum(graft.ops.BpeEncode.symbolCount(col("s"))).as("bpe_tokens"))
          .withColumn("compression", Q.r6(
            col("n_chars").cast("double") / col("bpe_tokens").cast("double")))
          .orderBy("doc_id")
      },
      Some {
        val enc = graft.ops.BpeEncode.symbolCountSql(graft.ops.BpeEncode.encodeWordSql("w"))
        // len(words) > 0 mirrors Spark's explode dropping zero-word docs —
        // without it an empty-text doc would surface here as a NULL-stats
        // row the Spark side never emits
        "WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> length(w) > 0) AS words " +
          "FROM documents WHERE instr(text, '|') = 0), " +
          "e AS (SELECT doc_id, " +
          "CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT) AS n_chars, " +
          "CAST(len(words) AS BIGINT) AS ws_tokens, " +
          s"CAST(list_sum(list_transform(words, w -> $enc)) AS BIGINT) AS bpe_tokens " +
          "FROM w WHERE len(words) > 0) " +
          "SELECT doc_id, n_chars, ws_tokens, bpe_tokens, " +
          s"${Q.r6Sql("CAST(n_chars AS DOUBLE) / CAST(bpe_tokens AS DOUBLE)")} AS compression " +
          "FROM e ORDER BY doc_id"
      }),

    // Per-doc out-of-vocabulary rate against the top-10 vocab — the
    // coverage statistic that decides whether a tokenizer vocab is big
    // enough for a corpus. The vocab is an aggregate-then-broadcast: tiny
    // by construction (top-k), so the membership join never shuffles the
    // exploded token stream; the only shuffle is the per-doc count.
    Q("q_vocab_oov",
      (s, d) => {
        val tok = docs(s, d).select(col("doc_id"), explode(col("tokens")).as("token"))
        val vocab = tok.groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token").asc).limit(10)
          .select(col("token"), lit(1L).as("in_vocab"))
        tok.join(broadcast(vocab), Seq("token"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
          .select(col("doc_id"), col("n_tokens"), col("n_oov"),
            Q.r6(col("n_oov").cast("double") / col("n_tokens").cast("double"))
              .as("oov_rate"))
          .orderBy("doc_id")
      },
      Some(s"WITH ${Q.toksCte}, " +
        "tok AS (SELECT doc_id, unnest(toks) AS token FROM toks), " +
        "vocab AS (SELECT token FROM (SELECT token, count(*) AS n FROM tok " +
        "GROUP BY token ORDER BY n DESC, token LIMIT 10)), " +
        "ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, " +
        "CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov " +
        "FROM tok t LEFT JOIN vocab v ON t.token = v.token GROUP BY doc_id) " +
        s"SELECT doc_id, n_tokens, n_oov, " +
        s"${Q.r6Sql("CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE)")} AS oov_rate " +
        "FROM ag ORDER BY doc_id")),

    // Per-doc average bigram log-probability under the corpus's own
    // add-one-smoothed bigram model — the perplexity-proxy quality signal
    // (a doc whose transitions are corpus-typical scores high; word salad
    // scores low). Counts tables are partial-agg'd before the join; the
    // vocab-size scalar rides a broadcast; per-term log-probs quantize to
    // 1e-6 longs before the cross-row sum (order-independence rule). ln
    // parity between engines is established practice (the BM25 idf).
    Q("q_text_bigram_logprob",
      (s, d) => {
        val tok = Q.docsTokens(s, d)
        // vocab-sized unigram counts, materialized ONCE (the
        // PhraseSearch.collocations uni policy): two consumers below — the
        // c1 join and the vocab-size scalar — and Spark shares no scan
        // subtrees across them, so without the lazy checkpoint each use
        // re-scanned and re-tokenized the corpus (round 22; plan dump
        // showed 3 corpus scans where 2 were claimed)
        val uni = tok.select(explode(col("tokens")).as("w1"))
          .groupBy("w1").agg(count(lit(1)).as("c1"))
          .localCheckpoint(false)
        // vocab size IS uni's row count — deriving it there avoids a third
        // full corpus scan + exact-distinct shuffle for one scalar
        val vocabSize = uni.agg(count(lit(1)).as("v"))
        val bi = tok.filter(size(col("tokens")) >= 2)
          .select(col("doc_id"), explode(transform(
            sequence(lit(1), size(col("tokens")) - 1),
            i => struct(element_at(col("tokens"), i).as("w1"),
              element_at(col("tokens"), i + 1).as("w2")))).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        // ROUND 22: aggregate the occurrence stream to per-(doc, bigram)
        // counts FIRST, then attach the corpus bigram count as a
        // sum-over-window on that deduplicated frame. lp is a pure function
        // of (w1, w2) — identical for every occurrence — so the old
        // per-occurrence quantize-and-sum equals cd × floor(lp·1e6 + 0.5)
        // and n_bigrams equals Σcd: the occurrence stream crosses ONE
        // exchange (the dbc aggregation, partial-agg'd) instead of riding
        // through the c2 join and the final per-doc aggregation at full
        // occurrence width, and the standalone `big` pipeline (its own
        // corpus scan + explode: Spark shares no scan subtrees across join
        // sides) disappears. Values are bit-identical.
        val dbc = bi.groupBy("w1", "w2", "doc_id").agg(count(lit(1)).as("cd"))
        val wB = Window.partitionBy(col("w1"), col("w2"))
        dbc.withColumn("c2", sum(col("cd")).over(wB))
          .join(uni, Seq("w1"))
          .crossJoin(broadcast(vocabSize))
          .withColumn("lp",
            log((col("c2") + 1).cast("double") / (col("c1") + col("v")).cast("double")))
          .groupBy("doc_id")
          .agg(sum(col("cd")).as("n_bigrams"),
            Q.r6(sum(col("cd") * floor(col("lp") * 1e6 + 0.5).cast("long")).cast("double")
              / (sum(col("cd")).cast("double") * lit(1e6))).as("avg_logprob"))
          .orderBy("doc_id")
      },
      Some(s"WITH ${Q.toksCte}, " +
        "tok AS (SELECT doc_id, unnest(toks) AS w FROM toks), " +
        "uni AS (SELECT w AS w1, CAST(count(*) AS BIGINT) AS c1 FROM tok GROUP BY w), " +
        "vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni), " +
        "bj AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS j " +
        "FROM toks WHERE len(toks) >= 2), " +
        "bi AS (SELECT doc_id, toks[j] AS w1, toks[j + 1] AS w2 FROM bj), " +
        "big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bi GROUP BY w1, w2), " +
        "sc AS (SELECT doc_id, ln(CAST(c2 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE)) AS lp " +
        "FROM bi JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN vs) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, " +
        s"${Q.r6Sql("CAST(sum(CAST(floor(lp * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e6)")} AS avg_logprob " +
        "FROM sc GROUP BY doc_id ORDER BY doc_id")),

    // Per-doc token-distribution Shannon entropy (nats) — the classic
    // repetitiveness/quality signal (low entropy = boilerplate or
    // keyword-stuffed text; complements the window-based repetition score
    // with a whole-distribution view). One partial-agg'd (doc, term) count,
    // one per-doc rollup; per-term contributions quantize to 1e6-ints
    // before summing so Spark's aggregation tree and DuckDB's sequential
    // sum get the same integer (the q_text_bigram_logprob determinism
    // pattern).
    Q("q_text_entropy",
      (s, d) => {
        val tf = Q.docsTokens(s, d)
          .select(col("doc_id"), explode(col("tokens")).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        val dl = tf.groupBy("doc_id")
          .agg(sum("c").as("n"), count(lit(1)).as("n_distinct"))
        val p = col("c").cast("double") / col("n").cast("double")
        tf.join(dl, Seq("doc_id"))
          .withColumn("hq", floor(-p * log(p) * 1e6 + 0.5).cast("long"))
          .groupBy("doc_id")
          .agg(first(col("n")).as("n_tokens"),
            first(col("n_distinct")).as("n_distinct"),
            Q.r6((sum(col("hq")).cast("double") / 1e6)).as("entropy"))
          .orderBy("doc_id")
      },
      Some(s"WITH ${Q.toksCte}, " +
        "tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c " +
        "FROM (SELECT doc_id, unnest(toks) AS w FROM toks) GROUP BY doc_id, w), " +
        "dl AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, " +
        "CAST(count(*) AS BIGINT) AS n_distinct FROM tf GROUP BY doc_id), " +
        "hc AS (SELECT tf.doc_id, n, n_distinct, " +
        "CAST(floor(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) " +
        "* ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS hq " +
        "FROM tf JOIN dl ON tf.doc_id = dl.doc_id) " +
        "SELECT doc_id, min(n) AS n_tokens, min(n_distinct) AS n_distinct, " +
        s"${Q.r6Sql("CAST(sum(hq) AS DOUBLE) / 1e6")} AS entropy " +
        "FROM hc GROUP BY doc_id ORDER BY doc_id")),

    // Unicode normalization via the native codegen expression
    // ([[graft.functions.UnicodeNormalize]]) — the first pass of any
    // text-cleaning pipeline (crawl corpora mix NFC/NFD/compatibility
    // encodings of the same grapheme). The corpus is ASCII, so each doc
    // gets a deterministic non-NFC tail appended (an NFD e+combining-acute
    // that NFC must COMPOSE, and a U+FB01 ligature that NFC must NOT
    // touch) — the normalization genuinely fires on every row, and the
    // md5 pins byte-identical rewrites cross-engine against DuckDB's
    // nfc_normalize. Map-only, stays inside whole-stage codegen.
    Q("q_text_normalize",
      (s, d) => {
        val raw = concat(substring(col("text"), 1, 40),
          lit(" e\u0301clair \ufb01n"))
        t(s, d, "documents")
          .select(col("doc_id"), raw.as("raw"))
          .select(col("doc_id"),
            graft.functions.TextOps.normalizeUnicode(col("raw"), "NFC").as("nfc"),
            length(col("raw")).cast("long").as("len_raw"))
          .select(col("doc_id"), md5(col("nfc")).as("nfc_md5"),
            length(col("nfc")).cast("long").as("len_nfc"), col("len_raw"))
          .orderBy("doc_id")
      },
      Some("WITH raw AS (SELECT doc_id, substr(text, 1, 40) || ' e' || " +
        "chr(769) || 'clair ' || chr(64257) || 'n' AS r FROM documents) " +
        "SELECT doc_id, md5(nfc_normalize(r)) AS nfc_md5, " +
        "CAST(length(nfc_normalize(r)) AS BIGINT) AS len_nfc, " +
        "CAST(length(r) AS BIGINT) AS len_raw FROM raw ORDER BY doc_id")),

    // ---- PII redaction / URL handling ----

    // Regex PII redaction + URL/domain extraction. The corpus is synthetic
    // words only, so each doc gets a deterministic contact tail appended
    // (same synthesize-then-verify pattern as the chunker queries) — the
    // redaction genuinely fires on every row and the md5 of the redacted
    // text proves byte-identical rewrites in both engines. Map-only; at
    // 100 TB this is the cheap pass that MUST NOT shuffle, and doesn't.
    Q("q_pii_redact",
      (s, d) => {
        val synth = concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or call 555-"), (col("doc_id") % 1000).cast("string"),
          lit(" see https://docs"), (col("doc_id") % 7).cast("string"),
          lit(".example.org/page"))
        t(s, d, "documents")
          .withColumn("synth", synth)
          .withColumn("red",
            regexp_replace(
              regexp_replace(col("synth"), lit("user[0-9]+@[a-z.]+"), lit("<EMAIL>")),
              lit("555-[0-9]+"), lit("<PHONE>")))
          .select(col("doc_id"),
            size(regexp_extract_all(col("synth"), lit("(user[0-9]+@[a-z.]+)"), lit(1)))
              .cast("long").as("n_emails"),
            size(regexp_extract_all(col("synth"), lit("(555-[0-9]+)"), lit(1)))
              .cast("long").as("n_phones"),
            regexp_extract(col("synth"), "https://([a-z0-9.]+)/", 1).as("domain"),
            md5(col("red")).as("red_md5"))
          .orderBy("doc_id")
      },
      Some("WITH sy AS (SELECT doc_id, text || ' contact user' || doc_id || " +
        "'@example.com or call 555-' || (doc_id % 1000) || " +
        "' see https://docs' || (doc_id % 7) || '.example.org/page' AS synth " +
        "FROM documents) " +
        "SELECT doc_id, " +
        "CAST(len(regexp_extract_all(synth, '(user[0-9]+@[a-z.]+)', 1)) AS BIGINT) AS n_emails, " +
        "CAST(len(regexp_extract_all(synth, '(555-[0-9]+)', 1)) AS BIGINT) AS n_phones, " +
        "regexp_extract(synth, 'https://([a-z0-9.]+)/', 1) AS domain, " +
        "md5(regexp_replace(regexp_replace(synth, 'user[0-9]+@[a-z.]+', '<EMAIL>', 'g'), " +
        "'555-[0-9]+', '<PHONE>', 'g')) AS red_md5 " +
        "FROM sy ORDER BY doc_id"))
  )
}
