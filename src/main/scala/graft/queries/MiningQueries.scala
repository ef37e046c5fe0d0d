package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis
import graft.queries.Q.t

/** Round-5 pipeline extensions: PQ asymmetric-distance ANN search, a k-means
  * Lloyd refinement step, tf-idf keyword extraction, edit-distance dedup
  * verification, Gopher-style quality rules, statistical anomaly flags, and
  * two training-example constructors (strided token windows, span
  * corruption). Same contract as every other query module: deterministic
  * Spark plan + DuckDB oracle mirror, scale posture documented per query.
  */
object MiningQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Q.docsTokens(s, d)

  private def docsSpread(s: SparkSession, d: String): DataFrame =
    Q.docsTokensSpread(s, d)

  private def events(s: SparkSession, d: String): DataFrame = Q.events(s, d)

  /** Explode an embeddings frame into 8-dim subvectors: (id, j, sub).
    * Subspace count derives from the embedding size (q_embed_pq rule).
    * The float→double cast runs ONCE per vector (`_dv`), not once per
    * subspace — the inlined `slice(transform(...))` re-cast the whole
    * 64-dim array for each of its 8 slices (round 21). */
  private def subspaces(df: DataFrame, idAs: String, vecAs: String): DataFrame =
    df.select(col("vec_id").as(idAs),
        transform(col("embedding"), x => x.cast("double")).as("_dv"))
      .select(col(idAs),
        explode(transform(
          sequence(lit(0), (size(col("_dv")) / 8).cast("int") - 1),
          j => struct(j.cast("long").as("j"),
            slice(col("_dv"), j * 8 + 1, lit(8)).as("sv")))).as("sub"))
      .select(col(idAs), col("sub.j").as("j"), col("sub.sv").as(vecAs))

  /** Element-order L2 between two 8-dim double arrays — the codegen'd
    * [[graft.functions.SquaredL2]] kernel; bit-identical to the
    * `aggregate(zip_with(...))` left fold it replaces (same IEEE op
    * order; KernelExpressionsSpec pins it). */
  private def l2(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.SquaredL2(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  private def l2Sql(a: String, b: String): String = Q.l2Sql8(a, b)

  /** Gopher rule bundle as a pure projection over (doc_id, text, tokens) —
    * no window/sort/aggregate, so the SAME function serves the batch query
    * and `readStream` inputs unchanged (CurationStreamSpec pins the
    * batch-equal contract, like the quality gate). */
  private[graft] def gopherRules(tokenized: DataFrame): DataFrame =
    tokenized
      .withColumn("n_tok", size(col("tokens")).cast("long"))
      .withColumn("mean_len", Q.r6(TextAnalysis.avgTokenLen(col("text"), col("n_tok"))))
      .withColumn("n_stop", TextAnalysis.stopwordCount(col("tokens")))
      .withColumn("frac_alpha", Q.r6(
        size(filter(col("tokens"), t => t.rlike("[a-z]"))).cast("double") /
          col("n_tok").cast("double")))
      .select(col("doc_id"), col("n_tok"), col("mean_len"), col("n_stop"), col("frac_alpha"),
        (col("n_tok") >= 20 && col("n_tok") <= 100000).as("rule_len"),
        (col("mean_len") >= 3.0 && col("mean_len") <= 10.0).as("rule_word_len"),
        (col("n_stop") >= 2).as("rule_stop"),
        (col("frac_alpha") >= 0.8).as("rule_alpha"))
      .withColumn("pass",
        col("rule_len") && col("rule_word_len") && col("rule_stop") && col("rule_alpha"))

  /** Shared oracle CTE chain for the PQ layout: subvectors + codebook
    * (the q_embed_pq structure). */
  private val pqCtes: String =
    "sj AS (SELECT vec_id, unnest(generate_series(0, len(embedding) // 8 - 1)) AS j, " +
      "embedding FROM embeddings), " +
      "sub AS (SELECT vec_id, j, embedding[j * 8 + 1 : j * 8 + 8] AS sv FROM sj), " +
      "code AS (SELECT vec_id AS cid, j, sv AS cv FROM sub WHERE vec_id < 16)"

  /** ADC ranking shared by the PQ search queries: corpus codes join the
    * broadcast per-query LUT on (subspace, code); approximate distance is
    * the partial-agg'd sum of 1e-6-quantized LUT longs; ranks are
    * (rounded-adist, id)-deterministic. Returns (qid, vec_id, adist, rank)
    * with rank ≤ k. */
  private def adcShortlist(s: SparkSession, d: String, k: Int,
      qids: Seq[Int] = Seq(0, 1, 2)): DataFrame =
    adcShortlistOver(s, d, t(s, d, "embeddings"), k, qids)

  /** [[adcShortlist]] over a RESTRICTED corpus frame (vec_id, embedding) —
    * the codebook, queries and LUT still derive from the full embeddings
    * table so the quantization geometry is identical; only the CANDIDATE
    * set shrinks (the IVF∘PQ composition point). `qids` restricts the
    * QUERY side: ADC distances, ranks and shortlists are all per-qid
    * (independent window partitions), so a caller that keeps one query's
    * rows gets identical results computing only that query's LUT/agg rows
    * (round 22 — the e2e single-query paths used to compute all three and
    * filter). */
  private def adcShortlistOver(s: SparkSession, d: String, corpus: DataFrame,
      k: Int, qids: Seq[Int] = Seq(0, 1, 2)): DataFrame = {
    val e = t(s, d, "embeddings")
    val sub = subspaces(corpus, "vec_id", "sv")
    val code = subspaces(e.filter(col("vec_id") < 16), "cid", "cv")
    // corpus encoding: nearest codebook entry per (vector, subspace) —
    // struct-min argmin (map-side partials; no window over N×8×K rows)
    val enc = sub.join(broadcast(code), Seq("j"))
      .withColumn("_d", l2(col("sv"), col("cv")))
      .groupBy("vec_id", "j")
      .agg(min(struct(round(col("_d"), 6).as("d6"), col("cid").as("cid"))).as("best"))
      .select(col("vec_id"), col("j"), col("best.cid").as("cid"))
    // per-query lookup table: exact distance from the query's j-th
    // subvector to every codebook entry of subspace j (3×8×16 rows)
    val lut = subspaces(e.filter(col("vec_id").isin(qids.map(Int.box): _*)), "qid", "qv")
      .join(broadcast(code), Seq("j"))
      .select(col("qid"), col("j"), col("cid"),
        floor(l2(col("qv"), col("cv")) * 1e6 + 0.5).cast("long").as("lq"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("adist"), 6).asc, col("vec_id").asc)
    enc.join(broadcast(lut), Seq("j", "cid"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id")
      .agg((sum(col("lq")).cast("double") / 1e6).as("adist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Oracle mirror of [[adcShortlist]]: CTE chain ending in
    * `rr(qid, vec_id, adist, rank)` (consumers filter the rank). */
  private val adcCtes: String =
    s"$pqCtes, " +
      s"dd AS (SELECT s.vec_id, s.j, c.cid, ${l2Sql("s.sv", "c.cv")} AS d " +
      "FROM sub s JOIN code c ON s.j = c.j), " +
      "er AS (SELECT vec_id, j, cid, row_number() OVER " +
      "(PARTITION BY vec_id, j ORDER BY round(d, 6), cid) AS rn FROM dd), " +
      "enc AS (SELECT vec_id, j, cid FROM er WHERE rn = 1), " +
      "lut AS (SELECT s.vec_id AS qid, c.j, c.cid, " +
      s"CAST(floor(${l2Sql("s.sv", "c.cv")} * 1e6 + 0.5) AS BIGINT) AS lq " +
      "FROM sub s JOIN code c ON s.j = c.j WHERE s.vec_id IN (0, 1, 2)), " +
      "ad AS (SELECT l.qid, e.vec_id, CAST(sum(l.lq) AS DOUBLE) / 1e6 AS adist " +
      "FROM enc e JOIN lut l ON e.j = l.j AND e.cid = l.cid " +
      "WHERE e.vec_id != l.qid GROUP BY l.qid, e.vec_id), " +
      "rr AS (SELECT qid, vec_id, adist, CAST(row_number() OVER " +
      s"(PARTITION BY qid ORDER BY round(adist, 6), vec_id) AS BIGINT) AS rank FROM ad)"

  val all: Seq[Q] = Seq(

    // ---- Similarity: the PQ serving path ----

    // PQ asymmetric-distance (ADC) top-k search: corpus vectors live only as
    // 8 codebook codes (the q_embed_pq encoding); each query builds a
    // 8×16-entry lookup table of exact query-subvector→centroid distances,
    // and the approximate distance is the SUM OF 8 TABLE LOOKUPS — no
    // per-vector float math at all. This is how a 100 TB corpus is actually
    // served: codes are 8 small ints per vector (64 floats → ~8 bytes), the
    // LUT is queries×128 rows riding a broadcast, and the only shuffle is
    // the per-(query, vector) partial-agg'd sum of skinny longs. LUT entries
    // quantize to 1e-6 longs before the cross-row sum (order-independence
    // rule), so the approximate distances are bit-identical cross-engine.
    // At scale this composes with IVF probing (q_sim_ivf_search) so the
    // encoded scan side is the probed subset, not the full corpus.
    Q("q_sim_pq_adc",
      (s, d) => adcShortlist(s, d, 5)
        .select(col("qid"), col("vec_id"), col("rank"), Q.r6(col("adist")).as("adist"))
        .orderBy("qid", "rank"),
      Some(s"WITH $adcCtes " +
        s"SELECT qid, vec_id, rank, ${Q.r6Sql("adist")} AS adist " +
        "FROM rr WHERE rank <= 5 ORDER BY qid, rank")),

    // Two-stage PQ retrieval — the production ANN serving pattern: the ADC
    // stage shortlists 20 candidates per query from codes alone (cheap,
    // approximate), then ONLY the shortlist's raw vectors are fetched and
    // re-ranked by exact cosine distance. At 100 TB the expensive exact
    // kernel touches Q×20 vectors instead of the corpus; the shortlist
    // rides a broadcast into an equi-join on the vector id, so the
    // raw-vector fetch is also the only corpus-side probe.
    Q("q_sim_pq_rerank",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val short = adcShortlist(s, d, 20).select(col("qid"), col("vec_id"))
        val qs = e.filter(col("vec_id").isin(0, 1, 2))
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(round(col("dist"), 6).asc, col("vec_id").asc)
        e.join(broadcast(short), Seq("vec_id"))
          .join(broadcast(qs), Seq("qid"))
          .withColumn("dist",
            graft.functions.VectorOps.cosineDist(col("embedding"), col("qvec")))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("qid"), col("vec_id"), col("rank"), Q.r6(col("dist")).as("dist"))
          .orderBy("qid", "rank")
      },
      Some(s"WITH $adcCtes, " +
        "short AS (SELECT qid, vec_id FROM rr WHERE rank <= 20), " +
        "qs AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id IN (0, 1, 2)), " +
        s"ex AS (SELECT s.qid, s.vec_id, ${Q.cosineDistSql("e.embedding", "q.qvec")} AS dist " +
        "FROM short s JOIN embeddings e ON s.vec_id = e.vec_id JOIN qs q ON s.qid = q.qid), " +
        "rr2 AS (SELECT qid, vec_id, dist, CAST(row_number() OVER " +
        "(PARTITION BY qid ORDER BY round(dist, 6), vec_id) AS BIGINT) AS rank FROM ex) " +
        s"SELECT qid, vec_id, rank, ${Q.r6Sql("dist")} AS dist " +
        "FROM rr2 WHERE rank <= 5 ORDER BY qid, rank")),

    // ANN recall@10 of every approximate serving leg vs the exact leg —
    // the measurement that quantifies the exactness-for-speed trade the
    // `--ann ivf/pq` paths make (the missing half of the HNSW-replacement
    // story, reference `src/db.py:152-165`: HNSW is approximate too, it
    // just never reports by how much). All legs are this engine's own
    // deterministic plans (fixed centroids, fixed codebook, round-6
    // tie-breaks), so recall is a pure function of the fixtures and the
    // oracle replays every leg bit-for-bit. Two structural facts make the
    // spec's monotonicity assertions sound, not just empirical: an exact
    // top-10 member ranks ≤10 inside ANY candidate subset that contains it
    // (at most 9 vectors are closer anywhere), so IVF recall is
    // non-decreasing in nprobe (probe sets nest) and the reranked-20
    // shortlist's recall is ≥ the ADC-10 shortlist's (ADC shortlists nest
    // and exact rerank keeps every true member). Cost shape: each leg is
    // the already-audited top-k-pruned plan; the recall join is k-rows ×
    // queries against a broadcast truth set — negligible over any corpus.
    Q("q_ann_recall",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val k = 10
        val qs = e.filter(col("vec_id").isin(0, 1, 2))
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val cent = e.filter(col("vec_id") < 4)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        // ROUND 22: every leg is a MARKER over ONE corpus×queries exact-
        // distance frame. dist is a pure function of (embedding, qvec) —
        // independent of which leg asks — so leg membership attaches as
        // broadcast joins (no row loss/duplication: every vector has an
        // assignment; marker pair sets are unique), each leg's
        // within-subset rank is a running conditional count over the SAME
        // (qid / round(dist,6), vec_id) window (for member rows the
        // running count IS row_number over the filtered subset — identical
        // ordering, identical ties), and the per-(leg, qid) hit counts are
        // conditional sums in ONE aggregation. The whole measurement is
        // one shuffle + one Window operator + one hash aggregation; the
        // round-21 shape planned 6 separate legs (5 of them with their own
        // corpus×queries cosine subtree and 3 with their own ivfAssign) +
        // union + semi-join + crossJoin attach — ~45 blocking stages.
        // Zero-hit legs still surface as hits = 0: every qid aggregates
        // (the frame always carries its corpus rows) and the conditional
        // sum is 0 when no member row hits.
        val assigned = graft.ops.Similarity
          .ivfAssign(e, "vec_id", "embedding", cent, "cid", "cvec")
          .select(col("vec_id"), col("cid"))
        val wProbe = Window.partitionBy(col("qid"))
          .orderBy(round(col("qcd"), 6).asc, col("cid").asc)
        val probes = qs.crossJoin(broadcast(cent))
          .withColumn("qcd",
            graft.functions.VectorOps.cosineDist(col("qvec"), col("cvec")))
          .withColumn("pr", row_number().over(wProbe))
          .filter(col("pr") <= 2)
          .select(col("qid"), col("cid"), col("pr"))
        // ONE ADC pass serves both PQ legs AND the composed IVF×PQ leg:
        // every shortlist is a rank-prefix filter over the SAME full-rank
        // ADC frame (round 21); the composed leg restricts the ADC pool to
        // each query's 2 probed clusters (the q_search_e2e_ivfpq dataflow)
        // and re-shortlists 20 within the pool.
        val adistAll = adcShortlist(s, d, Int.MaxValue)
        val short20all = adistAll.filter(col("rank") <= 20)
        val pqAdc = short20all.filter(col("rank") <= k)
          .select(col("qid"), col("vec_id"))
        val short20 = short20all.select(col("qid"), col("vec_id"))
        val wIn = Window.partitionBy(col("qid"))
          .orderBy(round(col("adist"), 6).asc, col("vec_id").asc)
        val composedShort = adistAll
          .join(broadcast(assigned), Seq("vec_id"))
          .join(broadcast(probes.select(col("qid"), col("cid"))), Seq("qid", "cid"))
          .withColumn("rn", row_number().over(wIn))
          .filter(col("rn") <= 20)
          .select(col("qid"), col("vec_id"))
        val marked = e.crossJoin(broadcast(qs))
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("dist",
            graft.functions.VectorOps.cosineDist(col("embedding"), col("qvec")))
          .select(col("qid"), col("vec_id"), col("dist"))
          .join(broadcast(assigned), Seq("vec_id"))
          .join(broadcast(probes), Seq("qid", "cid"), "left")
          .join(broadcast(short20.withColumn("m20", lit(1))), Seq("qid", "vec_id"), "left")
          .join(broadcast(composedShort.withColumn("mcs", lit(1))), Seq("qid", "vec_id"), "left")
          .join(broadcast(pqAdc.withColumn("madc", lit(1))), Seq("qid", "vec_id"), "left")
        val wOrd = Window.partitionBy(col("qid"))
          .orderBy(round(col("dist"), 6).asc, col("vec_id").asc)
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val flags = marked
          .withColumn("xrank", row_number().over(wOrd))
          .withColumn("rc1", sum(when(col("pr") <= 1, 1).otherwise(0)).over(wRun))
          .withColumn("rc2", sum(when(col("pr") <= 2, 1).otherwise(0)).over(wRun))
          .withColumn("rc20", sum(when(col("m20") === 1, 1).otherwise(0)).over(wRun))
          .withColumn("rcs", sum(when(col("mcs") === 1, 1).otherwise(0)).over(wRun))
          .withColumn("hit", col("xrank") <= k)
        def hitsOf(member: Column): Column =
          sum(when(member && col("hit"), 1L).otherwise(0L))
        val hitsPerQid = flags.groupBy("qid").agg(
          hitsOf(col("xrank") <= k).as("h_exact"),
          hitsOf(col("pr") <= 1 && col("rc1") <= k).as("h_ivf1"),
          hitsOf(col("pr") <= 2 && col("rc2") <= k).as("h_ivf2"),
          hitsOf(col("mcs") === 1 && col("rcs") <= k).as("h_ivfpq"),
          hitsOf(col("madc") === 1).as("h_adc"),
          hitsOf(col("m20") === 1 && col("rc20") <= k).as("h_pqr"))
        hitsPerQid.select(col("qid"), explode(array(
            struct(lit("exact").as("leg"), col("h_exact").as("hits")),
            struct(lit("ivf_np1").as("leg"), col("h_ivf1").as("hits")),
            struct(lit("ivf_np2").as("leg"), col("h_ivf2").as("hits")),
            struct(lit("ivfpq").as("leg"), col("h_ivfpq").as("hits")),
            struct(lit("pq_adc").as("leg"), col("h_adc").as("hits")),
            struct(lit("pq_rerank").as("leg"), col("h_pqr").as("hits")))).as("lh"))
          .select(col("lh.leg").as("leg"), col("qid"),
            col("lh.hits").as("hits"),
            Q.r6(col("lh.hits").cast("double") / k).as("recall"))
          .orderBy("leg", "qid")
      },
      Some(s"WITH $adcCtes, " +
        "aqs AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id IN (0, 1, 2)), " +
        s"xd AS (SELECT qid, vec_id, ${Q.cosineDistSql("embedding", "qvec")} AS dist " +
        "FROM embeddings CROSS JOIN aqs WHERE vec_id != qid), " +
        "xt AS (SELECT qid, vec_id FROM (SELECT qid, vec_id, row_number() OVER " +
        "(PARTITION BY qid ORDER BY round(dist, 6), vec_id) AS rn FROM xd) WHERE rn <= 10), " +
        "icent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 4), " +
        s"iad AS (SELECT e.vec_id, e.embedding, c.cid, ${Q.cosineDistSql("e.embedding", "c.cvec")} AS cdist " +
        "FROM embeddings e CROSS JOIN icent c), " +
        "iasg AS (SELECT vec_id, embedding, cid FROM (SELECT *, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY round(cdist, 6), cid) AS rn FROM iad) WHERE rn = 1), " +
        s"ipd AS (SELECT qid, qvec, cid, ${Q.cosineDistSql("cvec", "qvec")} AS qcdist " +
        "FROM aqs CROSS JOIN icent), " +
        "ipr AS (SELECT qid, qvec, cid, row_number() OVER " +
        "(PARTITION BY qid ORDER BY round(qcdist, 6), cid) AS pr FROM ipd), " +
        s"ivd1 AS (SELECT p.qid, a.vec_id, ${Q.cosineDistSql("a.embedding", "p.qvec")} AS dist " +
        "FROM iasg a JOIN (SELECT qid, qvec, cid FROM ipr WHERE pr <= 1) p ON a.cid = p.cid " +
        "WHERE a.vec_id != p.qid), " +
        "ivt1 AS (SELECT qid, vec_id FROM (SELECT qid, vec_id, row_number() OVER " +
        "(PARTITION BY qid ORDER BY round(dist, 6), vec_id) AS rn FROM ivd1) WHERE rn <= 10), " +
        s"ivd2 AS (SELECT p.qid, a.vec_id, ${Q.cosineDistSql("a.embedding", "p.qvec")} AS dist " +
        "FROM iasg a JOIN (SELECT qid, qvec, cid FROM ipr WHERE pr <= 2) p ON a.cid = p.cid " +
        "WHERE a.vec_id != p.qid), " +
        "ivt2 AS (SELECT qid, vec_id FROM (SELECT qid, vec_id, row_number() OVER " +
        "(PARTITION BY qid ORDER BY round(dist, 6), vec_id) AS rn FROM ivd2) WHERE rn <= 10), " +
        "pqt AS (SELECT qid, vec_id FROM rr WHERE rank <= 10), " +
        "s20 AS (SELECT qid, vec_id FROM rr WHERE rank <= 20), " +
        s"prx AS (SELECT s.qid, s.vec_id, ${Q.cosineDistSql("e.embedding", "q.qvec")} AS dist " +
        "FROM s20 s JOIN embeddings e ON s.vec_id = e.vec_id JOIN aqs q ON s.qid = q.qid), " +
        "prt AS (SELECT qid, vec_id FROM (SELECT qid, vec_id, row_number() OVER " +
        "(PARTITION BY qid ORDER BY round(dist, 6), vec_id) AS rn FROM prx) WHERE rn <= 10), " +
        // composed IVF×PQ: ADC distances (ad) restricted to each query's
        // probed clusters, shortlist 20 within the pool, exact rerank to 10
        "cvd AS (SELECT ad.qid, ad.vec_id, ad.adist FROM ad " +
        "JOIN iasg ON ad.vec_id = iasg.vec_id " +
        "JOIN ipr p ON p.qid = ad.qid AND p.cid = iasg.cid AND p.pr <= 2), " +
        "cst AS (SELECT qid, vec_id FROM (SELECT qid, vec_id, row_number() OVER " +
        "(PARTITION BY qid ORDER BY round(adist, 6), vec_id) AS rn FROM cvd) WHERE rn <= 20), " +
        s"cex AS (SELECT s.qid, s.vec_id, ${Q.cosineDistSql("e.embedding", "q.qvec")} AS dist " +
        "FROM cst s JOIN embeddings e ON s.vec_id = e.vec_id JOIN aqs q ON s.qid = q.qid), " +
        "cpt AS (SELECT qid, vec_id FROM (SELECT qid, vec_id, row_number() OVER " +
        "(PARTITION BY qid ORDER BY round(dist, 6), vec_id) AS rn FROM cex) WHERE rn <= 10), " +
        "legs AS (SELECT 'exact' AS leg, qid, vec_id FROM xt " +
        "UNION ALL SELECT 'ivf_np1', qid, vec_id FROM ivt1 " +
        "UNION ALL SELECT 'ivf_np2', qid, vec_id FROM ivt2 " +
        "UNION ALL SELECT 'ivfpq', qid, vec_id FROM cpt " +
        "UNION ALL SELECT 'pq_adc', qid, vec_id FROM pqt " +
        "UNION ALL SELECT 'pq_rerank', qid, vec_id FROM prt), " +
        "h AS (SELECT l.leg, l.qid, CAST(count(*) AS BIGINT) AS hits " +
        "FROM legs l JOIN xt x ON l.qid = x.qid AND l.vec_id = x.vec_id GROUP BY l.leg, l.qid), " +
        "base AS (SELECT leg, qid FROM (VALUES ('exact'), ('ivf_np1'), ('ivf_np2'), " +
        "('ivfpq'), ('pq_adc'), ('pq_rerank')) lv(leg) CROSS JOIN (SELECT qid FROM aqs) qq) " +
        "SELECT b.leg, b.qid, COALESCE(h.hits, CAST(0 AS BIGINT)) AS hits, " +
        s"${Q.r6Sql("CAST(COALESCE(h.hits, 0) AS DOUBLE) / 10.0")} AS recall " +
        "FROM base b LEFT JOIN h ON b.leg = h.leg AND b.qid = h.qid ORDER BY b.leg, b.qid")),

    // End-to-end SEARCH with the PQ-accelerated VSS leg — the `--ann pq`
    // product path as an oracle-checked query: ADC shortlists 20 candidates
    // from codes alone, the exact cosine kernel reranks ONLY the shortlist,
    // and the result fuses with the untouched BM25 leg exactly like
    // q_search_e2e_norerank / q_search_e2e_ann (fusion semantics unchanged
    // across all three VSS strategies — that's the point). The persisted-
    // sidecar path is pinned by PqIndexSpec; this query oracle-checks the
    // identical dataflow over the testdata corpus.
    Q("q_search_e2e_pq",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val short = adcShortlist(s, d, 20, Seq(0))
          .filter(col("qid") === 0).select("vec_id")
        val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
        val vss = e.join(broadcast(short), Seq("vec_id"))
          .crossJoin(broadcast(qv))
          .select(col("vec_id").as("doc_id"),
            graft.functions.VectorOps.cosineDist(col("embedding"), col("qvec")).as("vss_score"))
          .orderBy(round(col("vss_score"), 6).asc, col("doc_id").asc)
          .limit(10)
        val dd = docs(s, d).select(col("doc_id"), col("tokens"))
        val doclen = graft.search.Bm25.docLengths(dd)
        val fts = graft.search.Bm25.scoresSelfContained(
            Seq("spark", "join", "merge"),
            graft.search.Bm25.postings(dd), doclen, graft.search.Bm25.corpusStats(doclen))
          .orderBy(round(col("score"), 6).desc, col("doc_id").asc)
          .limit(10)
          .withColumnRenamed("score", "fts_score")
        val fused = fts.join(vss, Seq("doc_id"), "full_outer")
          .withColumn("score",
            graft.search.HybridSearch.hybridScore(col("fts_score"), col("vss_score")))
        t(s, d, "documents")
          .select(col("doc_id"),
            concat(lit("corpus/"), regexp_replace(col("source"), "^src", "")).as("file_path"))
          .join(broadcast(fused), Seq("doc_id"))
          .filter(col("score") > 0.01)
          .select(col("doc_id"), col("file_path"), round(col("score"), 6).as("score"))
          .orderBy(round(col("score"), 6).desc, col("doc_id").asc)
          .limit(5)
      },
      Some(s"WITH ${Q.bm25Ctes}, ${Q.bm25ScoresCte("['spark', 'join', 'merge']")}, $adcCtes, " +
        "fts AS (SELECT doc_id, score AS fts_score FROM scores ORDER BY round(score, 6) DESC, doc_id LIMIT 10), " +
        "short AS (SELECT vec_id FROM rr WHERE qid = 0 AND rank <= 20), " +
        "qvt AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), " +
        s"vd AS (SELECT e.vec_id AS doc_id, ${Q.cosineDistSql("e.embedding", "qv")} AS vss_score " +
        "FROM short s JOIN embeddings e ON s.vec_id = e.vec_id CROSS JOIN qvt), " +
        "vss AS (SELECT doc_id, vss_score FROM vd ORDER BY round(vss_score, 6) ASC, doc_id LIMIT 10), " +
        "fused AS (SELECT COALESCE(fts.doc_id, vss.doc_id) AS doc_id, fts_score, vss_score, " +
        "CASE WHEN fts_score IS NOT NULL AND vss_score IS NOT NULL THEN (fts_score + vss_score) / 2.0 " +
        "WHEN fts_score IS NOT NULL THEN fts_score * 0.8 " +
        "WHEN vss_score IS NOT NULL THEN vss_score * 0.8 ELSE 0.0 END AS score " +
        "FROM fts FULL OUTER JOIN vss ON fts.doc_id = vss.doc_id) " +
        "SELECT doc_id, 'corpus/' || regexp_replace(source, '^src', '') AS file_path, " +
        "round(score, 6) AS score FROM fused JOIN documents USING (doc_id) " +
        "WHERE score > 0.01 ORDER BY round(score, 6) DESC, doc_id LIMIT 5")),

    // End-to-end SEARCH with the COMPOSED IVF×PQ VSS leg — `--ann
    // ivf:2+pq:20` as an oracle-checked query, completing the set: all four
    // VSS strategies (exact / ivf / pq / ivf+pq) now hash-match DuckDB
    // through the identical fusion tail. The composition point: the ADC
    // candidate set is RESTRICTED to vectors assigned to a probed cluster
    // (at scale, a partition-pruned scan of the cluster-partitioned codes),
    // the codebook/LUT geometry is unchanged, and the exact kernel touches
    // only the 20-row shortlist.
    Q("q_search_e2e_ivfpq",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val cents = e.filter(col("vec_id") < 4)
          .select(col("vec_id").as("ccid"), col("embedding").as("ccvec"))
        val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
        val cosd = graft.functions.VectorOps.cosineDist _
        // probe: top-2 centroids for query 0 (4-row window — bounded)
        val pr = cents.crossJoin(broadcast(qv))
          .withColumn("qcd", cosd(col("ccvec"), col("qvec")))
          .withColumn("_rn", row_number().over(
            Window.orderBy(round(col("qcd"), 6).asc, col("ccid").asc)))
          .filter(col("_rn") <= 2).select("ccid")
        // corpus assignment → probed-cluster restriction
        val wA = Window.partitionBy(col("vec_id"))
          .orderBy(round(col("cd"), 6).asc, col("ccid").asc)
        val restricted = e.crossJoin(broadcast(cents))
          .withColumn("cd", cosd(col("embedding"), col("ccvec")))
          .withColumn("_rn", row_number().over(wA)).filter(col("_rn") === 1)
          .join(broadcast(pr), Seq("ccid"))
          .select(col("vec_id"), col("embedding"))
        val short = adcShortlistOver(s, d, restricted, 20, Seq(0))
          .filter(col("qid") === 0).select("vec_id")
        val vss = e.join(broadcast(short), Seq("vec_id"))
          .crossJoin(broadcast(qv))
          .select(col("vec_id").as("doc_id"),
            cosd(col("embedding"), col("qvec")).as("vss_score"))
          .orderBy(round(col("vss_score"), 6).asc, col("doc_id").asc)
          .limit(10)
        val dd = docs(s, d).select(col("doc_id"), col("tokens"))
        val doclen = graft.search.Bm25.docLengths(dd)
        val fts = graft.search.Bm25.scoresSelfContained(
            Seq("spark", "join", "merge"),
            graft.search.Bm25.postings(dd), doclen, graft.search.Bm25.corpusStats(doclen))
          .orderBy(round(col("score"), 6).desc, col("doc_id").asc)
          .limit(10)
          .withColumnRenamed("score", "fts_score")
        val fused = fts.join(vss, Seq("doc_id"), "full_outer")
          .withColumn("score",
            graft.search.HybridSearch.hybridScore(col("fts_score"), col("vss_score")))
        t(s, d, "documents")
          .select(col("doc_id"),
            concat(lit("corpus/"), regexp_replace(col("source"), "^src", "")).as("file_path"))
          .join(broadcast(fused), Seq("doc_id"))
          .filter(col("score") > 0.01)
          .select(col("doc_id"), col("file_path"), round(col("score"), 6).as("score"))
          .orderBy(round(col("score"), 6).desc, col("doc_id").asc)
          .limit(5)
      },
      Some(s"WITH ${Q.bm25Ctes}, ${Q.bm25ScoresCte("['spark', 'join', 'merge']")}, $pqCtes, " +
        "fts AS (SELECT doc_id, score AS fts_score FROM scores ORDER BY round(score, 6) DESC, doc_id LIMIT 10), " +
        "cents AS (SELECT vec_id AS ccid, embedding AS ccvec FROM embeddings WHERE vec_id < 4), " +
        "qvt AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), " +
        "pr AS (SELECT ccid FROM (SELECT ccid, row_number() OVER " +
        s"(ORDER BY round(${Q.cosineDistSql("ccvec", "qv")}, 6), ccid) AS rn FROM cents CROSS JOIN qvt) WHERE rn <= 2), " +
        s"ca AS (SELECT vec_id, ccid FROM (SELECT e.vec_id, c.ccid, row_number() OVER " +
        s"(PARTITION BY e.vec_id ORDER BY round(${Q.cosineDistSql("e.embedding", "c.ccvec")}, 6), c.ccid) AS rn " +
        "FROM embeddings e CROSS JOIN cents c) WHERE rn = 1), " +
        "probed AS (SELECT vec_id FROM ca JOIN pr USING (ccid)), " +
        s"dd AS (SELECT s.vec_id, s.j, c.cid, ${l2Sql("s.sv", "c.cv")} AS d " +
        "FROM sub s JOIN probed USING (vec_id) JOIN code c ON s.j = c.j), " +
        "er AS (SELECT vec_id, j, cid, row_number() OVER " +
        "(PARTITION BY vec_id, j ORDER BY round(d, 6), cid) AS rn FROM dd), " +
        "enc AS (SELECT vec_id, j, cid FROM er WHERE rn = 1), " +
        "lut AS (SELECT c.j, c.cid, " +
        s"CAST(floor(${l2Sql("s.sv", "c.cv")} * 1e6 + 0.5) AS BIGINT) AS lq " +
        "FROM sub s JOIN code c ON s.j = c.j WHERE s.vec_id = 0), " +
        "ad AS (SELECT e.vec_id, CAST(sum(l.lq) AS DOUBLE) / 1e6 AS adist " +
        "FROM enc e JOIN lut l ON e.j = l.j AND e.cid = l.cid " +
        "WHERE e.vec_id != 0 GROUP BY e.vec_id), " +
        "short AS (SELECT vec_id FROM (SELECT vec_id, row_number() OVER " +
        "(ORDER BY round(adist, 6), vec_id) AS rn FROM ad) WHERE rn <= 20), " +
        s"vd AS (SELECT e.vec_id AS doc_id, ${Q.cosineDistSql("e.embedding", "qv")} AS vss_score " +
        "FROM short s JOIN embeddings e ON s.vec_id = e.vec_id CROSS JOIN qvt), " +
        "vss AS (SELECT doc_id, vss_score FROM vd ORDER BY round(vss_score, 6) ASC, doc_id LIMIT 10), " +
        "fused AS (SELECT COALESCE(fts.doc_id, vss.doc_id) AS doc_id, fts_score, vss_score, " +
        "CASE WHEN fts_score IS NOT NULL AND vss_score IS NOT NULL THEN (fts_score + vss_score) / 2.0 " +
        "WHEN fts_score IS NOT NULL THEN fts_score * 0.8 " +
        "WHEN vss_score IS NOT NULL THEN vss_score * 0.8 ELSE 0.0 END AS score " +
        "FROM fts FULL OUTER JOIN vss ON fts.doc_id = vss.doc_id) " +
        "SELECT doc_id, 'corpus/' || regexp_replace(source, '^src', '') AS file_path, " +
        "round(score, 6) AS score FROM fused JOIN documents USING (doc_id) " +
        "WHERE score > 0.01 ORDER BY round(score, 6) DESC, doc_id LIMIT 5")),

    // One k-means (Lloyd) refinement step over the embedding corpus: assign
    // every vector to its nearest centroid (the IVF assignment), then
    // recompute each centroid as the element-wise member mean and report how
    // far it moved — the inner loop of training the coarse quantizer that
    // q_sim_ivf_search probes. Shapes: broadcast centroids + windowed argmin
    // (per-vector partition), then posexplode to (cluster, dim) rows whose
    // partial-agg'd integer sums (floor(v·1e6+0.5) longs, the
    // q_embed_centroids rule) make the means order-independent; the k×d
    // mean/shift table is tiny. Nothing shuffles more than once and no
    // driver-side iteration state exists beyond the centroid frame itself —
    // at 100 TB each Lloyd round is exactly this job.
    Q("q_kmeans_step",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val cent = e.filter(col("vec_id") < 4)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        val asg = graft.ops.Similarity
          .ivfAssign(e, "vec_id", "embedding", cent, "cid", "cvec")
          .select(col("cid"), col("embedding"))
        val dims = asg
          .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .select(col("cid"), col("pos").cast("long").as("pos"),
            floor(col("v").cast("double") * 1e6 + 0.5).cast("long").as("sv"))
          .groupBy("cid", "pos")
          .agg(count(lit(1)).as("n"), sum(col("sv")).as("ssum"))
          .withColumn("mean", col("ssum").cast("double") / (col("n").cast("double") * 1e6))
        val centEx = cent
          .select(col("cid"), posexplode(col("cvec")).as(Seq("pos", "cv")))
          .select(col("cid"), col("pos").cast("long").as("pos"),
            col("cv").cast("double").as("cv"))
        dims.join(broadcast(centEx), Seq("cid", "pos"))
          .withColumn("sqd", (col("mean") - col("cv")) * (col("mean") - col("cv")))
          .withColumn("sqm", col("mean") * col("mean"))
          .groupBy("cid")
          .agg(max(col("n")).as("n_members"),
            Q.r6(sqrt(sum(floor(col("sqd") * 1e12 + 0.5).cast("long")).cast("double") / 1e12))
              .as("shift"),
            Q.r6(sqrt(sum(floor(col("sqm") * 1e12 + 0.5).cast("long")).cast("double") / 1e12))
              .as("new_norm"))
          .orderBy("cid")
      },
      Some("WITH cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 4), " +
        s"ad AS (SELECT e.vec_id, e.embedding, c.cid, ${Q.cosineDistSql("e.embedding", "c.cvec")} AS cdist " +
        "FROM embeddings e CROSS JOIN cent c), " +
        "adr AS (SELECT vec_id, embedding, cid, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY round(cdist, 6), cid) AS rn FROM ad), " +
        "asg AS (SELECT embedding, cid FROM adr WHERE rn = 1), " +
        "ex AS (SELECT cid, CAST(i - 1 AS BIGINT) AS pos, " +
        "CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS sv " +
        s"FROM asg CROSS JOIN ${Q.dimSeriesSql} AS g(i) WHERE i <= len(embedding)), " +
        "dims AS (SELECT cid, pos, CAST(count(*) AS BIGINT) AS n, sum(sv) AS ssum FROM ex GROUP BY cid, pos), " +
        "dm AS (SELECT cid, pos, n, CAST(ssum AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6) AS mean FROM dims), " +
        "cx AS (SELECT cid, CAST(i - 1 AS BIGINT) AS pos, CAST(cvec[i] AS DOUBLE) AS cv " +
        s"FROM cent CROSS JOIN ${Q.dimSeriesSql} AS g(i) WHERE i <= len(cvec)), " +
        "jj AS (SELECT dm.cid, dm.n, (mean - cv) * (mean - cv) AS sqd, mean * mean AS sqm " +
        "FROM dm JOIN cx ON dm.cid = cx.cid AND dm.pos = cx.pos) " +
        "SELECT cid, max(n) AS n_members, " +
        s"${Q.r6Sql("sqrt(CAST(sum(CAST(floor(sqd * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12)")} AS shift, " +
        s"${Q.r6Sql("sqrt(CAST(sum(CAST(floor(sqm * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12)")} AS new_norm " +
        "FROM jj GROUP BY cid ORDER BY cid")),

    // ---- Text: keyword extraction + quality rules ----

    // Per-document top-3 keywords by tf-idf (smoothed idf) — the classic
    // document-summary signal a curation pipeline attaches before topic
    // bucketing. tf and df are both partial-agg'd; the corpus-size scalar
    // rides a broadcast; the doc-frequency join is an equi-join on the term
    // (vocab-sized, NOT broadcast — a real vocab is millions of terms); the
    // final top-3 is a window partitioned BY DOC (no global sort, perfectly
    // parallel). Ranking compares the ROUNDED score with a term tiebreak so
    // the cut is cross-engine deterministic.
    Q("q_tfidf_keywords",
      (s, d) => {
        val tok = docs(s, d).select(col("doc_id"), explode(col("tokens")).as("term"))
        val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        // df rides a count-over-window on the SAME tf frame (round 22): the
        // tf-rows-per-term count IS the doc frequency, so the former
        // aggregate-then-join shape — which re-scanned and re-tokenized the
        // whole corpus for the df branch (Spark shares no scan subtrees
        // across join sides) — collapses to one tokenize + one exchange on
        // term. Identical df per (term): count(*) over the term partition
        // equals the old groupBy(term).count join value.
        val withDf = tf.withColumn("df",
          count(lit(1)).over(Window.partitionBy(col("term"))))
        val nd = t(s, d, "documents").agg(count(lit(1)).as("nd"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(round(col("score"), 6).desc, col("term").asc)
        withDf.crossJoin(broadcast(nd))
          .withColumn("score", col("tf").cast("double") *
            log((col("nd").cast("double") + 1.0) / (col("df").cast("double") + 1.0)))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("term"), col("rank"), Q.r6(col("score")).as("score"))
          .orderBy("doc_id", "rank")
      },
      Some(s"WITH ${Q.toksCte}, ${Q.postingCte}, ${Q.tfCte}, ${Q.dfCte}, " +
        "nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents), " +
        "sc AS (SELECT tf.doc_id, tf.term, CAST(tf.tf AS DOUBLE) * " +
        "ln((CAST(nd.nd AS DOUBLE) + 1.0) / (CAST(tdf.df AS DOUBLE) + 1.0)) AS score " +
        "FROM tf JOIN tdf USING (term) CROSS JOIN nd), " +
        "rr AS (SELECT doc_id, term, score, CAST(row_number() OVER " +
        "(PARTITION BY doc_id ORDER BY round(score, 6) DESC, term) AS BIGINT) AS rank FROM sc) " +
        s"SELECT doc_id, term, rank, ${Q.r6Sql("score")} AS score " +
        "FROM rr WHERE rank <= 3 ORDER BY doc_id, rank")),

    // Gopher-style quality rule bundle (Rae et al. 2021 §A1.1, re-expressed
    // over this corpus's signals): token count bounds, mean-word-length
    // window, minimum stopword evidence, minimum alphabetic-word fraction —
    // each rule reported separately plus the composite verdict, because a
    // real pipeline tunes and ablates rules individually. Pure map-only
    // projection (no shuffle at any scale); rules compare ROUNDED signals so
    // both engines agree at rule boundaries.
    Q("q_text_gopher_rules",
      (s, d) => gopherRules(docs(s, d)).orderBy("doc_id"),
      Some(s"WITH ${Q.toksCte}, m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok, " +
        s"${Q.r6Sql(TextAnalysis.avgTokenLenSql("d.text", "len(toks)"))} AS mean_len, " +
        s"${TextAnalysis.stopwordCountSql("toks")} AS n_stop, " +
        s"${Q.r6Sql("CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)")} AS frac_alpha " +
        "FROM toks JOIN documents d USING (doc_id)), " +
        "r AS (SELECT doc_id, n_tok, mean_len, n_stop, frac_alpha, " +
        "n_tok >= 20 AND n_tok <= 100000 AS rule_len, " +
        "mean_len >= 3.0 AND mean_len <= 10.0 AS rule_word_len, " +
        "n_stop >= 2 AS rule_stop, frac_alpha >= 0.8 AS rule_alpha FROM m) " +
        "SELECT doc_id, n_tok, mean_len, n_stop, frac_alpha, rule_len, rule_word_len, " +
        "rule_stop, rule_alpha, rule_len AND rule_word_len AND rule_stop AND rule_alpha AS pass " +
        "FROM r ORDER BY doc_id")),

    // ---- Dedup: edit-distance verification ----

    // Edit-distance verify over the MinHash-LSH candidate pairs: Levenshtein
    // similarity (1 − lev/maxlen) on length-capped prefixes. The candidate
    // set is the band-bucketed LSH output (never all-pairs); the texts
    // attach by two equi-joins on the doc id; the O(L²) edit-distance
    // kernel runs per-pair, map-only, with L capped at 200 chars so the
    // worst-case cell count is bounded no matter how long documents get at
    // 100 TB (the cap is the standard trick — near-dups disagree early).
    // Equal prefixes short-circuit to lev=0 before the kernel: in the
    // boilerplate-dense corpora that saturate LSH buckets (license headers,
    // templated pages) most candidate pairs share their first 200 chars
    // exactly, so the dominant cost class drops from O(L²) to an equality
    // check; a result-identical rewrite, so the oracle SQL is unchanged.
    // The remaining kernel input spreads via [[Dedup.spreadForKernel]] —
    // without it AQE byte-coalesces the skinny pair frame to one partition
    // and the kernel runs single-core (measured 20 s vs 1.3 s on 74k pairs).
    Q("q_dedup_lev_pairs",
      (s, d) => {
        val txt = t(s, d, "documents")
          .select(col("doc_id"), substring(col("text"), 1, 200).as("t200"))
        // attach-then-spread HERE (unlike the ds-array verifies): the
        // attach payload is two 200-char prefixes — re-shuffling it is
        // cheap — while a pre-spread lets Catalyst broadcast the pairs and
        // park the O(L²) levenshtein kernel on the single-task documents
        // scan (round-21 bench: 1.60 → 3.04 s in that shape; this one
        // restores 32-way kernel execution above the repartition)
        graft.ops.Dedup.spreadForKernel(
          PipelineQueries.minhashCandidatePairs(s, d)
            .join(txt.select(col("doc_id").as("doc_a"), col("t200").as("ta")), Seq("doc_a"))
            .join(txt.select(col("doc_id").as("doc_b"), col("t200").as("tb")), Seq("doc_b")))
          .withColumn("lev",
            when(col("ta") === col("tb"), lit(0L))
              .otherwise(levenshtein(col("ta"), col("tb")).cast("long")))
          .select(col("doc_a"), col("doc_b"), col("lev"),
            Q.r6(lit(1.0) - col("lev").cast("double") /
              greatest(length(col("ta")), length(col("tb"))).cast("double")).as("lev_sim"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"WITH ${PipelineQueries.minhashCandCtes}, " +
        "tx AS (SELECT doc_id, substr(text, 1, 200) AS t200 FROM documents), " +
        "lv AS (SELECT doc_a, doc_b, CAST(levenshtein(a.t200, b.t200) AS BIGINT) AS lev, " +
        "greatest(length(a.t200), length(b.t200)) AS ml " +
        "FROM pairs JOIN tx a ON pairs.doc_a = a.doc_id JOIN tx b ON pairs.doc_b = b.doc_id) " +
        s"SELECT doc_a, doc_b, lev, ${Q.r6Sql("1.0 - CAST(lev AS DOUBLE) / CAST(ml AS DOUBLE)")} AS lev_sim " +
        "FROM lv ORDER BY doc_a, doc_b")),

    // ---- Analytics: statistical anomaly detection ----

    // Per-event-type 3σ anomaly counts: exact-decimal moments per type
    // (q_stat_moments rule: Σx/Σx² in DECIMAL so the stats are
    // order-independent), broadcast back onto the stream, flag
    // |z| > 3 on the ROUNDED z-score. Two passes over events, both
    // partial-agg'd; the stats table is |event_type| rows — at 100 TB the
    // flagging pass is map-only against a broadcast.
    Q("q_anomaly_zscore",
      (s, d) => {
        val ev = events(s, d)
        val x = col("value").cast("decimal(18,4)")
        val st = ev.groupBy("event_type")
          .agg(count(lit(1)).cast("double").as("n"),
            sum(x).cast("double").as("sx"),
            sum((x * x).cast("decimal(38,8)")).cast("double").as("sxx"))
          // degenerate types must be excluded BEFORE the sqrt, on the
          // VARIANCE NUMERATOR: a constant-valued group's numerator rounds
          // to a tiny NEGATIVE double (≈ -1e-22), where DuckDB's sqrt
          // hard-errors while Spark yields NaN — and Spark's nan-safe
          // comparisons would then let NaN z-scores count as anomalies.
          // Guarding the numerator (not sigma) keeps both engines on the
          // same row set without ever evaluating sqrt(negative).
          .withColumn("_vn", col("sxx") - col("sx") * col("sx") / col("n"))
          .filter(col("_vn") > 0.0 && col("n") > 1.0)
          .select(col("event_type"), col("sx") / col("n") as "mu",
            sqrt(col("_vn") / (col("n") - 1.0)).as("sigma"))
        ev.join(broadcast(st), Seq("event_type"))
          .withColumn("az", round(abs((col("value") - col("mu")) / col("sigma")), 6))
          .groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("n_events"),
            sum(when(col("az") > 3.0, 1L).otherwise(0L)).as("n_anomalies"),
            Q.r6(max(col("az"))).as("max_absz"))
          .orderBy("event_type")
      },
      Some("WITH st AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)) AS DECIMAL(38,8))) AS DOUBLE) AS sxx " +
        "FROM events GROUP BY event_type), " +
        "vn AS (SELECT event_type, sx, n, sxx - sx * sx / n AS vnum FROM st), " +
        "ms AS (SELECT event_type, sx / n AS mu, sqrt(vnum / (n - 1.0)) AS sigma " +
        "FROM vn WHERE vnum > 0.0 AND n > 1.0), " +
        "fl AS (SELECT e.event_type, round(abs((e.value - mu) / sigma), 6) AS az " +
        "FROM events e JOIN ms ON e.event_type = ms.event_type) " +
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, " +
        "CAST(sum(CASE WHEN az > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies, " +
        s"${Q.r6Sql("max(az)")} AS max_absz " +
        "FROM fl GROUP BY event_type ORDER BY event_type")),

    // ---- Training-example construction ----

    // Fixed-size token windows with stride (context-window chunking for LLM
    // training): size 8, stride 4, full windows only. One map-only
    // transform+explode per document — no shuffle, no state; the window
    // content is carried as an md5 so the output stays skinny while still
    // hash-proving byte-identical window extraction cross-engine.
    Q("q_token_windows",
      (s, d) => docs(s, d)
        .filter(size(col("tokens")) >= 8)
        .withColumn("nwin", expr("(size(tokens) - 8) div 4 + 1"))
        .select(col("doc_id"), explode(transform(
          sequence(lit(0), col("nwin") - 1),
          w => struct(w.cast("long").as("win_id"),
            (w * 4 + 1).cast("long").as("start_pos"),
            md5(concat_ws(" ", slice(col("tokens"), w * 4 + 1, lit(8)))).as("win_md5")))).as("w"))
        .select(col("doc_id"), col("w.win_id").as("win_id"),
          col("w.start_pos").as("start_pos"), col("w.win_md5").as("win_md5"))
        .orderBy("doc_id", "win_id"),
      Some(s"WITH ${Q.toksCte}, " +
        "wn AS (SELECT doc_id, toks, (len(toks) - 8) // 4 + 1 AS nwin " +
        "FROM toks WHERE len(toks) >= 8), " +
        "wx AS (SELECT doc_id, toks, unnest(generate_series(0, nwin - 1)) AS w FROM wn) " +
        "SELECT doc_id, CAST(w AS BIGINT) AS win_id, CAST(w * 4 + 1 AS BIGINT) AS start_pos, " +
        "md5(array_to_string(toks[w * 4 + 1 : w * 4 + 8], ' ')) AS win_md5 " +
        "FROM wx ORDER BY doc_id, win_id")),

    // Learning-to-rank feature extraction — the training-data product of
    // the search engine itself: for each query, take the BM25 top-10
    // candidates and emit the per-(query, doc) feature vector an LTR
    // reranker trains on (BM25 score, exact cosine distance, matched-term
    // count, document length, weak-supervision rank label). Shapes are the
    // engine's own: postings partial-agg'd once, the 9-row query set and
    // the corpus stats ride broadcasts, candidates prune per query with
    // WindowGroupLimit, and the embedding attach joins ONLY the ≤ 30
    // shortlisted (query, doc) rows. The BM25 arithmetic and the Okapi
    // constants are the oracle-checked F4 ones.
    Q("q_ltr_features",
      (s, d) => {
        // BM25 statistics come from the F1-F3 helpers themselves (one
        // kernel definition repo-wide), with the scoresSelfContained
        // shape: postings are filtered to the query vocabulary FIRST
        // (broadcast), df comes from a window count over those matching
        // postings (same value as the corpus tdf for matched terms), so
        // the explode+aggregate subtree runs ONCE and no vocab-sized df
        // table ever shuffles for a 9-term query set.
        import graft.search.Bm25
        val tok = docs(s, d)
        val dl = Bm25.docLengths(tok)
        val stats = Bm25.corpusStats(dl)
        val tf = Bm25.postings(tok)
        val qdf = Seq((0L, "spark"), (0L, "join"), (0L, "merge"),
          (1L, "window"), (1L, "batch"), (1L, "stream"),
          (2L, "customer"), (2L, "order"), (2L, "value"))
        import s.implicits._
        val qterms = qdf.toDF("qid", "term")
        val withDf = tf.join(broadcast(qterms.select("term").distinct()), Seq("term"))
          .withColumn("df", count(lit(1)).over(Window.partitionBy("term")).cast("long"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(round(col("fts_score"), 6).desc, col("doc_id").asc)
        val cand = withDf.join(broadcast(qterms), Seq("term"))
          .join(dl, Seq("doc_id"))
          .crossJoin(broadcast(stats))
          .withColumn("_c", Bm25.termScore(
            col("tf"), col("df"), col("dl"), col("n_docs"), col("avgdl")))
          .groupBy("qid", "doc_id")
          // tf rows are (doc, term)-unique, so the row count IS the number
          // of distinct matched query terms; dl is functionally dependent
          // on doc_id, so max() carries it through without a later re-join
          .agg(sum(col("_c")).as("fts_score"), count(lit(1)).as("overlap"),
            max(col("dl")).as("doc_len"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 10)
        val emb = t(s, d, "embeddings")
        val qv = emb.filter(col("vec_id") < 3)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        cand.join(emb.select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
          .join(broadcast(qv), Seq("qid"))
          .select(col("qid"), col("doc_id"), col("rank"),
            Q.r6(col("fts_score")).as("fts_score"),
            Q.r6(graft.functions.VectorOps.cosineDist(col("embedding"), col("qvec")))
              .as("cos_dist"),
            col("overlap"), col("doc_len"))
          .orderBy("qid", "rank")
      },
      Some {
        val qt = "(VALUES (0,'spark'),(0,'join'),(0,'merge')," +
          "(1,'window'),(1,'batch'),(1,'stream')," +
          "(2,'customer'),(2,'order'),(2,'value')) AS qt(qid, term)"
        s"WITH ${Q.bm25Ctes}, " +
          s"qscores AS (SELECT qid, tf.doc_id, sum(${Q.bm25TermSql}) AS fts_score, " +
          "CAST(count(*) AS BIGINT) AS overlap, CAST(max(doclen.dl) AS BIGINT) AS doc_len " +
          s"FROM tf JOIN $qt USING (term) JOIN tdf USING (term) " +
          "JOIN doclen ON tf.doc_id = doclen.doc_id CROSS JOIN stats GROUP BY qid, tf.doc_id), " +
          "cand AS (SELECT qid, doc_id, fts_score, overlap, doc_len, CAST(row_number() OVER " +
          "(PARTITION BY qid ORDER BY round(fts_score, 6) DESC, doc_id) AS BIGINT) AS rank " +
          "FROM qscores), " +
          "qv AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3) " +
          "SELECT c.qid, c.doc_id, c.rank, " +
          s"${Q.r6Sql("c.fts_score")} AS fts_score, " +
          s"${Q.r6Sql(Q.cosineDistSql("e.embedding", "qv.qvec"))} AS cos_dist, " +
          "c.overlap, c.doc_len " +
          "FROM cand c JOIN embeddings e ON c.doc_id = e.vec_id " +
          "JOIN qv ON c.qid = qv.qid " +
          "WHERE c.rank <= 10 ORDER BY c.qid, c.rank"
      }),

    // Retention cohort analysis over the event stream: cohort = each
    // user's first active day; report distinct active users per
    // (cohort_day, day_offset ≤ 7) — the D1/D7 retention table. Shapes:
    // one distinct on (user, day) (partial-agg'd), ONE shuffle on user_id
    // for the per-user min window, then a grouped count over rows that are
    // already (user, day)-unique — no second distinct, no join. Day
    // arithmetic is integer ns division, identical in both engines.
    Q("q_retention_cohorts",
      (s, d) => {
        val act = events(s, d)
          .select(col("user_id"), expr("ts div 86400000000000").as("day"))
          .distinct()
        val w = Window.partitionBy(col("user_id"))
        act.withColumn("cohort_day", min(col("day")).over(w))
          .withColumn("day_offset", col("day") - col("cohort_day"))
          .filter(col("day_offset") <= 7)
          .groupBy("cohort_day", "day_offset")
          .agg(count(lit(1)).as("n_users")) // rows are (user, day)-unique
          .orderBy("cohort_day", "day_offset")
      },
      Some("WITH act AS (SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events), " +
        "c AS (SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort_day FROM act) " +
        "SELECT cohort_day, day - cohort_day AS day_offset, " +
        "CAST(count(*) AS BIGINT) AS n_users " +
        "FROM c WHERE day - cohort_day <= 7 " +
        "GROUP BY cohort_day, day_offset ORDER BY cohort_day, day_offset")),

    // Token-distribution drift (PSI) between two corpus halves — the
    // distribution-shift monitor a pipeline runs between ingest batches
    // (here: even vs odd doc ids as the deterministic "before/after").
    // Per-token population stability index with add-one smoothing; the
    // top-20 drifting tokens cut by TakeOrderedAndProject. Two partial-
    // agg'd counts + broadcast totals + map arithmetic — one shuffle on
    // the term, nothing corpus-sized moves.
    Q("q_token_psi",
      (s, d) => {
        val tok = docs(s, d)
          .select(explode(col("tokens")).as("term"), (col("doc_id") % 2).as("half"))
        val cnt = tok.groupBy("term").agg(
          sum(when(col("half") === 0, 1L).otherwise(0L)).as("c1"),
          sum(when(col("half") === 1, 1L).otherwise(0L)).as("c2"))
        val tot = cnt.agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"),
          count(lit(1)).as("v"))
        val p1 = (col("c1") + 1).cast("double") / (col("t1") + col("v")).cast("double")
        val p2 = (col("c2") + 1).cast("double") / (col("t2") + col("v")).cast("double")
        cnt.crossJoin(broadcast(tot))
          .withColumn("psi", Q.r6((p1 - p2) * log(p1 / p2)))
          .select(col("term"), col("c1"), col("c2"), col("psi"))
          .orderBy(col("psi").desc, col("term").asc)
          .limit(20)
      },
      Some(s"WITH ${Q.toksCte}, " +
        "tk AS (SELECT unnest(toks) AS term, doc_id % 2 AS half FROM toks), " +
        "cnt AS (SELECT term, CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1, " +
        "CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2 FROM tk GROUP BY term), " +
        "tot AS (SELECT CAST(sum(c1) AS BIGINT) AS t1, CAST(sum(c2) AS BIGINT) AS t2, " +
        "CAST(count(*) AS BIGINT) AS v FROM cnt), " +
        "ps AS (SELECT term, c1, c2, " +
        s"${Q.r6Sql("(CAST(c1 + 1 AS DOUBLE) / CAST(t1 + v AS DOUBLE) - CAST(c2 + 1 AS DOUBLE) / CAST(t2 + v AS DOUBLE)) " +
          "* ln((CAST(c1 + 1 AS DOUBLE) / CAST(t1 + v AS DOUBLE)) / (CAST(c2 + 1 AS DOUBLE) / CAST(t2 + v AS DOUBLE)))")} AS psi " +
        "FROM cnt, tot) " +
        "SELECT term, c1, c2, psi FROM ps ORDER BY psi DESC, term LIMIT 20")),

    // Near-dup train/test split leakage audit: assign every doc to a
    // deterministic hash split (the q_shard_assign nibble, mod 2) and
    // report every VERIFIED near-dup pair (Jaccard ≥ 0.5, the dedup
    // clustering edges) that crosses the split boundary — each one is a
    // train→test leak that inflates eval scores. Pairs come from the
    // band-bucketed LSH machinery (never all-pairs); the split attach is
    // two id-keyed joins of the bounded pair set.
    Q("q_split_leakage",
      (s, d) => {
        val splits = t(s, d, "documents")
          .select(col("doc_id"), (expr(CurationQueries.nibbleHashSql) % 2).as("sp"))
        PipelineQueries.minhashVerifiedPairsOf(docsSpread(s, d))
          .filter(col("jaccard") >= 0.5)
          .join(splits.select(col("doc_id").as("doc_a"), col("sp").as("split_a")), Seq("doc_a"))
          .join(splits.select(col("doc_id").as("doc_b"), col("sp").as("split_b")), Seq("doc_b"))
          .filter(col("split_a") =!= col("split_b"))
          .select(col("doc_a"), col("doc_b"), Q.r6(col("jaccard")).as("jaccard"),
            col("split_a"), col("split_b"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"WITH ${PipelineQueries.minhashPairsCtes}, " +
        s"sp AS (SELECT doc_id, (${CurationQueries.nibbleHashSql}) % 2 AS sp FROM documents) " +
        s"SELECT doc_a, doc_b, ${Q.r6Sql("jaccard")} AS jaccard, " +
        "sa.sp AS split_a, sb.sp AS split_b " +
        "FROM verified JOIN sp sa ON doc_a = sa.doc_id JOIN sp sb ON doc_b = sb.doc_id " +
        "WHERE jaccard >= 0.5 AND sa.sp != sb.sp ORDER BY doc_a, doc_b")),

    // Exact shared-span detection (memorization / contamination spans): md5
    // every 8-token window at stride 1 and group across documents — any
    // hash held by ≥2 docs is a verbatim 8-gram shared between them, the
    // signal behind exact-substring dedup of memorized boilerplate. One
    // map-only explode (×L per doc) + one partial-agg'd groupBy on a
    // 32-byte hash; skew-safe at 100 TB because a viral span still groups
    // to ONE skinny count row (the texts never ride the shuffle).
    Q("q_shared_spans",
      (s, d) => docsSpread(s, d)
        .filter(size(col("tokens")) >= 8)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("tokens")) - 7),
          p => md5(concat_ws(" ", slice(col("tokens"), p, lit(8)))))).as("h"))
        .groupBy("h")
        .agg(countDistinct(col("doc_id")).cast("long").as("n_docs"),
          count(lit(1)).as("n_occ"), min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy("h"),
      Some(s"WITH ${Q.toksCte}, " +
        "wx AS (SELECT doc_id, unnest(generate_series(1, len(toks) - 7)) AS p, toks " +
        "FROM toks WHERE len(toks) >= 8), " +
        "hh AS (SELECT doc_id, md5(array_to_string(toks[p : p + 7], ' ')) AS h FROM wx) " +
        "SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, " +
        "CAST(count(*) AS BIGINT) AS n_occ, min(doc_id) AS first_doc " +
        "FROM hh GROUP BY h HAVING count(DISTINCT doc_id) >= 2 ORDER BY h")),

    // BPE merge TRAINING (the actual loop, not just one round's statistic):
    // 4 rounds of count-pairs → argmax → corpus-wide greedy merge, via
    // graft.ops.BpeTrainer (4 keeps the benchmarked loop short; the spec
    // also drives longer chained runs). Inherently iterative (merge k+1's
    // statistics depend on merge k) and engine-specific in its loop, so the
    // gate is rows-only; BpeTrainerSpec replays the algorithm locally in
    // plain Scala and asserts the IDENTICAL merge sequence and counts.
    Q("q_bpe_train",
      (s, d) => {
        import s.implicits._
        // spread-scan input: the trainer re-scans the corpus per merge
        // round (4 driver-sequential iterations), so the one-task fixture
        // scan serializes every round's map phase — measured 4.9 s
        // unspread vs 2.7 s spread in the round-21 full-bench A/B
        val (merges, _) = graft.ops.BpeTrainer.train(
          docsSpread(s, d).select(col("doc_id"), col("tokens")), "tokens", nMerges = 4)
        merges.toDF()
          .select(col("rank").cast("long").as("merge_rank"),
            col("left"), col("right"), col("n"))
          .orderBy("merge_rank")
      },
      None),

    // Span corruption (T5-style denoising prep): deterministically mask
    // ~20% of positions ((doc_id·31 + pos) mod 5 — no RNG state, so a
    // 100 TB rerun reproduces the same examples), emit the masked input and
    // the extraction target as md5s plus the mask count. Pure map-only
    // array transforms; nothing shuffles.
    Q("q_span_corruption",
      (s, d) => {
        def masked(i: Column) = (col("doc_id") * 31 + i) % 5 === 0
        docs(s, d)
          .withColumn("n_tokens", size(col("tokens")).cast("long"))
          .withColumn("idx", sequence(lit(1L), col("n_tokens")))
          .withColumn("mi", filter(col("idx"), i => masked(i)))
          .select(col("doc_id"), col("n_tokens"),
            size(col("mi")).cast("long").as("n_masked"),
            md5(concat_ws(" ", transform(col("idx"),
              i => when(masked(i), lit("<M>"))
                .otherwise(element_at(col("tokens"), i.cast("int")))))).as("input_md5"),
            md5(concat_ws(" ", transform(col("mi"),
              i => element_at(col("tokens"), i.cast("int"))))).as("target_md5"))
          .orderBy("doc_id")
      },
      Some(s"WITH ${Q.toksCte}, " +
        "m AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens, " +
        "list_filter(generate_series(1, len(toks)), i -> (doc_id * 31 + i) % 5 = 0) AS mi " +
        "FROM toks) " +
        "SELECT doc_id, n_tokens, CAST(len(mi) AS BIGINT) AS n_masked, " +
        "md5(array_to_string(list_transform(generate_series(1, len(toks)), " +
        "i -> CASE WHEN (doc_id * 31 + i) % 5 = 0 THEN '<M>' ELSE toks[i] END), ' ')) AS input_md5, " +
        "md5(array_to_string(list_transform(mi, i -> toks[i]), ' ')) AS target_md5 " +
        "FROM m ORDER BY doc_id"))
  )
}
