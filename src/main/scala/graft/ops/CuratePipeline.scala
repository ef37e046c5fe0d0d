package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end corpus curation chain — the composition a pretraining
  * pipeline actually runs, wired from the individually-oracle-checked
  * stages: quality gate → exact dedup → MinHash-LSH near-dup clustering →
  * optional quality-weighted sampling. Returns (kept corpus, drop report);
  * every input doc lands in exactly one of the two, and the whole chain is
  * deterministic (content hashes everywhere, no RNG), so a 100 TB curate
  * is reproducible and each stage's shuffle discipline is the one its
  * standalone query documents (PLANS.md).
  *
  * Stage order matters and mirrors production practice: the cheap map-only
  * gate runs first so dedup never hashes junk; exact dedup (32-byte keys)
  * runs before the shingle pipeline so near-dup only sees distinct texts;
  * sampling runs on the deduped corpus, BEFORE containment, so that every
  * `contained_in=<id>` report line names a container present in the final
  * kept output (the draw is per-doc deterministic, so its kept set is
  * position-independent — ordering it earlier only fixes the report's
  * referential integrity).
  */
object CuratePipeline {

  /** THE 8-token window-hash kernel shared by the oracle-checked
    * `q_boilerplate_windows` query and the curate pipeline's boilerplate
    * stage — one definition so the gated surface cannot drift from the
    * oracle (the same convention as `minhashVerifiedPairsOf`). Input needs
    * (doc_id, tokens); output: one row per (doc_id, window hash `wh`) with
    * the window's corpus-wide occurrence count `wf`. One shuffle keyed on
    * the 32-byte hash, map-side combined — linear in corpus tokens. */
  private[graft] def windowHashFreq(docs: DataFrame): DataFrame = {
    // round 21: the window id is INTERNAL to both consumers (the query
    // outputs per-doc counts; the curate stage a boiler ratio), so it
    // rides the fused xxhash64 stride-window kernel — one compiled pass
    // per row, an 8-byte shuffle key instead of a 32-char md5 hex string
    // (same rationale and collision math as repeatedGramFrames)
    val win = docs.filter(size(col("tokens")) >= 1)
      .select(col("doc_id"), explode(
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.functions.StrideWindowHashes64(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("tokens")),
            8, 8))).as("wh"))
    win.join(win.groupBy("wh").agg(count(lit(1)).as("wf")), Seq("wh"))
  }

  final case class Opts(
      jaccardThreshold: Double = 0.5,
      sample: Boolean = false,
      /** Oversized-LSH-bucket policy for the near-dup stage: `cap` (bound
        * pairs, overflow docs lose the band) or `subsplit` (every doc keeps
        * pairing inside its C-sized block) — [[Dedup.MaxPerBucket]]'s two
        * deterministic candidate-stage contracts. */
      bucketPolicy: String = "cap",
      /** Which member of a near-dup cluster survives (`--keep`):
        * `minid` (the component root — cheapest, order-stable) or
        * `longest` (max text length, ties to the smaller id — the
        * keep-best-representative policy of q_dedup_keep_longest). Both
        * run the same one-window-per-component argmax. */
      keepPolicy: String = "minid",
      /** Benchmark decontamination stage (`--decontaminate BENCH.parquet`):
        * docs whose shingle-contamination fraction against the benchmark
        * corpus reaches [[contaminationMax]] are dropped before dedup.
        * The benchmark freezes into a bloom + exact set pair
        * ([[Decontam.benchSet]] — benchmark-sized, never corpus-sized) and
        * each doc is screened by one stateless per-row pass. None = skip. */
      decontaminate: Option[DataFrame] = None,
      contaminationMax: Double = 0.05,
      /** Containment dedup stage (`--containment T`): after near-dup
        * clustering, drop every doc whose distinct-shingle set is ≥ T
        * CONTAINED in a LARGER kept doc (ties by id) — the sub-document-
        * duplication jaccard clustering can't see (a short doc inside a
        * boilerplate page has jaccard ≈ |A|/|B|, below any sane jaccard
        * threshold, at containment ~1.0). Candidates come from the
        * containment-calibrated (b=8, r=1) band layout (LSH Ensemble —
        * `Dedup.containmentBands`) under the production hash; the verify
        * is exact containment. If A ⊆ B ⊆ C, both A and B drop and C
        * survives — each contained doc names one container in the report,
        * not its transitive root. Negative = skip. */
      containmentMin: Double = -1.0,
      /** Corpus-global boilerplate drop (`--boilerplate-max F`): docs whose
        * fraction of non-overlapping 8-token windows appearing elsewhere in
        * the corpus reaches F are dropped (the q_boilerplate_windows rule
        * as a stage). Negative = skip. Unlike the benchmark screen this is
        * corpus-self-referential: one hash-keyed shuffle to count window
        * frequencies, one join back — the exact-dedup cost class. */
      boilerplateMax: Double = -1.0,
      /** Unicode-normalize the text BEFORE tokenization (`--normalize
        * NFC|NFD|NFKC|NFKD`): crawl corpora mix encodings of the same
        * grapheme ("é" composed vs e+U+0301, ligatures, width variants),
        * and every downstream stage — tokens, shingles, window hashes,
        * dedup — treats byte-distinct encodings as distinct content, so
        * two visually identical boilerplate pages in different encodings
        * would evade exact AND near dedup. Map-only codegen'd rewrite
        * ([[graft.functions.UnicodeNormalize]], already-normalized rows
        * pass through allocation-free). None = skip. */
      normalize: Option[String] = None)

  /** Run the chain over (doc_id, text) rows. Returns (kept, report) where
    * `kept` is the surviving (doc_id, text) corpus and `report` is
    * (doc_id, stage, detail) for every dropped doc. */
  def run(docsDf: DataFrame, opts: Opts = Opts()): (DataFrame, DataFrame) = {
    // 0. (optional) Unicode normalization — a pure text rewrite, never a
    //    drop, so it contributes no report rows; `kept` carries the
    //    NORMALIZED text (the whole point: downstream consumers must see
    //    one encoding per grapheme)
    val src = opts.normalize match {
      case Some(form) => docsDf.withColumn("text",
        graft.functions.TextOps.normalizeUnicode(col("text"), form))
      case None => docsDf
    }
    val tok = src.select(col("doc_id"), col("text"),
      split(col("text"), " ").as("tokens"))

    // 1. quality gate (map-only; graft.queries.PipelineQueries.qualityGate
    //    is the oracle-checked batch/streaming projection). Lineage is cut
    //    after the gate: `gated` feeds both the report branch and every
    //    later stage, and without the checkpoint the tokenize+gate subtree
    //    re-executes once per report-union branch plus once per write.
    val gate = graft.queries.PipelineQueries.qualityGate(tok)
      .select(col("doc_id"), col("keep"), col("drop_reason"))
    // docs too short to shingle (< 3 tokens) never enter the gate frame;
    // treat them as gated out with their own reason
    val gated = tok.join(gate, Seq("doc_id"), "left")
      .withColumn("keep", coalesce(col("keep"), lit(false)))
      .withColumn("drop_reason", coalesce(col("drop_reason"), lit("too_short")))
      .localCheckpoint()
    val dropQuality = gated.filter(!col("keep"))
      .select(col("doc_id"), lit("quality").as("stage"), col("drop_reason").as("detail"))
    val kept1g = gated.filter(col("keep")).select("doc_id", "text", "tokens")

    // 1.5 (optional) benchmark decontamination: map-only screen against the
    //     frozen bloom + exact set; runs before dedup so eval-contaminated
    //     docs never become cluster representatives
    val (kept1, dropContam) = opts.decontaminate match {
      case None => (kept1g, kept1g.limit(0)
        .select(col("doc_id"), lit("").as("stage"), lit("").as("detail")))
      case Some(benchDocs) =>
        // the benchmark gets the SAME normalization as the corpus (stage 0):
        // the screen compares shingle hashes, so normalizing only one side
        // would make encoding-variant contamination invisible — the exact
        // byte-distinct-encoding evasion --normalize exists to close
        val benchSrc = opts.normalize match {
          case Some(form) => benchDocs.withColumn("text",
            graft.functions.TextOps.normalizeUnicode(col("text"), form))
          case None => benchDocs
        }
        val (bloom, bench) = Decontam.benchSet(
          benchSrc.select(col("doc_id"), split(col("text"), " ").as("tokens")))
        val screened = Decontam.screen(
            kept1g.select(col("doc_id"), col("tokens")), bloom, bench)
          .select(col("doc_id"), col("contamination"))
        val joined = kept1g.join(screened, Seq("doc_id"), "left")
          .withColumn("contamination", coalesce(col("contamination"), lit(0.0)))
          .localCheckpoint()
        (joined.filter(col("contamination") < opts.contaminationMax)
          .select("doc_id", "text", "tokens"),
          joined.filter(col("contamination") >= opts.contaminationMax)
            .select(col("doc_id"), lit("contaminated").as("stage"),
              concat(lit("contamination="), round(col("contamination"), 6)).as("detail")))
    }

    // 1.6 (optional) corpus-global boilerplate drop: flag docs dominated by
    //     windows that repeat ANYWHERE in the gated corpus (the
    //     q_boilerplate_windows shape — window-hash groupBy + join back)
    val (kept1b, dropBoiler) =
      if (opts.boilerplateMax < 0) (kept1, kept1.limit(0)
        .select(col("doc_id"), lit("").as("stage"), lit("").as("detail")))
      else {
        val ratio = CuratePipeline.windowHashFreq(kept1)
          .groupBy("doc_id")
          .agg((sum(when(col("wf") > 1, 1.0).otherwise(0.0)) / count(lit(1)))
            .as("boiler_ratio"))
        val joined = kept1.join(ratio, Seq("doc_id"), "left")
          .withColumn("boiler_ratio", coalesce(col("boiler_ratio"), lit(0.0)))
          .localCheckpoint()
        (joined.filter(col("boiler_ratio") < opts.boilerplateMax)
          .select("doc_id", "text", "tokens"),
          joined.filter(col("boiler_ratio") >= opts.boilerplateMax)
            .select(col("doc_id"), lit("boilerplate").as("stage"),
              concat(lit("boiler_ratio="), round(col("boiler_ratio"), 6)).as("detail")))
      }

    // 2. exact dedup: min doc_id per content hash survives (one 32-byte
    //    keyed shuffle; texts stay in place)
    val withH = kept1b.withColumn("_h", md5(col("text")))
    val keepExact = withH.groupBy("_h").agg(min(col("doc_id")).as("_keep_id"))
    val kept2 = withH.join(keepExact, Seq("_h")).localCheckpoint()
    val dropExact = kept2.filter(col("doc_id") =!= col("_keep_id"))
      .select(col("doc_id"), lit("exact_dup").as("stage"),
        concat(lit("dup_of="), col("_keep_id")).as("detail"))
    val kept2d = kept2.filter(col("doc_id") === col("_keep_id"))
      .select("doc_id", "text", "tokens")

    // 3. near-dup clustering: LSH candidate pairs → Jaccard ≥ threshold
    //    edges → connected components → component min survives. The pair
    //    machinery is the SAME implementation the oracle-checked queries
    //    run (PipelineQueries.minhashVerifiedPairsOf) — one definition, no
    //    drift between the CLI tool and the gated surface — but with the
    //    PRODUCTION hash (portable = false): the oracle-parity tokHash
    //    saturates on large corpora (measured: candidate pairs grew 178×
    //    per 10× docs at the 500k-doc decade purely from hash-space
    //    crowding — Dedup.tokHash scaladoc), while xxhash64 keeps buckets
    //    = true near-dup families and pair growth linear. Exact-jaccard
    //    verification is hash-independent, so the kept/dropped decision
    //    semantics are unchanged — only the candidate recall/cost curve
    //    improves.
    val edges = graft.queries.PipelineQueries
      .minhashVerifiedPairsOf(kept2d, opts.bucketPolicy, portable = false)
      .filter(col("jaccard") >= opts.jaccardThreshold)
      .select("doc_a", "doc_b")
    val comps = Components.connectedComponents(
      kept2d.select("doc_id"), "doc_id", edges, "doc_a", "doc_b")
    val kept3 = kept2d.join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"))
      .localCheckpoint()
    // survivor per component by the configured policy — one row_number
    // window PARTITIONED by component (never wider than the largest
    // cluster). `minid` ranks by doc_id alone, so the keeper IS the
    // component root — byte-identical to the historical behavior.
    val keepOrder = opts.keepPolicy match {
      case "minid" => Seq(col("doc_id").asc)
      case "longest" => Seq(length(col("text")).desc, col("doc_id").asc)
      case other => sys.error(
        s"unknown keep policy '$other' (expected minid or longest)")
    }
    val wKeep = Window.partitionBy(col("comp")).orderBy(keepOrder: _*)
    val ranked = kept3
      .withColumn("_rn", row_number().over(wKeep))
      .withColumn("_keep_id", first(col("doc_id")).over(
        wKeep.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val dropNear = ranked.filter(col("_rn") =!= 1)
      .select(col("doc_id"), lit("near_dup").as("stage"),
        concat(lit("cluster_of="), col("_keep_id")).as("detail"))
    val kept3d = ranked.filter(col("_rn") === 1)
      .select("doc_id", "text", "tokens")

    // 3.4 (optional) quality-weighted sampling (deterministic md5 draw).
    //     Runs BEFORE containment. The per-doc DRAW is position-independent
    //     (quality score and unit hash depend only on the doc's own row),
    //     but the reorder DOES change the final kept set — deliberately: a
    //     doc whose only would-be container is sampled out now SURVIVES
    //     containment (its content is no longer redundant once the
    //     superset doc is gone), where the old order dropped it and then
    //     named a removed doc in its `contained_in=<id>` report line
    //     (round-11 ADVICE). Both the referential integrity and the
    //     survive-when-container-sampled-out semantics are pinned in
    //     CuratePipelineSpec.
    val (kept3s, dropSample) =
      if (!opts.sample) (kept3d, kept3d.limit(0)
        .select(col("doc_id"), lit("").as("stage"), lit("").as("detail")))
      else {
        val sampled = graft.queries.CurationQueries.weightedSample(kept3d)
          .select(col("doc_id"), lit(true).as("_sampled"))
        val joined = kept3d.join(sampled, Seq("doc_id"), "left")
        (joined.filter(col("_sampled").isNotNull).select("doc_id", "text", "tokens"),
          joined.filter(col("_sampled").isNull)
            .select(col("doc_id"), lit("sampled_out").as("stage"), lit("").as("detail")))
      }

    // 3.5 (optional) containment dedup: drop docs ≥ T contained in a
    //     larger kept doc. Candidates via the containment-calibrated
    //     (b=8, r=1) bands (LSH Ensemble) under the production hash —
    //     jaccard clustering upstream cannot catch these pairs by
    //     construction (see Opts.containmentMin). In-bucket-only pairs,
    //     exact-containment verify on the spread kernel — the same cost
    //     discipline as the jaccard verify stage.
    val (keptFinal, dropContained) =
      if (opts.containmentMin < 0) (kept3s, kept3s.limit(0)
        .select(col("doc_id"), lit("").as("stage"), lit("").as("detail")))
      else {
        val sh = kept3s.filter(size(col("tokens")) >= 3)
          .select(col("doc_id"), Dedup.distinctShingles(col("tokens")).as("ds"))
        val pairs = graft.queries.PipelineQueries
          .containmentBandPairsOf(kept3s, portable = false)
        // |A∩B| computed ONCE for both directions (|A∩B| = |B∩A| on
        // distinct arrays), skinny pairs spread BEFORE the array attach —
        // the round-21 verify-kernel shape (see q_dedup_containment)
        val verdicts = Dedup.spreadForKernel(pairs)
          .join(sh.select(col("doc_id").as("doc_a"), col("ds").as("dsa")), Seq("doc_a"))
          .join(sh.select(col("doc_id").as("doc_b"), col("ds").as("dsb")), Seq("doc_b"))
          .withColumn("_i", Dedup.intersectSizeOnce(col("dsa"), col("dsb")).cast("double"))
          .select(col("doc_a"), col("doc_b"),
            (col("_i") / size(col("dsa")).cast("double")).as("cab"),
            (col("_i") / size(col("dsb")).cast("double")).as("cba"),
            size(col("dsa")).as("na"), size(col("dsb")).as("nb"))
          .localCheckpoint()
        // a drops into b iff contained AND b is strictly bigger (ties by
        // smaller id) — the orientation makes the candidate relation a DAG
        // by (size, id)
        val aDrops = verdicts.filter(col("cab") >= opts.containmentMin &&
            (col("nb") > col("na") ||
             (col("nb") === col("na") && col("doc_b") < col("doc_a"))))
          .select(col("doc_a").as("doc_id"), col("doc_b").as("into"))
        val bDrops = verdicts.filter(col("cba") >= opts.containmentMin &&
            (col("na") > col("nb") ||
             (col("na") === col("nb") && col("doc_a") < col("doc_b"))))
          .select(col("doc_b").as("doc_id"), col("doc_a").as("into"))
        val cand = aDrops.unionAll(bDrops).localCheckpoint()
        // Resolve to "contained in a doc that SURVIVES": below containment
        // 1.0 the relation is not transitive (A 0.9-in-B, B 0.85-in-C does
        // NOT bound A's overlap with C), so a one-pass drop could remove A
        // whose only container B is itself removed — A's content then has
        // no kept representative. Fixpoint over the candidate DAG: start
        // from the over-approximation (all candidates dropped), keep a drop
        // only while SOME container of the doc survives, iterate until
        // stable. Converges in ≤ chain-depth rounds (each round one
        // anti-join + distinct over the CANDIDATE frame, corpus never
        // touched — the Components discipline); capped with a loud escape.
        var dropped = cand.select("doc_id").distinct().localCheckpoint()
        var stable = false
        var rounds = 0
        while (!stable && rounds < 25) {
          val next = cand
            .join(dropped.withColumnRenamed("doc_id", "into"), Seq("into"), "left_anti")
            .select("doc_id").distinct().localCheckpoint()
          // exact set equality (both anti-join directions), not a count
          // compare — equal cardinality of different sets must not stop
          // the iteration early
          stable = next.join(dropped, Seq("doc_id"), "left_anti").isEmpty &&
            dropped.join(next, Seq("doc_id"), "left_anti").isEmpty
          dropped = next
          rounds += 1
        }
        if (!stable) {
          // Escape path must preserve the safety property WITHOUT relying
          // on the cap's parity (odd iterates of the antitone map are
          // under-approximations, even iterates over-approximations — a
          // future cap edit must not silently reintroduce orphaned drops).
          // For ANY set D, the restriction D ∩ {d : ∃ d→c, c ∉ D} is safe:
          // each retained drop names a container outside D, and D only
          // shrinks, so that container survives. One extra anti-join.
          val valid = cand
            .join(dropped.withColumnRenamed("doc_id", "into"), Seq("into"), "left_anti")
            .select("doc_id").distinct()
          dropped = dropped.join(valid, Seq("doc_id"), "left_semi").localCheckpoint()
          System.err.println(
            "[curate] containment fixpoint did not stabilize in 25 rounds; " +
              "dropping the safety-restricted (conservative) set")
        }
        // report each dropped doc with its smallest SURVIVING container
        val dropIds = cand
          .join(dropped.withColumnRenamed("doc_id", "into"), Seq("into"), "left_anti")
          .join(dropped, Seq("doc_id"), "left_semi")
          .groupBy("doc_id").agg(min(col("into")).as("into"))
        val kept = kept3s.join(dropped, Seq("doc_id"), "left_anti")
        (kept, dropIds.select(col("doc_id"), lit("contained").as("stage"),
          concat(lit("contained_in="), col("into")).as("detail")))
      }

    (keptFinal.select("doc_id", "text"),
      dropQuality.union(dropContam).union(dropBoiler).union(dropExact)
        .union(dropNear).union(dropContained).union(dropSample))
  }
}
