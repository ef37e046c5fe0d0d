package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CuratePipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("every doc lands in exactly one of kept/report; stages are coherent") {
    val (kept, report) = CuratePipeline.run(docs)
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val repRows = report.collect()
    val repIds = repRows.map(_.getLong(0)).toSet
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.intersect(repIds).isEmpty)
    assert(keptIds.union(repIds) == allIds)
    assert(keptIds.nonEmpty && repIds.nonEmpty)
    val stages = repRows.map(_.getString(1)).toSet
    assert(stages.subsetOf(Set("quality", "exact_dup", "near_dup")))
    // exact-dup and near-dup drops name a surviving representative
    repRows.filter(r => r.getString(1) != "quality").foreach { r =>
      val target = r.getString(2).split("=")(1).toLong
      assert(keptIds.contains(target) || repIds.contains(target))
      assert(target < r.getLong(0), s"representative must be the cluster min: $r")
    }
  }

  test("dedup prefix is materialized once: kept and report read checkpoints, " +
      "never recompute the LSH pair machinery") {
    // the expensive shared prefix (shingles → minhash → banded pairs →
    // Jaccard verify → connected components) sits BEHIND localCheckpoint
    // barriers, so every downstream consumer — survivor selection, the drop
    // report, a later --keep/--split style stage — reads the materialized
    // frame instead of re-deriving components per consumer. Pin that: the
    // returned plans must contain checkpointed RDD scans and must NOT
    // contain any Generate (the explode at the root of the shingle/minhash
    // subtree) or parquet re-scan of the corpus.
    val (kept, report) = CuratePipeline.run(docs)
    Seq("kept" -> kept, "report" -> report).foreach { case (label, df) =>
      val plan = df.queryExecution.optimizedPlan
      val rdds = plan.collect {
        case r: org.apache.spark.sql.execution.LogicalRDD => r }
      val gens = plan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }
      val scans = plan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l }
      assert(rdds.nonEmpty, s"$label: no checkpoint barrier in plan")
      assert(gens.isEmpty, s"$label: pair machinery recomputed downstream of the barrier")
      assert(scans.isEmpty, s"$label: corpus re-scanned downstream of the barrier")
    }
  }

  test("kept corpus has no exact duplicates and survives re-curation intact") {
    val (kept, _) = CuratePipeline.run(docs)
    val texts = kept.select("text").collect().map(_.getString(0))
    assert(texts.distinct.length == texts.length, "exact dups survived")
    // idempotence: curating the curated corpus drops nothing further
    val (kept2, report2) = CuratePipeline.run(kept)
    assert(kept2.count() == kept.count())
    assert(report2.count() == 0, report2.collect().mkString("\n"))
  }

  test("near-dup drops really are near-dups of their representative") {
    val (_, report) = CuratePipeline.run(docs)
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(s: String) = s.split(" ").toSeq.sliding(3).map(_.mkString(" ")).toSet
    val nearDrops = report.filter(col("stage") === "near_dup").collect()
    assert(nearDrops.nonEmpty, "fixture contains near-dup clusters")
    nearDrops.foreach { r =>
      val id = r.getLong(0)
      val rep = r.getString(2).split("=")(1).toLong
      // connected through the cluster: the dropped doc must share ≥ 0.5
      // Jaccard with SOME doc of its component — check directly against the
      // representative OR any other member reporting the same cluster
      val members = nearDrops.filter(_.getString(2) == r.getString(2))
        .map(_.getLong(0)).toSet + rep
      val ok = (members - id).exists { other =>
        val (a, b) = (shingles(texts(id)), shingles(texts(other)))
        val inter = a.intersect(b).size.toDouble
        inter / (a.size + b.size - inter) >= 0.5 - 1e-9
      }
      assert(ok, s"doc $id not near any member of its cluster $members")
    }
  }

  test("subsplit bucket policy curates identically when no bucket is oversized") {
    // fixture buckets are far below MaxPerBucket, so cap and subsplit see
    // the same candidate pairs — the chain must be policy-invariant there
    val (keptCap, _) = CuratePipeline.run(docs)
    val (keptSub, reportSub) = CuratePipeline.run(docs,
      CuratePipeline.Opts(bucketPolicy = "subsplit"))
    val a = keptCap.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = keptSub.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(reportSub.count() > 0)
    val err = intercept[RuntimeException] {
      CuratePipeline.run(docs, CuratePipeline.Opts(bucketPolicy = "nope"))._1.count()
    }
    assert(err.getMessage.contains("bucket policy"))
  }

  test("keep=longest survives the longest cluster member; counts match minid") {
    val (keptMin, _) = CuratePipeline.run(docs)
    val (keptLong, reportLong) = CuratePipeline.run(docs,
      CuratePipeline.Opts(keepPolicy = "longest"))
    // same clusters either way — one survivor each, so counts agree
    assert(keptLong.count() == keptMin.count())
    val lenOf = docs.select(col("doc_id"), length(col("text")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nearDrops = reportLong.filter(col("stage") === "near_dup").collect()
    assert(nearDrops.nonEmpty)
    nearDrops.foreach { r =>
      val dropped = r.getLong(0)
      val keeper = r.getString(2).split("=")(1).toLong
      assert(lenOf(keeper) > lenOf(dropped) ||
        (lenOf(keeper) == lenOf(dropped) && keeper < dropped),
        s"keeper $keeper (len ${lenOf(keeper)}) vs dropped $dropped (len ${lenOf(dropped)})")
    }
    val err = intercept[RuntimeException] {
      CuratePipeline.run(docs, CuratePipeline.Opts(keepPolicy = "nope"))._1.count()
    }
    assert(err.getMessage.contains("keep policy"))
  }

  test("decontamination stage drops exactly the docs contaminated by the benchmark") {
    // benchmark = the corpus' own docs 0-9: those docs screen as 100%
    // contaminated against themselves (plus any true shingle overlaps)
    val bench = docs.filter(col("doc_id") < 10)
    val (kept, report) = CuratePipeline.run(docs,
      CuratePipeline.Opts(decontaminate = Some(bench), contaminationMax = 0.5))
    val (keptPlain, _) = CuratePipeline.run(docs)
    val contamRows = report.filter(col("stage") === "contaminated").collect()
    assert(contamRows.nonEmpty)
    val contamIds = contamRows.map(_.getLong(0)).toSet
    // every benchmark doc that survived the quality gate must be dropped
    // as contaminated (self-overlap = 1.0), and detail carries the fraction
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val benchSurvivors = keptPlain.select("doc_id").collect().map(_.getLong(0))
      .toSet.intersect((0L until 10L).toSet)
    assert(benchSurvivors.nonEmpty && benchSurvivors.subsetOf(contamIds))
    assert(keptIds.intersect(contamIds).isEmpty)
    assert(contamRows.forall(_.getString(2).startsWith("contamination=")))
    // screening is a pre-dedup stage: nothing else about the chain changes
    // for uncontaminated docs
    assert(kept.count() <= keptPlain.count())
  }

  test("boilerplate stage drops docs dominated by corpus-repeated windows") {
    // plant a boilerplate family: three gate-passing docs (33 distinct
    // tokens — length/quality/repetition all clear) whose windows past the
    // first are identical across the family, so 4 of each doc's 5
    // non-overlapping 8-token windows repeat corpus-globally (ratio 0.8)
    val boiler = (9001L to 9003L).map(i =>
      (i, s"unique$i " + (1 to 32).map(j => s"shared$j").mkString(" ")))
    val spark2 = spark
    import spark2.implicits._
    val augmented = docs.unionByName(boiler.toDF("doc_id", "text"))
    val (kept, report) = CuratePipeline.run(augmented,
      CuratePipeline.Opts(boilerplateMax = 0.5))
    val drops = report.filter(col("stage") === "boilerplate").collect()
    assert(drops.nonEmpty)
    val dropIds = drops.map(_.getLong(0)).toSet
    // the planted family windows repeat 3x corpus-wide: all three drop
    assert(Set(9001L, 9002L, 9003L).subsetOf(dropIds), dropIds.toString)
    assert(drops.forall(_.getString(2).startsWith("boiler_ratio=")))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet
      .intersect(dropIds).isEmpty)
  }

  test("containment stage drops sub-document dups the jaccard clustering misses") {
    // plant a super-document: three KEPT real docs concatenated. Each
    // component is ~fully contained in it (containment ≈ 1.0) at jaccard
    // ≈ 1/3 — below the 0.5 near-dup threshold, so only the containment
    // stage can catch the relationship. All three components must drop as
    // contained_in=9100 and the super-doc survives.
    val (keptPlain, _) = CuratePipeline.run(docs)
    val parts = keptPlain.orderBy("doc_id").limit(3).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val superDoc = (9100L, parts.map(_._2).mkString(" "))
    val spark2 = spark
    import spark2.implicits._
    val augmented = docs.unionByName(Seq(superDoc).toDF("doc_id", "text"))
    val (kept, report) = CuratePipeline.run(augmented,
      CuratePipeline.Opts(containmentMin = 0.85))
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.contains(9100L), "the super-document must survive")
    val drops = report.filter(col("stage") === "contained").collect()
    val dropIds = drops.map(_.getLong(0)).toSet
    assert(parts.map(_._1).toSet.subsetOf(dropIds),
      s"expected ${parts.map(_._1).toSet} contained-dropped, got $dropIds")
    assert(drops.forall(_.getString(2).startsWith("contained_in=")))
    assert(keptIds.intersect(dropIds).isEmpty)
    // and WITHOUT the flag the components are kept (the near-dup stage
    // does not see jaccard-1/3 pairs) — the stage is genuinely additive
    val (keptOff, _) = CuratePipeline.run(augmented)
    val offIds = keptOff.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(parts.map(_._1).toSet.subsetOf(offIds))
  }

  test("containment fixpoint: a doc is dropped only into a SURVIVING container") {
    // chain A ⊂ B, B 0.87-contained-in C, A ∩ C = ∅, jaccard(B,C) ≈ 0.4
    // (below the near-dup threshold, so the jaccard stage can't touch it):
    // the naive one-pass rule drops BOTH A (into B) and B (into C), losing
    // A's content entirely since A is NOT in C. The fixpoint must keep A
    // (its only container B does not survive) and drop exactly B.
    val aToks = (1 to 22).map(i => f"aw$i%02d")
    val shared = (1 to 150).map(i => f"sw$i%03d")
    val extra = (1 to 200).map(i => f"ew$i%03d")
    val fixture = Seq(
      (9201L, aToks.mkString(" ")),
      (9202L, (aToks ++ shared).mkString(" ")),
      (9203L, (shared ++ extra).mkString(" ")))
    val spark2 = spark
    import spark2.implicits._
    val augmented = docs.unionByName(fixture.toDF("doc_id", "text"))
    val (kept, report) = CuratePipeline.run(augmented,
      CuratePipeline.Opts(containmentMin = 0.85))
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val drops = report.filter(col("stage") === "contained").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(keptIds.contains(9203L), "the top container C must survive")
    assert(drops.contains(9202L) && drops(9202L) == "contained_in=9203",
      drops.toString)
    assert(keptIds.contains(9201L),
      s"A's only container B was dropped — A must survive (fixpoint), drops=$drops")
    assert(!drops.contains(9201L))
  }

  test("sample + containment: every contained_in names a doc in the FINAL kept " +
      "output (sampling runs first — round-11 ADVICE referential integrity)") {
    // with the old stage order (containment, then sampling) the report's
    // contained_in=<id> could name a container the sampling stage later
    // removed; sampling-first makes the container choice final by
    // construction. Reuse the super-document fixture so containment drops
    // actually occur.
    val (keptPlain, _) = CuratePipeline.run(docs)
    val parts = keptPlain.orderBy("doc_id").limit(3).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val superDoc = (9100L, parts.map(_._2).mkString(" "))
    val spark2 = spark
    import spark2.implicits._
    val augmented = docs.unionByName(Seq(superDoc).toDF("doc_id", "text"))
    val (kept, report) = CuratePipeline.run(augmented,
      CuratePipeline.Opts(containmentMin = 0.85, sample = true))
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val repRows = report.collect()
    val containers = repRows.filter(_.getString(1) == "contained")
      .map(_.getString(2).split("=")(1).toLong)
    assert(containers.forall(keptIds.contains),
      s"containment report names non-surviving containers: " +
        s"${containers.filterNot(keptIds.contains).toSeq} not in kept")
    // partition invariant still holds under the reordered stages
    val repIds = repRows.map(_.getLong(0)).toSet
    val allIds = augmented.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.intersect(repIds).isEmpty)
    assert(keptIds.union(repIds) == allIds)
  }

  test("a doc whose ONLY container is sampled out survives containment " +
      "(sampling-first changes the kept set by design — round-12 ADVICE)") {
    // 16 disjoint (A_i ⊂ B_i) pairs with pair-unique tokens: without
    // sampling every A_i drops as contained_in=B_i; with sampling, any B_i
    // the deterministic draw removes is GONE before containment candidates
    // form, so its A_i — whose content is no longer redundant — must
    // survive. The draw is row-local (quality + unit hash of the doc's own
    // row), so the outcome is deterministic for this fixture; the spec
    // selects the pairs where B_i sampled out and A_i did not.
    //
    // The container must be BUILT to sample out sometimes: quality feeds
    // keep_p, so B is stopword-heavy — A's 22 unique tokens plus 7 filler
    // groups (uniq, the, a, of) land quality ≈ 0.54 (keep_p 0.54, ~46%
    // draw-out, yet above the stage-1 gate's 0.5) while holding shingle
    // jaccard(A,B) = 20/44 ≈ 0.45 under the 0.5 near-dup threshold (A must
    // reach containment, not drop as near_dup), containment(A⊂B) = 1.0
    // (A is a verbatim prefix), and rep_ratio ≈ 0.08 under the 0.2 gate.
    val pairs = (0 until 16).map { i =>
      val aToks = (1 to 22).map(j => f"ca$i%02dw$j%02d")
      val bToks = aToks ++ (1 to 7).flatMap(j => Seq(f"cb$i%02dw$j%02d", "the", "a", "of"))
      ((9300L + 2 * i, aToks.mkString(" ")), (9301L + 2 * i, bToks.mkString(" ")))
    }
    val spark2 = spark
    import spark2.implicits._
    val augmented = docs.unionByName(
      pairs.flatMap(p => Seq(p._1, p._2)).toDF("doc_id", "text"))
    val (_, repPlain) = CuratePipeline.run(augmented,
      CuratePipeline.Opts(containmentMin = 0.85))
    val droppedPlain = repPlain.filter(col("stage") === "contained").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // the containment CANDIDATE machinery is banded LSH (not all-pairs), so
    // an individual A_i⊂B_i pair can legitimately miss its band — the
    // property is asserted over the pairs the bands did catch (typically
    // ~2/3 of 16; require enough to make the with-sampling half meaningful)
    val caught = pairs.filter { case ((aId, _), (bId, _)) =>
      droppedPlain.get(aId).contains(s"contained_in=$bId") }
    assert(caught.size >= 6,
      s"fixture needs banded containment drops; got ${caught.map(_._1._1)}")
    val (kept, report) = CuratePipeline.run(augmented,
      CuratePipeline.Opts(containmentMin = 0.85, sample = true))
    val sampledOut = report.filter(col("stage") === "sampled_out")
      .collect().map(_.getLong(0)).toSet
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val qualifying = caught.filter { case ((aId, _), (bId, _)) =>
      sampledOut.contains(bId) && !sampledOut.contains(aId) }
    assert(qualifying.nonEmpty,
      s"fixture produced no sampled-out container with a surviving A; sampledOut=$sampledOut")
    qualifying.foreach { case ((aId, _), (bId, _)) =>
      assert(keptIds.contains(aId),
        s"$aId's only container $bId was sampled out — $aId must survive containment")
    }
  }

  test("sampling stage drops only sampled_out rows and stays deterministic") {
    val (kept, report) = CuratePipeline.run(docs, CuratePipeline.Opts(sample = true))
    val (kept2, _) = CuratePipeline.run(docs, CuratePipeline.Opts(sample = true))
    assert(kept.collect().map(_.getLong(0)).toSeq.sorted ==
      kept2.collect().map(_.getLong(0)).toSeq.sorted)
    assert(report.filter(col("stage") === "sampled_out").count() > 0)
    val (keptNoSample, _) = CuratePipeline.run(docs)
    assert(kept.count() < keptNoSample.count())
  }

  test("--normalize NFKC: byte-distinct encodings of the same text merge " +
      "into one exact-dup cluster; kept text is normalized") {
    import spark.implicits._
    // the same 24-token document in three encodings (gate needs >= 20
    // tokens; indexed words keep every shingle distinct so rep_ratio = 0):
    // composed e-acute, decomposed e + U+0301, and a ligature variant.
    // Without normalization the variants share no shingles (every 3-gram
    // contains at least one byte-distinct token) — no exact OR near dedup
    // is possible; under NFKC all three become byte-identical.
    def doc(cafe: String, eclair: String, fin: String): String =
      (0 until 8).flatMap(i => Seq(s"$cafe$i", s"$eclair$i", s"$fin$i"))
        .mkString(" ")
    val composed = doc("caf\u00e9", "\u00e9clair", "fin")
    val decomposed = doc("cafe\u0301", "e\u0301clair", "fin")
    val compat = doc("caf\u00e9", "\u00e9clair", "\ufb01n")
    val fixture = Seq(
      (1L, composed), (2L, decomposed), (3L, compat),
      (4L, (0 until 24).map(i => s"unrelated$i").mkString(" "))
    ).toDF("doc_id", "text")

    // without normalization: three distinct texts, nothing exact-dups
    val (keptRaw, _) = CuratePipeline.run(fixture)
    assert(keptRaw.count() == 4)

    // with NFKC: 2 and 3 fold into 1 (exact dup drops name the min id)
    val (kept, report) = CuratePipeline.run(fixture,
      CuratePipeline.Opts(normalize = Some("NFKC")))
    val keptRows = kept.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keptRows.keySet == Set(1L, 4L), keptRows.keySet)
    // kept text is the NORMALIZED form
    assert(keptRows(1L) == java.text.Normalizer.normalize(
      composed, java.text.Normalizer.Form.NFKC))
    val drops = report.collect().filter(_.getString(1) == "exact_dup")
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(drops.keySet == Set(2L, 3L), drops)
    drops.values.foreach(d => assert(d.endsWith("=1"), d))
  }

  test("--normalize also folds the --decontaminate benchmark: " +
      "encoding-variant contamination is caught with the flag and " +
      "(structurally) missed without it") {
    import spark.implicits._
    def doc(cafe: String, eclair: String, fin: String): String =
      (0 until 8).flatMap(i => Seq(s"$cafe$i", s"$eclair$i", s"$fin$i"))
        .mkString(" ")
    val corpus = Seq(
      (1L, doc("cafe\u0301", "e\u0301clair", "fin")), // decomposed
      (2L, (0 until 24).map(i => s"unrelated$i").mkString(" "))
    ).toDF("doc_id", "text")
    val bench = Seq( // the SAME doc, composed — byte-distinct shingles
      (100L, doc("caf\u00e9", "\u00e9clair", "fin"))
    ).toDF("doc_id", "text")

    // without normalization the screen structurally cannot see it
    val (k0, _) = CuratePipeline.run(corpus,
      CuratePipeline.Opts(decontaminate = Some(bench)))
    assert(k0.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))

    // with NFC on BOTH sides, doc 1 is fully contaminated and drops
    val (k1, r1) = CuratePipeline.run(corpus,
      CuratePipeline.Opts(normalize = Some("NFC"), decontaminate = Some(bench)))
    assert(k1.select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L))
    val drop = r1.collect().filter(_.getLong(0) == 1L)
    assert(drop.length == 1 && drop.head.getString(1) == "contaminated",
      drop.mkString(";"))
  }
}
