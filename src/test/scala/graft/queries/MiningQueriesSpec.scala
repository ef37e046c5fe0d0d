package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Semantic assertions for the round-5 mining queries — each is recomputed
  * (or bounded) independently of the query plan, so these fail on logic
  * drift even when both engines agree. */
class MiningQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  private lazy val docTokens: Map[Long, Seq[String]] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap

  test("pq adc: approximate ranking has real recall against exact knn") {
    val adc = q("q_sim_pq_adc").collect()
    assert(adc.length == 15) // 3 queries × 5
    // per query: ranks are 1..5, distances non-decreasing, no self-match
    adc.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
      assert(sorted.forall(_.getAs[Long]("vec_id") != qid))
      val ds = sorted.map(_.getAs[Double]("adist"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b + 1e-9 })
    }
    // recall@5 vs exact L2 brute force over the same corpus (computed here
    // from raw embeddings): ADC with an untrained 16-entry codebook is
    // crude, but must still overlap the true top-5 far above chance
    // (chance is 5/N ≈ 1%; observed ≈ 33%)
    import spark.implicits._
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().toMap.view.mapValues(_.map(_.toDouble)).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val recall = (0L to 2L).map { qid =>
      val truth = vecs.filter(_._1 != qid)
        .map { case (id, v) => id -> l2(v, vecs(qid)) }
        .toSeq.sortBy { case (id, d) => (math.round(d * 1e6), id) }
        .take(5).map(_._1).toSet
      val got = adc.filter(_.getAs[Long]("qid") == qid).map(_.getAs[Long]("vec_id")).toSet
      truth.intersect(got).size.toDouble / 5.0
    }.sum / 3.0
    assert(recall >= 0.2, s"ADC recall@5 too low: $recall")
  }

  test("pq rerank: top-5 equals the exact-cosine best of the ADC-20 shortlist") {
    import spark.implicits._
    val rerank = q("q_sim_pq_rerank").collect()
    assert(rerank.length == 15)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().toMap.view.mapValues(_.map(_.toDouble)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // replay stage 2 locally: exact cosine over the stage-1 shortlist
    rerank.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rows) =>
      val got = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("vec_id")).toSeq
      // the reported exact distances must be the true cosine distances
      rows.foreach { r =>
        val d = cos(vecs(r.getAs[Long]("vec_id")), vecs(qid))
        assert(math.abs(r.getAs[Double]("dist") - math.round(d * 1e6) / 1e6) < 1e-9)
      }
      // and ordered ascending
      val ds = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("dist"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b + 1e-9 })
      assert(got.distinct.length == 5 && !got.contains(qid))
    }
  }

  test("ltr features: overlap/doc_len recomputed, ranks dense per query") {
    val rows = q("q_ltr_features").collect()
    val qsets = Map(0L -> Set("spark", "join", "merge"),
      1L -> Set("window", "batch", "stream"),
      2L -> Set("customer", "order", "value"))
    // all three queries present with full shortlists — guards against a
    // vacuous pass if a join regression empties the candidate set
    assert(rows.length == 30)
    assert(rows.map(_.getAs[Long]("qid")).toSet == qsets.keySet)
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 10L))
      rs.foreach { r =>
        val toks = docTokens(r.getAs[Long]("doc_id"))
        assert(r.getAs[Long]("doc_len") == toks.length)
        assert(r.getAs[Long]("overlap") == toks.toSet.intersect(qsets(qid)).size)
        assert(r.getAs[Long]("overlap") >= 1) // candidates matched >= 1 term
        assert(r.getAs[Double]("fts_score") > 0.0)
        assert(r.getAs[Double]("cos_dist") >= 0.0 && r.getAs[Double]("cos_dist") <= 2.0)
      }
      // the rank label follows the BM25 feature it was derived from
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      val fs = sorted.map(_.getAs[Double]("fts_score"))
      assert(fs.zip(fs.tail).forall { case (a, b) => a >= b - 1e-9 })
    }
  }

  test("retention cohorts: offset-0 row is each cohort's maximum") {
    val rows = q("q_retention_cohorts").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("day_offset") >= 0 && r.getAs[Long]("day_offset") <= 7)
      assert(r.getAs[Long]("n_users") > 0)
    }
    rows.groupBy(_.getAs[Long]("cohort_day")).foreach { case (cd, rs) =>
      val d0 = rs.find(_.getAs[Long]("day_offset") == 0L)
      assert(d0.isDefined, s"cohort $cd missing day-0 row")
      val max = rs.map(_.getAs[Long]("n_users")).max
      assert(d0.get.getAs[Long]("n_users") == max,
        s"cohort $cd day-0 not the max: ${rs.mkString(",")}")
    }
  }

  test("kmeans step: every cluster populated, shift bounded by norms") {
    val rows = q("q_kmeans_step").collect()
    assert(rows.map(_.getAs[Long]("cid")).toSeq.sorted == Seq(0L, 1L, 2L, 3L))
    val total = rows.map(_.getAs[Long]("n_members")).sum
    assert(total == spark.read.parquet(s"$dir/embeddings.parquet").count())
    rows.foreach { r =>
      val shift = r.getAs[Double]("shift")
      val norm = r.getAs[Double]("new_norm")
      assert(norm > 0.0 && shift >= 0.0)
      // vectors are unit-ish: a mean of unit vectors has norm <= 1, and the
      // shift from another point in the unit ball is < 2 + slack
      assert(norm <= 1.0 + 1e-6, s"cid ${r.get(0)}: norm=$norm")
      assert(shift <= 2.0 + 1e-6, s"cid ${r.get(0)}: shift=$shift")
    }
  }

  test("tfidf keywords: terms really occur in the doc, scores recomputed") {
    val rows = q("q_tfidf_keywords").collect()
    val nDocs = docTokens.size
    val dfMap = docTokens.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size).toMap
    assert(rows.groupBy(_.getAs[Long]("doc_id")).forall(_._2.length == 3))
    rows.foreach { r =>
      val (id, term) = (r.getAs[Long]("doc_id"), r.getAs[String]("term"))
      val toks = docTokens(id)
      assert(toks.contains(term), s"doc $id keyword '$term' not in doc")
      val tf = toks.count(_ == term)
      val expected = tf * math.log((nDocs + 1.0) / (dfMap(term) + 1.0))
      assert(math.abs(r.getAs[Double]("score") - math.round(expected * 1e6) / 1e6) < 1e-9)
    }
  }

  test("gopher rules: composite verdict equals the conjunction, signals sane") {
    val rows = q("q_text_gopher_rules").collect()
    assert(rows.length == docTokens.size)
    rows.foreach { r =>
      val pass = r.getAs[Boolean]("pass")
      val conj = r.getAs[Boolean]("rule_len") && r.getAs[Boolean]("rule_word_len") &&
        r.getAs[Boolean]("rule_stop") && r.getAs[Boolean]("rule_alpha")
      assert(pass == conj)
      val toks = docTokens(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tok") == toks.length)
      assert(r.getAs[Boolean]("rule_alpha")) // synthetic corpus is all-alpha
      val meanLen = toks.map(_.length).sum.toDouble / toks.length
      assert(math.abs(r.getAs[Double]("mean_len") - math.round(meanLen * 1e6) / 1e6) < 1e-9)
    }
    assert(rows.exists(_.getAs[Boolean]("pass")), "fixture should pass some docs")
  }

  test("levenshtein pairs: identical docs score 1, bounds hold") {
    val rows = q("q_dedup_lev_pairs").collect()
    assert(rows.nonEmpty)
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).take(200)).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(a < b)
      val sim = r.getAs[Double]("lev_sim")
      val lev = r.getAs[Long]("lev")
      assert(sim >= 0.0 - 1e-9 && sim <= 1.0 + 1e-9)
      if (texts(a) == texts(b)) assert(lev == 0L && sim == 1.0)
      assert(lev <= math.max(texts(a).length, texts(b).length))
    }
    // the LSH fixture contains true duplicates — some pair must be exact
    assert(rows.exists(_.getAs[Long]("lev") == 0L))
  }

  test("zscore anomalies: counts bounded by Chebyshev, stats recomputed") {
    val rows = q("q_anomaly_zscore").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_events")
      val anom = r.getAs[Long]("n_anomalies")
      // Chebyshev: P(|z| > 3) <= 1/9, generous 2x slack for sampling
      assert(anom <= n / 4, s"${r.get(0)}: $anom anomalies of $n")
      assert(r.getAs[Double]("max_absz") >= 0.0)
      if (anom > 0) assert(r.getAs[Double]("max_absz") > 3.0)
    }
  }

  test("token windows: full coverage at stride 4, windows are real slices") {
    val rows = q("q_token_windows").collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (id, ws) =>
      val n = docTokens(id).length
      assert(n >= 8)
      val expected = (n - 8) / 4 + 1
      assert(ws.length == expected, s"doc $id: ${ws.length} windows, want $expected")
      val sorted = ws.sortBy(_.getAs[Long]("win_id"))
      sorted.zipWithIndex.foreach { case (w, i) =>
        assert(w.getAs[Long]("win_id") == i)
        assert(w.getAs[Long]("start_pos") == i * 4 + 1)
        val slice = docTokens(id).slice(i * 4, i * 4 + 8).mkString(" ")
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(w.getAs[String]("win_md5") == md)
      }
    }
    // docs shorter than one window are excluded, all others present
    assert(byDoc.keySet == docTokens.filter(_._2.length >= 8).keySet)
  }

  test("token psi: contributions recomputed and non-negative by construction") {
    val rows = q("q_token_psi").collect()
    assert(rows.length == 20)
    val counts = docTokens.toSeq.flatMap { case (id, ts) => ts.map(t => (t, id % 2)) }
      .groupBy(_._1).view.mapValues { occ =>
        (occ.count(_._2 == 0L).toLong, occ.count(_._2 == 1L).toLong)
      }.toMap
    val t1 = counts.values.map(_._1).sum.toDouble
    val t2 = counts.values.map(_._2).sum.toDouble
    val v = counts.size.toDouble
    rows.foreach { r =>
      val (c1, c2) = counts(r.getAs[String]("term"))
      assert(r.getAs[Long]("c1") == c1 && r.getAs[Long]("c2") == c2)
      val p1 = (c1 + 1) / (t1 + v); val p2 = (c2 + 1) / (t2 + v)
      val psi = (p1 - p2) * math.log(p1 / p2)
      assert(math.abs(r.getAs[Double]("psi") - math.round(psi * 1e6) / 1e6) < 1e-9)
      // (p1-p2) and ln(p1/p2) always share a sign, so PSI >= 0
      assert(r.getAs[Double]("psi") >= 0.0)
    }
  }

  test("split leakage: reported pairs are real cross-split near-dups") {
    val rows = q("q_split_leakage").collect()
    assert(rows.nonEmpty, "near-dup fixture must leak across a hash split")
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def split(id: Long) = ("0123456789abcdef".indexOf(md5hex(texts(id)).head)) % 2
    def shingleSet(id: Long) =
      texts(id).split(" ").toSeq.sliding(3).map(_.mkString(" ")).toSet
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(split(a) != split(b))
      assert(r.getAs[Int]("split_a") == split(a) && r.getAs[Int]("split_b") == split(b))
      val (sa, sb) = (shingleSet(a), shingleSet(b))
      val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(j >= 0.5 - 1e-9, s"pair ($a,$b) jaccard $j below threshold")
    }
  }

  test("shared spans: every flagged hash is a real cross-doc verbatim 8-gram") {
    val rows = q("q_shared_spans").collect()
    assert(rows.nonEmpty, "near-dup fixture must share verbatim 8-grams")
    // recompute every doc's window hashes locally and check each flagged
    // hash really occurs in >= 2 distinct docs with the reported counts
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val local = docTokens.toSeq.flatMap { case (id, ts) =>
      if (ts.length >= 8) ts.sliding(8).map(w => (md5(w.mkString(" ")), id)).toSeq
      else Seq.empty
    }
    val byHash = local.groupBy(_._1)
    rows.foreach { r =>
      val h = r.getAs[String]("h")
      val occ = byHash.getOrElse(h, Seq.empty)
      assert(occ.map(_._2).distinct.size == r.getAs[Long]("n_docs"), s"hash $h")
      assert(occ.size == r.getAs[Long]("n_occ"), s"hash $h occurrences")
      assert(occ.map(_._2).min == r.getAs[Long]("first_doc"), s"hash $h first_doc")
    }
    // completeness: every locally-found cross-doc hash is reported
    val wantFlagged = byHash.filter(_._2.map(_._2).distinct.size >= 2).keySet
    assert(rows.map(_.getAs[String]("h")).toSet == wantFlagged)
  }

  test("span corruption: mask rule recomputed, md5s match a local replay") {
    val rows = q("q_span_corruption").collect()
    assert(rows.length == docTokens.size)
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val toks = docTokens(id)
      def isMasked(pos: Int) = (id * 31 + pos) % 5 == 0
      val input = toks.zipWithIndex
        .map { case (t, i) => if (isMasked(i + 1)) "<M>" else t }.mkString(" ")
      val target = toks.zipWithIndex.collect { case (t, i) if isMasked(i + 1) => t }
        .mkString(" ")
      assert(r.getAs[Long]("n_tokens") == toks.length)
      assert(r.getAs[Long]("n_masked") == toks.indices.count(i => isMasked(i + 1)))
      assert(r.getAs[String]("input_md5") == md5(input), s"doc $id input mismatch")
      assert(r.getAs[String]("target_md5") == md5(target), s"doc $id target mismatch")
    }
    // ~20% of positions masked corpus-wide
    val frac = rows.map(_.getAs[Long]("n_masked")).sum.toDouble /
      rows.map(_.getAs[Long]("n_tokens")).sum
    assert(frac > 0.15 && frac < 0.25, s"mask fraction $frac")
  }
}
