package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CurationQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("shard assignment covers every doc exactly once and is balanced-ish") {
    val rows = q("q_shard_assign").collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(total == nDocs)
    assert(rows.map(_.getAs[Int]("shard_id")).toSet.subsetOf((0 until 16).toSet))
    // content-hash sharding: no shard should hold more than ~4x the mean
    val mean = nDocs.toDouble / rows.length
    assert(rows.forall(_.getAs[Long]("n_docs") <= mean * 4),
      rows.map(r => s"${r.getAs[Int]("shard_id")}:${r.getAs[Long]("n_docs")}").mkString(","))
  }

  test("shard assignment drives a real partitioned write layout") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val df = Q.docsTokens(spark, dir)
      .withColumn("shard_id", org.apache.spark.sql.functions.expr(CurationQueries.nibbleHashSql))
    df.repartition(col("shard_id"))
      .write.partitionBy("shard_id").mode("overwrite").parquet(out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard_id=")).sorted
    assert(dirs.nonEmpty && dirs.forall(_.matches("shard_id=\\d+")))
    // the written layout round-trips: partition column recovered, all rows
    val back = spark.read.parquet(out)
    assert(back.count() == df.count())
    assert(back.select("shard_id").distinct().count() == dirs.length)
  }

  test("int8 quantization reconstructs within the quantization step") {
    val rows = q("q_embed_quantize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val mse = r.getAs[Double]("mse")
      assert(scale > 0.0)
      // worst-case per-element error is half a quantization step (scale/127/2);
      // MSE must sit below that bound squared
      val step = scale / 127.0
      assert(mse <= step * step / 4.0 + 1e-12, s"vec ${r.get(0)}: mse=$mse step=$step")
    }
  }

  test("quantized values round-trip the sign and magnitude ordering") {
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet").limit(5)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    e.foreach { case (_, v) =>
      val scale = v.map(x => math.abs(x.toDouble)).max
      val qv = v.map(x => math.floor(x / scale * 127.0 + 0.5).toLong)
      assert(qv.forall(x => x >= -127 && x <= 128))
      // strictly largest-magnitude element maps to ±127
      assert(qv.map(math.abs).max >= 126)
    }
  }

  test("pq: codebook members reconstruct exactly; codes stay in range") {
    val rows = q("q_embed_pq").collect()
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.length == n)
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val mse = r.getAs[Double]("mse")
      val cs = r.getAs[Long]("code_sum")
      assert(mse >= 0.0)
      // vecs 0..15 ARE the codebook: every subvector matches itself at d=0
      if (id < 16) assert(mse == 0.0, s"vec $id mse=$mse")
      // code_sum = Σ_j cid_j·(j+1), cid ≤ 15, Σ(j+1) = 36
      assert(cs >= 0 && cs <= 15L * 36, s"vec $id code_sum=$cs")
    }
    // PQ is lossy but must beat the trivial all-zeros reconstruction
    val meanMse = rows.map(_.getAs[Double]("mse")).sum / rows.length
    assert(meanMse > 0.0 && meanMse < 1.0, s"meanMse=$meanMse")
  }

  test("bpe pair counts: every counted pair is adjacent somewhere") {
    val pairs = q("q_bpe_pairs").collect()
    assert(pairs.length == 50)
    assert(pairs.forall(_.getAs[Long]("n") >= 1))
    // counts are non-increasing in the returned order
    val ns = pairs.map(_.getAs[Long]("n")).toSeq
    assert(ns == ns.sorted(Ordering[Long].reverse))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val top = pairs.head.getAs[String]("pair").split(" ")
    assert(docs.exists { t =>
      val ts = t.split(" ")
      ts.indices.dropRight(1).exists(i => ts(i) == top(0) && ts(i + 1) == top(1))
    })
  }

  test("vocab top-50 matches a direct computation") {
    val vocab = q("q_vocab_top").collect().map(r => (r.getString(0), r.getLong(1)))
    val direct = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").count()
      .orderBy(col("count").desc, col("token").asc).limit(50)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(vocab.toSeq == direct.toSeq)
  }

  test("oov rate matches a direct recompute") {
    val rows = q("q_vocab_oov").collect()
    val vocab = q("q_vocab_top").collect().take(10).map(_.getString(0)).toSet
    val direct = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect().map { r =>
        val toks = r.getString(1).split(" ")
        r.getLong(0) -> (toks.length.toLong, toks.count(t => !vocab(t)).toLong)
      }.toMap
    assert(rows.length == direct.size)
    rows.foreach { r =>
      val (nt, noov) = direct(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tokens") == nt && r.getAs[Long]("n_oov") == noov,
        s"doc ${r.get(0)}")
      val expected = math.round(noov.toDouble / nt * 1e6) / 1e6
      assert(math.abs(r.getAs[Double]("oov_rate") - expected) < 1e-9)
    }
  }

  test("z-order key interleaves losslessly and ranges partition the curve") {
    // pure mirror: interleave then de-interleave recovers (x, y)
    def zOf(x: Long, y: Long): Long =
      (0 until 8).map(b => (((x >> b) & 1L) << (2 * b + 1)) | (((y >> b) & 1L) << (2 * b))).sum
    def unz(z: Long): (Long, Long) = {
      val pairs = (0 until 8).map(b => (((z >> (2 * b + 1)) & 1L) << b, ((z >> (2 * b)) & 1L) << b))
      (pairs.map(_._1).sum, pairs.map(_._2).sum)
    }
    (0 until 200).foreach { i =>
      val (x, y) = ((i * 37) % 256L, (i * 91) % 256L)
      assert(unz(zOf(x, y)) == (x, y))
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rows = q("q_zorder_layout").collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == spark.read.parquet(s"$dir/events.parquet").count())
    rows.foreach { r =>
      val zr = r.getAs[Long]("z_range")
      assert(r.getAs[Long]("z_min") >= zr * 4096 && r.getAs[Long]("z_max") < (zr + 1) * 4096)
    }
  }

  test("hilbert key: bijection, unit-step locality, and the query's histogram") {
    // local mirror of the unrolled xy→d walk
    def xy2d(x0: Long, y0: Long): Long = {
      var x = x0; var y = y0; var dd = 0L
      var k = 7
      while (k >= 0) {
        val s = 1L << k
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        dd += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        k -= 1
      }
      dd
    }
    // bijection over the full 256×256 grid, and TRUE Hilbert locality:
    // consecutive d are Manhattan-adjacent cells (Z-order fails this —
    // that's exactly the property this layout buys)
    val inv = new Array[(Int, Int)](65536)
    for (x <- 0 until 256; y <- 0 until 256) {
      val dd = xy2d(x, y)
      assert(inv(dd.toInt) == null, s"collision at d=$dd")
      inv(dd.toInt) = (x, y)
    }
    (1 until 65536).foreach { dd =>
      val ((ax, ay), (bx, by)) = (inv(dd - 1), inv(dd))
      assert(math.abs(ax - bx) + math.abs(ay - by) == 1,
        s"non-adjacent step at d=$dd: ($ax,$ay)->($bx,$by)")
    }
    // the query's histogram equals the local replay over the events table
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rows = q("q_hilbert_layout").collect()
    val local = spark.read.parquet(s"$dir/events.parquet")
      .select("event_id", "user_id").collect()
      .map(r => xy2d(r.getLong(1) % 256, r.getLong(0) % 256))
      .groupBy(_ / 4096)
    rows.foreach { r =>
      val ds = local(r.getAs[Long]("h_range"))
      assert(r.getAs[Long]("n") == ds.length)
      assert(r.getAs[Long]("h_min") == ds.min && r.getAs[Long]("h_max") == ds.max)
    }
    assert(rows.map(_.getAs[Long]("n")).sum == local.values.map(_.length).sum)
  }

  test("corpus diff statuses follow the version rule exactly") {
    val m = q("q_corpus_diff").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    // split points are fractions of max(doc_id), mirroring the query
    val mx = docs.agg(max("doc_id")).head.getLong(0)
    val (c1, c2) = (mx * 9 / 10, mx / 10)
    assert(m.size == n)
    m.foreach { case (id, st) =>
      val expected =
        if (id < c2) "removed"
        else if (id >= c1) "added"
        else if (id % 10 == 0) "changed"
        else "same"
      assert(st == expected, s"doc $id: $st != $expected")
    }
  }

  test("whitening centers and unit-scales: sums cancel, norms near sqrt(d)") {
    val rows = q("q_embed_whiten").collect()
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.length == n)
    // per-dim whitened values sum to ~0 across the corpus, so the total of
    // per-vector sums cancels (up to n*d*0.5e-6 quantization slack)
    val total = rows.map(_.getAs[Double]("w_sum")).sum
    assert(math.abs(total) < n * 64 * 0.5e-6 + 1e-3, s"total=$total")
    // standardized 64-dim rows have norm ~sqrt(64)=8 on average
    val meanNorm = rows.map(_.getAs[Double]("w_norm")).sum / rows.length
    assert(meanNorm > 6.0 && meanNorm < 10.0, s"meanNorm=$meanNorm")
  }

  test("weighted sampling keeps more high-quality docs and is deterministic") {
    val rows = q("q_sample_weighted").collect()
    assert(rows.nonEmpty && rows.length < spark.read.parquet(s"$dir/documents.parquet").count())
    rows.foreach { r =>
      val (p, u) = (r.getAs[Double]("keep_p"), r.getAs[Double]("u"))
      assert(p >= 0.1 - 1e-9 && p <= 1.0 + 1e-9)
      assert(u < p + 1e-9, s"doc ${r.get(0)} kept with u=$u >= p=$p")
    }
    // deterministic: a second run returns the identical keep set
    val again = q("q_sample_weighted").collect().map(_.getLong(0)).toSeq
    assert(again == rows.map(_.getLong(0)).toSeq)
  }

  test("mix rebalance never exceeds source counts and caps rates at 1") {
    val rows = q("q_mix_rebalance").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (before, after) = (r.getAs[Long]("n_before"), r.getAs[Long]("n_after"))
      val rate = r.getAs[Double]("rate")
      assert(rate > 0.0 && rate <= 1.0 + 1e-9)
      assert(after <= before)
      // kept fraction tracks the rate (hash-uniform draw, generous slack)
      assert(math.abs(after.toDouble / before - rate) < 0.35,
        s"${r.get(0)}: after/before=${after.toDouble / before} rate=$rate")
    }
  }

  test("url canonicalization collapses all four variants of a resource") {
    val rows = q("q_url_canonical_dedup").collect()
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_dups")).sum == n)
    rows.foreach { r =>
      val canonical = r.getAs[String]("canonical")
      assert(canonical.matches("example\\.com/path\\d+"), canonical)
      // doc_ids 4k..4k+3 share canonical path k; full groups have 4 members
      val keep = r.getAs[Long]("keep_id")
      assert(keep % 4 == 0 || keep >= n - 4, s"keep_id $keep is not a group min")
    }
    assert(rows.exists(_.getAs[Long]("n_dups") == 4L))
  }

  test("incremental dedup: flagged new docs really match, one pair recomputed") {
    val rows = q("q_dedup_incremental").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    assert(rows.length == docs.count { case (id, ts) => id >= 400 && ts.length >= 3 })
    val dups = rows.filter(_.getAs[Boolean]("is_dup"))
    assert(dups.nonEmpty, "fixture should contain cross-split near-dups")
    def shingles(ts: Seq[String]) = ts.sliding(3).map(_.mkString(" ")).toSet
    dups.foreach { r =>
      val a = shingles(docs(r.getAs[Long]("doc_id")))
      val b = shingles(docs(r.getAs[Long]("best_match")))
      val j = a.intersect(b).size.toDouble / a.union(b).size
      assert(r.getAs[Long]("best_match") < 400)
      assert(math.abs(r.getAs[Double]("best_jaccard") - math.round(j * 1e6) / 1e6) < 1e-9,
        s"doc ${r.get(0)}")
      // the query thresholds on the ROUNDED jaccard (repo determinism rule)
      assert(math.round(j * 1e6) / 1e6 >= 0.3)
    }
    rows.filter(!_.getAs[Boolean]("is_dup")).foreach { r =>
      assert(r.getAs[Long]("n_matches") == 0L && r.isNullAt(r.fieldIndex("best_match")))
    }
  }

  test("bigram logprob: negative scores, bigram counts match, one doc recomputed") {
    val rows = q("q_text_bigram_logprob").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    assert(rows.length == docs.count(_._2.length >= 2))
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_logprob") < 0.0) // probabilities < 1
      assert(r.getAs[Long]("n_bigrams") == docs(r.getAs[Long]("doc_id")).length - 1)
    }
    // brute-force recompute for one doc
    val uni = docs.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val big = docs.values.flatMap(ts => ts.zip(ts.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = uni.size.toLong
    val toks0 = docs(0L)
    val lps = toks0.zip(toks0.tail).map { p =>
      math.log((big(p) + 1).toDouble / (uni(p._1) + v).toDouble)
    }
    val expected = math.floor(lps.map(x => math.floor(x * 1e6 + 0.5)).sum) /
      (lps.length.toDouble * 1e6)
    val got = rows.find(_.getAs[Long]("doc_id") == 0L).get.getAs[Double]("avg_logprob")
    assert(math.abs(got - (math.round(expected * 1e6) / 1e6)) < 2e-6, s"got=$got expected=$expected")
  }

  test("pii redaction leaves no live email/phone and extracts the domain") {
    val rows = q("q_pii_redact").collect()
    assert(rows.forall(_.getAs[Long]("n_emails") == 1L))
    assert(rows.forall(_.getAs[Long]("n_phones") == 1L))
    assert(rows.forall(r => r.getAs[String]("domain").matches("docs[0-6]\\.example\\.org")))
    // recompute one redaction in plain Scala and compare the md5
    val d0 = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") === 0).select("text").head().getString(0)
    val synth = d0 + " contact user0@example.com or call 555-0 see https://docs0.example.org/page"
    val red = synth.replaceAll("user[0-9]+@[a-z.]+", "<EMAIL>")
      .replaceAll("555-[0-9]+", "<PHONE>")
    val md = java.security.MessageDigest.getInstance("MD5").digest(red.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val got = rows.find(_.getAs[Long]("doc_id") == 0L).get.getAs[String]("red_md5")
    assert(got == md)
  }
}
