package graft.embed

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.VectorOps
import graft.ops.ApproxKnn

class EmbedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("TF-IDF embedding: unit norm and shared-vocabulary geometry") {
    val df = Seq(
      (1L, Seq("spark", "sql", "engine")),
      (2L, Seq("spark", "sql", "runtime")),
      (3L, Seq("grape", "banana", "kiwi")))
      .toDF("id", "tokens")
    val emb = TfIdfEmbed.withTfIdfEmbedding(df, "tokens", dim = 64)
    assert(emb.schema("embedding").dataType.simpleString == "array<float>")
    val rows = emb.select($"id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // unit norm
    rows.values.foreach { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
    // doc1 closer to doc2 (shares 'spark sql') than to doc3 (shares nothing)
    def cos(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(cos(rows(1L), rows(2L)) > cos(rows(1L), rows(3L)) + 0.1)
  }

  test("Word2Vec embedding: trained vectors, unit norm, query path " +
      "reproduces the bulk geometry, model survives save/load") {
    // a corpus with two clearly separated topic clusters so the trained
    // geometry is testable (words co-occurring in sentences end up closer)
    val sents = (0 until 30).map { i =>
      if (i % 2 == 0) (i.toLong, Seq("spark", "sql", "query", "engine", "plan"))
      else (i.toLong, Seq("grape", "banana", "kiwi", "mango", "fruit"))
    }
    val df = sents.toDF("id", "tokens")
    val (emb, model) = Word2VecEmbed.fitTransform(df, "tokens", dim = 16)
    assert(model.vectors.nonEmpty && model.dim == 16)
    assert(emb.schema("embedding").dataType.simpleString == "array<float>")
    val rows = emb.select($"id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.values.foreach { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"not unit-norm: $n")
    }
    def cos(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    // same-topic docs are identical token bags → cosine 1; cross-topic must
    // be measurably farther (the vectors are LEARNED, not hand-set)
    assert(cos(rows(0L), rows(2L)) > cos(rows(0L), rows(1L)) + 0.05)

    // query-time embedder = bulk kernel, bit-for-bit
    val qe = model.embedder(t => t.split(" ").toSeq)
    val q = qe.embed(Seq("spark sql query engine plan")).head
    assert(q.toSeq == rows(0L))
    // all-OOV embeds to the zero vector, not a crash
    assert(qe.embed(Seq("zzz yyy")).head.forall(_ == 0.0f))

    // save/load round-trip preserves every vector
    val dir = java.nio.file.Files.createTempDirectory("graft-w2v").toString
    model.save(spark, dir)
    val loaded = Word2VecEmbed.load(spark, dir)
    assert(loaded.dim == model.dim)
    assert(loaded.vectors.keySet == model.vectors.keySet)
    model.vectors.foreach { case (w, v) => assert(loaded.vectors(w).toSeq == v.toSeq) }
  }

  test("Word2Vec partitioned fit (N=4): serving contract survives — " +
      "save/load → bulk and query geometry bit-stable") {
    // the at-scale fit mode: training runs Hogwild over 4 partitions, so
    // the LEARNED vectors may jitter run-to-run — but everything serving
    // depends on (saved vectors → load → one shared meanVector kernel)
    // must stay a bit-exact pure function of whatever was saved
    val sents = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, Seq("spark", "sql", "query", "engine", "plan"))
      else (i.toLong, Seq("grape", "banana", "kiwi", "mango", "fruit"))
    }
    val df = sents.toDF("id", "tokens")
    val (emb, model) = Word2VecEmbed.fitTransform(df, "tokens", dim = 16,
      numPartitions = 4)
    assert(model.vectors.nonEmpty && model.dim == 16)
    val rows = emb.select($"id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.values.foreach { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"not unit-norm: $n")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-w2v-par").toString
    model.save(spark, dir)
    val loaded = Word2VecEmbed.load(spark, dir, expectedDim = Some(16))
    // reloaded model reproduces the BULK geometry exactly through the
    // query path — the contract that lets training jitter stay harmless
    val qe = loaded.embedder(t => t.split(" ").toSeq)
    assert(qe.embed(Seq("spark sql query engine plan")).head.toSeq == rows(0L))
    assert(qe.embed(Seq("grape banana kiwi mango fruit")).head.toSeq == rows(1L))
  }

  test("Word2Vec load fails loudly on empty vocab and on dim mismatch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-w2v-bad").toString
    // empty vector table (what an empty corpus / aggressive minCount saves)
    Seq.empty[(String, Seq[Float])].toDF("word", "vector")
      .write.mode("overwrite").parquet(s"$dir/empty")
    val e = intercept[IllegalStateException] {
      Word2VecEmbed.load(spark, s"$dir/empty")
    }
    assert(e.getMessage.contains("empty vocabulary"))
    // persisted dim disagrees with the index's embedding_dim setting
    Seq(("w", Seq(1.0f, 0.0f))).toDF("word", "vector")
      .write.mode("overwrite").parquet(s"$dir/d2")
    val m = intercept[IllegalArgumentException] {
      Word2VecEmbed.load(spark, s"$dir/d2", expectedDim = Some(64))
    }
    assert(m.getMessage.contains("geometry mismatch"))
  }

  test("MLlib LSH approx kNN agrees with brute force on an easy corpus") {
    val rnd = new scala.util.Random(11)
    def unit(dim: Int) = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val corpus = (0 until 300).map(i => (i.toLong, unit(16))).toDF("id", "vec")
    val qv = corpus.filter($"id" === 0).select($"vec").as[Array[Float]].head()

    val approx = ApproxKnn.approxTopK(corpus, "id", "vec", qv, k = 5,
        bucketLength = 2.0, numHashTables = 8)
      .collect().map(_.getAs[Long]("id")).toSet
    val exact = corpus
      .withColumn("d", VectorOps.cosineDist($"vec", typedlit(qv.toSeq)))
      .orderBy($"d".asc).limit(5)
      .collect().map(_.getAs[Long]("id")).toSet
    // generous LSH settings on a small corpus: expect high recall incl. self
    assert(approx.contains(0L))
    assert((approx & exact).size >= 3, s"approx=$approx exact=$exact")

    // the batch path: 3 queries in ONE approxSimilarityJoin job, per-query
    // recall vs brute force for EACH query
    val queries = corpus.filter($"id" < 3).select($"id".as("qid"), $"vec".as("qvec"))
    val batch = ApproxKnn.approxTopKBatch(corpus, "id", "vec",
        queries, "qid", "qvec", k = 5, bucketLength = 2.0, numHashTables = 8)
      .collect().groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("id")).toSet).toMap
    assert(batch.keySet == Set(0L, 1L, 2L))
    (0L to 2L).foreach { qid =>
      val qvec = corpus.filter($"id" === qid).select($"vec").as[Array[Float]].head()
      val ex = corpus
        .withColumn("d", VectorOps.cosineDist($"vec", typedlit(qvec.toSeq)))
        .orderBy($"d".asc).limit(5)
        .collect().map(_.getAs[Long]("id")).toSet
      assert(batch(qid).contains(qid), s"q$qid missing self")
      assert(batch(qid).size <= 5)
      assert((batch(qid) & ex).size >= 3, s"q$qid: batch=${batch(qid)} exact=$ex")
    }
  }
}
