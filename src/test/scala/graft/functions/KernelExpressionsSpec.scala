package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.{BpeEncode, Dedup}

/** Round-21 native kernels vs their HOF executable specifications —
  * bit-identical on real corpus rows AND adversarial synthetic rows
  * (unicode, empty tokens, short arrays). The natives replaced measured
  * hot paths (minhash signatures, verify-kernel intersections, BPE merge
  * fold, PQ subspace L2, phrase adjacency); any drift here is a
  * correctness bug, not a perf regression. */
class KernelExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")
    .select(col("doc_id"), split(col("text"), " ").as("tokens"))

  private lazy val adversarial = Seq(
    Seq("a"),                                  // below shingle width
    Seq("a", "b"),                             // still below
    Seq("a", "b", "c"),                        // exactly one shingle
    Seq("", "", ""),                           // empty tokens
    Seq("é", "漢字", "𝄞clef", "x"),            // multi-byte + surrogate pair
    Seq("tok", "", "y", "zz", "longertoken"),  // mixed lengths with empty
    Seq.fill(40)("same"),                      // degenerate repetition
    (1 to 30).map(i => s"t$i")
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "tokens")

  private def assertSameRows(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Unit = {
    val ra = a.collect().map(_.toString).sorted
    val rb = b.collect().map(_.toString).sorted
    assert(ra.toSeq == rb.toSeq)
  }

  test("ShingleMinhashes ≡ HOF signature chain (portable + prod, corpus + edges)") {
    for (portable <- Seq(true, false); df <- Seq(corpus, adversarial)) {
      val in = df.filter(size(col("tokens")) >= 3)
      val native = Dedup.withMinhashSignature(in, "tokens", portable)
        .select(Seq(col("doc_id")) ++
          (0 until Dedup.NumHashes).map(j => col(s"mh$j")) ++
          Seq(col("band0"), col("band1")): _*)
      val hof = Dedup.withMinhashSignatureHof(in, "tokens", portable)
        .select(Seq(col("doc_id")) ++
          (0 until Dedup.NumHashes).map(j => col(s"mh$j")) ++
          Seq(col("band0"), col("band1")): _*)
      assertSameRows(native, hof)
    }
  }

  test("SortedIntersectSize ≡ size(array_intersect) on sorted distinct sets") {
    val ds = corpus.filter(size(col("tokens")) >= 3)
      .select(col("doc_id"), Dedup.distinctShingles(col("tokens")).as("ds"))
    val pairs = ds.select(col("doc_id").as("a_id"), col("ds").as("a"))
      .join(ds.select((col("doc_id") - 1).as("a_id"), col("ds").as("b")), Seq("a_id"))
    val checked = pairs.select(
      Dedup.intersectSize(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin"),
      round(Dedup.jaccardSorted(col("a"), col("b")), 6).as("jn"),
      round(Dedup.jaccard(col("a"), col("b")), 6).as("jh"))
    checked.collect().foreach { r =>
      assert(r.getInt(0) == r.getInt(1), "intersect size mismatch")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), "jaccard mismatch")
    }
  }

  test("BpeEncodeWord ≡ mergePass fold (corpus words + unicode edges)") {
    val words = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(instr(col("text"), "|") === 0)
      .select(explode(filter(split(col("text"), " "), w => length(w) > 0)).as("w"))
      .union(Seq("é", "漢字th", "ther", "andand", "inin", "a",
        "𝄞the𝄞", "xyz").toDF("w"))
    val native = BpeEncode.encodeWords(words, "w", "s")
    val hof = BpeEncode.encodeWordsHof(words, "w", "s")
    assertSameRows(native.select("w", "s"), hof.select("w", "s"))
    // symbolCount translate-form ≡ regex re-split form on the encoded strings
    val counts = native.select(
      BpeEncode.symbolCount(col("s")).as("a"),
      size(split(col("s"), "\\|")).cast("long").as("b"))
    counts.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("ShingleHashes64 ≡ xxhash64 over the materialized window strings") {
    for (df <- Seq(corpus, adversarial)) {
      val in = df.filter(size(col("tokens")) >= 8)
      val native = in.select(col("doc_id"), ColumnBridge.column(ShingleHashes64(
        ColumnBridge.expression(col("tokens")), 8)).as("h"))
      val hof = in.select(col("doc_id"), transform(
        Dedup.shingles(col("tokens"), 8), w => xxhash64(w)).as("h"))
      assertSameRows(native, hof)
    }
  }

  test("StrideWindowHashes64 ≡ xxhash64 over the strided window strings") {
    for (df <- Seq(corpus, adversarial)) {
      val in = df.filter(size(col("tokens")) >= 1)
      val native = in.select(col("doc_id"), ColumnBridge.column(StrideWindowHashes64(
        ColumnBridge.expression(col("tokens")), 8, 8)).as("h"))
      val hof = in.select(col("doc_id"), transform(
        sequence(lit(0), ceil(size(col("tokens")).cast("double") / 8).cast("int") - 1),
        i => xxhash64(concat_ws(" ", slice(col("tokens"), i * 8 + 1, lit(8))))).as("h"))
      assertSameRows(native, hof)
    }
  }

  test("SquaredL2 ≡ zip_with/aggregate fold") {
    val rnd = new scala.util.Random(11)
    val df = (0 until 300).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextDouble() * 2 - 1),
        Array.fill(8)(rnd.nextDouble() * 2 - 1))
    }.toDF("id", "a", "b")
    val l2Native = ColumnBridge.column(SquaredL2(
      ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b"))))
    val l2Hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
    df.select(l2Native.as("n"), l2Hof.as("h")).collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("AdjacentPairCount ≡ filter-over-sequence HOF") {
    val df = corpus.filter(size(col("tokens")) >= 2)
    val native = ColumnBridge.column(AdjacentPairCount(
      ColumnBridge.expression(col("tokens")), "table", "value"))
    val hof = size(filter(sequence(lit(1), size(col("tokens")) - 1),
      i => element_at(col("tokens"), i) === "table" &&
        element_at(col("tokens"), i + 1) === "value")).cast("long")
    df.select(native.as("n"), hof.as("h")).collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
    }
    // non-vacuity: the phrase does occur in the fixture
    assert(df.select(sum(native)).head.getLong(0) > 0)
  }

  test("null elements: kernels match their HOF formulations instead of NPE-ing " +
      "(round-22 ADVICE — concat_ws skips nulls+separators, null never matches, " +
      "null ∩ null counts once)") {
    val nullish = Seq(
      Seq("a", null, "b", "c", "x", "yy", "z", "w", "v", "u"),
      Seq(null, null, "q", "r", "s", "t", "uu", "vv", "ww", "xx"),
      Seq("table", null, "value", "table", "value", "k", "l", "m", "n", "o")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "tokens")

    // minhash signature chain (portable + prod)
    for (portable <- Seq(true, false)) {
      val native = Dedup.withMinhashSignature(nullish, "tokens", portable)
        .select(Seq(col("doc_id")) ++
          (0 until Dedup.NumHashes).map(j => col(s"mh$j")): _*)
      val hof = Dedup.withMinhashSignatureHof(nullish, "tokens", portable)
        .select(Seq(col("doc_id")) ++
          (0 until Dedup.NumHashes).map(j => col(s"mh$j")): _*)
      assertSameRows(native, hof)
    }
    // window-hash kernels vs their concat_ws formulations
    assertSameRows(
      nullish.select(col("doc_id"), ColumnBridge.column(ShingleHashes64(
        ColumnBridge.expression(col("tokens")), 8)).as("h")),
      nullish.select(col("doc_id"), transform(
        Dedup.shingles(col("tokens"), 8), w => xxhash64(w)).as("h")))
    assertSameRows(
      nullish.select(col("doc_id"), ColumnBridge.column(StrideWindowHashes64(
        ColumnBridge.expression(col("tokens")), 8, 8)).as("h")),
      nullish.select(col("doc_id"), transform(
        sequence(lit(0), ceil(size(col("tokens")).cast("double") / 8).cast("int") - 1),
        i => xxhash64(concat_ws(" ", slice(col("tokens"), i * 8 + 1, lit(8))))).as("h")))
    // adjacency: null never matches (the HOF condition is null → dropped)
    val adjNative = ColumnBridge.column(AdjacentPairCount(
      ColumnBridge.expression(col("tokens")), "table", "value"))
    val adjHof = size(filter(sequence(lit(1), size(col("tokens")) - 1),
      i => element_at(col("tokens"), i) === "table" &&
        element_at(col("tokens"), i + 1) === "value")).cast("long")
    nullish.select(adjNative.as("n"), adjHof.as("h")).collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // sorted intersect: null sorts first, null ∩ null counts once
    val ipairs = Seq(
      (Seq[String](null, "a", "c"), Seq[String](null, "b", "c")),
      (Seq[String](null, "a"), Seq[String]("a", "b")),
      (Seq[String]("a", "b"), Seq[String]("c"))
    ).toDF("a", "b")
    ipairs.select(Dedup.intersectSize(col("a"), col("b")).as("n"),
        size(array_intersect(col("a"), col("b"))).as("h"))
      .collect().foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }
}
