package graft.search

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.core.Schemas.Setting
import graft.index.IndexData

/** Positional-postings phrase search (round-15 directive #3): adjacency as
  * a pruned self-join over the `positions/` sidecar instead of a per-query
  * corpus token scan. Pins (a) result parity with the token-scan
  * formulation on adversarial token streams, (b) the ROWS-READ bound on a
  * persisted artifact — the index path reads the phrase terms' occurrence
  * lists, not the corpus, and (c) the serving `--phrase` filter producing
  * identical results through the index path and the token-filter fallback. */
class PhrasePostingsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-local reference count of adjacent runs (overlap-counting, same
    * as the q_phrase_match HOF). */
  private def localMatches(tokens: Seq[String], phrase: Seq[String]): Int =
    if (tokens.length < phrase.length) 0
    else (0 to tokens.length - phrase.length)
      .count(i => phrase.indices.forall(j => tokens(i + j) == phrase(j)))

  test("parity: the positional self-join counts exactly the adjacent runs " +
      "the token scan counts — repeats, overlaps, duplicate phrase terms") {
    val docs = Seq(
      1L -> Seq("table", "value", "x", "table", "value"), // 2 matches
      2L -> Seq("value", "table", "x"),                   // wrong order: 0
      3L -> Seq("table", "x", "value"),                   // gap: 0
      4L -> Seq("table", "value"),                        // exact: 1
      5L -> Seq("a", "a", "a"),                           // self-overlap fixture
      6L -> Seq("to", "be", "to", "be", "to"),            // duplicate terms
      7L -> Seq("table"),                                 // too short
      8L -> Seq.empty[String]
    ).toDF("doc_id", "tokens")
    val pos = Bm25.positionalPostings(docs)

    def check(phrase: Seq[String]): Unit = {
      val got = PhraseSearch.phraseMatches(pos, phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = docs.collect()
        .map(r => r.getLong(0) -> localMatches(r.getSeq[String](1), phrase).toLong)
        .filter(_._2 > 0).toMap
      assert(got == want, s"phrase=$phrase")
    }
    check(Seq("table", "value"))
    check(Seq("a", "a"))          // overlapping runs: doc 5 has 2
    check(Seq("to", "be", "to"))  // duplicate phrase terms: doc 6 has 2
    check(Seq("table"))           // 1-term phrase ≡ tf
    check(Seq("absent", "term"))  // empty result
  }

  test("proximity: bucketed range join counts exactly the in-window ordered " +
      "pairs; window=1 degenerates to 2-term adjacency") {
    val docs = Seq(
      1L -> Seq("table", "x", "y", "value", "value"), // gaps 3 and 4
      2L -> Seq("value", "x", "table"),               // wrong order
      3L -> Seq("table", "value", "table", "z", "value"), // mixed
      4L -> Seq("table", "a", "b", "c", "d", "value")     // gap 5: outside w=4
    ).toDF("doc_id", "tokens")
    val pos = Bm25.positionalPostings(docs)
    def localPairs(tokens: Seq[String], w: Int): Long =
      (for {
        (a, i) <- tokens.zipWithIndex if a == "table"
        (b, j) <- tokens.zipWithIndex if b == "value" && j > i && j - i <= w
      } yield 1).size.toLong
    for (w <- Seq(1, 2, 3, 4, 7)) {
      val got = PhraseSearch.proximityMatches(pos, "table", "value", w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = docs.collect()
        .map(r => r.getLong(0) -> localPairs(r.getSeq[String](1), w))
        .filter(_._2 > 0).toMap
      assert(got == want, s"window=$w")
    }
    // window=1 ≡ adjacency for the 2-term phrase
    val adj = PhraseSearch.phraseMatches(pos, Seq("table", "value"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prox1 = PhraseSearch.proximityMatches(pos, "table", "value", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(adj == prox1)
  }

  test("unordered proximity: counts in-window pairs in EITHER order; " +
      "3-bucket emission never double-counts; self-pair rejected") {
    val docs = Seq(
      1L -> Seq("value", "x", "table"),                   // reverse order: in
      2L -> Seq("table", "x", "y", "z", "value"),         // gap 4
      3L -> Seq("table", "value", "value", "x", "table"), // mixed multiplicity
      4L -> Seq("table", "a", "b", "c", "d", "e", "value") // gap 6
    ).toDF("doc_id", "tokens")
    val pos = Bm25.positionalPostings(docs)
    def localPairs(tokens: Seq[String], w: Int): Long =
      (for {
        (a, i) <- tokens.zipWithIndex if a == "table"
        (b, j) <- tokens.zipWithIndex if b == "value" && math.abs(j - i) <= w
      } yield 1).size.toLong
    for (w <- Seq(1, 2, 4, 6, 9)) {
      val got = PhraseSearch.proximityMatchesUnordered(pos, "table", "value", w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = docs.collect()
        .map(r => r.getLong(0) -> localPairs(r.getSeq[String](1), w))
        .filter(_._2 > 0).toMap
      assert(got == want, s"window=$w")
    }
    intercept[IllegalArgumentException] {
      PhraseSearch.proximityMatchesUnordered(pos, "table", "table", 3)
    }
  }

  test("N-term sloppy phrase: chained bucketed probes count exactly the " +
      "in-order within-span tuples; 2-term case ≡ proximityMatches") {
    val docs = Seq(
      1L -> Seq("key", "x", "row", "y", "scan"),          // span 4
      2L -> Seq("key", "row", "scan"),                    // span 2
      3L -> Seq("scan", "row", "key"),                    // reverse: 0
      4L -> Seq("key", "row", "x", "x", "x", "x", "scan"), // span 6
      5L -> Seq("key", "key", "row", "scan"),             // anchor multiplicity
      6L -> Seq("key", "row")                             // missing term
    ).toDF("doc_id", "tokens")
    val pos = Bm25.positionalPostings(docs)
    def localTuples(tokens: Seq[String], terms: Seq[String], w: Int): Long = {
      def occ(t: String) = tokens.zipWithIndex.filter(_._1 == t).map(_._2)
      def rec(rem: Seq[String], prev: Int, first: Int): Long = rem match {
        case Nil => 1L
        case t +: rest => occ(t).filter(p => p > prev && p - first <= w)
          .map(p => rec(rest, p, first)).sum
      }
      occ(terms.head).map(p0 => rec(terms.tail, p0, p0)).sum
    }
    for (w <- Seq(2, 4, 6, 8)) {
      val got = PhraseSearch.sloppyPhraseMatches(pos, Seq("key", "row", "scan"), w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = docs.collect()
        .map(r => r.getLong(0) -> localTuples(r.getSeq[String](1), Seq("key", "row", "scan"), w))
        .filter(_._2 > 0).toMap
      assert(got == want, s"window=$w")
    }
    // 2-term sloppy ≡ the dedicated ordered-pair operator
    val viaSloppy = PhraseSearch.sloppyPhraseMatches(pos, Seq("key", "scan"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPair = PhraseSearch.proximityMatches(pos, "key", "scan", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSloppy == viaPair)
    // a window too small for the term count is a usage error, not silence
    intercept[IllegalArgumentException] {
      PhraseSearch.sloppyPhraseMatches(pos, Seq("key", "row", "scan"), 1)
    }
  }

  test("sloppy-phrase probe on the persisted artifact reads the terms' " +
      "occurrence lists, not the corpus") {
    val index = IndexData.load(spark, artifactDir)
    val pos = index.positions.getOrElse(fail("artifact must carry positions/"))
    val total = pos.count()
    val (rows, read) = graft.util.InputMetrics.rowsRead(spark, expectNonZero = true) {
      PhraseSearch.sloppyPhraseMatches(pos, Seq("table", "zfill0"), window = 3).collect()
    }
    assert(rows.nonEmpty)
    assert(read <= total / 4, s"sloppy probe read $read of $total position rows")
  }

  // an artifact whose corpus is dominated by filler terms lexically AROUND
  // the phrase terms — the positions probe must read only the phrase
  // terms' occurrence lists (row-group stats on the term-sorted layout)
  private lazy val artifactDir: String = {
    val d = java.nio.file.Files.createTempDirectory("phrasepost").toString
    val n = 4096
    val docs = (0 until n).map { i =>
      val toks =
        if (i % 64 == 0) Seq("table", "value", s"zfill$i")
        else Seq(s"afill$i", s"mfill$i", s"zfill$i", s"qfill$i")
      (i.toString, toks.mkString(" "), toks)
    }.toDF("doc_id", "content", "tokens")
      .withColumn("embedding", lit(null).cast("array<float>"))
      .withColumn("file_path", concat(lit("docs/"), col("doc_id")))
      .withColumn("header_path", lit(""))
      .withColumn("line_start", lit(1)).withColumn("line_end", lit(1))
    // scale-representative file granularity: positions/ range-clusters by
    // term into shuffle.partitions files — at TestSpark's tiny default the
    // whole fixture is one near-full-range file and row-group pruning has
    // nothing to prune (a 100 TB artifact has thousands of term-ranged
    // files; DocFetchPruneSpec takes the same approach for doc_id)
    val partsWas = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      IndexData.write(docs, Seq(Setting("embedding_model", "test")).toDF(), d)
    } finally spark.conf.set("spark.sql.shuffle.partitions", partsWas)
    d
  }

  test("artifact phrase probe reads the phrase terms' lists, not the " +
      "corpus (rows-read on the persisted positions sidecar)") {
    val index = IndexData.load(spark, artifactDir)
    val pos = index.positions.getOrElse(fail("artifact must carry positions/"))
    val total = pos.count()
    val (rows, read) = graft.util.InputMetrics.rowsRead(spark, expectNonZero = true) {
      PhraseSearch.phraseMatches(pos, Seq("table", "value")).collect()
    }
    assert(rows.length == 4096 / 64)
    assert(rows.forall(_.getLong(1) == 1L))
    assert(read > 0, "rows-read pin needs a real read-out")
    // 64 phrase docs × 2 phrase tokens among ~16k total occurrences: the
    // pruned probe must read well under the corpus-sized table (each leg
    // reads its term's row groups; generous 25% bound absorbs row-group
    // granularity on a small fixture)
    assert(read <= total / 4, s"phrase probe read $read of $total position rows")
  }

  test("collocations: windowed ordered pair counts + PMI match a " +
      "hand-computed corpus (window semantics, count floor, self-pairs)") {
    val docs = Seq(
      1L -> Seq("a", "b", "a", "b"),
      2L -> Seq("a", "b", "c")
    ).toDF("doc_id", "tokens")
    val pos = Bm25.positionalPostings(docs)
    // window 1 (adjacent), floor 2: only (a,b) survives — 3 occurrences;
    // unigrams a=3 b=3 c=1, T=7 → pmi = ln(3·7/(3·3))
    val w1 = PhraseSearch.collocations(pos, window = 1, minCount = 2).collect()
    assert(w1.length == 1, w1.mkString(";"))
    val r = w1.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 3L)
    assert(math.abs(r.getDouble(3) - math.log(3.0 * 7 / (3 * 3))) < 1e-12)
    // window 2, no floor: all ordered pairs within 2 positions, including
    // the same-term-different-positions self-pair (a,a)
    val w2 = PhraseSearch.collocations(pos, window = 2, minCount = 1)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(w2 == Map(("a", "b") -> 3L, ("a", "a") -> 1L, ("b", "a") -> 1L,
      ("b", "b") -> 1L, ("a", "c") -> 1L, ("b", "c") -> 1L), w2)
  }

  test("collocationsFromTokens ≡ collocations over the positions sidecar " +
      "(windows 1..3, incl. window past doc end, single-token and empty docs)") {
    val docs = Seq(
      1L -> Seq("a", "b", "a", "b"),
      2L -> Seq("a", "b", "c"),
      3L -> Seq("x"),
      4L -> Seq.empty[String]
    ).toDF("doc_id", "tokens")
    val pos = Bm25.positionalPostings(docs)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, String, Long, Double)] =
      df.collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sorted
    for (w <- 1 to 3; mc <- Seq(1L, 2L)) {
      val viaJoin = rows(PhraseSearch.collocations(pos, w, minCount = mc))
      val viaTokens = rows(PhraseSearch.collocationsFromTokens(docs, w, minCount = mc))
      assert(viaTokens == viaJoin, s"window=$w minCount=$mc")
    }
  }

  test("serving --phrase: the positions index path and the token-filter " +
      "fallback return identical results") {
    val index = IndexData.load(spark, artifactDir)
    assert(index.positions.isDefined)
    def ids(i: IndexData): Seq[String] =
      ServeSearch.search(i, "table value",
        analyzer = graft.analyze.WhitespaceAnalyzer,
        opts = HybridSearch.Options(k = 10, phraseOnly = true))
        .select("doc_id").as[String].collect().toSeq
    val viaIndex = ids(index)
    val viaTokens = ids(index.copy(positions = None))
    assert(viaIndex == viaTokens, s"index=$viaIndex tokens=$viaTokens")
    assert(viaIndex.nonEmpty, "phrase docs exist and score for the query")
    // and the filter really bites: without phraseOnly more docs return
    val unfiltered = ServeSearch.search(index, "table value",
      analyzer = graft.analyze.WhitespaceAnalyzer,
      opts = HybridSearch.Options(k = 10, phraseOnly = false)).count()
    assert(unfiltered >= viaIndex.length)
  }
}
