package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The distributed BPE trainer must produce the IDENTICAL merge sequence as
  * a plain-Scala reference implementation run on the collected corpus —
  * byte-for-byte, counts included. */
class BpeTrainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def localApply(ts: Seq[String], a: String, b: String): Seq[String] = {
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    for (x <- ts) {
      if (buf.nonEmpty && buf.last == a && x == b) {
        buf.remove(buf.size - 1); buf += (a + "+" + b)
      } else buf += x
    }
    buf.toSeq
  }

  /** Spark's string order is binary UTF-8 byte order (differs from Java's
    * UTF-16 order for supplementary-plane chars) — the replay must match. */
  private val utf8Order: Ordering[String] = (x: String, y: String) => {
    val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
    val n = math.min(a.length, b.length)
    var i = 0
    var c = 0
    while (i < n && c == 0) { c = (a(i) & 0xff) - (b(i) & 0xff); i += 1 }
    if (c != 0) c else a.length - b.length
  }

  private def localTrain(docs0: Seq[Seq[String]], nMerges: Int)
      : Seq[(Int, String, String, Long)] = {
    var cur = docs0
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      cur.foreach(_.sliding(2).foreach {
        case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
        case _ =>
      })
      val best = counts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }(
          Ordering.Tuple3(Ordering.Long, utf8Order, utf8Order))
        .headOption
      best.filter(_._2 >= 2) match {
        case Some(((a, b), n)) =>
          out += ((rank, a, b, n))
          cur = cur.map(localApply(_, a, b))
          rank += 1
        case None => done = true
      }
    }
    out.result()
  }

  test("distributed merges equal the local reference replay, counts included") {
    val rows = graft.SparkEntry.queries("q_bpe_train")(spark, dir).collect()
    val got = rows.map(r => (r.getAs[Long]("merge_rank").toInt,
      r.getAs[String]("left"), r.getAs[String]("right"), r.getAs[Long]("n"))).toSeq
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("text")).collect().map(_.getString(0).split(" ").toSeq).toSeq
    val want = localTrain(docs, 4)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    assert(got.length == 4)
  }

  test("later rounds chain onto earlier merged symbols") {
    import spark.implicits._
    // 10 copies of "x y z w": round 1 merges (x,y); round 2 must see the
    // REWRITTEN corpus and merge (x+y, z), proving the loop feeds each
    // round the previous round's output
    val df = (0 until 10).map(i => (i, Seq("x", "y", "z", "w"))).toDF("id", "sym")
    val (merges, out) = BpeTrainer.train(df, "sym", nMerges = 3)
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("x", "y"), ("x+y", "z"), ("x+y+z", "w")))
    assert(merges.forall(_.n == 10L))
    val fin = out.select("sym").collect().map(_.getSeq[String](0).toList).toSeq
    assert(fin.forall(_ == List("x+y+z+w")))
  }

  test("greedy fold equals the local apply on 200 random symbol runs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val syms = Seq("a", "b", "c", "a+b")
    val cases = (0 until 200).map { i =>
      (i, Seq.fill(rnd.nextInt(12))(syms(rnd.nextInt(syms.length))))
    }
    for ((l, r) <- Seq(("a", "b"), ("b", "a"), ("a", "a"), ("a+b", "c"))) {
      val got = cases.toDF("id", "sym")
        .withColumn("sym", BpeTrainer.applyMerge(col("sym"), l, r))
        .orderBy("id").collect().map(_.getSeq[String](1).toList).toSeq
      val want = cases.map { case (_, ts) => localApply(ts, l, r).toList }
      assert(got == want, s"merge ($l,$r) diverged")
    }
  }

  test("greedy fold apply matches the local apply on adversarial runs") {
    import spark.implicits._
    val cases = Seq(
      Seq("a", "a", "a"), Seq("a", "a", "a", "a"), Seq("a", "b", "a", "b"),
      Seq("b", "a", "b", "a", "b"), Seq("a"), Seq.empty[String])
    val df = cases.zipWithIndex.map { case (ts, i) => (i, ts) }.toDF("id", "sym")
      .withColumn("sym", BpeTrainer.applyMerge(col("sym"), "a", "b"))
    val got = df.orderBy("id").collect().map(_.getSeq[String](1).toList).toSeq
    assert(got == cases.map(localApply(_, "a", "b").toList))
    val df2 = cases.zipWithIndex.map { case (ts, i) => (i, ts) }.toDF("id", "sym")
      .withColumn("sym", BpeTrainer.applyMerge(col("sym"), "a", "a"))
    val got2 = df2.orderBy("id").collect().map(_.getSeq[String](1).toList).toSeq
    assert(got2 == cases.map(localApply(_, "a", "a").toList))
  }

  test("BpeEncode matches a local greedy reference on randomized words") {
    import spark.implicits._
    // independent Scala implementation of greedy left-to-right merge passes
    def localEncode(w: String): List[String] = {
      var syms = w.map(_.toString).toList
      for ((a, b) <- BpeEncode.Merges) {
        val out = scala.collection.mutable.ListBuffer[String]()
        for (s <- syms) {
          if (out.nonEmpty && out.last == a && s == b) {
            out.remove(out.length - 1); out += (a + b)
          } else out += s
        }
        syms = out.toList
      }
      syms
    }
    // seeded draw over an alphabet dense in merge characters so every merge
    // (incl. the chained th→the and an→and) fires often
    val rnd = new scala.util.Random(20260813L)
    val alphabet = "thieandr"
    val words = (1 to 300).map { _ =>
      (1 to (1 + rnd.nextInt(10))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.distinct
    val got = BpeEncode.encodeWords(words.toDF("w"), "w", "s").collect()
      .map(r => r.getString(0) -> r.getString(1).split("\\|").toList).toMap
    words.foreach { w =>
      assert(got(w) == localEncode(w), s"word '$w' diverged")
    }
  }

  test("BpeEncode applies the pinned merge table with greedy BPE semantics") {
    import spark.implicits._
    // expected values derive from hand-running Merges = th, the, in, an,
    // and, er in order: e.g. 'another' = a n o t h e r → (t,h) → (th,e)
    // 'the' → (a,n) 'an' → an|o|the|r; (e,r) never fires there because
    // the preceding symbol is 'the', not 'e'
    val want = Map(
      "there" -> "the|r|e", "another" -> "an|o|the|r", "in" -> "in",
      "a" -> "a", "and" -> "and", "thethe" -> "the|the", "x" -> "x",
      "hat" -> "h|a|t")
    val df = want.keys.toSeq.toDF("w")
    val got = BpeEncode.encodeWords(df, "w", "s").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == want)
    // symbol counts follow the delimited representation
    val counts = BpeEncode.encodeWords(df, "w", "s")
      .select(col("w"), BpeEncode.symbolCount(col("s")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("there") == 3L && counts("in") == 1L && counts("hat") == 3L)
  }
}
