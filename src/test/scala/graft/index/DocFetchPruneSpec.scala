package graft.index

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.core.Schemas.Setting

/** Pins the round-13 scale finding: doc_ids are content-addressed
  * (uniform-random), so an UNCLUSTERED documents write gives every parquet
  * file full-range doc_id min/max stats — the serving candidate fetch's
  * pushed `In(doc_id, …)` ([[graft.search.ServeSearch]], job 3) then reads
  * the ENTIRE corpus per request, exactly the per-request full scan the
  * layout exists to prevent. [[IndexData.write]] now range-clusters + sorts
  * documents by doc_id (the same pattern the postings layout uses for
  * term), so the fetch touches only the row groups holding its candidate
  * ids. Like SessionConfSpec, this asserts the thing that matters — ROWS
  * READ off parquet, via task input metrics — because the plan string
  * cannot show row-group pruning. */
class DocFetchPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 8192
  // content-addressed-like ids: md5 hex — uniform over the id space, the
  // exact distribution that defeats zonemaps on an unclustered layout
  private def idOf(i: Int): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private lazy val docs = {
    (0 until N).map { i =>
      (idOf(i), s"docs/d$i", "", 1, 1, s"word$i content", Seq(s"word$i", "content"))
    }.toDF("doc_id", "file_path", "header_path", "line_start", "line_end",
      "content", "tokens")
  }

  /** The production write path (clustered by default), built with enough
    * range partitions that pruning is observable at this corpus size. */
  private lazy val clusteredDir: String = {
    val d = java.nio.file.Files.createTempDirectory("fetchprune-c").toString
    val wasP = spark.conf.get("spark.sql.shuffle.partitions")
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val wasC = spark.conf.get(coalesceKey)
    try {
      // AQE coalesces the range shuffle toward its 64 MB advisory size —
      // ONE file for this tiny fixture (and well-sized many-file layouts at
      // real corpus sizes, where files ≈ corpus/64 MB ≫ candidate k). Pin
      // the partition count here so the multi-file pruning property is
      // observable at test scale.
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      spark.conf.set(coalesceKey, "false")
      IndexData.write(docs, Seq(Setting("embedding_model", "none")).toDF(), d)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", wasP)
      spark.conf.set(coalesceKey, wasC)
    }
    d
  }

  /** The pre-round-14 layout: documents written as produced (random ids in
    * every file), same file count as the clustered fixture. */
  private lazy val unclusteredDir: String = {
    val d = java.nio.file.Files.createTempDirectory("fetchprune-u").toString
    docs.repartition(64).write.mode("overwrite").parquet(s"$d/documents")
    d
  }

  /** Rows actually read off parquet (post row-group pruning) for a k-id
    * candidate fetch in the serving shape. */
  private def rowsRead(dir: String, ids: Seq[String]): Long = {
    // expectNonZero: the clustered bound is `read ≤ N/8` — vacuous at a
    // slow-bus 0 (round-15 ADVICE)
    val (n, read) = graft.util.InputMetrics.rowsRead(spark, expectNonZero = true) {
      spark.read.parquet(s"$dir/documents")
        .filter(col("doc_id").isin(ids: _*))
        .select("doc_id", "file_path", "content")
        .collect().length
    }
    assert(n == ids.size) // both layouts agree on the ANSWER
    assert(read > 0, "rows-read pin needs a real read-out, got 0")
    read
  }

  private val probeIds = Seq(3, 1111, 4096, 6000, 8191).map(idOf)

  test("doc_id-clustered documents prune the serving fetch to the candidate " +
      "row groups; the unclustered layout reads the whole corpus") {
    val clustered = rowsRead(clusteredDir, probeIds)
    val unclustered = rowsRead(unclusteredDir, probeIds)
    // 5 ids over 64 range files of ~128 rows: ≤5 files' row groups
    assert(clustered <= N / 8,
      s"clustered fetch read $clustered of $N rows — layout not pruning")
    // the old layout cannot prune uniform-random ids
    assert(unclustered >= (N * 0.9).toLong,
      s"unclustered control read only $unclustered of $N rows — fixture no " +
        "longer models the pre-clustering layout")
    assert(clustered * 3 <= unclustered,
      s"clustered=$clustered unclustered=$unclustered — expected ≥3× fewer rows")
  }

  test("fetch In(doc_id) pushes through the segmented live view's union " +
      "into base AND segment scans") {
    // after an append-merge the documents live view is base ∪ segment with
    // a broadcast tombstone mask — the serving fetch's doc_id IN-list must
    // push below the mask join into EVERY parquet scan, or segment (or
    // base) reads stay unpruned per request
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("fetchprune-seg").toString
    def doc(id: String) =
      (id, s"docs/$id", "", 1, 1, s"content $id", Seq("content", id))
    val base = Seq(doc("a1"), doc("b2"), doc("c3"))
      .toDF("doc_id", "file_path", "header_path", "line_start", "line_end",
        "content", "tokens")
    val settings = Seq(graft.core.Schemas.Setting("embedding_model", "none")).toDF()
    IndexData.write(base, settings, d)
    val delta = Seq(doc("d4"))
      .toDF("doc_id", "file_path", "header_path", "line_start", "line_end",
        "content", "tokens")
    graft.index.IndexJob.appendMerge(spark, delta, settings, d)
    val live = IndexData.load(spark, d)
    assert(live.pendingSegments == 1)
    val fetch = live.documents
      .filter(col("doc_id").isin("a1", "d4"))
      .select("doc_id", "file_path", "content")
    val plan = fetch.queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[[^\\]]*".r.findAllIn(plan).toSeq
      .filter(_.contains("In(doc_id"))
    assert(pushed.size >= 2,
      s"expected the In(doc_id) push on base AND segment documents scans, " +
        s"got ${pushed.size}:\n${plan.take(2000)}")
    // and the masked union still answers correctly across generations
    assert(fetch.collect().map(_.getString(0)).sorted.toSeq == Seq("a1", "d4"))
  }

  test("clustered write preserves the corpus: same rows, doc_id-sorted files " +
      "with disjoint ranges") {
    val onDisk = spark.read.parquet(s"$clusteredDir/documents")
    assert(onDisk.count() == N)
    // per-file min/max doc_id ranges must be pairwise disjoint — the file-
    // level pruning unit at real scale, where files ≫ candidate ids
    val ranges = onDisk
      .select(input_file_name().as("f"), col("doc_id"))
      .groupBy("f").agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => (r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(ranges.length > 1) // the 64-partition fixture actually split
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping file ranges: $hi1 > $lo2")
      case _ =>
    }
  }
}
