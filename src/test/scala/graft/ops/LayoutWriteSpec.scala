package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The clustered-write path built on the oracle-checked curve keys
  * (q_zorder_layout / q_hilbert_layout): per-file key ranges must be
  * DISJOINT (that's what range partitioning buys — file pruning by
  * row-group stats) and the clustering must be pure layout: same rows,
  * same schema, same query results. */
class LayoutWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Per written parquet file: recompute the curve key and return its
    * [min, max] range (the key is a pure function of the row, so it can be
    * recomputed from the written data — the written schema stays clean). */
  private def fileRanges(dir: String, method: String, x: String, y: String): Seq[(Long, Long)] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.length > 0)
      .map(_.getAbsolutePath).toSeq
    files.flatMap { f =>
      val keyed = Layout.withKey(spark.read.parquet(f), method, x, y)
      val r = keyed.agg(min("_layout_key"), max("_layout_key")).head()
      if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
    }
  }

  private def assertDisjoint(ranges: Seq[(Long, Long)]): Unit = {
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"overlapping file key ranges: $sorted")
      case _ => ()
    }
  }

  test("zorder key matches the by-hand Morton interleave") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L))
      .toDF("x", "y")
      .withColumn("z", Layout.zorderKey(col("x"), col("y")))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    def morton(x: Long, y: Long): Long = (0 until 8).map { b =>
      (((x >> b) & 1) << (2 * b + 1)) | (((y >> b) & 1) << (2 * b))
    }.sum
    rows.foreach { case ((x, y), z) => assert(z == morton(x, y), s"($x,$y)") }
  }

  test("clustered write: disjoint per-file ranges, identical row multiset (hilbert)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-layout").toString
    Layout.cluster(docs, "hilbert", "doc_id", "text", numFiles = 6)
      .write.mode("overwrite").parquet(out)

    val ranges = fileRanges(out, "hilbert", "doc_id", "text")
    assert(ranges.length > 1, s"want multiple files, got $ranges")
    assertDisjoint(ranges)

    // pure layout: schema and row multiset unchanged
    val back = spark.read.parquet(out)
    assert(back.schema.fieldNames.sorted.toSeq == docs.schema.fieldNames.sorted.toSeq)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("index artifact --layout: clustered documents, search results unchanged") {
    val docsDir = java.nio.file.Files.createTempDirectory("graft-layout-docs")
    (0 until 8).foreach { i =>
      java.nio.file.Files.writeString(docsDir.resolve(s"f$i.md"),
        s"# Doc $i\n\nspark merge join content number $i\n" + ("filler line\n" * (i + 1)))
    }
    def build(layout: String): (String, graft.index.IndexData) = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-idx-$layout").toString
      val idx = graft.index.IndexJob.run(spark, Seq(docsDir.toString), dir,
        new graft.embed.HashingEmbedder(16),
        opts = graft.index.IndexJob.Options(layout = layout, layoutFiles = 3))
      (dir, idx)
    }
    val (plainDir, _) = build("none")
    val (clusDir, _) = build("zorder")
    assertDisjoint(fileRanges(s"$clusDir/documents", "zorder", "file_path", "line_start"))
    def hits(dir: String) = graft.search.HybridSearch.search(
      graft.index.IndexData.load(spark, dir), "spark merge",
      embedder = Some(new graft.embed.HashingEmbedder(16)),
      opts = graft.search.HybridSearch.Options(k = 5, rerank = false))
      .select("doc_id", "score").collect().toSeq
    assert(hits(clusDir) == hits(plainDir)) // layout never changes answers
  }
}
