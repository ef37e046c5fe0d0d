package graft.search

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.analyze.WhitespaceAnalyzer
import graft.core.Schemas.Setting
import graft.index.IndexData

/** Fat-batch candidate-fetch ROUTING pin (round-14 verdict Next #5): a
  * batch's candidate set quickly exceeds any pushed-In width the serving
  * fetch could prune (FetchProbe: a k=500 In-fetch touches 84.9% of a
  * 5M-doc corpus's row groups — and the In degrades to a range filter past
  * the threshold anyway), so the DESIGN answer is that BatchSearch fetches
  * via ONE broadcast join: candidates (bounded at |queries| × (2k +
  * shortlist) rows by construction) broadcast, documents STREAMED in a
  * single pass for the whole batch. This was prose in PLANS.md; these pin
  * it as plan shape + rows-read.
  *
  * The broadcast hint is load-bearing at scale: the checkpointed candidate
  * frame carries no size stats, so without it the planner falls back to a
  * sort-merge join that SHUFFLES the corpus-sized documents table — the
  * spec runs with the auto-broadcast threshold DISABLED to simulate
  * exactly the regime where documents is too big to broadcast (at spec
  * scale it would otherwise slip under the static threshold and mask the
  * routing).
  */
class FatBatchFetchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val (idx, dir) = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("string").as("doc_id"), col("text").as("content"),
        split(col("text"), " ").as("tokens"))
      .withColumn("embedding", lit(null).cast("array<float>"))
      .withColumn("file_path", concat(lit("docs/"), col("doc_id")))
      .withColumn("header_path", lit(""))
      .withColumn("line_start", lit(1)).withColumn("line_end", lit(1))
    val d = java.nio.file.Files.createTempDirectory("fatbatch").toString
    IndexData.write(docs, Seq(Setting("embedding_model", "test")).toDF(), d)
    (IndexData.load(spark, d), d)
  }

  private lazy val vocab = idx.termdf.orderBy(desc("df"), asc("term"))
    .limit(40).select("term").as[String].collect()

  private def queries(n: Int): Seq[(String, String)] = {
    val v = vocab.length
    (0 until n).map(i =>
      s"q$i" -> Seq(vocab(i % v), vocab((i + 7) % v), vocab((i + 13) % v)).mkString(" "))
  }

  private def batch(n: Int) = BatchSearch.searchBatchReranked(
    idx, queries(n), new graft.rerank.TokenOverlapReranker(),
    analyzer = WhitespaceAnalyzer)

  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      p +: walk(r.child)
    case _ => p +: p.children.flatMap(walk)
  }

  test("the candidate fetch plans a broadcast join streaming the documents " +
      "scan — even when documents is past the broadcast threshold") {
    val thrWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      // -1 disables auto-broadcast: the regime where the corpus-sized side
      // can never broadcast, so only the explicit candidate-side hint keeps
      // the fetch off the corpus-shuffling sort-merge path. AQE off for a
      // statically inspectable plan.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = batch(4)
      val nodes = walk(df.queryExecution.executedPlan)
      def docScans(p: SparkPlan): Seq[FileSourceScanExec] =
        walk(p).collect {
          case s: FileSourceScanExec
              if s.relation.location.rootPaths.exists(_.toString.endsWith("/documents")) => s
        }
      // the fetch join: a BroadcastHashJoin with the documents scan on the
      // STREAMED side (build side = the bounded candidate set)
      val fetchJoins = nodes.collect {
        case j: BroadcastHashJoinExec if docScans(j).nonEmpty => j
      }
      assert(fetchJoins.nonEmpty, "no broadcast fetch join over documents:\n" +
        df.queryExecution.executedPlan.toString.take(4000))
      fetchJoins.foreach { j =>
        val streamed = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.right
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.left
        }
        assert(docScans(streamed).nonEmpty,
          s"documents must be on the STREAMED side, got buildSide=${j.buildSide}:\n$j")
      }
      // and that streamed scan is a plain column-pruned pass — no pushed
      // In(doc_id) (the serving-shape filter that stops pruning at fat
      // widths), no corpus shuffle anywhere under the fetch join
      nodes.collect {
        case s: FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.endsWith("/documents")) => s
      }.foreach { s =>
        val pushed = s.metadata.getOrElse("PushedFilters", "[]")
        assert(!pushed.contains("In(doc_id"), s"pushed In on the batch fetch: $pushed")
      }
      val results = df.collect()
      assert(results.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thrWas)
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
    }
  }

  test("rows read off storage are FLAT in the query count — one corpus " +
      "pass per batch, not one per query") {
    def reads(n: Int): (Int, Long) = {
      // expectNonZero: `r20 ≤ 2·r2` is vacuous if the listener bus hands
      // back 0 for both (round-15 ADVICE)
      val (c, r) = graft.util.InputMetrics.rowsRead(spark,
        expectNonZero = true)(batch(n).collect().length)
      (c, r)
    }
    val (c2, r2) = reads(2)
    val (c20, r20) = reads(20)
    assert(c2 > 0 && c20 > 0)
    assert(r2 > 0, "rows-read pin needs a real read-out, got 0")
    // 10× the queries must not approach 10× the reads: the corpus-sized
    // tables are scanned once per batch (the small per-query extras are
    // candidate/termdf rows, far under one corpus pass)
    assert(r20 <= 2 * r2, s"rowsRead grew with query count: 2q=$r2 20q=$r20")
  }
}
