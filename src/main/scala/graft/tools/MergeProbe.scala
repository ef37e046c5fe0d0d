package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analyze.DefaultAnalyzer
import graft.core.Schemas.Chunk
import graft.embed.HashingEmbedder
import graft.index.{AnnIndex, IndexData, IndexJob}

/** Merge-cost probe: the measured evidence behind the `--merge append`
  * O(delta) claim. For a fixed 200-doc delta against bases of growing size,
  * time (a) an append merge (segment write + frozen-model sidecar delta)
  * vs (b) a rewrite merge (full base rewrite + full sidecar re-derive).
  * Rewrite cost must grow with the base; append cost must stay ~flat —
  * that flatness is the LSM bargain a 100 TB corpus with a 1 GB daily
  * delta lives on.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.MergeProbe 2 8 16"
  *
  * Args = replica factors over the sf documents table (default 2 8 16).
  * Prints one JSON line per base size.
  */
object MergeProbe {

  private val Dim = 64

  /** Testdata documents table → chunk-shaped rows with `replicas` distinct
    * paths per source doc (new content volume, same distribution). */
  private def synthDocs(spark: SparkSession, sfDir: String,
      replicas: Int, tag: String, take: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    val embedder = new HashingEmbedder(dim = Dim)
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string").as("did"), col("text"))
      .limit(take)
    val chunks = base
      .crossJoin(spark.range(replicas.toLong).select(col("id").as("rep")))
      .select(concat(lit(tag), col("did"), lit("_"), col("rep"), lit(".md")).as("path"),
        col("text"))
      .as[(String, String)]
      .map { case (path, text) =>
        Chunk(path, "", 1, 1, text, DefaultAnalyzer.tokenize(text)) }
    IndexJob.embedChunks(chunks, embedder, IndexJob.Options())
  }

  private def buildBase(spark: SparkSession, sfDir: String, replicas: Int,
      dir: String): Long = {
    val docs = synthDocs(spark, sfDir, replicas, "base_")
    val settings = IndexJob.settingsOf(spark, s"hashing-bow-$Dim", Dim)
    val written = IndexData.write(docs, settings, dir)
    AnnIndex.buildAndWrite(written.documents, "doc_id", "embedding", dir,
      k = 16, iters = 2)
    written.documents.count()
  }

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** Read-amplification probe (`MergeProbe readamp [nSegs]`): the cost the
    * live view pays per pending segment — time one full BM25-stats read
    * (postings + termdf + doclen + stats counts, the search path's input)
    * at 0, nSegs/2 and nSegs pending segments, then after compaction.
    * This is the number `--compact-every` exists to bound. */
  private def readAmp(spark: SparkSession, sfDir: String, nSegs: Int): Unit = {
    val settings = IndexJob.settingsOf(spark, s"hashing-bow-$Dim", Dim)
    val root = java.nio.file.Files.createTempDirectory("mergeprobe-ra").toString
    val dir = s"$root/idx"
    buildBase(spark, sfDir, 8, dir)
    def readSec(): Double = timed {
      val ix = IndexData.load(spark, dir)
      ix.postings.count(); ix.termdf.count(); ix.doclen.count(); ix.stats.count()
    }
    println(f"""{"pending_segments":0,"stats_read_sec":${readSec()}%.2f}""")
    (1 to nSegs).foreach { i =>
      val delta = synthDocs(spark, sfDir, 1, s"ra${i}_", take = 50).localCheckpoint(true)
      IndexJob.appendMerge(spark, delta, settings, dir)
      if (i == nSegs / 2 || i == nSegs)
        println(f"""{"pending_segments":$i,"stats_read_sec":${readSec()}%.2f}""")
    }
    IndexJob.compact(spark, dir)
    println(f"""{"pending_segments":0,"compacted":true,"stats_read_sec":${readSec()}%.2f}""")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (args.headOption.contains("readamp")) {
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      readAmp(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(8))
      spark.stop()
      return
    }
    val replicas = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(2, 8, 16)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val settings = IndexJob.settingsOf(spark, s"hashing-bow-$Dim", Dim)
    // fixed delta: 200 new-path docs, materialized once so neither mode
    // pays the synth lineage inside its timed window
    val delta = synthDocs(spark, sfDir, 1, "delta_", take = 200)
      .localCheckpoint(true)
    replicas.foreach { r =>
      val root = java.nio.file.Files.createTempDirectory(s"mergeprobe-$r").toString
      val nBase = buildBase(spark, sfDir, r, s"$root/append")
      buildBase(spark, sfDir, r, s"$root/rewrite")
      val appendSec = timed {
        IndexJob.appendMerge(spark, delta, settings, s"$root/append")
          .stats.count()
      }
      val rewriteSec = timed {
        IndexJob.mergeAndWrite(spark, delta, settings, s"$root/rewrite",
          clear = false).stats.count()
      }
      println(f"""{"base_docs":$nBase,"delta_docs":200,"append_sec":$appendSec%.2f,"rewrite_sec":$rewriteSec%.2f}""")
    }
    spark.stop()
  }
}
