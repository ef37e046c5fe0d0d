package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decade grow-audit of the STREAMING near-dup path (round-12 directive):
  * the batch dedup families carry sf1/sf10 evidence, but
  * [[graft.streaming.NearDupStream]] had only sf0.01 specs — this tool runs
  * the real micro-batched stream (file source, `maxFilesPerTrigger`) over
  * sf0.1 and the 10× grown corpus in BOTH hash domains and reports wall,
  * emitted pairs, saturated-bucket sentinels, and live state rows, closing
  * the loop on the round-11 `portable` knob: the portable oracle-parity
  * hash crowds buckets as the corpus grows (saturation sentinels, capped
  * recall), the xxhash64 production hash keeps pair growth ~linear.
  *
  * Pair counts aggregate inside `foreachBatch` (driver holds one long per
  * metric) — a memory sink would collect the multi-million portable-domain
  * pair stream onto the driver, which is exactly the failure mode the audit
  * exists to expose.
  *
  *   SPARK_GRAFT_STREAM_DIRS=/root/testdata/sf0.1,/tmp/sf1g \
  *     sbt "runMain graft.tools.NearDupStreamProbe"
  */
object NearDupStreamProbe {

  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_STREAM_DIRS",
      "/root/testdata/sf0.1,/tmp/sf1g").split(",").toSeq.map(_.trim)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docsSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)))

    dirs.foreach { dir =>
      // stage the corpus as 8 files so maxFilesPerTrigger=2 drives 4 real
      // micro-batches (state accumulates across batches, as in production)
      val staged = java.nio.file.Files.createTempDirectory("ndstream").toString
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      docs.repartition(8).write.mode("overwrite").parquet(staged)
      val nDocs = docs.count()

      Seq(true, false).foreach { portable =>
        val ckpt = java.nio.file.Files.createTempDirectory("ndstream-ck").toString
        var pairs = 0L
        var sentinels = 0L
        val stream = spark.readStream.schema(docsSchema)
          .option("maxFilesPerTrigger", "2").parquet(staged)
          .select(col("doc_id"), split(col("text"), " ").as("tokens"))
          .filter(size(col("tokens")) >= 3)
        val t0 = System.nanoTime()
        val q = graft.streaming.NearDupStream
          .candidates(stream, "tokens",
            maxPerBucket = graft.ops.Dedup.MaxPerBucket, portable = portable)
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              graft.streaming.NearDupStream.DupCandidate], _: Long) =>
            val counts = batch.agg(
              sum(when(col("dup_of") >= 0, 1L).otherwise(0L)),
              sum(when(col("dup_of") === -1L, 1L).otherwise(0L))).collect()(0)
            pairs += Option(counts.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
            sentinels += Option(counts.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
          }
          .start()
        q.processAllAvailable()
        val wall = (System.nanoTime() - t0) / 1e9
        val stateRows = q.lastProgress.stateOperators.headOption
          .map(_.numRowsTotal).getOrElse(-1L)
        q.stop()
        println(f"[ndstream] dir=$dir%-22s docs=$nDocs%8d " +
          f"domain=${if (portable) "portable" else "production"}%-10s " +
          f"wall=$wall%7.1fs pairs=$pairs%9d sentinels=$sentinels%6d " +
          f"state_buckets=$stateRows%8d")
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staged))
    }
    spark.stop()
  }
}
