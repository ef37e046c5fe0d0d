package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.{AnnIndex, PqIndex}

/** Decade audit for the `pq:auto` recall-curve measurement (round-19
  * directive #1): fit PQ codebooks over each given embeddings table, time
  * the fit-time curve measurement ([[PqIndex.recallCurve]] — the price a
  * `--pq-codes` build pays once), and report the curve plus the shortlist
  * `--ann pq:auto` would resolve at the 0.9 target.
  *
  * The claim under audit: the curve measurement is SAMPLE-BOUNDED — 8
  * exact TakeOrdered passes + 8 map-only adist scans regardless of corpus
  * size — so its wall grows linearly with the corpus (the scans) and
  * never quadratically, and the resolved shortlist is an honest function
  * of the corpus's own compressibility, not a hand-picked constant.
  *
  * Usage: runMain graft.tools.PqAutoProbe /root/testdata/sf0.1 /tmp/sf1g /tmp/sf10g
  */
object PqAutoProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1g", "/tmp/sf10g")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    dirs.foreach { d =>
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
        .select(col("vec_id").cast("string").as("doc_id"), col("embedding"))
        .localCheckpoint(true)
      val n = emb.count()
      val t0 = System.nanoTime()
      val books = PqIndex.fit(emb, "doc_id", "embedding", k = 16, iters = 3)
        .localCheckpoint(true)
      val codes = PqIndex.encode(emb, "doc_id", "embedding", books)
        .localCheckpoint(true)
      val tFit = (System.nanoTime() - t0) / 1e9
      val pq = PqIndex(books, codes)
      val t1 = System.nanoTime()
      val curve = PqIndex.recallCurve(pq, emb, "doc_id", "embedding")
      val tCurve = (System.nanoTime() - t1) / 1e9
      val resolved = curve.find(_._2 >= 0.9).orElse(curve.lastOption)
        .map(_._1).getOrElse(-1)
      println(f"""{"dir":"$d","n_vectors":$n,"fit_s":$tFit%.2f,""" +
        f""""curve_s":$tCurve%.2f,"resolved_shortlist":$resolved,""" +
        s""""resolved_frac":${"%.4f".formatLocal(java.util.Locale.ROOT,
          resolved.toDouble / n)},""" +
        s""""curve":"${AnnIndex.encodeCurve(curve)}"}""")
      emb.unpersist(false); books.unpersist(false); codes.unpersist(false)
    }
    spark.stop()
  }
}
