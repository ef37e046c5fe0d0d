package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Streaming-safe benchmark decontamination: the per-doc screening kernel
  * of `q_decontaminate` / `q_decontaminate_bloom`, restructured so it runs
  * under `readStream` unchanged.
  *
  * The batch queries join exploded shingles against the benchmark set —
  * correct, but a per-doc AGGREGATION, which a stream cannot run without
  * state. Here the benchmark side is FROZEN up front (the realistic
  * deployment: eval suites change rarely, the corpus streams daily) into a
  * bloom + exact set pair, and each arriving doc is screened by one
  * per-row pass over its own shingles — a stateless projection, no
  * shuffle, no state store, identical rows whether the corpus comes from
  * `read` or `readStream` (CurationStreamSpec pins streamed ≡ batch).
  *
  * Two-tier membership mirrors `q_decontaminate_bloom`: the ~10 bits/key
  * bloom rejects the overwhelming majority of shingles, the exact set
  * confirms the survivors (bloom has no false negatives, so the result is
  * exact). Both ride the closure as broadcast-sized artifacts of the
  * BENCHMARK — never of the corpus.
  */
object Decontam {

  /** Benchmark shingle set + bloom, built once from the eval-suite docs
    * ((doc_id, tokens); only docs with ≥3 tokens shingle). Collected to the
    * driver — benchmark-sized by definition, not corpus-sized. */
  def benchSet(benchDocs: DataFrame): (BloomFilter, Set[String]) = {
    val rows = benchDocs.filter(size(col("tokens")) >= 3)
      .select(explode(array_distinct(Dedup.shingles(col("tokens")))).as("sh"))
      .distinct()
      .collect().map(_.getString(0))
    val bloom = BloomFilter.create(math.max(rows.length.toLong, 1L), 0.01)
    rows.foreach(bloom.putString)
    (bloom, rows.toSet)
  }

  /** Screen (doc_id, tokens) rows against a frozen benchmark: per-doc
    * shingle count, contaminated count, contamination fraction — the
    * `q_decontaminate` row shape from a stateless per-row kernel. The
    * shingle ARRAY comes from the shared [[Dedup.shingles]] column
    * expression (one semantics for batch, stream and oracle); only the
    * membership count is a closure UDF over the broadcast pair. */
  def screen(tokenized: DataFrame, bloom: BloomFilter,
      bench: Set[String]): DataFrame = {
    val spark = tokenized.sparkSession
    val bloomB = spark.sparkContext.broadcast(bloom)
    val benchB = spark.sparkContext.broadcast(bench)
    val nHits = udf((shs: Seq[String]) =>
      if (shs == null) 0L
      else shs.count(s =>
        s != null && bloomB.value.mightContainString(s) && benchB.value.contains(s)).toLong)
    tokenized.filter(size(col("tokens")) >= 3)
      .withColumn("_shs", array_distinct(Dedup.shingles(col("tokens"))))
      .select(col("doc_id"),
        size(col("_shs")).cast("long").as("n_shingles"),
        nHits(col("_shs")).as("n_contaminated"))
      .withColumn("contamination",
        round(col("n_contaminated").cast("double") / col("n_shingles").cast("double"), 6))
  }
}
