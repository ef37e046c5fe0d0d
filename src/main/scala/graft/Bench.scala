package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every declared query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  *
  * Queries are materialized through the `noop` sink — `count()` would let
  * Catalyst prune the computed columns and benchmark only the scan.
  */
object Bench {
  private def jsonStr(s: String): String = graft.util.Json.str(s)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    // ERROR, not WARN: the consumer of our stdout keeps only a ~2KB tail,
    // and benign per-query WARNs (e.g. WindowExec on the ≤2k-row fused
    // candidate frames) flood that window and push the summary JSON line
    // out of it (r07/r08: `parsed: null` in the driver artifact)
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftStrategies.install(spark)

    // JVM/codegen warmup: one full pass of EVERY query at the smallest scale
    // factor, so each measured plan has already paid its one-time
    // codegen-compile + JIT cost (a single-query warmup left every other
    // plan's first timed iteration carrying it — on this jittery host that
    // produced 20× phantom outliers in round 1).
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () } // failures surface in the timed loop
    }

    // Two timed iterations per query, report the min — but INTERLEAVED as two
    // separated full passes (all queries once, then all queries again) rather
    // than back-to-back per query. The host VM's CPU availability comes and
    // goes in multi-minute windows; back-to-back iterations land both samples
    // of a query inside the same contention window (round 3: the first half
    // of the alphabetical run order read 20-80s for queries whose steady
    // state is <2s). Two passes minutes apart make correlated contention of
    // both samples far less likely, at identical total work.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    def timedPass(): Map[String, Double] = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val t = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0 // no successful run this pass
      }
      name -> t
    }.toMap
    val pass1 = timedPass()
    val pass2 = timedPass()
    // min over SUCCESSFUL runs; -1 marks a query with no successful run
    // (elapsed-until-exception would read as a plausible timing)
    val results = ordered.map { case (name, _) =>
      val ts = Seq(pass1(name), pass2(name)).filter(_ >= 0)
      name -> ts.minOption.getOrElse(-1.0)
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)

    // Full per-query timings go to a FILE: the harness that reads our stdout
    // keeps only a ~2KB tail, and the full 80-query map alone exceeds that —
    // in rounds 1 and 2 the one-line JSON was truncated mid-line and never
    // parsed. stdout gets a compact headline subset that always fits.
    //
    // A query with NO successful run is recorded as JSON null (not a
    // sentinel a naive sum would absorb), "value" explicitly covers
    // completed queries only, and "failed" carries the count + names — so
    // cross-round total comparisons can detect differing failure sets
    // instead of misreading a shrunken green total as a speedup (the round-8
    // lesson, per ADVICE.md).
    def tJson(v: Double): String = if (v < 0) "null" else f"$v%.3f"
    val allJson = results.map { case (k, v) => "\"" + k + "\":" + tJson(v) }
      .mkString("{", ",", "}")
    val failedNames = results.collect { case (k, v) if v < 0 => jsonStr(k) }
      .mkString("[", ",", "]")
    val detailsPath = java.nio.file.Paths.get("bench_details.json")
    java.nio.file.Files.write(detailsPath,
      (f"""{"metric":"total_completed","value":$total%.3f,"unit":"sec",""" +
        s""""n_queries":${results.size},"failed":$failed,"failed_names":$failedNames,""" +
        f""""queries":$allJson,"sf":${jsonStr(sfDir)}}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))

    val headlineSet = Headline.filter(results.toMap.contains)
    val head = results.filter(r => headlineSet.contains(r._1))
      .map { case (k, v) => "\"" + k + "\":" + tJson(v) }
      .mkString("{", ",", "}")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$head,""" +
      s""""n_queries":${results.size},"failed":$failed,"failed_names":$failedNames,""" +
      s""""queries_all":${jsonStr(detailsPath.toAbsolutePath.toString)},"sf":${jsonStr(sfDir)}}""")
    spark.stop()
  }

  /** Representative subset printed on stdout — one per engine area (search,
    * vectors, dedup, curation, analytics, streaming, text, multimodal) so
    * the one-line summary stays a complete cross-section while fitting the
    * consumer's 2KB tail window. Everything runs and everything lands in
    * bench_details.json; only the printed map is subset. */
  private val Headline: Seq[String] = Seq(
    "q_agg_pricing_summary", "q_asof_join", "q_batch_search", "q_events_time_slice",
    "q_decontaminate", "q_dedup_components", "q_dedup_embed_lsh_knn",
    "q_dedup_exact", "q_dedup_minhash_pairs", "q_f4_bm25_topk",
    "q_embed_pq", "q_mm_frame_sample", "q_o1_topk_desc", "q_pack_sequences",
    "q_percentile_median", "q_search_e2e_ann", "q_search_e2e_norerank", "q_sessionize",
    "q_sim_knn_join", "q_sim_pq_adc", "q_skew_salted_agg",
    "q_stream_tumbling_hourly", "q_t2_chunker", "q_text_bigram_logprob",
    "q_text_quality",
    "q_topn_per_group", "q_u1_candidate_union", "q_v2_knn",
    "q_w1_running_sum")
}
