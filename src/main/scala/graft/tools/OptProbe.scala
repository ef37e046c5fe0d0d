package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-21 scratch instrumentation: volumes and stage timings of the
  * LSH pair-verify family, so the optimization notes carry measured
  * numbers (candidate-pair counts, per-stage seconds) rather than guesses.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // `spread` mode sweeps this to emulate the multi-split regime a real
      // corpus presents (many row groups / files ≥ cores) on the one-file
      // fixture; every other mode keeps the bench default
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_SPLIT_BYTES", "134217728"))
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("GRAFT_CODEGEN_CACHE", "100"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftStrategies.install(spark)

    // mode: `spread` — measure, don't argue, Q.spreadScan's at-scale
    // behavior (round-21 verdict item #5): print whether the spread is the
    // IDENTITY under the current split geometry, then time the opt-in
    // spread winners. Run once with the default 128 MiB splits (fixture:
    // 1 split < cores → spread fires) and once with
    // GRAFT_MAX_SPLIT_BYTES=1048576 (splits ≥ cores — the real-corpus
    // regime → spreadScan must return its input unchanged and the shapes
    // must hold their times through natural scan parallelism).
    if (args.headOption.contains("spread")) {
      val docsPath = s"$sfDir/documents.parquet"
      val raw = spark.read.parquet(docsPath)
      val spread = graft.queries.Q.spreadScan(spark, raw, docsPath)
      val hp = new org.apache.hadoop.fs.Path(docsPath)
      val bytes = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(hp).getLength
      println(s"[spread] docBytes=$bytes " +
        s"maxSplit=${spark.sessionState.conf.filesMaxPartitionBytes} " +
        s"cores=${spark.sparkContext.defaultParallelism} " +
        s"scanPartitions=${raw.rdd.getNumPartitions} " +
        s"afterSpread=${spread.rdd.getNumPartitions} " +
        s"identity=${spread eq raw}")
      def noopS(df: DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      for (i <- 1 to 3; n <- Seq("q_quality_gate", "q_text_repetition",
          "q_dedup_excise_spans", "q_dedup_minhash_pairs")) {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val t0 = System.nanoTime(); noopS(df)
        println(f"[spread] run$i $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      spark.stop()
      return
    }

    // mode: `final <query>` — run the declared query once and print the
    // FINAL adaptive plan (post-execution), to see what AQE actually ran
    if (args.headOption.contains("final")) {
      for (n <- args.drop(1)) {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"===== $n (${(System.nanoTime() - t0) / 1e9}%.2f s) =====")
        // the noop write runs its OWN QueryExecution; to see the FINAL
        // adaptive plan (ReusedExchange/QueryStage structure) execute the
        // dataset's own QE via collect (results are small by contract)
        df.collect()
        println(df.queryExecution.executedPlan.toString.take(
          sys.env.getOrElse("GRAFT_PLAN_CHARS", "8000").toInt))
      }
      spark.stop()
      return
    }

    // mode: `ab` — same-session head-to-head: OLD (round-20) vs NEW
    // (round-21) formulation of q_dedup_minhash_pairs, alternating runs
    if (args.headOption.contains("ab")) {
      import graft.ops.Dedup
      val tok0 = graft.queries.Q.docsTokens(spark, sfDir)
      def bandsOf(): DataFrame = Dedup.capBuckets(
        Dedup.withMinhashSignature(
          tok0.filter(size(col("tokens")) >= 3), "tokens")
          .select(col("doc_id"), explode(array(
            struct(lit(0).as("band"), col("band0").as("bucket")),
            struct(lit(1).as("band"), col("band1").as("bucket")))).as("bb"))
          .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket")),
        "doc_id", Seq("band", "bucket"))
      val bands = bandsOf()
      val oldPairs = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val shingleSets = tok0.filter(size(col("tokens")) >= 3)
        .select(col("doc_id"), array_distinct(Dedup.shingles(col("tokens"))).as("ds"))
      def verify(pairs: DataFrame): DataFrame = Dedup.spreadForKernel(pairs
          .join(shingleSets.select(col("doc_id").as("doc_a"), col("ds").as("dsa")), Seq("doc_a"))
          .join(shingleSets.select(col("doc_id").as("doc_b"), col("ds").as("dsb")), Seq("doc_b")))
        .select(col("doc_a"), col("doc_b"),
          round(Dedup.jaccard(col("dsa"), col("dsb")), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")
      val oldQ = verify(oldPairs)
      val newQ = verify(Dedup.inBucketPairs(bands, "doc_id", Seq("band", "bucket")))
      def noop3(df: DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      def verifyNoSpread(pairs: DataFrame): DataFrame = pairs
        .join(shingleSets.select(col("doc_id").as("doc_a"), col("ds").as("dsa")), Seq("doc_a"))
        .join(shingleSets.select(col("doc_id").as("doc_b"), col("ds").as("dsb")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          round(Dedup.jaccard(col("dsa"), col("dsb")), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")
      def verifyPreSpread(pairs: DataFrame): DataFrame =
        verifyNoSpread(Dedup.spreadForKernel(pairs))
      val variants = Seq(
        "v1 oldPairs attach->spread" -> oldQ,
        "v2 oldPairs spread->attach" -> verifyPreSpread(oldPairs),
        "v3 oldPairs no spread     " -> verifyNoSpread(oldPairs),
        "v4 newPairs attach->spread" -> newQ,
        "v5 newPairs no spread     " -> verifyNoSpread(
          Dedup.inBucketPairs(bands, "doc_id", Seq("band", "bucket"))))
      for (i <- 1 to 3; (lbl, q) <- variants) {
        val t0 = System.nanoTime(); noop3(q)
        println(f"[ab] run$i $lbl ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      spark.stop()
      return
    }

    // mode: `pairs` — old self-join vs new in-bucket-array pair stages
    if (args.headOption.contains("pairs")) {
      import graft.ops.Dedup
      val tok0 = graft.queries.Q.docsTokens(spark, sfDir)
      val sig = Dedup.withMinhashSignature(
        tok0.filter(size(col("tokens")) >= 3), "tokens")
      val bands = Dedup.capBuckets(
        sig.select(col("doc_id"), explode(array(
          struct(lit(0).as("band"), col("band0").as("bucket")),
          struct(lit(1).as("band"), col("band1").as("bucket")))).as("bb"))
          .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket")),
        "doc_id", Seq("band", "bucket"))
      def noop2(df: DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      val oldPairs = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val newPairs = Dedup.inBucketPairs(bands, "doc_id", Seq("band", "bucket"))
      for (i <- 1 to 3) {
        val t0 = System.nanoTime(); noop2(oldPairs)
        val t1 = System.nanoTime(); noop2(newPairs)
        val t2 = System.nanoTime()
        println(f"[pairs] run$i old=${(t1 - t0) / 1e9}%.2f new=${(t2 - t1) / 1e9}%.2f")
      }
      spark.stop()
      return
    }

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[opt-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val tok = graft.queries.Q.docsTokens(spark, sfDir)
    println(s"[opt-probe] docs=${tok.count()} " +
      s"tokens=${tok.select(sum(size(col("tokens")))).head.getLong(0)}")

    // stage volumes of the containment-lshe pipeline
    import graft.ops.Dedup
    val sig = Dedup.withMinhashSignature(
      tok.filter(size(col("tokens")) >= 3), "tokens")
    time("minhash signature pass (noop)")(noop(sig))
    time("minhash signature pass again")(noop(sig))
    val bands = Dedup.capBuckets(
      Dedup.containmentBands(sig), "doc_id", Seq("band", "bucket"), 64)
    println(s"[opt-probe] lshe capped band rows=${bands.count()}")
    val pairs = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    println(s"[opt-probe] lshe raw in-bucket pairs=${pairs.count()}")
    val dpairs = pairs.distinct()
    println(s"[opt-probe] lshe distinct pairs=${dpairs.count()}")
    time("lshe candidate pairs (noop)")(noop(dpairs))
    val shingleSets = tok.filter(size(col("tokens")) >= 3)
      .select(col("doc_id"), array_distinct(Dedup.shingles(col("tokens"))).as("ds"))
    time("shingle sets (noop)")(noop(shingleSets))
    println(s"[opt-probe] mean |ds|=${shingleSets.select(avg(size(col("ds")))).head.getDouble(0)}")
    val attached = Dedup.spreadForKernel(dpairs
        .join(shingleSets.select(col("doc_id").as("doc_a"), col("ds").as("dsa")), Seq("doc_a"))
        .join(shingleSets.select(col("doc_id").as("doc_b"), col("ds").as("dsb")), Seq("doc_b")))
    val twoIntersects = attached
      .select(col("doc_a"), col("doc_b"),
        round(Dedup.containment(col("dsa"), col("dsb")), 6).as("cont_ab"),
        round(Dedup.containment(col("dsb"), col("dsa")), 6).as("cont_ba"))
      .filter(greatest(col("cont_ab"), col("cont_ba")) >= 0.5)
    time("attach + 2x intersect kernel (noop)")(noop(twoIntersects))
    val oneIntersect = attached
      .withColumn("_i", size(array_intersect(col("dsa"), col("dsb"))).cast("double"))
      .select(col("doc_a"), col("doc_b"),
        round(col("_i") / size(col("dsa")).cast("double"), 6).as("cont_ab"),
        round(col("_i") / size(col("dsb")).cast("double"), 6).as("cont_ba"))
      .filter(greatest(col("cont_ab"), col("cont_ba")) >= 0.5)
    time("attach + 1x intersect kernel (noop)")(noop(oneIntersect))

    // jaccard-band family volumes (the minhash_pairs/lev/split_leakage shape)
    val jbands = graft.queries.PipelineQueries
      .minhashBands(tok)
    println(s"[opt-probe] jaccard capped band rows=${jbands.count()}")
    val jpairs = jbands.as("a").join(jbands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    println(s"[opt-probe] jaccard raw pairs=${jpairs.count()} " +
      s"distinct=${jpairs.distinct().count()}")

    spark.stop()
  }
}
