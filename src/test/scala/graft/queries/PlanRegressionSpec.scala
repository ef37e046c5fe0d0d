package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Plan-shape regression guards: the architecture claims in PLANS.md, held
  * by assertion so a refactor can't silently regress them. */
class PlanRegressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("filters and projections reach the parquet scan") {
    val p = plan("q_p4_threshold")
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(n_chars,300)"), p.take(600))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"), p.take(600))
  }

  test("events time slice pushes the ts range to the parquet scan") {
    val p = plan("q_events_time_slice")
    // the range predicate must bind to the RAW ts column under the
    // normalization projection — visible as PushedFilters on ts, which is
    // what lets parquet prune row groups at 100 TB (Q.eventsBetween)
    assert(p.contains("PushedFilters"), p.take(800))
    val pushed = "PushedFilters: \\[[^\\]]*".r.findFirstIn(p).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(ts") && pushed.contains("LessThan(ts"),
      s"ts range not pushed: $pushed")
  }

  test("partitioned events slice prunes day directories AND row groups") {
    val p = plan("q_events_partitioned_slice")
    // the date-partitioned layout must surface the day range as partition
    // filters (directories outside the slice are never listed or opened)
    // AND still push the exact ns bounds to the reader for the boundary
    // days — both prunings, not either one
    val pf = "PartitionFilters: \\[[^\\]]*".r.findFirstIn(p).getOrElse("")
    assert(pf.contains("event_date"), s"day range not a partition filter: $pf")
    val pushed = "PushedFilters: \\[[^\\]]*".r.findFirstIn(p).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(ts") && pushed.contains("LessThan(ts"),
      s"ts range not pushed: $pushed")
  }

  test("semi join broadcasts the filtered build side") {
    val p = plan("q_j1_semi_join")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p.take(800))
    assert(!p.contains("SortMergeJoin"))
  }

  test("vector top-k rewrites to the heap operator; top-k never global-sorts") {
    val p = plan("q_v2_knn")
    // AnnTopKRewrite turns the brute-force crossJoin+sort+limit into
    // CosineKnnJoin; the remaining Sort+Limit over its ≤partitions×k
    // candidates plans as TakeOrderedAndProject.
    assert(p.contains("CosineKnnJoin"), p.take(800))
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
  }

  test("knn join uses the custom operator, not a materialized cross product") {
    val p = plan("q_sim_knn_join")
    assert(p.contains("CosineKnnJoin"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("asof join plans as union-merge: one shuffle, no join node") {
    val p = plan("q_asof_join")
    // The union-merge plan must never materialize order×event candidate
    // pairs: no join operator of any kind, exactly one exchange for the
    // per-user window (plus the final presentation sort's range exchange).
    assert(!p.contains("Join"), p.take(1200))
    assert(p.contains("Union"), p.take(1200))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges\n${p.take(1500)}")
  }

  test("bucketed embed near-dup never collects the corpus") {
    val p = plan("q_dedup_embed_lsh_knn")
    // The scale path must not route through CosineKnnJoin (whose query side
    // is executeCollect'ed to the driver) nor form all-pairs: candidates
    // come from an equi-join on the bucket id.
    assert(!p.contains("CosineKnnJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("decontamination broadcasts the benchmark shingle set") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"))
  }

  test("sequence packing windows per language, never a global cumsum") {
    val p = plan("q_pack_sequences")
    assert(p.contains("Exchange hashpartitioning(lang"), p.take(1200))
  }

  test("embedding centroids aggregate with a map-side partial") {
    val p = plan("q_embed_centroids")
    assert(p.contains("partial_"), p.take(1200))
    assert(p.contains("Exchange hashpartitioning(label"), p.take(1200))
  }

  test("topk aggregate runs object-hash with a map-side partial") {
    val p = plan("q_topk_agg")
    // TypedImperativeAggregate plans as ObjectHashAggregate; the partial
    // before the exchange is the whole point (≤k values/group shuffled)
    assert(p.contains("ObjectHashAggregate"), p.take(900))
    assert(p.contains("partial_topk_desc"), p.take(900))
  }

  test("self-contained BM25 builds the postings subtree once") {
    val p = plan("q_f4_bm25_topk")
    // one Generate (explode) for postings; a second would mean the df branch
    // re-derives the subtree
    val generates = "\\bGenerate explode".r.findAllIn(p).length
    assert(generates == 1, s"expected 1 explode, got $generates")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("vocab/BPE top-k cut with TakeOrderedAndProject, never a global sort") {
    Seq("q_vocab_top", "q_bpe_pairs").foreach { n =>
      val p = plan(n)
      assert(p.contains("TakeOrderedAndProject"), s"$n:\n${p.take(900)}")
      assert(p.contains("partial_count"), s"$n:\n${p.take(900)}") // map-side combine
      assert(!p.contains("Exchange rangepartitioning"), s"$n global-sorts:\n${p.take(900)}")
    }
  }

  test("shard assignment is one partial-agg'd groupBy, no window, no join") {
    val p = plan("q_shard_assign")
    assert(p.contains("partial_count"), p.take(900))
    assert(!p.contains("Window") && !p.contains("Join"), p.take(900))
  }

  test("ivf search probes via broadcast equi-join, never a sort-merge or corpus cartesian") {
    val p = plan("q_sim_ivf_search")
    // probe list joins the assigned corpus on cluster id as a broadcast
    // hash join; the only nested-loop joins are the broadcast centroid
    // cross-products (4 rows). A SortMergeJoin would mean the corpus
    // shuffles on cluster id just for 3 queries.
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("pq argmin is a partial-agg'd struct-min, not a window over candidates") {
    val p = plan("q_embed_pq")
    // min(struct) has a map-side partial, so the shuffle carries ≤ one row
    // per (vec, subspace) per partition — a Window would shuffle all
    // N×8×K candidate rows
    assert(p.contains("partial_min"), p.take(1200))
    assert(!p.contains("Window"), p.take(1200))
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), p.take(1200))
  }

  test("oov join broadcasts the vocab, never shuffles the token stream for membership") {
    val p = plan("q_vocab_oov")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  test("funnel pre-aggregates both sides; no window, no cartesian") {
    val p = plan("q_events_funnel")
    assert(p.contains("partial_min"), p.take(1200)) // per-user min before the join
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p.take(1200))
  }

  test("incremental dedup joins only on band buckets, never new×existing") {
    val p = plan("q_dedup_incremental")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
  }

  test("pii redaction is map-only: no exchange before the presentation sort") {
    val p = plan("q_pii_redact")
    // the only exchange allowed is the final ORDER BY's range partitioning —
    // a hash exchange would mean the redaction itself shuffles
    assert(!p.contains("Exchange hashpartitioning"), p.take(900))
    assert(!p.contains("Join"), p.take(900))
  }

  test("pq adc search: broadcast LUT, partial-agg'd lookup sums, pruned top-k window") {
    val p = plan("q_sim_pq_adc")
    // the LUT and codebook ride broadcasts; the per-(query, vector) sum of
    // lookups partial-aggregates before its exchange; the rank window prunes
    // with WindowGroupLimit so no full candidate sort materializes
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(p.contains("partial_sum"), p.take(1200))
    assert(p.contains("WindowGroupLimit"), p.take(1200))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(1200))
  }

  test("tfidf keywords: partial-agg'd tf, per-doc window pruned with group limit") {
    val p = plan("q_tfidf_keywords")
    assert(p.contains("partial_count"), p.take(1200))
    assert(p.contains("WindowGroupLimit"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("kmeans step: broadcast centroids, partial-agg'd dimension sums") {
    val p = plan("q_kmeans_step")
    assert(p.contains("partial_sum"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  test("zscore anomalies: per-type stats broadcast back, no sort-merge join") {
    val p = plan("q_anomaly_zscore")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
    assert(p.contains("partial_"), p.take(1200))
  }

  test("token windows and span corruption are map-only") {
    Seq("q_token_windows", "q_span_corruption").foreach { n =>
      val p = plan(n)
      assert(!p.contains("Exchange hashpartitioning"), s"$n shuffles:\n${p.take(900)}")
      assert(!p.contains("Join"), s"$n joins:\n${p.take(900)}")
    }
  }

  test("ltr features: one postings explode, pruned top-k window, no vocab shuffle join") {
    val p = plan("q_ltr_features")
    // the scoresSelfContained shape: df via window over query-filtered
    // postings, so the explode+aggregate subtree runs exactly once
    val generates = "\\bGenerate explode".r.findAllIn(p).length
    assert(generates == 1, s"expected 1 explode, got $generates\n${p.take(1200)}")
    assert(p.contains("WindowGroupLimit"), p.take(1200))
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), p.take(1200))
  }

  test("levenshtein pairs never form a cross product") {
    val p = plan("q_dedup_lev_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
  }

  /** SortMergeJoins allowed only for the top-k leg FUSION (FullOuter over
    * two ≤k-row candidate lists — bounded by construction; full-outer can't
    * build a broadcast hash side). Any other SMJ means a corpus-sized
    * shuffle crept in. */
  private def onlyFusionSortMerge(p: String): Boolean =
    "SortMergeJoin [^\n]*".r.findAllIn(p).forall(_.contains("FullOuter"))

  test("ann e2e search: probe equi-joins broadcast; only the fusion join sort-merges") {
    val p = plan("q_search_e2e_ann")
    // probes ride broadcasts into the assigned-corpus equi-join; the fused
    // candidate attach is a broadcast too — at 100 TB nothing here shuffles
    // the corpus on anything but its scan
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(onlyFusionSortMerge(p) && !p.contains("CartesianProduct"), p.take(1500))
  }

  test("range join bins to an equi-join, never a nested-loop over intervals") {
    val p = plan("q_range_join")
    // the bin quantization must turn the range condition into a hash-joinable
    // equi key: a BroadcastNestedLoopJoin/CartesianProduct here means the
    // range predicate reached the planner bare and every probe scans every
    // interval
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
  }

  test("salted join: the sort-merge keys carry the salt") {
    val p = plan("q_skew_salted_join")
    // the whole point: the shuffle key is (orderkey, salt), so a hot
    // orderkey spreads across S reducers instead of funneling into one
    val smj = "SortMergeJoin [^\n]*".r.findFirstIn(p).getOrElse("")
    assert(smj.contains("_salt"), s"salt not in the join key: $smj\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("bucketed join: no hash exchange anywhere — both scans carry the bucket partitioning") {
    val p = plan("q_join_bucketed")
    // the whole point of the bucketed layout: join AND per-key aggregate
    // consume HashPartitioning(key, n) straight from the scans; the only
    // exchange left is the presentation sort's range partitioning
    assert(p.contains("SortMergeJoin"), p.take(1500))
    assert(!p.contains("Exchange hashpartitioning"), p.take(1500))
    assert(p.contains("Bucketed: true"), p.take(1500))
  }

  test("pq and composed ivf+pq e2e search: ADC sum partial-aggregates; shortlist rides broadcasts") {
    Seq("q_search_e2e_pq", "q_search_e2e_ivfpq").foreach { n =>
      val p = plan(n)
      // the per-doc ADC sum must partial-aggregate before its exchange, and
      // the ≤20-row shortlist/probe frames must broadcast into their joins
      assert(p.contains("partial_sum"), s"$n:\n${p.take(1200)}")
      assert(p.contains("BroadcastHashJoin"), s"$n:\n${p.take(1200)}")
      assert(onlyFusionSortMerge(p) && !p.contains("CartesianProduct"),
        s"$n:\n${p.take(1500)}")
    }
  }
}
