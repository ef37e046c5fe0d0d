package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Q.t

/** Reference-surface operators over the testdata tables: scans, predicates,
  * joins, sorts, aggregations, scalar functions (SURVEY.md §2.1–§2.3,
  * §2.6, §2.8). Each query names the §2 operator(s) it realizes.
  */
object CoreQueries {

  val all: Seq[Q] = Seq(

    // S6: point lookup (reference `src/db.py:181-196`)
    Q("q_s6_point_lookup",
      (s, d) => t(s, d, "region").filter(col("r_regionkey") === 1).select("r_name"),
      Some("SELECT r_name FROM region WHERE r_regionkey = 1")),

    // P1: column projection (reference `src/searcher.py:173-180`)
    Q("q_p1_projection",
      (s, d) => t(s, d, "documents").select("doc_id", "source", "n_chars")
        .orderBy("doc_id"),
      Some("SELECT doc_id, source, n_chars FROM documents ORDER BY doc_id")),

    // P2: IN-list candidate fetch (reference `src/searcher.py:172-180`)
    Q("q_p2_inlist",
      (s, d) => t(s, d, "documents")
        .filter(col("doc_id").isin(3, 14, 159, 265, 358))
        .select("doc_id", "lang").orderBy("doc_id"),
      Some("SELECT doc_id, lang FROM documents WHERE doc_id IN (3, 14, 159, 265, 358) ORDER BY doc_id")),

    // P3: equality predicate (reference `src/db.py:191`)
    Q("q_p3_equality",
      (s, d) => t(s, d, "documents").filter(col("lang") === "es")
        .select("doc_id", "source").orderBy("doc_id"),
      Some("SELECT doc_id, source FROM documents WHERE lang = 'es' ORDER BY doc_id")),

    // P4: score-threshold-style filter (reference `src/searcher.py:312-317`)
    Q("q_p4_threshold",
      (s, d) => t(s, d, "documents").filter(col("n_chars") > 300)
        .select("doc_id", "n_chars").orderBy("doc_id"),
      Some("SELECT doc_id, n_chars FROM documents WHERE n_chars > 300 ORDER BY doc_id")),

    // P6: filename-suffix predicate (reference `src/splitter.py:398`)
    Q("q_p6_suffix_pred",
      (s, d) => t(s, d, "documents").filter(col("source").endsWith("3"))
        .select("doc_id", "source").orderBy("doc_id"),
      Some("SELECT doc_id, source FROM documents WHERE source LIKE '%3' ORDER BY doc_id")),

    // J1: semi join — candidate-id fetch shape (reference `src/searcher.py:172-180`).
    // Broadcast the filtered build side: at 100 TB lineitem is the probe side
    // and never shuffles.
    Q("q_j1_semi_join",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val keys = t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey").as("l_orderkey"))
        li.join(broadcast(keys), Seq("l_orderkey"), "left_semi")
          .groupBy("l_returnflag")
          .agg(count("*").cast("long").as("n"))
          .orderBy("l_returnflag")
      },
      Some("SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n FROM lineitem " +
        "WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') " +
        "GROUP BY l_returnflag ORDER BY l_returnflag")),

    // J3: embedding attach as an equi join on the carried key, NOT by position
    // (SURVEY.md §2.3 J3; reference `src/indexer.py:105-149`)
    Q("q_j3_attach_join",
      (s, d) => {
        val docs = t(s, d, "documents")
        val emb = t(s, d, "embeddings").select(col("vec_id").as("doc_id"), col("label"))
        docs.join(emb, Seq("doc_id"))
          .select("doc_id", "label", "n_chars").orderBy("doc_id")
      },
      Some("SELECT d.doc_id, e.label, d.n_chars FROM documents d " +
        "JOIN embeddings e ON d.doc_id = e.vec_id ORDER BY d.doc_id")),

    // O1: top-k desc → TakeOrderedAndProject (reference `src/searcher.py:115-117`)
    Q("q_o1_topk_desc",
      (s, d) => t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(25),
      Some("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25")),

    // O2: top-k asc (reference `src/searcher.py:139-141`)
    Q("q_o2_topk_asc",
      (s, d) => t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").asc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(25),
      Some("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
        "ORDER BY l_extendedprice ASC, l_orderkey, l_linenumber LIMIT 25")),

    // X1: YAML front-matter strip (reference `src/utils/yaml_front_matter.py:7-25`)
    Q("q_x1_front_matter",
      (s, d) => t(s, d, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"),
          substring(regexp_replace(col("text"),
            graft.analyze.FrontMatter.regex, ""), 1, 60).as("stripped"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, substr(regexp_replace(text, '(?s)^---\\s*\\n.*?\\n---\\s*\\n', ''), 1, 60) AS stripped " +
        "FROM documents WHERE doc_id < 50 ORDER BY doc_id")),

    // X5: index-time path prefix trim (reference `src/indexer.py:112-136`)
    Q("q_x5_trim_prefix",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), regexp_replace(col("source"), "^src", "").as("trimmed"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, regexp_replace(source, '^src', '') AS trimmed " +
        "FROM documents ORDER BY doc_id")),

    // X6: query-time remove-then-add path prefix (reference `src/searcher.py:191-216`)
    Q("q_x6_path_rewrite",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          concat(lit("corpus/"), regexp_replace(col("source"), "^src", "")).as("file_path"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, 'corpus/' || regexp_replace(source, '^src', '') AS file_path " +
        "FROM documents ORDER BY doc_id")),

    // X7 + X10: rerank truncation (2048) and display preview (200)
    // (reference `src/models/reranker.py:86`, `src/cli.py:261`)
    Q("q_x7_truncate",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          substring(col("text"), 1, 200).as("preview"),
          length(substring(col("text"), 1, 2048)).cast("long").as("rerank_len"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, substr(text, 1, 200) AS preview, " +
        "CAST(length(substr(text, 1, 2048)) AS BIGINT) AS rerank_len " +
        "FROM documents ORDER BY doc_id")),

    // X4: tokens ⇄ space-joined string round trip (the reference stores the
    // joined form for DuckDB-FTS plumbing, `src/splitter.py:47`; Spark keeps
    // the array and joins only on export)
    Q("q_x4_tokens_join",
      (s, d) => t(s, d, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"),
          substring(concat_ws(" ", split(col("text"), " ")), 1, 80).as("joined"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, substr(array_to_string(string_split(text, ' '), ' '), 1, 80) AS joined, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok " +
        "FROM documents WHERE doc_id < 100 ORDER BY doc_id")),

    // TPC-H Q1-shaped aggregate: exact DECIMAL sums cast to double so both
    // engines agree bit-for-bit regardless of partial-aggregation order.
    Q("q_agg_pricing_summary",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(28,4)")).cast("double").as("sum_disc_price"),
          count("*").cast("long").as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, " +
        "CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price, " +
        "CAST(count(*) AS BIGINT) AS count_order " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus")),

    // Broadcast-join rollup: revenue by nation. nation/region are broadcast
    // dims; orders⨝customer is the only shuffle and co-partitions on custkey.
    Q("q_agg_nation_revenue",
      (s, d) => {
        val cust = t(s, d, "customer").select("c_custkey", "c_nationkey")
        val nat = t(s, d, "nation").select("n_nationkey", "n_name")
        t(s, d, "orders")
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
            count("*").cast("long").as("n_orders"))
          .orderBy("n_name")
      },
      Some("SELECT n_name, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, " +
        "CAST(count(*) AS BIGINT) AS n_orders " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name")))
}
