package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analyze.WhitespaceAnalyzer
import graft.core.Schemas.Setting
import graft.embed.FixedVectorEmbedder
import graft.index.IndexData
import graft.queries.{CoreQueries, CurationQueries, ExtraQueries, MiningQueries, PipelineQueries, Q, SearchQueries}
import graft.rerank.TokenOverlapReranker
import graft.search.HybridSearch

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private lazy val allQs: Seq[Q] =
    CoreQueries.all ++ SearchQueries.all ++ PipelineQueries.all ++
      ExtraQueries.all ++ CurationQueries.all ++ MiningQueries.all

  /** Flagship query: full hybrid search (BM25 + cosine fusion + deterministic
    * rerank) over the sf0.001 corpus via the real library path
    * (IndexData → HybridSearch). Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docsRaw = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("string").as("doc_id"), col("embedding"))
    val docs = docsRaw.select(
      col("doc_id").cast("string").as("doc_id"),
      col("source").as("file_path"),
      lit("").as("header_path"),
      lit(1).as("line_start"),
      lit(1).as("line_end"),
      col("text").as("content"),
      split(col("text"), " ").as("tokens"))
      .join(emb, Seq("doc_id"), "left")
    val index = IndexData.fromDocuments(docs,
      Seq(Setting("embedding_model", "precomputed"), Setting("embedding_dim", "64")).toDF())
    val queryVec = emb.filter(col("doc_id") === "0")
      .select("embedding").as[Array[Float]].head()
    HybridSearch.search(
      index,
      "spark join merge",
      analyzer = WhitespaceAnalyzer,
      embedder = Some(new FixedVectorEmbedder(queryVec)),
      reranker = Some(new TokenOverlapReranker(WhitespaceAnalyzer.tokenize)),
      opts = HybridSearch.Options(k = 10))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQs.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
