package graft.core

/** Core record types of the engine (SURVEY.md §1.3).
  *
  * Mirrors the reference data model:
  *  - `documents` table: reference `src/db.py:113-126`
  *  - in-flight `Chunk`: reference `src/splitter.py:221-230`
  *  - result record: reference `src/searcher.py:243-255`
  *
  * Differences (deliberate, Spark-first):
  *  - `tokens` is a real `ArrayType(StringType)` column, not a space-joined
  *    string (the join is DuckDB-FTS plumbing, reference `src/splitter.py:47`).
  *  - `embedding` is `ArrayType(FloatType)`; Spark has no fixed-length array
  *    type, so dimension is validated at write time.
  */
object Schemas {
  import org.apache.spark.sql.types._

  /** One chunk of a source document, before embedding. */
  final case class Chunk(
      filePath: String,
      headerPath: String,
      lineStart: Int,
      lineEnd: Int,
      content: String,
      tokens: Seq[String])

  /** One row of the `documents` index dataset. */
  final case class DocumentRow(
      docId: String,
      filePath: String,
      headerPath: String,
      lineStart: Int,
      lineEnd: Int,
      content: String,
      tokens: Seq[String],
      embedding: Array[Float])

  /** One search result (reference `src/searcher.py:243-255`). */
  final case class SearchHit(
      docId: String,
      filePath: String,
      headerPath: String,
      lineStart: Int,
      lineEnd: Int,
      content: String,
      score: Double,
      ftsScore: Option[Double],
      vssScore: Option[Double])

  /** Key/value row of the `settings` dataset (reference `src/db.py:129-136`). */
  final case class Setting(key: String, value: String)

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("file_path", StringType, nullable = false),
    StructField("header_path", StringType, nullable = true),
    StructField("line_start", IntegerType, nullable = false),
    StructField("line_end", IntegerType, nullable = false),
    StructField("content", StringType, nullable = false),
    StructField("tokens", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true)))

  val settingsSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = true)))
}
