package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance primitives over `ArrayType(FloatType)` columns, built from
  * codegen'd higher-order functions (`zip_with` + `aggregate`) — no UDF, so
  * the whole expression stays inside WholeStageCodegen (SURVEY.md §2.5 V1;
  * reference `src/searcher.py:135-143` `array_cosine_distance`).
  *
  * All arithmetic is double-precision (elements cast from float) with
  * sequential left-to-right accumulation, so a SQL oracle that sums the
  * element products in index order produces bit-identical values.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine similarity = dot/(‖a‖·‖b‖) */
  def cosineSim(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** cosine distance = 1 − similarity; ascending = closer, matching DuckDB's
    * `array_cosine_distance` ordering used by the reference VSS query
    * (reference `src/searcher.py:135-143`). */
  def cosineDist(a: Column, b: Column): Column = lit(1.0) - cosineSim(a, b)

  /** Euclidean (L2) distance. */
  def l2Dist(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, v) => acc + v))

  /** Unit-normalize an array<float> vector (double math, cast back to float).
    * Pre-normalizing at index time turns cosine into a dot product
    * (SURVEY.md §4.2). */
  def normalize(a: Column): Column =
    transform(a, x => (x.cast("double") / l2Norm(a)).cast("float"))
}
