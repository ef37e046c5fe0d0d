package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Vector distance primitives over `ArrayType(FloatType)` columns
  * (SURVEY.md §2.5 V1; reference `src/searcher.py:135-143`
  * `array_cosine_distance`).
  *
  * Default implementations are the native codegen'd Catalyst expressions in
  * [[VectorExpressions]] (tight primitive loop inside WholeStageCodegen).
  * The `*Hof` variants are the pure-built-in formulation (`zip_with` +
  * `aggregate`); they produce bit-identical doubles (same summation order,
  * same formula) and serve as the executable specification the natives are
  * tested against.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double — codegen'd. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** cosine distance = 1 − dot/(‖a‖·‖b‖); ascending = closer, matching
    * DuckDB's `array_cosine_distance` ordering used by the reference VSS
    * query. Codegen'd single pass. */
  def cosineDist(a: Column, b: Column): Column =
    ColumnBridge.column(CosineDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosineSim(a: Column, b: Column): Column = lit(1.0) - cosineDist(a, b)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  // ---- pure higher-order-function formulations (the spec) ----

  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def l2NormHof(a: Column): Column = sqrt(dotHof(a, a))

  def cosineDistHof(a: Column, b: Column): Column =
    lit(1.0) - dotHof(a, b) / (l2NormHof(a) * l2NormHof(b))

  /** Euclidean (L2) distance. */
  def l2Dist(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, v) => acc + v))

  /** Unit-normalize an array<float> vector — single-pass codegen'd
    * [[L2Normalize]] (the `transform`+`l2Norm` composition re-evaluates the
    * norm per element). Pre-normalizing at index time turns cosine into a
    * dot product (SURVEY.md §4.2). Zero vectors pass through. */
  def normalize(a: Column): Column =
    ColumnBridge.column(L2Normalize(ColumnBridge.expression(a)))
}
