package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Space-filling-curve file layout — the Delta/Iceberg Z-ORDER technique as
  * plain portable arithmetic, plus the write path that makes the keys real:
  * `repartitionByRange` on the curve key + a within-partition sort, so every
  * output parquet file covers a DISJOINT key range and its row-group min/max
  * stats prune 2-D predicate scans. At 100 TB, unclustered parquet makes
  * every 2-D range predicate a full scan; this is the difference the curve
  * keys exist for (q_zorder_layout / q_hilbert_layout oracle-check the key
  * math; LayoutWriteSpec proves the written files' ranges are disjoint and
  * the clustering is correctness-neutral).
  */
object Layout {

  val Methods: Set[String] = Set("zorder", "hilbert")

  /** Reduce a column to an 8-bit dimension in [0, 256): numerics take
    * `pmod(·, 256)`; strings take the first two md5 nibbles — both
    * deterministic and engine-portable (the md5 trick is
    * CurationQueries.nibbleHashSql widened to a byte). */
  def dim8(c: Column, isString: Boolean): Column =
    if (isString) conv(substring(md5(c), 1, 2), 16, 10).cast("long")
    else pmod(c.cast("long"), lit(256L))

  /** Z-order (Morton) key: interleave the bits of two 8-bit dimensions.
    * Same arithmetic as the q_zorder_layout oracle (`(x div 2^b) % 2`
    * terms); inputs must be in [0, 256). */
  def zorderKey(x: Column, y: Column): Column =
    (0 until 8).map { b =>
      (shiftright(x, b) % 2).cast("long") * lit(1L << (2 * b + 1)) +
        (shiftright(y, b) % 2).cast("long") * lit(1L << (2 * b))
    }.reduce(_ + _)

  /** Hilbert d-index of two 8-bit dimensions, appended as column `out`.
    * The classic xy→d walk has loop-carried state (the quadrant rotation
    * rewrites x/y each level), so it unrolls into 8 chained projections —
    * Catalyst collapses them into one codegen stage. Bijection and
    * unit-step locality are proven over the full 256×256 grid in
    * CurationQueriesSpec; q_hilbert_layout oracle-checks the same kernel
    * cross-engine. */
  def withHilbertKey(df: DataFrame, x: Column, y: Column, out: String): DataFrame = {
    var cur = df
      .withColumn("_hx", x.cast("long"))
      .withColumn("_hy", y.cast("long"))
      .withColumn(out, lit(0L))
    for (k <- 7 to 0 by -1) {
      val sv = 1L << k
      // rx/ry and the rotated x/y all read the PREVIOUS level's coordinates:
      // compute every output from _hx/_hy before renaming over them
      val rx = when(col("_hx").bitwiseAND(lit(sv)) > 0, 1L).otherwise(0L)
      val ry = when(col("_hy").bitwiseAND(lit(sv)) > 0, 1L).otherwise(0L)
      cur = cur
        .withColumn("_nx",
          when(ry === 0, when(rx === 1, lit(sv - 1) - col("_hy")).otherwise(col("_hy")))
            .otherwise(col("_hx")))
        .withColumn("_ny",
          when(ry === 0, when(rx === 1, lit(sv - 1) - col("_hx")).otherwise(col("_hx")))
            .otherwise(col("_hy")))
        .withColumn(out, col(out) + lit(sv * sv) * (rx * 3L).bitwiseXOR(ry))
        .drop("_hx", "_hy")
        .withColumnRenamed("_nx", "_hx")
        .withColumnRenamed("_ny", "_hy")
    }
    cur.drop("_hx", "_hy")
  }

  /** Append the curve key for `method` over (xName, yName) as `out`,
    * deriving each dimension's 8-bit reduction from the column's type. */
  def withKey(df: DataFrame, method: String, xName: String, yName: String,
      out: String = "_layout_key"): DataFrame = {
    def d(name: String) = dim8(col(name),
      df.schema(name).dataType == org.apache.spark.sql.types.StringType)
    method match {
      case "zorder"  => df.withColumn(out, zorderKey(d(xName), d(yName)))
      case "hilbert" => withHilbertKey(df, d(xName), d(yName), out)
      case other => sys.error(
        s"unknown layout '$other' (expected one of: ${Methods.toSeq.sorted.mkString(", ")})")
    }
  }

  /** Range-cluster `df` by the curve key: `repartitionByRange` makes every
    * output file's key range DISJOINT from every other's, the within-
    * partition sort tightens row-group min/max. The key column is dropped
    * before the caller writes, so clustering never changes the schema or
    * the row multiset — pure layout (spec-pinned). */
  def cluster(df: DataFrame, method: String, xName: String, yName: String,
      numFiles: Int = 8): DataFrame =
    withKey(df, method, xName, yName)
      .repartitionByRange(numFiles, col("_layout_key"))
      .sortWithinPartitions("_layout_key")
      .drop("_layout_key")
}
