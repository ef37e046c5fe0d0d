package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.DoubleType

/** kNN join as a first-class operator (SURVEY.md §4.2's "custom Strategy"
  * option, realized): for each query vector, the k nearest corpus vectors by
  * cosine distance.
  *
  * Why an operator instead of `crossJoin → row_number → filter`: the
  * compositional plan materializes |corpus|×|queries| joined rows, shuffles
  * them, and sorts per query. This operator broadcasts the (small) query
  * side and keeps one bounded heap per query per corpus partition — the
  * cross product is consumed on the fly, nothing is materialized or
  * shuffled, and each partition emits at most queries×k candidate rows. At
  * 100 TB that is the difference between an O(N·Q) shuffle and a map-only
  * pass with a tiny combine.
  *
  * Contract (enforced by the API wrapper in
  * [[graft.ops.Similarity.knnJoin]]): left child = corpus projected to
  * (id, vec: array<float>), right child = queries projected to
  * (qid, qvec: array<float>). Output: (id, qid, dist) with partition-local
  * top-k semantics — the wrapper applies the final exact per-query top-k on
  * the ≤ partitions×Q×k candidates. Heap ordering uses (round(dist,6), id)
  * — identical to the final ordering, so pruning never changes the result.
  */
case class CosineKnnJoin(
    left: LogicalPlan, right: LogicalPlan, k: Int,
    // constructor parameter so Catalyst tree copies preserve the exprId —
    // a `val` would mint a fresh attribute on every transform and break
    // downstream references
    distAttr: AttributeReference =
      AttributeReference("dist", DoubleType, nullable = false)())
  extends BinaryNode {

  override def output: Seq[Attribute] =
    Seq(left.output.head, right.output.head, distAttr)

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(distAttr)

  /** The exec reads BOTH child columns positionally (id at 0, vector at 1),
    * but only the ids appear in `output` — without declaring the vectors
    * referenced, ColumnPruning inserts Projects that drop them and the exec
    * reads empty arrays. */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): LogicalPlan = copy(left = l, right = r)
}

case class CosineKnnJoinExec(left: SparkPlan, right: SparkPlan, k: Int,
    output: Seq[Attribute])
  extends BinaryExecNode {

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output.last)

  /** Heap key = Spark's `round(dist, 6)` as an unscaled long. Spark's round
    * — interpreted (`scala.BigDecimal(d)`) and codegen
    * (`java.math.BigDecimal.valueOf`) alike — rounds the SHORTEST-DECIMAL
    * `Double.toString` value, not the exact binary expansion: for doubles
    * whose shortest repr ends in `…5` at the 7th decimal but whose binary
    * value sits just below the decimal half, the two differ by 1 ulp of the
    * key. `valueOf` here keeps this bit-for-bit the final window's ordering
    * key, so partition-local pruning can never evict a candidate the final
    * ranking would keep (a `floor(d*1e6+0.5)` key can likewise disagree
    * near .5·1e-6 boundaries). */
  private def exactKey(d: Double): Long =
    java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValue()

  /** Cheap screen within ±1 of [[exactKey]] (|fl(d·1e6) − d·1e6| < 1e-9 for
    * cosine distances ≤ 2) — lets the hot loop skip the BigDecimal for the
    * overwhelming majority of candidates that can't enter a full heap. */
  private def fastKey(d: Double): Long = math.floor(d * 1e6 + 0.5).toLong

  override protected def doExecute(): RDD[InternalRow] = {
    // Query side: collect + broadcast primitive arrays (qid, qvec, |qvec|).
    val queryRows = right.executeCollect()
    val queries = queryRows.flatMap { r =>
      if (r.isNullAt(1)) None // null query vector: contributes no matches
      else {
        val qid = r.get(0, right.output.head.dataType)
        val arr = r.getArray(1)
        val v = new Array[Float](arr.numElements())
        var i = 0
        while (i < v.length) { v(i) = arr.getFloat(i); i += 1 }
        var nb = 0.0
        i = 0
        while (i < v.length) { nb += v(i).toDouble * v(i).toDouble; i += 1 }
        Some((qid, v, math.sqrt(nb)))
      }
    }
    val bc = sparkContext.broadcast(queries)
    val kLocal = k
    val schema = output.map(_.dataType)
    val leftIdType = left.output.head.dataType
    val rightIdType = right.output.head.dataType

    left.execute().mapPartitions { iter =>
      val qs = bc.value
      // per-query bounded max-heaps ordered by (rounded dist, id) descending
      // so the worst candidate is on top
      final case class Cand(id: Any, distKey: Long, dist: Double)
      def idCompare(a: Any, b: Any): Int = (a, b) match {
        case (x: java.lang.Long, y: java.lang.Long) => x.compareTo(y)
        case (x: java.lang.Integer, y: java.lang.Integer) => x.compareTo(y)
        case (x: org.apache.spark.unsafe.types.UTF8String,
              y: org.apache.spark.unsafe.types.UTF8String) => x.compareTo(y)
        case (x, _) =>
          // a silent 0 would break the deterministic heap-vs-final ordering
          throw new UnsupportedOperationException(
            s"CosineKnnJoin id tiebreak supports long/int/string ids, got ${x.getClass.getName}")
      }
      val heapOrd = new java.util.Comparator[Cand] {
        def compare(a: Cand, b: Cand): Int = {
          val c = java.lang.Long.compare(b.distKey, a.distKey) // worst first
          if (c != 0) c else idCompare(b.id, a.id)
        }
      }
      val heaps = Array.fill(qs.length)(new java.util.PriorityQueue[Cand](kLocal + 1, heapOrd))

      iter.foreach { row =>
        if (!row.isNullAt(1)) { // null embeddings can't match (HOF semantics)
          val id = row.get(0, leftIdType) match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
            case other => other
          }
          val arr = row.getArray(1)
          val n = arr.numElements()
          // copy the row vector and compute its self dot product ONCE per
          // row: they are query-independent, and the per-query loop
          // otherwise re-reads every element through the ArrayData
          // accessor and re-accumulates na for each of the Q queries —
          // ~1/3 of the inner-loop FLOPs plus all the virtual calls, in
          // the exec's own declared hot path. Accumulation order per
          // accumulator is unchanged, so distances stay bit-identical.
          val vec = new Array[Float](n)
          var na = 0.0
          var j = 0
          while (j < n) {
            val x = arr.getFloat(j)
            vec(j) = x
            na += x.toDouble * x.toDouble
            j += 1
          }
          val rowNorm = math.sqrt(na)
          var qi = 0
          while (qi < qs.length) {
            val (_, qv, qnorm) = qs(qi)
            if (qv.length == n) {
              var dot = 0.0
              var i = 0
              while (i < n) {
                dot += vec(i).toDouble * qv(i)
                i += 1
              }
              val dist = 1.0 - dot / (rowNorm * qnorm)
              // NaN (zero-norm side) would key() to 0 — the BEST distKey —
              // and evict genuine neighbors; a NaN distance can never be a
              // nearest neighbor, so drop it here (brute force sorts NaN
              // last, same observable result for k < corpus size)
              if (!dist.isNaN) {
                val h = heaps(qi)
                if (h.size < kLocal) h.add(Cand(id, exactKey(dist), dist))
                else {
                  val worst = h.peek()
                  // fastKey is within ±1 of exactKey, so a candidate more
                  // than 1 over the worst key can never displace it — only
                  // boundary cases pay for the exact BigDecimal rounding
                  if (fastKey(dist) <= worst.distKey + 1) {
                    val cand = Cand(id, exactKey(dist), dist)
                    if (heapOrd.compare(cand, worst) > 0) { h.poll(); h.add(cand) }
                  }
                }
              }
            }
            qi += 1
          }
        }
      }

      val proj = UnsafeProjection.create(schema.toArray)
      val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        val qid = qs(qi)._1
        import scala.jdk.CollectionConverters._
        h.iterator().asScala.toSeq.map { c =>
          out.update(0, c.id)
          out.update(1, qid)
          out.update(2, c.dist)
          proj(out).copy(): InternalRow
        }
      }
    }
  }
}

/** Plans [[CosineKnnJoin]]; install once per session via
  * [[GraftStrategies.install]] or `SparkSessionExtensions.injectPlannerStrategy`. */
object CosineKnnStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ CosineKnnJoin(l, r, k, _) =>
      CosineKnnJoinExec(planLater(l), planLater(r), k, j.output) :: Nil
    case _ => Nil
  }
}

object GraftStrategies {
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(CosineKnnStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ CosineKnnStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(AnnTopKRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AnnTopKRewrite
    }
  }
}
