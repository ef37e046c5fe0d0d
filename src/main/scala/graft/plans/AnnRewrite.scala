package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType, StringType}
import graft.functions.CosineDistance

/** Plan rewrite: brute-force cosine top-k → the heap-pruned
  * [[CosineKnnJoin]] operator, automatically.
  *
  * Users writing the natural DataFrame formulation of exact kNN —
  *
  * {{{
  *   corpus.crossJoin(broadcast(queryVec))
  *     .select(col("id"), cosineDist(col("vec"), col("qv")).as("dist"))
  *     .orderBy(round(col("dist"), 6).asc, col("id").asc)
  *     .limit(k)
  * }}}
  *
  * — get a plan that computes |corpus| distances, then top-k's them
  * (`TakeOrderedAndProject`: per-partition k-heaps on the FINAL projected
  * rows). That is already linear, but it evaluates the distance expression
  * through the row pipeline and carries every scored row to the sort
  * operator. This rule rewrites the shape into [[CosineKnnJoin]], which
  * fuses scoring and heap pruning into one tight primitive loop per corpus
  * partition and emits only ≤ partitions×k candidates; the original
  * Sort+Limit stays on top to pick the exact global top-k from those
  * candidates, so results are bit-identical.
  *
  * Matched shape (either Limit arrangement Catalyst produces —
  * `Limit(Sort(Project(Join)))` or, after `PushProjectionThroughLimit`,
  * `Limit(Project(Sort(Project(Join))))`):
  *
  *  - projection of exactly (id-attribute, `cosine_distance(vec, qvec)`)
  *    with `vec` a bare corpus attribute, and `qvec` EITHER a bare attribute
  *    from the other side of a condition-free cross join OR a foldable
  *    array<float> literal (`cosineDist(col, lit(qv))` — no join at all);
  *    either argument order (the distance is symmetric);
  *  - `ORDER BY round(dist, 6) ASC [+0.0 canonicalization], id ASC` —
  *    exactly the operator's heap ordering. Spark's `round` (BigDecimal
  *    HALF_UP) never produces `-0.0`, so the rounded sort key and the
  *    operator's unscaled-long heap key induce the same total order; a sort
  *    on the UNROUNDED distance is deliberately NOT matched (partition-local
  *    pruning by the rounded key could then evict a raw-order-better tie);
  *  - `LIMIT k` with the same literal on both Limit nodes;
  *  - id type long/int/string (the operator's deterministic tiebreak domain);
  *  - both vector attributes provably non-null (`IsNotNull` constraint or
  *    non-nullable schema) — a null distance would sort FIRST under the
  *    default ASC NULLS FIRST while the operator drops unmatchable rows, so
  *    without the proof the rule declines rather than change results.
  *
  * Like [[graft.ops.Similarity.knnJoin]], the operator excludes NaN
  * distances (zero-norm vectors) and assumes uniform vector dimensionality;
  * both are engine-wide embedding-table contracts (a zero-norm or
  * dim-mismatched vector is never a meaningful neighbor).
  *
  * The query side is `executeCollect`ed by the exec, so the cross-join arm
  * additionally requires that side to be PROVABLY driver-sized: a broadcast
  * hint on it, or a `maxRows` bound ≤ `spark.graft.ann.maxQueryRows`
  * (default 10000). An unhinted large-large cartesian cosine top-k stays on
  * the planner's CartesianProduct path rather than becoming a driver
  * collect. Kill switch: `spark.graft.ann.rewrite=false`.
  *
  * Install via [[GraftStrategies.install]] (session-local) or
  * `spark.sql.extensions=graft.functions.GraftExtensions` (cluster-wide).
  */
object AnnTopKRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.ann.rewrite"

  /** Kill-switch parse, hardened like the maxQueryRows key below: a
    * malformed value must not abort planning of every query on the session
    * — the opposite of an emergency lever. Common off-spellings disable;
    * anything unrecognized ALSO disables (the user reached for the switch;
    * failing open would ignore them). Absent key = enabled. */
  private def rewriteEnabled: Boolean =
    conf.getConfString(ConfKey, "true").trim.toLowerCase match {
      case "true" | "1" | "on" | "yes" | "enabled" => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!rewriteEnabled) plan
    else plan.transformDown {
      case lim @ GlobalLimit(gl @ IntegerLiteral(k), LocalLimit(IntegerLiteral(k2), inner))
          if k == k2 && k > 0 =>
        val parts = inner match {
          case s: Sort => Some((None, s))
          case p @ Project(_, s: Sort) => Some((Some(p), s))
          case _ => None
        }
        parts.flatMap { case (outerPrj, sort) =>
          rewrite(k, gl, outerPrj, sort)
        }.getOrElse(lim)
    }

  private def rewrite(k: Int, limitLit: Expression, outerPrj: Option[Project],
      sort: Sort): Option[LogicalPlan] = sort match {
    case Sort(
        orders @ Seq(SortOrder(key1, Ascending, _, _), SortOrder(key2, Ascending, _, _)),
        true,
        Project(projList, src),
        hint)
        if projList.size == 2 =>
      for {
        (distAlias, x, y) <- projList.collectFirst {
          case a @ Alias(CosineDistance(l, r), _) => (a, l, r)
        }
        // a duplicate-exprId projection (Project([a, a])) has no id entry —
        // decline rather than throw inside the optimizer
        idEntry <- projList.find(_.exprId != distAlias.exprId)
        idBase <- idEntry match {
          case a: AttributeReference => Some(a)
          case Alias(a: AttributeReference, _) => Some(a)
          case _ => None
        }
        if Seq(LongType, IntegerType, StringType).contains(idBase.dataType)
        if isRound6Of(key1, distAlias.toAttribute) && key2.semanticEquals(idEntry.toAttribute)
        (corpus, cvec, queryPlan) <- resolveSides(src, x, y, idBase)
        // the id must be provably non-null too: the operator's deterministic
        // tiebreak can't compare null ids, while the original plan would
        // happily emit them (NULLS FIRST)
        if provablyNotNull(corpus, cvec) && provablyNotNull(corpus, idBase)
      } yield {
        val left = Project(Seq(idBase, cvec), corpus)
        val knn = CosineKnnJoin(left, queryPlan, k)
        // rebind the dist column to the operator's output, keeping the
        // original exprId so the untouched Sort/Limit/outer plans resolve
        val rebound = projList.map {
          case a @ Alias(_: CosineDistance, name) =>
            Alias(knn.distAttr, name)(exprId = a.exprId, qualifier = a.qualifier)
          case other => other
        }
        val newSort = Sort(orders, global = true, Project(rebound, knn), hint)
        val newInner: LogicalPlan = outerPrj.map(p => p.copy(child = newSort)).getOrElse(newSort)
        GlobalLimit(limitLit, LocalLimit(limitLit, newInner))
      }
    case _ => None
  }

  /** Two supported sources for the query vector:
    *  - a cross-joined query-side plan (both cosine args are attributes);
    *  - a foldable literal (`cosineDist(vec, lit(qv))`) — becomes a
    *    single-row [[LocalRelation]] query side.
    * Returns (corpus plan, corpus vector attr, (qid, qvec) query plan). */
  private def resolveSides(src: LogicalPlan, x: Expression, y: Expression,
      id: AttributeReference)
      : Option[(LogicalPlan, AttributeReference, LogicalPlan)] = (src, x, y) match {
    case (Join(jl, jr, jt, cond, hint), va: AttributeReference, vb: AttributeReference)
        if (jt == Cross || jt == Inner) && cond.forall(_ == Literal.TrueLiteral) =>
      pickSides(jl, jr, va, vb, id).flatMap { case (corpus, query, cvec, qvec) =>
        if (provablyNotNull(query, qvec) && boundedQuerySide(query, jl, jr, hint)) {
          Some((corpus, cvec,
            Project(Seq(Alias(Literal(0L), "qid")(), Alias(qvec, "qvec")()), query)))
        } else None
      }
    case (_, va: AttributeReference, qlit: Literal) =>
      literalQuerySide(qlit).flatMap { q =>
        if (src.outputSet.contains(va) && src.outputSet.contains(id)) Some((src, va, q))
        else None
      }
    case (_, qlit: Literal, vb: AttributeReference) =>
      literalQuerySide(qlit).flatMap { q =>
        if (src.outputSet.contains(vb) && src.outputSet.contains(id)) Some((src, vb, q))
        else None
      }
    case _ => None
  }

  /** A non-null, non-empty, finite, nonzero-norm literal query vector as a
    * one-row (qid, qvec) LocalRelation; None declines the rewrite (a
    * zero-norm or non-finite query makes every distance NaN, which the
    * original plan sorts LAST but the operator drops). */
  private def literalQuerySide(qlit: Literal): Option[LogicalPlan] = qlit match {
    case Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData,
        t @ ArrayType(FloatType, _)) if arr != null && arr.numElements() > 0 =>
      val fs = arr.toFloatArray()
      var norm = 0.0
      fs.foreach(f => norm += f.toDouble * f.toDouble)
      if (java.lang.Double.isFinite(norm) && norm > 0.0) {
        val out = Seq(
          AttributeReference("qid", LongType, nullable = false)(),
          AttributeReference("qvec", t, nullable = false)())
        Some(LocalRelation(out, Seq(InternalRow(0L, arr.copy())), isStreaming = false))
      } else None
    case _ => None
  }

  /** The exec `executeCollect`s the query side, so the rewrite must PROVE it
    * is driver-sized before firing: either the user hinted broadcast on that
    * side (the documented spelling) or the plan has a row-count bound
    * (`maxRows`, e.g. a Limit or a LocalRelation) under the cap. A plain
    * condition-free cross join of two large tables is a legal cartesian
    * cosine top-k the planner handles as CartesianProduct — rewriting it
    * would turn a slow-but-correct plan into a driver OOM, so decline. */
  private def boundedQuerySide(query: LogicalPlan, jl: LogicalPlan, jr: LogicalPlan,
      hint: JoinHint): Boolean = {
    // a malformed config value must not abort planning with a bare
    // NumberFormatException — fall back to the default, naming the key
    val capRaw = conf.getConfString("spark.graft.ann.maxQueryRows", "10000")
    val cap = capRaw.toLongOption.getOrElse {
      logWarning(s"invalid spark.graft.ann.maxQueryRows='$capRaw'; using 10000")
      10000L
    }
    val hinted =
      (query.eq(jl) && hint.leftHint.exists(_.strategy.contains(BROADCAST))) ||
        (query.eq(jr) && hint.rightHint.exists(_.strategy.contains(BROADCAST)))
    hinted || query.maxRows.exists(_ <= cap)
  }

  private def pickSides(jl: LogicalPlan, jr: LogicalPlan, va: AttributeReference,
      vb: AttributeReference, id: AttributeReference)
      : Option[(LogicalPlan, LogicalPlan, AttributeReference, AttributeReference)] =
    if (jl.outputSet.contains(va) && jl.outputSet.contains(id) && jr.outputSet.contains(vb)) {
      Some((jl, jr, va, vb))
    } else if (jl.outputSet.contains(vb) && jl.outputSet.contains(id) && jr.outputSet.contains(va)) {
      Some((jl, jr, vb, va))
    } else if (jr.outputSet.contains(va) && jr.outputSet.contains(id) && jl.outputSet.contains(vb)) {
      Some((jr, jl, va, vb))
    } else if (jr.outputSet.contains(vb) && jr.outputSet.contains(id) && jl.outputSet.contains(va)) {
      Some((jr, jl, vb, va))
    } else None

  /** `round(dist, 6)`, optionally `+ 0.0` on either side (the engine's
    * signed-zero canonicalization `Q.r6`; `+0.0` maps `-0.0` to `0.0` and is
    * order-preserving, so both spellings induce the heap-key order). */
  private def isRound6Of(e: Expression, dist: Attribute): Boolean = e match {
    case Round(c, Literal(6, IntegerType), _) => c.semanticEquals(dist)
    case a: Add =>
      (isRound6Of(a.left, dist) && isPositiveZero(a.right)) ||
        (isPositiveZero(a.left) && isRound6Of(a.right, dist))
    case _ => false
  }

  private def isPositiveZero(e: Expression): Boolean = e match {
    // +0.0 exactly — adding -0.0 would NOT canonicalize (-0.0 + -0.0 = -0.0)
    case Literal(v: Double, DoubleType) => java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  /** Null rows sort first under ASC NULLS FIRST but the operator drops them;
    * only rewrite when the plan proves no nulls reach the distance. */
  private def provablyNotNull(plan: LogicalPlan, a: Attribute): Boolean =
    !a.nullable || plan.constraints.exists {
      case IsNotNull(x: Attribute) => x.semanticEquals(a)
      case _ => false
    }
}

// Cluster-wide registration (strategy + rule + SQL functions) lives in
// graft.functions.GraftExtensions — the engine's single
// `spark.sql.extensions` entry point.
