package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (SURVEY.md §2.5 V1).
  *
  * The composable `zip_with`+`aggregate` formulation in [[VectorOps]] is
  * correct but interpreted (higher-order functions evaluate their lambda per
  * element outside whole-stage codegen). These expressions generate a tight
  * primitive loop instead — the shape a 100 TB brute-force scan needs — while
  * producing BIT-IDENTICAL doubles: one pass, per-accumulator left-to-right
  * summation in double precision, then the same `1 − dot/(√na·√nb)` formula.
  *
  * Null semantics match the HOF version: null input array → null; length
  * mismatch → null (zip_with pads with null and the sum collapses).
  * Caveat, stated for honesty: a null ELEMENT inside an array (legal under
  * parquet's containsNull=true schemas, never produced by this engine's
  * embedders) reads as 0.0f here, where the HOF formulation would propagate
  * null — per-element null checks in the hot loop would cost exactly the
  * branch these expressions exist to remove, so the engine contract is
  * "embedding arrays have no null elements" (enforced at index time: the
  * embedders emit dense float arrays).
  */
abstract class FloatVectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>), got (${l.sql}, ${r.sql})")
    }
}

/** Σ aᵢ·bᵢ in double — codegen'd. */
case class DotProduct(left: Expression, right: Expression)
  extends FloatVectorBinaryExpression {

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var dot = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 1 − Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²) — codegen'd single pass over both arrays. */
case class CosineDistance(left: Expression, right: Expression)
  extends FloatVectorBinaryExpression {

  override def prettyName: String = "cosine_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        val xv = x.getFloat(i).toDouble
        val yv = y.getFloat(i).toDouble
        dot += xv * yv
        na += xv * xv
        nb += yv * yv
        i += 1
      }
      1.0 - dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = (double) $a.getFloat($i);
         |    double $yv = (double) $b.getFloat($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  ${ev.value} = 1.0 - $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Unit-normalize an `array<float>` in ONE pass (norm, then scaled copy) —
  * the Column-API formulation (`transform(a, x => x / l2Norm(a))`) inlines
  * the norm computation into every element's lambda, i.e. O(dim²) per row.
  * Zero vectors pass through unchanged. Null ELEMENTS (legal under a
  * containsNull=true input type, never produced by this engine's pipelines)
  * contribute 0.0 — embedding vectors are dense by contract. */
case class L2Normalize(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "l2_normalize"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Float](n)
    var norm = 0.0
    var i = 0
    while (i < n) { val v = x.getFloat(i).toDouble; norm += v * v; i += 1 }
    norm = java.lang.Math.sqrt(norm)
    i = 0
    while (i < n) {
      out(i) = if (norm == 0.0) x.getFloat(i) else (x.getFloat(i) / norm).toFloat
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |float[] $out = new float[$n];
         |double $norm = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $norm += $v * $v;
         |}
         |$norm = java.lang.Math.sqrt($norm);
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $norm == 0.0 ? $a.getFloat($i) : (float) ($a.getFloat($i) / $norm);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
