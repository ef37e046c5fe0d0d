package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE-encode kernel (round 21).
  *
  * [[graft.ops.BpeEncode.encodeWords]]'s expression-algebra fold (one
  * `aggregate(...)` HOF per merge over the re-split '|'-string) is the
  * executable spec both engines share, but on the Spark side each pass is
  * interpreted per symbol WITH a full string rebuild — O(|merges| · |word|²)
  * character copying in boxed lambdas (measured: the q_bpe_encode kernel
  * dominated the query at 1.5 s). This evaluates the IDENTICAL greedy
  * semantics in one compiled pass over a symbol list: per merge (a, b), a
  * left-to-right sweep replaces a trailing `a` followed by `b` with `ab`.
  * Equivalence to the fold, argued and then property-pinned in
  * KernelExpressionsSpec: the fold's accumulator is the '|'-join of this
  * sweep's list — `acc = a` ⇔ singleton list [a]; `acc endsWith "|a"` ⇔
  * last symbol = a (symbols never contain '|', so a "|a" suffix can only
  * be a full last symbol); the `left(acc, len−|a|) ⧺ ab` rewrite is
  * exactly "replace trailing symbol a with ab"; and no-re-merge holds
  * because `ab ≠ a` (b non-empty). */
object BpeOps {
  def encode(word: UTF8String, merges: Array[Array[String]]): UTF8String = {
    val s = word.toString
    var syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cc = Character.charCount(cp)
      syms.add(s.substring(i, i + cc))
      i += cc
    }
    var m = 0
    while (m < merges.length) {
      val a = merges(m)(0)
      val b = merges(m)(1)
      if (syms.size() > 1) {
        val out = new java.util.ArrayList[String](syms.size())
        out.add(syms.get(0))
        var k = 1
        while (k < syms.size()) {
          val x = syms.get(k)
          if (out.get(out.size() - 1) == a && x == b)
            out.set(out.size() - 1, a + b)
          else out.add(x)
          k += 1
        }
        syms = out
      }
      m += 1
    }
    UTF8String.fromString(String.join("|", syms))
  }
}

/** `word → '|'-delimited BPE symbol string` under a fixed ordered merge
  * table — bit-identical to the [[graft.ops.BpeEncode.mergePass]] fold
  * chain (see [[BpeOps]]). */
case class BpeEncodeWord(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def prettyName: String = "bpe_encode_word"
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  @transient private lazy val table: Array[Array[String]] =
    merges.map(p => Array(p._1, p._2)).toArray

  override def nullSafeEval(word: Any): Any =
    BpeOps.encode(word.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("merges", table, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BpeOps.encode($a, $tRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
