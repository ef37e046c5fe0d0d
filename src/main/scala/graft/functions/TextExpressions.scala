package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode normalization — the first step of
  * any text-cleaning pipeline (crawl corpora arrive with the same grapheme
  * in NFC, NFD, and compatibility encodings: "é" vs "e"+U+0301, the "ﬁ"
  * ligature, full-width ASCII). Spark has no built-in for it; a Scala UDF
  * would box every row and fall out of whole-stage codegen, so this is a
  * codegen'd expression: the generated code tests `isNormalized` first —
  * for the common already-normalized (and all-ASCII) case the input
  * UTF8String passes through with no String allocation beyond the check —
  * and only re-encodes when normalization actually changes the text.
  *
  * Forms: NFC (canonical compose — what DuckDB's `nfc_normalize` does,
  * which is the oracle hook), NFD, NFKC (compatibility fold: ligatures,
  * width variants — the training-pipeline default), NFKD. Null in → null
  * out.
  */
case class UnicodeNormalize(child: Expression, form: String)
  extends UnaryExpression {

  override def prettyName: String = "unicode_normalize"
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unicode_normalize form must be NFC|NFD|NFKC|NFKD, got '$form'")

  @transient private lazy val normForm = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(str, normForm)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, normForm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("normForm", normForm,
      classOf[java.text.Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |java.lang.String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized($s, $formRef)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, $formRef));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API face of the text expressions. */
object TextOps {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Unicode-normalize a string column. `form`: NFC | NFD | NFKC | NFKD. */
  def normalizeUnicode(c: Column, form: String = "NFKC"): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))
}
