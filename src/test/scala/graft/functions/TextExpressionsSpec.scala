package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[UnicodeNormalize]] — the codegen'd text-normalization expression.
  * Pinned against `java.text.Normalizer` ground truth through the FULL
  * DataFrame path (so the generated code, not just the interpreted eval,
  * is what's tested), across all four forms, nulls, and the
  * already-normalized fast path. Every non-ASCII char is an explicit
  * \\uXXXX escape — a literal glyph's composed/decomposed state depends on
  * the editor that last touched the file, which is exactly the ambiguity
  * this expression exists to erase. */
class TextExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Decomposed = "e\u0301clair" // e + combining acute (NFD)
  private val Composed = "\u00e9clair" // é precomposed (NFC)
  private val Ligature = "\ufb01n" // ﬁ + n
  private val FullWidth = "\uff21BC" // full-width Ａ + BC

  private val fixtures = Seq(
    Decomposed, // NFC must compose
    Ligature, // NFC keeps the ligature, NFKC expands to "fin"
    FullWidth, // NFKC folds width to "ABC"
    "plain ascii",
    "")

  test("all four forms match java.text.Normalizer through the DataFrame " +
      "(codegen) path") {
    val df = fixtures.toDF("s")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val got = df.select(TextOps.normalizeUnicode(col("s"), form))
        .as[String].collect().toSeq
      val want = fixtures.map(s =>
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.valueOf(form)))
      assert(got == want, form)
    }
    // the semantic pins the fixtures exist for
    def nfc(s: String) = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    def nfkc(s: String) = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
    assert(nfc(Decomposed) == Composed)
    assert(nfc(Ligature) == Ligature) // NFC keeps the ligature
    assert(nfkc(Ligature) == "fin") // NFKC expands it
    assert(nfkc(FullWidth) == "ABC") // width fold
  }

  test("null propagates; non-string input fails analysis; bad form fails " +
      "construction") {
    val got = Seq(Option(Decomposed), None).toDF("s")
      .select(TextOps.normalizeUnicode(col("s"), "NFC")).as[Option[String]]
      .collect().toSeq
    assert(got == Seq(Some(Composed), None))
    intercept[Exception] {
      Seq(1).toDF("s").select(TextOps.normalizeUnicode(col("s"), "NFC")).collect()
    }
    intercept[IllegalArgumentException] {
      TextOps.normalizeUnicode(col("s"), "NFX")
    }
  }

  test("callable from SQL after registration, with the optional form " +
      "argument (default NFKC)") {
    GraftExtensions.register(spark)
    Seq(Decomposed -> 1, FullWidth -> 2).toDF("s", "i")
      .createOrReplaceTempView("norm_fixture")
    val got = spark.sql(
      "SELECT unicode_normalize(s, 'NFC') AS nfc, unicode_normalize(s) AS nfkc " +
        "FROM norm_fixture ORDER BY i")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq((Composed, Composed), (FullWidth, "ABC")))
    intercept[Exception] { // non-literal form
      spark.sql("SELECT unicode_normalize(s, s) FROM norm_fixture").collect()
    }
  }

  test("already-normalized fast path returns equal values (identity on " +
      "ASCII and on NFC input)") {
    val df = Seq("plain", Composed).toDF("s")
    val got = df.select(TextOps.normalizeUnicode(col("s"), "NFC"))
      .as[String].collect().toSeq
    assert(got == Seq("plain", Composed))
  }
}
