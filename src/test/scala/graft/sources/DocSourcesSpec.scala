package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DocSourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-src").toFile
    val f = new java.io.File(dir, name)
    Files.writeString(f.toPath, content)
    f.getAbsolutePath
  }

  test("jsonl reads with the pinned schema; extra fields ignored, no inference") {
    val p = tmp("docs.jsonl",
      """{"doc_id": 1, "text": "alpha beta", "lang": "en", "junk": {"deep": [1,2]}}
        |{"doc_id": 2, "text": "gamma delta", "source": "web"}
        |""".stripMargin)
    val df = DocSources.read(spark, p)
    assert(df.columns.toSeq == Seq("doc_id", "text", "lang", "source"))
    val rows = df.orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "alpha beta")
    assert(rows(0).getString(2) == "en" && rows(0).isNullAt(3))
    assert(rows(1).getString(3) == "web" && rows(1).isNullAt(2))
  }

  test("csv reads header-typed and casts the contract columns") {
    val p = tmp("docs.csv",
      "doc_id,text,lang\n10,hello world,en\n11,more text here,es\n")
    val rows = DocSources.read(spark, p).orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 10L && rows(0).getString(1) == "hello world")
    assert(rows(1).getString(2) == "es")
    assert(rows(0).isNullAt(3)) // no source column -> null, schema stable
  }

  test("format inference by extension, including compressed") {
    assert(DocSources.formatOf("/x/a.jsonl") == "jsonl")
    assert(DocSources.formatOf("/x/a.JSONL.gz") == "jsonl")
    assert(DocSources.formatOf("/x/a.csv.zst") == "csv")
    assert(DocSources.formatOf("/x/a.tsv") == "tsv") // NOT csv: separator keys off this
    assert(DocSources.formatOf("/x/a.tsv.gz") == "tsv")
    assert(DocSources.formatOf("/x/a.parquet") == "parquet")
    assert(DocSources.formatOf("/x/dir") == "parquet")
  }

  test("tsv reads tab-separated by extension alone") {
    val p = tmp("docs.tsv", "doc_id\ttext\n5\ttabbed doc text\n")
    val rows = DocSources.read(spark, p).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 5L && rows(0).getString(1) == "tabbed doc text")
  }

  test("missing contract columns fail loudly") {
    val p = tmp("bad.csv", "id,body\n1,hello\n")
    val e = intercept[RuntimeException](DocSources.read(spark, p))
    assert(e.getMessage.contains("doc_id") && e.getMessage.contains("text"))
  }

  test("wholesale-unparseable ids fail loudly (wrong separator probe)") {
    val p = tmp("sep.csv", "doc_id\ttext\n1\thello\n2\tworld\n") // tabs in a .csv
    val e = intercept[RuntimeException](DocSources.read(spark, p))
    assert(e.getMessage.contains("doc_id") || e.getMessage.contains("missing"))
  }

  test("jsonl round-trips escaping edge cases (quotes, newlines, unicode, control chars)") {
    // texts that stress the escaping path, written with the engine's own
    // Json.str — pins the writer/reader pair together
    val texts = Seq(
      "plain words",
      "with \"double quotes\" inside",
      "back\\slash and tab\there",
      "multi\nline\ntext",
      "unicode: 日本語のドキュメント été ß",
      "control: end",
      "")
    val lines = texts.zipWithIndex.map { case (t, i) =>
      s"""{"doc_id": $i, "text": ${graft.util.Json.str(t)}}"""
    }
    val p = tmp("escape.jsonl", lines.mkString("", "\n", "\n"))
    val back = DocSources.read(spark, p).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(back(i.toLong) == t, s"text $i mangled: ${back(i.toLong)}")
    }
  }

  test("csv with quoted raw newlines: loud error by default, --multiline parses it") {
    // quoted text holding a raw newline splits into malformed continuation
    // rows under the splittable one-record-per-line read; the probe must
    // fail LOUDLY (naming the remedy) instead of silently skipping the doc
    val p = tmp("newlines.csv",
      "doc_id,text\n1,\"line one\nline two\"\n2,plain row\n")
    val e = intercept[RuntimeException](DocSources.read(spark, p).collect())
    assert(e.getMessage.contains("multiline"), e.getMessage)
    // opting in trades splittability for correct quoted-newline parsing
    val rows = DocSources.read(spark, p, multiLine = true)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) == "line one\nline two", rows(1L))
    assert(rows(2L) == "plain row")
  }

  test("csv malformation BEYOND the probe window still fails loudly at scan depth") {
    // first 1500 rows clean (the 1000-row probe passes), then a quoted
    // raw-newline doc: the in-projection raise_error must surface the
    // actionable message when the malformed row is actually read —
    // silent null-and-skip past the probe window is the round-11 review's
    // data-loss finding
    val clean = (1 to 1500).map(i => s"$i,clean row number $i").mkString("\n")
    val p = tmp("deep.csv", s"doc_id,text\n$clean\n9999,\"line one\nline two\"\n")
    val df = DocSources.read(spark, p) // probe passes: first 1000 rows clean
    // materialize doc_id (as every real consumer does — it is the key);
    // a bare count() would let Catalyst prune the id projection entirely
    val e = intercept[Exception](df.select("doc_id").collect())
    assert(e.getMessage.contains("multiline") ||
      Option(e.getCause).exists(_.getMessage.contains("multiline")),
      s"${e.getMessage}\ncause: ${Option(e.getCause).map(_.getMessage)}")
  }

  test("a jsonl corpus runs the full curate chain") {
    val lines = (0 until 40).map { i =>
      val words = if (i % 10 == 0) "tiny" // gated: too short to shingle
      else s"document number $i talks about spark joins and shuffles at scale " +
        s"with plenty of distinct words ${"w" + i} to pass the quality gate"
      s"""{"doc_id": $i, "text": "$words"}"""
    }
    val p = tmp("corpus.jsonl", lines.mkString("", "\n", "\n"))
    val docs = DocSources.read(spark, p)
    val (kept, report) = graft.ops.CuratePipeline.run(docs)
    val (nKept, nDropped) = (kept.count(), report.count())
    assert(nKept > 0 && nKept < 40) // the short docs are gated out
    assert(nKept + nDropped == 40) // report = one row per dropped doc
  }
}
