package graft.index

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.core.Schemas.Setting

/** Round-15 directive #4: a direct `IndexData.write`/`save` onto a LIVE
  * artifact (a dir already holding a committed table set) must not tear it.
  * Engine writers (compact, rewrite merges) stage+swap since round 15; the
  * remaining hazard was library misuse — calling the plain writers on a dir
  * a serving session is reading. Both now detect the committed artifact and
  * route through the same `writeStagedSwap` machinery, so a failure (or
  * crash) anywhere before the `_COMMIT` marker leaves the original artifact
  * byte-identical, and the swap itself is the idempotent one every reader
  * already heals. */
class LiveWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDf(rows: Seq[(String, String)]) =
    rows.map { case (id, text) => (id, text, text.split(" ").toSeq) }
      .toDF("doc_id", "content", "tokens")
      .withColumn("embedding", lit(null).cast("array<float>"))
      .withColumn("file_path", concat(lit("docs/"), col("doc_id")))
      .withColumn("header_path", lit(""))
      .withColumn("line_start", lit(1)).withColumn("line_end", lit(1))

  private def settingsDf = Seq(Setting("embedding_model", "test")).toDF()

  private def contents(dir: String): Set[String] =
    IndexData.load(spark, dir).documents
      .select("doc_id").as[String].collect().toSet

  test("write onto a live artifact: a FAILING lineage leaves the original " +
      "table set fully intact and loadable (no torn read, no marker)") {
    val dir = Files.createTempDirectory("livewrite-fail").toString
    IndexData.write(docsDf(Seq("d1" -> "spark runs fast")), settingsDf, dir)
    val before = IndexData.artifactVersion(spark, dir)

    // a lineage that throws mid-scan. clusterById = false is the worst
    // case: the pre-routing in-place path pointed this write straight at
    // <dir>/documents in overwrite mode — the failure would have destroyed
    // the live documents table before any other table was touched
    val boom = org.apache.spark.sql.functions.udf { (_: String) =>
      sys.error("injected lineage failure"): String
    }
    val bad = docsDf(Seq("d2" -> "new corpus")).withColumn("content", boom(col("content")))
    intercept[Exception] {
      IndexData.write(bad, settingsDf, dir, clusterById = false)
    }

    // original artifact intact: same fingerprint modulo uncommitted staging
    // debris (which load() and the fingerprint both ignore — no _COMMIT)
    assert(contents(dir) == Set("d1"),
      "failed write must leave the live artifact serving the old base")
    val after = IndexData.artifactVersion(spark, dir)
    assert(after == before,
      s"failed write moved the committed fingerprint:\n$before\nvs\n$after")
  }

  test("write and save onto a live artifact stage+swap: the new base lands " +
      "atomically and the staging dir is gone") {
    val dir = Files.createTempDirectory("livewrite-swap").toString
    IndexData.write(docsDf(Seq("d1" -> "spark runs fast")), settingsDf, dir)

    IndexData.write(docsDf(Seq("d2" -> "volcano model", "d3" -> "iterator tree")),
      settingsDf, dir)
    assert(contents(dir) == Set("d2", "d3"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, IndexData.CompactStagingDir)),
      "staging must be retired by the swap")

    // instance save() routes the same way — and with positions STRIPPED
    // from the instance: save must re-derive and stage them (a swap whose
    // staging lacked positions would leave the old base's sidecar serving
    // stale phrase results against the new corpus)
    val idx = IndexData.load(spark, dir)
    assert(idx.positions.isDefined)
    idx.copy(documents = idx.documents.filter(col("doc_id") === "d2"),
        positions = None)
      .save(dir)
    assert(contents(dir) == Set("d2"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, IndexData.CompactStagingDir)))
    val reloaded = IndexData.load(spark, dir)
    val pos = reloaded.positions.getOrElse(fail("save must re-derive positions"))
    assert(graft.search.PhraseSearch.phraseMatches(pos, Seq("iterator", "tree"))
      .collect().isEmpty, "stale positions from the d3 base survived the swap")
    assert(graft.search.PhraseSearch.phraseMatches(pos, Seq("volcano", "model"))
      .collect().map(_.getString(0)).toSeq == Seq("d2"))
  }
}
