package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the session-scoped materialize-once of the cluster-resolution
  * prefix: after any of the three consumer queries runs, the others' plans
  * read the checkpointed components RDD instead of re-deriving the LSH
  * pair machinery (shingles → minhash → bands → verify → components). */
class ComponentsMemoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("cluster-resolution trio shares one materialized components frame") {
    // first access builds (and checkpoints) the prefix
    val comp = q("q_dedup_components").collect()
    assert(comp.nonEmpty)

    // every trio member's plan must now be a checkpoint read: no Generate
    // (the shingle/minhash explode) and no documents re-scan below it —
    // the same materialize-once shape CuratePipelineSpec pins for the chain
    Seq("q_dedup_components", "q_dedup_keep_longest", "q_split_by_cluster")
      .foreach { name =>
        val plan = q(name).queryExecution.optimizedPlan
        val gens = plan.collect {
          case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }
        val rdds = plan.collect {
          case r: org.apache.spark.sql.execution.LogicalRDD => r }
        assert(gens.isEmpty, s"$name re-derives the pair machinery")
        assert(rdds.nonEmpty, s"$name does not read the checkpoint")
      }

    // and the memoized result is the one the consumers actually serve:
    // canonical flags agree between the components view and keep-longest
    val keep = q("q_dedup_keep_longest").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component")).toMap
    comp.foreach { r =>
      assert(keep(r.getAs[Long]("doc_id")) == r.getAs[Long]("component"))
    }
  }

  test("memo invalidates when the corpus is regenerated in place") {
    // the memo key carries a listing fingerprint (name + length + mtime) of
    // documents.parquet, so overwriting the corpus under an unchanged dir
    // path must recompute components, not serve the stale checkpoint
    val tmp = java.nio.file.Files.createTempDirectory("memo_stale").toString
    val full = spark.read.parquet(s"$dir/documents.parquet").collect()
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    def writeDocs(rows: Array[org.apache.spark.sql.Row]): Unit =
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toIndexedSeq, 2), schema)
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    writeDocs(full)
    val n1 = graft.SparkEntry.queries("q_dedup_components")(spark, tmp).count()
    assert(n1 == full.length.toLong)

    // regenerate in place with half the corpus: a stale memo would keep
    // reporting the old doc count
    writeDocs(full.take(full.length / 2))
    val n2 = graft.SparkEntry.queries("q_dedup_components")(spark, tmp).count()
    assert(n2 == (full.length / 2).toLong,
      s"memo served stale components: got $n2 rows for a ${full.length / 2}-doc corpus")
  }

  test("clearComponentsMemo forces a rebuild that still serves correct results") {
    val before = q("q_dedup_components").collect()
    graft.queries.PipelineQueries.clearComponentsMemo()
    val after = q("q_dedup_components").collect()
    assert(after.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ==
      before.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
  }
}
