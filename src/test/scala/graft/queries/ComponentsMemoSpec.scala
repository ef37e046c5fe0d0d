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
}
