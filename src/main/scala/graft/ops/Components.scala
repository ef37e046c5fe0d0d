package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a candidate-pair graph — the step AFTER
  * near-dup detection in a training-data pipeline: LSH/MinHash emits
  * pairwise edges, but dedup decisions need the transitive closure (if A≈B
  * and B≈C, all three are one cluster and exactly one representative
  * survives). Reference scope ends at pairwise candidates; this is the
  * pipeline extension (SURVEY.md §2 pipeline surface).
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round every node takes the min of its own label and its
  * neighbors' labels; fixpoint = every node carries the min node id of its
  * component (the deterministic canonical representative).
  *
  * Scale posture: each round is one equi-join on node id (hash shuffle) +
  * one partial-aggregated groupBy — no all-pairs anything, and the edge set
  * an LSH dedup feeds in is already band-bucketed (|E| ≪ |V|²). Rounds =
  * graph diameter; near-dup clusters are small and dense (diameter ≤ 3-4 in
  * practice) so the loop converges in a handful of rounds. For adversarial
  * long-chain graphs the known upgrade is large-star/small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
  * '14), which converges in O(log n) rounds with the same per-round shape —
  * the loop body below is deliberately factored so that swap is local.
  * Lineage is cut every round (`localCheckpoint`) so the plan doesn't grow
  * exponentially across iterations.
  */
object Components {

  /** (id, component) for every node in `nodes`, where `component` is the
    * minimum node id reachable through `edges` (undirected). Nodes with no
    * edges are their own singleton component. Deterministic. */
  def connectedComponents(
      nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    // symmetrize once; candidate pairs arrive deduped but direction matters
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint()

    var labels = nodes.select(col(idCol).as("id"))
      .distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()

    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // min label among each node's neighbors (map-side partial min first)
      val nbrMin = sym
        .join(labels.select(col("id").as("b"), col("comp").as("nc")), Seq("b"))
        .groupBy(col("a").as("id")).agg(min(col("nc")).as("nbr"))
      // carry the previous label through the merge join so convergence is a
      // filter on this frame — not a third full-label-set join per round
      val stepped = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"),
          col("comp").as("prev"))
        .localCheckpoint()
      changed = stepped.filter(col("comp") =!= col("prev")).count()
      labels = stepped.select("id", "comp")
      i += 1
    }
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }
}
