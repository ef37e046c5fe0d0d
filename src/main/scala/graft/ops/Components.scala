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
  * Algorithm: alternating large-star/small-star (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC '14). Each round rewires every
  * edge toward the locally-known minimum:
  *
  *  - large-star(u): every STRICTLY LARGER neighbor of `u` is re-attached to
  *    `min(Γ(u) ∪ {u})`;
  *  - small-star(u): every smaller-or-equal neighbor (and `u` itself) is
  *    re-attached to `min(Γ⁻(u) ∪ {u})`.
  *
  * Both operations preserve connectivity, and the alternation converges in
  * O(log n) rounds in practice (O(log² n) proven) — a function of component
  * SIZE, not diameter, so chain-shaped near-dup clusters (overlapping
  * shingle chains) that would take diameter rounds under plain min-label
  * propagation settle logarithmically. At the fixpoint the edge set is a
  * forest of stars, each centered at its component's minimum id.
  *
  * Scale posture: each half-round is one hash-shuffle groupBy(min) + one
  * equi-join on node id over the CURRENT edge set — no all-pairs anything,
  * and the edge set an LSH dedup feeds in is already band-bucketed
  * (|E| ≪ |V|²). Star-rewiring also concentrates edges onto component
  * minima, so the working set shrinks monotonically toward one edge per
  * non-root node. Lineage is cut every round (`localCheckpoint`) so the
  * plan doesn't grow across iterations.
  */
object Components {

  /** (id, component) for every node in `nodes`, where `component` is the
    * minimum node id reachable through `edges` (undirected). Nodes with no
    * edges are their own singleton component. Deterministic. */
  def connectedComponents(
      nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30): DataFrame = {
    // canonical undirected edge set: (larger, smaller), deduped, no loops
    var cur = edges
      .select(greatest(col(srcCol), col(dstCol)).as("u"),
        least(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = smallStar(largeStar(cur)).localCheckpoint()
      // both sides are distinct sets: equal size + empty one-way difference
      // ⇒ set equality (the fixpoint test from the paper)
      converged = next.count() == cur.count() && next.except(cur).isEmpty
      // the fixpoint test above is the last read of `cur` — drop its
      // checkpoint blocks so memory stays O(1) in rounds, not O(log n)
      cur.unpersist(blocking = false)
      cur = next
      i += 1
    }
    require(converged,
      s"connectedComponents (large-star/small-star) did not converge in $maxIter " +
        s"rounds — rounds grow ~log(component size), so this graph is either " +
        s"astronomically large or the edge input is unstable; raise maxIter or " +
        s"inspect the edges feeding this call (e.g. q_dedup_components' LSH pairs)")

    // fixpoint edges form stars (child → component-min root); min() is
    // defensive — at the fixpoint each child carries exactly one root
    val roots = cur.groupBy(col("u").as("id")).agg(min(col("v")).as("comp"))
    nodes.select(col(idCol).as("id")).distinct()
      .join(roots, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** Re-attach each node's strictly larger neighbors to its local minimum:
    * emit (v, min(Γ(u) ∪ {u})) for every v ∈ Γ(u), v > u. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val m = sym.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    sym.filter(col("v") > col("u"))
      .join(m, Seq("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Re-attach each node's smaller neighbors (and itself) to the minimum of
    * those neighbors: with edges oriented (u > v), emit (v, min(Γ⁻(u))) for
    * every v ∈ Γ⁻(u) plus (u, min(Γ⁻(u))). */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = e
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
    val m = or.groupBy("u").agg(min(col("v")).as("m"))
    val nbr = or.join(m, Seq("u")).select(col("v").as("u"), col("m").as("v"))
    nbr.union(m.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }
}
