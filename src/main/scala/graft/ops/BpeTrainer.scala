package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training — the iterative inner loop of building a
  * byte-pair-encoding tokenizer over a corpus (q_bpe_pairs computes ONE
  * round's statistic; this runs the actual loop). Each round:
  *
  *  1. count adjacent symbol pairs corpus-wide (map-only pair generation +
  *     one partial-agg'd groupBy — the q_bpe_pairs shape);
  *  2. pick the argmax pair by (count desc, pair asc) — a ONE-ROW
  *     TakeOrdered to the driver. Vocabulary decisions are scalars; this is
  *     the legitimate driver-side step of every distributed tokenizer
  *     trainer (the corpus itself never moves). The pair tiebreak is
  *     Spark's string order — BINARY UTF-8 BYTE order, which differs from
  *     Java's UTF-16 code-unit order for supplementary-plane characters;
  *     any external replay must compare UTF-8 bytes (BpeTrainerSpec does);
  *  3. apply the merge corpus-wide as a map-only left fold (greedy,
  *     non-overlapping, left-to-right — standard BPE apply semantics),
  *     expressed with the `aggregate` HOF so it stays inside codegen.
  *
  * Lineage is cut each round (`localCheckpoint`), so the plan doesn't nest
  * `nMerges` fold expressions deep. At 100 TB each round is one scan + one
  * skinny shuffle of (pair, count) partials; rounds are inherently
  * sequential (merge k+1's statistics depend on merge k), exactly like any
  * production BPE/WordPiece trainer.
  *
  * Merged symbols join with '+' (originals here are '+'-free words), so a
  * merged symbol can never equal its own left part and retrigger within a
  * round.
  */
object BpeTrainer {

  final case class Merge(rank: Int, left: String, right: String, n: Long)

  /** Greedy left-to-right merge of adjacent (a, b) into "a+b". */
  private[ops] def applyMerge(sym: Column, a: String, b: String): Column =
    aggregate(
      sym,
      array().cast("array<string>"),
      (out, x) =>
        // nested whens: the element_at only evaluates when out is non-empty
        // (ANSI mode errors on out-of-bounds element_at)
        when(size(out) === 0, concat(out, array(x)))
          .otherwise(
            when(element_at(out, -1) === lit(a) && x === lit(b),
              concat(slice(out, lit(1), size(out) - 1), array(lit(a + "+" + b))))
              .otherwise(concat(out, array(x)))))

  /** Adjacent-pair counts of the current symbol arrays (the q_bpe_pairs
    * statistic, as a reusable step). */
  private def pairCounts(df: DataFrame, symCol: String): DataFrame =
    df.filter(size(col(symCol)) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col(symCol)) - 1),
        i => struct(element_at(col(symCol), i).as("left"),
          element_at(col(symCol), i + 1).as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(count(lit(1)).as("n"))

  /** Learn `nMerges` merges over `df`'s `symCol` (array<string>). Returns
    * the ordered merge table and the final re-tokenized corpus. Stops early
    * if no pair occurs at least `minCount` times. Lineage is cut every
    * round — measured: deferring the checkpoint makes the next round's
    * pair count re-execute the pending fold and costs MORE than the
    * materialization it saves. */
  def train(df: DataFrame, symCol: String, nMerges: Int, minCount: Long = 2L)
      : (Seq[Merge], DataFrame) = {
    var cur = df.localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val top = pairCounts(cur, symCol)
        .orderBy(col("n").desc, col("left").asc, col("right").asc)
        .limit(1).collect()
      top.headOption.filter(_.getAs[Long]("n") >= minCount) match {
        case Some(r) =>
          val (a, b, n) = (r.getAs[String]("left"), r.getAs[String]("right"),
            r.getAs[Long]("n"))
          merges += Merge(rank, a, b, n)
          val prev = cur
          cur = cur.withColumn(symCol, applyMerge(col(symCol), a, b))
            .localCheckpoint()
          // free the previous round's checkpoint blocks once the new one is
          // materialized — otherwise cached blocks accumulate linearly in
          // nMerges (thousands of rounds for a real tokenizer)
          prev.unpersist(blocking = false)
          rank += 1
        case None => exhausted = true
      }
    }
    (merges.result(), cur)
  }
}
