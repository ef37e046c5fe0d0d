package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(
        nodes.toDF("id"), "id",
        edges.toDF("s", "t"), "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains, triangles and singletons resolve to min-id components") {
    val got = run(
      nodes = (0L to 9L) :+ 42L,
      // chain 0-1-2-3, triangle 5-6-7 (+ redundant edge), pair 8-9
      edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (5L, 7L), (9L, 8L)))
    assert(got == Map(
      0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 4L, 42L -> 42L,
      5L -> 5L, 6L -> 5L, 7L -> 5L,
      8L -> 8L, 9L -> 8L))
  }

  test("a long path converges (diameter-bound iteration, not a fixed count)") {
    val n = 18L
    val got = run((0L to n), (0L until n).map(i => (i, i + 1)))
    assert(got.values.toSet == Set(0L))
  }

  test("random graphs match a driver-side union-find oracle") {
    val rnd = new scala.util.Random(4242)
    for (_ <- 1 to 5) {
      val n = 30 + rnd.nextInt(40)
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      // union-find where union parents the larger root under the smaller —
      // every root is its component's minimum id, same contract as the op
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      assert(run((0L until n.toLong), edges) == expected)
    }
  }

  test("edge direction is irrelevant") {
    assert(run(Seq(1L, 2L, 3L), Seq((3L, 2L), (2L, 1L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
