package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The extracted connected-components operator: correctness vs a local
  * union-find oracle on a random graph, and the O(log diameter)
  * convergence contract on a worst-case path graph (plain min-label
  * propagation would need diameter rounds; pointer jumping must stay
  * logarithmic — the property that makes the operator usable on
  * web-scale duplicate chains).
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the min root
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("random graph labels match a union-find oracle (root = min node)") {
    val rnd = new scala.util.Random(13)
    val n = 200
    val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val expected = unionFind(n, edges)
    val (labels, _, release) = ConnectedComponents.labels(
      edges.toDF("doc1", "doc2"))
    try {
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // only nodes with at least one edge appear in the result
      got.foreach { case (node, root) =>
        assert(root == expected(node), s"node $node: got $root, want ${expected(node)}")
      }
    } finally release()
  }

  test("path graph (worst-case diameter) converges in O(log d) rounds") {
    val n = 129L // diameter 128: plain propagation would need 128 rounds
    val pairs = spark.range(n - 1).select(col("id").as("doc1"), (col("id") + 1).as("doc2"))
    val (labels, iters, release) = ConnectedComponents.labels(pairs, maxIter = 64)
    try {
      val roots = labels.select("root").distinct().collect().map(_.getLong(0))
      assert(roots.toSeq == Seq(0L), s"expected one component rooted at 0, got ${roots.toSeq}")
      assert(labels.count() == n)
      // min-label + pointer jumping: reach better-than-doubles per round;
      // allow slack over ceil(log2(128)) = 7 for the final no-change round
      assert(iters <= 12, s"path-128 took $iters rounds — propagation is not logarithmic")
    } finally release()
  }
}
