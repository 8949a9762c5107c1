package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference labeling: plain union-find on the driver. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def sparkLabels(edges: Seq[(Long, Long)],
      localThreshold: Long = 4L << 20): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.labels(edges.toDF("src", "dst"), "src", "dst",
        localThreshold = localThreshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("labels match union-find on seeded random graphs (driver finish)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 30 + trial * 25
      val edges = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      assert(sparkLabels(edges) === unionFind(edges),
        s"trial $trial with $n edges")
    }
  }

  test("pure distributed star rounds (localThreshold=0) agree with union-find") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(60)((rnd.nextInt(35).toLong, rnd.nextInt(35).toLong))
    assert(sparkLabels(edges, localThreshold = 0L) === unionFind(edges))
  }

  test("path graph (worst case for naive propagation) converges to one min") {
    val path = (1L until 64L).map(i => (i, i + 1))
    val got = sparkLabels(path, localThreshold = 0L)
    assert(got.size === 64 && got.values.forall(_ == 1L))
  }

  test("self-loops, duplicates, and isolated components are handled") {
    val edges = Seq((7L, 7L), (1L, 2L), (2L, 1L), (10L, 11L))
    assert(sparkLabels(edges) ===
      Map(7L -> 7L, 1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("cut list drops every non-representative exactly once") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 20L)).toDF("src", "dst")
    val cut = ConnectedComponents.cutList(edges, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(cut.toSeq === Seq((2L, 1L), (3L, 1L), (20L, 10L)))
  }
}
