package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.TestSpark

/** graft.operators.PageRank — battery q114's operator. Integer fixed-point
  * arithmetic means a straight-line Scala model must reproduce every rank
  * EXACTLY (not approximately), independent of partitioning; plus the
  * structural PageRank facts a by-eye graph shows. */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The Scaladoc's formulas, straight-line: same floor divisions. */
  private def model(edges: Seq[(Long, Long)], iters: Int,
      total: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val r0 = total / nodes.size
    val base15 = r0 * 15L / 100L
    var ranks = nodes.map(_ -> r0).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => ranks(s) / outdeg(s) }.sum
      }
      ranks = nodes.map(n => n -> (base15 + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    ranks
  }

  private val diamond = Seq( // 1 feeds 2 and 3; both feed 4; 4 loops to 1
    (1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 1L))

  test("ranks equal the straight-line model exactly (it is the spec)") {
    import spark.implicits._
    for (parts <- Seq(1, 7); iters <- Seq(1, 3, 5)) {
      val got = PageRank.run(diamond.toDF("src", "dst").repartition(parts), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === model(diamond, iters), s"parts=$parts iters=$iters")
    }
  }

  test("structure: the double-fed sink outranks its feeders; mass never grows") {
    import spark.implicits._
    val got = PageRank.run(diamond.toDF("src", "dst"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(4L) > got(2L) && got(4L) > got(3L),
      "node 4 receives two full streams and must outrank the split feeders")
    assert(got(2L) === got(3L), "symmetric nodes must tie exactly")
    assert(got.values.sum <= 1000000000000L,
      "floor division may leak mass but can never create it")
  }

  test("dangling mass is dropped deterministically (sink with no out-edges)") {
    import spark.implicits._
    val dangling = Seq((1L, 2L), (2L, 3L)) // 3 has no out-edges
    val got = PageRank.run(dangling.toDF("src", "dst"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === model(dangling, 4))
    assert(got(1L) < got(2L) && got(2L) < got(3L))
  }

  test("deep runs: lineage truncation keeps the plan bounded and ranks exact") {
    import spark.implicits._
    val iters = 24
    // checkpointEvery=4 truncates 5 times over 24 iterations; the returned
    // frame's logical plan must be at most ~one truncation window deep, not
    // 24 nested joins — and the ranks must equal the straight-line model
    // bit-for-bit (truncation is plan surgery, never arithmetic).
    val got = PageRank.run(diamond.toDF("src", "dst"), iters, checkpointEvery = 4)
    val planDepth = got.queryExecution.logical.collect { case p => p }.size
    val untruncated = PageRank.run(diamond.toDF("src", "dst"), 6)
    val untruncDepth = untruncated.queryExecution.logical.collect { case p => p }.size
    assert(planDepth <= untruncDepth,
      s"24-iteration truncated plan ($planDepth nodes) must be no deeper than " +
        s"an untruncated 6-iteration plan ($untruncDepth nodes)")
    val ranks = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks === model(diamond, iters))
  }

  test("convergeEarly stops at the integer fixpoint with the fixpoint's ranks") {
    import spark.implicits._
    // the two-cycle reaches its integer fixpoint quickly; 50 requested
    // iterations with convergeEarly must return exactly the 50-iteration
    // model (the fixpoint IS the model's value from then on)
    val cyc = Seq((1L, 2L), (2L, 1L))
    val got = PageRank.run(cyc.toDF("src", "dst"), 50, convergeEarly = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === model(cyc, 50))
  }

  test("guards: empty edges and oversized totalUnits fail loudly") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    intercept[IllegalArgumentException](PageRank.run(empty, 3))
    intercept[IllegalArgumentException](
      PageRank.run(diamond.toDF("src", "dst"), 1, totalUnits = Long.MaxValue))
  }
}
