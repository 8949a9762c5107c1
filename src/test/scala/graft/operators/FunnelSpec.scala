package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.TestSpark

/** graft.operators.Funnel — battery q119's operator. Depth is STRICT-ORDER
  * semantics: a later step before the earliest qualifying earlier step
  * does not count, and ties do not advance. */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val steps = Seq("view", "click", "purchase")

  private def depths(rows: Seq[(Long, String, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Funnel.depths(rows.toDF("u", "t", "ts"), "u", "t", "ts", steps)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("strict-order depth on crafted sequences") {
    val got = depths(Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L), // full
      (2L, "click", 5L), (2L, "view", 10L),                         // click BEFORE view: depth 1
      (3L, "view", 10L), (3L, "purchase", 20L),                     // skipped click: depth 1
      (4L, "error", 10L),                                            // never entered: 0
      (5L, "view", 10L), (5L, "click", 10L),                         // tie does not advance: 1
      (6L, "view", 50L), (6L, "click", 60L), (6L, "purchase", 55L),  // purchase before click: 2
      (7L, "view", 1L), (7L, "view", 100L), (7L, "click", 2L),       // earliest view counts: 2
      (8L, "click", 1L), (8L, "view", 2L), (8L, "click", 3L),
      (8L, "purchase", 4L)))                                         // re-click after view: 3
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 0L,
      5L -> 1L, 6L -> 2L, 7L -> 2L, 8L -> 3L))
  }

  private def depthsGap(rows: Seq[(Long, String, Long)], gap: Long): Map[Long, Long] = {
    import spark.implicits._
    Funnel.depths(rows.toDF("u", "t", "ts"), "u", "t", "ts", steps, Some(gap))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("conversion window: a step outside maxGap does not advance the funnel") {
    val got = depthsGap(Seq(
      (1L, "view", 10L), (1L, "click", 15L), (1L, "purchase", 20L), // within gaps: 3
      (2L, "view", 10L), (2L, "click", 21L),                        // 11 > gap 10: depth 1
      (3L, "view", 10L), (3L, "click", 20L),                        // exactly gap: counts, 2
      (4L, "view", 10L), (4L, "click", 15L), (4L, "purchase", 26L), // purchase 11 after click: 2
      // greedy earliest-step semantics: the t=5 view opens the (5,15]
      // window, the click at 30 misses it even though the t=25 view would
      // have caught it — the chain keeps each step's EARLIEST time
      (5L, "view", 5L), (5L, "view", 25L), (5L, "click", 30L)),
      gap = 10L)
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
    // same data, no window: all windows-misses become hits
    val unwindowed = depths(Seq(
      (2L, "view", 10L), (2L, "click", 21L),
      (5L, "view", 5L), (5L, "view", 25L), (5L, "click", 30L)))
    assert(unwindowed === Map(2L -> 2L, 5L -> 2L))
  }

  test("maxGap guards: non-numeric ts and non-positive gap are rejected") {
    import spark.implicits._
    val tsDf = Seq((1L, "view", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("u", "t", "ts")
    intercept[IllegalArgumentException](
      Funnel.depths(tsDf, "u", "t", "ts", steps, Some(10L)))
    val ok = Seq((1L, "view", 1L)).toDF("u", "t", "ts")
    intercept[IllegalArgumentException](
      Funnel.depths(ok, "u", "t", "ts", steps, Some(0L)))
  }

  test("the windowed funnel still costs one exchange on the user column") {
    import spark.implicits._
    val df = (0L until 200L).map(i =>
      (i % 20, steps(i.toInt % 3), i)).toDF("u", "t", "ts")
    val plan = {
      val d = Funnel.report(df, "u", "t", "ts", steps, Some(25L))
      d.collect()
      graft.core.TestSpark.finalPlan(d)
    }
    val userEx = "Exchange hashpartitioning\\(u#".r.findAllIn(plan).size
    assert(userEx == 1, s"expected ONE user-keyed exchange, got $userEx:\n$plan")
  }

  test("the whole funnel costs one exchange on the user column") {
    import spark.implicits._
    val df = (0L until 200L).map(i =>
      (i % 20, steps(i.toInt % 3), i)).toDF("u", "t", "ts")
    val plan = {
      val d = Funnel.report(df, "u", "t", "ts", steps)
      d.collect()
      graft.core.TestSpark.finalPlan(d)
    }
    // ONE exchange of the events on the user column — all three chained
    // windows and the per-user depth aggregate reuse it; the only other
    // exchange moves the k+1-row depth report, not data
    val userEx = "Exchange hashpartitioning\\(u#".r.findAllIn(plan).size
    assert(userEx == 1, s"expected ONE user-keyed exchange, got $userEx:\n$plan")
  }
}
