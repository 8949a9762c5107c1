package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // deterministic pseudo-random long in [0, mod) from an index
  private def h(i: Long, salt: Long, mod: Long): Long =
    Math.floorMod(i * 6364136223846793005L + salt * 1442695040888963407L + 11L,
      mod)

  private def points(n: Int, mod: Long) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, h(i, 7L, mod))).toDF("pid", "pt")
  }

  // intervals with lengths up to maxLen, some zero-length
  private def intervals(n: Int, mod: Long, maxLen: Long) = {
    import spark.implicits._
    (0 until n).map { i =>
      val lo = h(i, 13L, mod)
      (i.toLong, lo, lo + h(i, 29L, maxLen + 1))
    }.toDF("iid", "lo", "hi")
  }

  private def brute(p: org.apache.spark.sql.DataFrame,
      iv: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    p.crossJoin(iv).where(col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("matches brute force exactly, each pair exactly once") {
    val p = points(400, 10000L)
    val iv = intervals(120, 10000L, maxLen = 900L) // spans up to ~4 buckets
    val got = pairs(RangeJoin.pointInInterval(p, "pt", iv, "lo", "hi", bucket = 250L))
    val want = brute(p, iv)
    assert(got.size == got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet == want)
  }

  test("bucket far smaller and far larger than interval length both stay exact") {
    val p = points(300, 5000L)
    val iv = intervals(80, 5000L, maxLen = 600L)
    val want = brute(p, iv)
    for (b <- Seq(7L, 64L, 5000L, 100000L)) {
      val got = pairs(RangeJoin.pointInInterval(p, "pt", iv, "lo", "hi", bucket = b))
      assert(got.size == got.toSet.size && got.toSet == want, s"bucket=$b")
    }
  }

  test("an interval replicating across many densify slices stays exact once") {
    import spark.implicits._
    // bucket=1 makes the giant interval replicate to ~200k bucket rows —
    // several Densify slices — alongside short intervals and an lo > hi
    // junk row (matches nothing, its descending slices must be filtered)
    val p = Seq((1L, 0L), (2L, 99999L), (3L, 200000L), (4L, 250000L))
      .toDF("pid", "pt")
    val iv = Seq((10L, 0L, 200000L), (20L, 250000L, 250000L),
      (30L, 5000L, 4000L)).toDF("iid", "lo", "hi")
    val got = pairs(RangeJoin.pointInInterval(p, "pt", iv, "lo", "hi", bucket = 1L))
    assert(got.size == got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet == Set((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L)))
  }

  test("bounds are inclusive on both ends; zero-length intervals match") {
    import spark.implicits._
    val p = Seq((1L, 10L), (2L, 20L), (3L, 15L)).toDF("pid", "pt")
    val iv = Seq((100L, 10L, 20L), (200L, 15L, 15L)).toDF("iid", "lo", "hi")
    val got = pairs(RangeJoin.pointInInterval(p, "pt", iv, "lo", "hi", bucket = 8L))
    assert(got.toSet == Set((1L, 100L), (2L, 100L), (3L, 100L), (3L, 200L)))
  }

  test("negative coordinates bucket by exact floor division across zero") {
    import spark.implicits._
    val p = Seq((1L, -5L), (2L, -1L), (3L, 0L), (4L, 3L)).toDF("pid", "pt")
    val iv = Seq((100L, -6L, 2L)).toDF("iid", "lo", "hi")
    val got = pairs(RangeJoin.pointInInterval(p, "pt", iv, "lo", "hi", bucket = 4L))
    assert(got.toSet == Set((1L, 100L), (2L, 100L), (3L, 100L)))
  }

  test("multi-resolution: wildly mixed interval lengths stay exact, pairs unique") {
    import spark.implicits._
    val p = points(500, 100000L)
    // lengths spanning 5 orders of magnitude: 0..3, ~100, ~10k, ~80k
    val iv = ((0 until 40).map { i =>
      val lo = h(i, 13L, 100000L); (i.toLong, lo, lo + h(i, 29L, 4L))
    } ++ (40 until 70).map { i =>
      val lo = h(i, 17L, 100000L); (i.toLong, lo, lo + 100L + h(i, 31L, 50L))
    } ++ (70 until 90).map { i =>
      val lo = h(i, 19L, 100000L); (i.toLong, lo, lo + 10000L + h(i, 37L, 5000L))
    } ++ (90 until 95).map { i =>
      val lo = h(i, 23L, 20000L); (i.toLong, lo, lo + 80000L)
    }).toDF("iid", "lo", "hi")
    val want = brute(p, iv)
    val got = pairs(RangeJoin.pointInIntervalMultiRes(p, "pt", iv, "lo", "hi", base = 4L))
    assert(got.size == got.toSet.size, "length classes must partition the intervals")
    assert(got.toSet == want)
    // degenerate sides
    val none = RangeJoin.pointInIntervalMultiRes(p, "pt",
      iv.where(col("iid") < 0), "lo", "hi", base = 4L)
    assert(none.count() == 0 && none.columns.length == p.columns.length + 3)
    // caller-known length bound skips the sizing job; a LOOSE bound and a
    // TIGHT (violated) bound must both stay exact — the top class is
    // open-ended, so a longer-than-declared interval still joins
    for (bound <- Seq(80000L, 1000000L, 500L)) {
      val g = pairs(RangeJoin.pointInIntervalMultiRes(p, "pt", iv, "lo", "hi",
        base = 4L, knownMaxLen = Some(bound)))
      assert(g.size == g.toSet.size && g.toSet == want, s"knownMaxLen=$bound")
    }
  }

  test("plans as a shuffled equi-join on the bucket, not a nested-loop join") {
    val p = points(50, 1000L)
    val iv = intervals(20, 1000L, maxLen = 100L)
    val plan = RangeJoin.pointInInterval(p, "pt", iv, "lo", "hi", bucket = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested-loop plan:\n$plan")
  }
}
