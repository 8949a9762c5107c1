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

  private def bruteOverlap(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    a.where(col("alo") <= col("ahi")).crossJoin(b.where(col("blo") <= col("bhi")))
      .where(col("alo") <= col("bhi") && col("blo") <= col("ahi"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def ovPairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("interval overlap matches brute force exactly, each pair exactly once") {
    import spark.implicits._
    val a = (0 until 150).map { i =>
      val lo = h(i, 41L, 8000L); (i.toLong, lo, lo + h(i, 43L, 700L))
    }.toDF("aid", "alo", "ahi")
    // include inverted (lo > hi) rows: they must match nothing
    val b = ((0 until 100).map { i =>
      val lo = h(i, 47L, 8000L); (i.toLong, lo, lo + h(i, 53L, 500L))
    } :+ ((999L, 5000L, 4000L))).toDF("bid", "blo", "bhi")
    val want = bruteOverlap(a, b)
    for (bk <- Seq(16L, 250L, 4000L)) {
      val got = ovPairs(RangeJoin.intervalOverlap(a, "alo", "ahi", b, "blo", "bhi", bk))
      assert(got.size == got.toSet.size, s"duplicate pairs at bucket=$bk")
      assert(got.toSet == want, s"bucket=$bk")
    }
    // inclusive touching endpoints overlap; disjoint-by-one do not
    val ta = Seq((1L, 0L, 10L)).toDF("aid", "alo", "ahi")
    val tb = Seq((1L, 10L, 20L), (2L, 11L, 20L)).toDF("bid", "blo", "bhi")
    assert(ovPairs(RangeJoin.intervalOverlap(ta, "alo", "ahi", tb, "blo", "bhi", 4L))
      .toSet == Set((1L, 1L)))
  }

  test("interval overlap multi-res: mixed-length sides stay exact, pairs unique") {
    import spark.implicits._
    // left lengths span 4 orders of magnitude (the class axis)
    val a = ((0 until 60).map { i =>
      val lo = h(i, 61L, 50000L); (i.toLong, lo, lo + h(i, 67L, 5L))
    } ++ (60 until 90).map { i =>
      val lo = h(i, 71L, 50000L); (i.toLong, lo, lo + 300L + h(i, 73L, 100L))
    } ++ (90 until 100).map { i =>
      val lo = h(i, 79L, 20000L); (i.toLong, lo, lo + 30000L)
    }).toDF("aid", "alo", "ahi")
    val b = (0 until 80).map { i =>
      val lo = h(i, 83L, 50000L); (i.toLong, lo, lo + h(i, 89L, 800L))
    }.toDF("bid", "blo", "bhi")
    val want = bruteOverlap(a, b)
    val got = ovPairs(RangeJoin.intervalOverlapMultiRes(
      a, "alo", "ahi", b, "blo", "bhi", base = 8L))
    assert(got.size == got.toSet.size, "length classes must partition the left side")
    assert(got.toSet == want)
    // knownMaxLen (loose AND violated) stays exact
    for (bound <- Seq(30000L, 1L << 30, 100L)) {
      val g = ovPairs(RangeJoin.intervalOverlapMultiRes(
        a, "alo", "ahi", b, "blo", "bhi", base = 8L, knownMaxLen = Some(bound)))
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
