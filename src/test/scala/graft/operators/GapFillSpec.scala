package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.TestSpark

class GapFillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def obs(rows: (String, Long, java.lang.Double)*) = {
    import spark.implicits._
    rows.toDF("sensor", "ts", "v")
  }

  private def run(df: org.apache.spark.sql.DataFrame, grain: Long,
      interp: Boolean = true) =
    GapFill.resample(df, Seq("sensor"), "ts", grain,
      cellAgg = sum(col("v").cast("decimal(18,4)")).cast("double") / count(col("v")),
      interpolate = interp)
      .orderBy("sensor", "cell_ts")

  test("densifies the span, forward-fills, and interpolates interior gaps") {
    // sensor a: obs at cells 0 (v=10) and 5 (v=40) under grain=10
    val out = run(obs(("a", 3L, 10.0), ("a", 51L, 40.0)), grain = 10L).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 10L, 20L, 30L, 40L, 50L))
    assert(out.map(_.getInt(2)).toSeq == Seq(1, 0, 0, 0, 0, 1))
    assert(out.map(_.getDouble(3)).toSeq == Seq(10.0, 10.0, 10.0, 10.0, 10.0, 40.0))
    // lerp: 10 + (40-10) * k/5
    assert(out.map(_.getDouble(4)).toSeq == Seq(10.0, 16.0, 22.0, 28.0, 34.0, 40.0))
  }

  test("keys are independent; single-observation keys emit one cell") {
    val out = run(obs(("a", 0L, 1.0), ("a", 25L, 2.0), ("b", 100L, 7.0)),
      grain = 10L)
    val a = out.where(col("sensor") === "a").collect()
    val b = out.where(col("sensor") === "b").collect()
    assert(a.map(_.getLong(1)).toSeq == Seq(0L, 10L, 20L))
    assert(b.map(_.getLong(1)).toSeq == Seq(100L))
    assert(b.head.getDouble(3) == 7.0 && b.head.getInt(2) == 1)
  }

  test("multiple observations in one cell reduce through cellAgg (exact avg)") {
    val out = run(obs(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 9L, 3.0)),
      grain = 10L).collect()
    assert(out.length == 1 && out.head.getDouble(3) == 2.0)
  }

  test("an all-null cell counts as unobserved and is filled through") {
    val out = run(obs(("a", 0L, 5.0), ("a", 15L, null), ("a", 25L, 8.0)),
      grain = 10L).collect()
    assert(out.map(_.getInt(2)).toSeq == Seq(1, 0, 1))
    assert(out.map(_.getDouble(3)).toSeq == Seq(5.0, 5.0, 8.0))
    assert(out.map(_.getDouble(4)).toSeq == Seq(5.0, 6.5, 8.0))
  }

  test("negative timestamps bucket by exact floor division, not truncation") {
    // ts=-5 under grain=10 is cell -1 (floor), not 0 (truncate)
    val out = run(obs(("a", -5L, 1.0), ("a", 12L, 4.0)), grain = 10L).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(-10L, 0L, 10L))
    assert(out.map(_.getDouble(4)).toSeq == Seq(1.0, 2.5, 4.0))
  }

  test("explodeRange equals the plain range for every slice alignment") {
    import spark.implicits._
    // spans that end exactly on, one short of, and one past slice edges,
    // plus negative and single-cell spans — at a tiny slice width so a few
    // rows cross many slices
    val cases = Seq((0L, 0L), (0L, 6L), (0L, 7L), (0L, 8L), (-13L, 5L),
      (-8L, -8L), (3L, 20L), (Long.MaxValue - 3L, Long.MaxValue))
    cases.foreach { case (lo, hi) =>
      val out = Densify.explodeRange(Seq((lo, hi)).toDF("l", "h"),
        col("l"), col("h"), "x", slice = 7L)
        .select(col("x")).collect().map(_.getLong(0)).toSeq
      assert(out == (lo to hi).toSeq, s"range [$lo, $hi]")
      assert(out.distinct == out, s"duplicates in [$lo, $hi]")
    }
  }

  test("a 10^8-cell span densifies at bounded executor memory") {
    import spark.implicits._
    // the single-sequence form would build one 10^8-element (≈800 MB)
    // array value inside one row before exploding; the sliced form caps
    // per-row transient memory at SliceCells longs. The count streaming
    // through is the whole assertion — an unbounded array would OOM the
    // executor thread long before it finished.
    val n = 100000000L
    val cnt = Densify.explodeRange(Seq((0L, n - 1L)).toDF("l", "h"),
      col("l"), col("h"), "x")
      .agg(count(lit(1)), min(col("x")), max(col("x"))).head()
    assert(cnt.getLong(0) == n && cnt.getLong(1) == 0L && cnt.getLong(2) == n - 1L)
  }

  test("grid generation is distributed (no driver-side collect in the plan)") {
    val plan = run(obs(("a", 0L, 1.0), ("a", 99L, 2.0)), grain = 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate") && plan.contains("sequence"),
      s"expected a distributed sequence-explode, got:\n$plan")
  }
}
