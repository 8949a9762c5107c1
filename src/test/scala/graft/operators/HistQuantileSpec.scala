package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.TestSpark

/** graft.operators.HistQuantile — battery q107's operator. The sketch is
  * its own spec (fixed power-of-two binning, integer rank arithmetic):
  * a straight-line model must reproduce every estimate exactly, the
  * estimate must bound the true quantile within one bin width, and
  * histograms must merge by elementwise sum. */
class HistQuantileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val W = 8L
  private val Ps = Seq((1, 2), (9, 10), (99, 100))

  private def model(xs: Seq[Double]): Map[(Int, Int), Long] = {
    val bins = xs.groupBy(x => math.floor(x / W).toLong)
      .map { case (b, v) => b -> v.size.toLong }.toSeq.sortBy(_._1)
    val n = xs.size.toLong
    Ps.map { case (num, den) =>
      val rank = (n * num + den - 1) / den
      var cum = 0L
      val bin = bins.collectFirst { case (b, c) if { cum += c; cum >= rank } => b }.get
      (num, den) -> bin * W
    }.toMap
  }

  private def run(xs: Seq[Double]): Map[(Int, Int), Long] = {
    import spark.implicits._
    val df = xs.map(("g", _)).toDF("g", "x")
    val h = HistQuantile.histogram(df, Seq("g"), "x", W)
    HistQuantile.quantiles(h, Seq("g"), W, Ps).collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
  }

  test("estimates equal the straight-line model exactly (it is the spec)") {
    val xs = (1 to 997).map(i => (i * 37 % 1000) + 0.25)
    assert(run(xs) === model(xs))
  }

  test("estimate brackets the true quantile within one bin width") {
    val xs = (1 to 2000).map(i => math.pow(1.003, i) * 3.7) // skewed
    val got = run(xs)
    val sorted = xs.sorted
    Ps.foreach { case (num, den) =>
      val rank = ((xs.size.toLong * num + den - 1) / den).toInt
      val truth = sorted(rank - 1)
      val est = got((num, den))
      assert(est <= truth && truth < est + W,
        s"p=$num/$den: est $est must satisfy est <= $truth < est+$W")
    }
  }

  test("negative values bin toward -inf and stay exact") {
    val xs = Seq(-17.5, -16.0, -1.0, 0.0, 1.0, 15.9, 16.0)
    assert(run(xs) === model(xs))
  }

  test("histograms of disjoint shards merge by elementwise sum") {
    import spark.implicits._
    val a = (1 to 500).map(i => ("g", i * 1.5)).toDF("g", "x")
    val b = (501 to 900).map(i => ("g", i * 1.5)).toDF("g", "x")
    val merged = HistQuantile.histogram(a, Seq("g"), "x", W)
      .union(HistQuantile.histogram(b, Seq("g"), "x", W))
      .groupBy(col("g"), col("bin")).agg(sum(col("cnt")).as("cnt"))
    val whole = HistQuantile.histogram(a.union(b), Seq("g"), "x", W)
    val m = HistQuantile.quantiles(merged, Seq("g"), W, Ps).collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    val w = HistQuantile.quantiles(whole, Seq("g"), W, Ps).collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(m === w)
  }

  test("non-power-of-two widths are rejected") {
    import spark.implicits._
    val df = Seq(("g", 1.0)).toDF("g", "x")
    intercept[IllegalArgumentException](HistQuantile.histogram(df, Seq("g"), "x", 10L))
  }
}
