package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.TestSpark

/** graft.operators.CountMin — battery q104's operator. The sketch is its
  * own spec (portable integer arithmetic): a straight-line Scala model
  * must reproduce every estimate exactly, and the classic CM guarantees
  * (never underestimate; exact when collision-free; mergeable by
  * elementwise sum) must hold structurally. */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def h56(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(14), 16)
  }

  /** Reference model: the Scaladoc's formulas, straight-line Scala. */
  private def modelEstimates(keys: Seq[String]): Map[String, Long] = {
    val counters = Array.fill(CountMin.Depth, CountMin.Width)(0L)
    def slot(k: String, i: Int) = (h56(s"$i:$k") % CountMin.Width).toInt
    keys.foreach { k =>
      (0 until CountMin.Depth).foreach(i => counters(i)(slot(k, i)) += 1L)
    }
    keys.distinct.map { k =>
      k -> (0 until CountMin.Depth).map(i => counters(i)(slot(k, i))).min
    }.toMap
  }

  private def zipf(n: Int): Seq[String] =
    (0 until n).map(j => s"key${(math.sqrt(j).toInt)}") // heavy head, long tail

  test("estimates equal the straight-line model exactly (it is the spec)") {
    import spark.implicits._
    val keys = zipf(6000)
    val df = keys.toDF("k")
    val got = CountMin.estimate(CountMin.sketch(df, Nil, "k"), df, Nil, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = modelEstimates(keys)
    assert(got === want)
  }

  test("never underestimates; exact for most keys at light load") {
    import spark.implicits._
    val keys = zipf(6000)
    val df = keys.toDF("k")
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = CountMin.estimate(CountMin.sketch(df, Nil, "k"), df, Nil, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"CM underestimated $k: ${est(k)} < $c")
    }
    // ~78 distinct keys across 4x256 counters: the heavy hitters at least
    // must come out exact (a collision with the head is vanishingly likely
    // across all 4 rows at this load)
    val head = exact.toSeq.sortBy(-_._2).take(5)
    head.foreach { case (k, c) => assert(est(k) === c, s"head key $k inexact") }
  }

  test("unseen keys estimate 0 through an absent slot") {
    import spark.implicits._
    val df = Seq("a", "b", "c").toDF("k")
    val probes = Seq("a", "zzz-not-there").toDF("k")
    val est = CountMin.estimate(CountMin.sketch(df, Nil, "k"), probes, Nil, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") === 1L)
    // 3 occupied slots out of 256 per row: overwhelmingly the probe misses
    // at least one row's occupied slots → exact 0 (and never negative)
    assert(est("zzz-not-there") === 0L)
  }

  test("sketches of disjoint shards merge by elementwise sum") {
    import spark.implicits._
    val a = zipf(3000).toDF("k")
    val b = zipf(6000).drop(3000).toDF("k")
    val whole = a.union(b)
    val merged = CountMin.sketch(a, Nil, "k").union(CountMin.sketch(b, Nil, "k"))
      .groupBy(col("i"), col("slot")).agg(sum(col("c")).as("c"))
    val estMerged = CountMin.estimate(merged, whole, Nil, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val estWhole = CountMin.estimate(CountMin.sketch(whole, Nil, "k"), whole, Nil, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estMerged === estWhole)
  }

  test("per-group sketches stay independent") {
    import spark.implicits._
    val df = (zipf(2000).map(("g1", _)) ++ zipf(500).map(("g2", _))).toDF("g", "k")
    val est = CountMin.estimate(CountMin.sketch(df, Seq("g"), "k"), df, Seq("g"), "k")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val g1 = modelEstimates(zipf(2000))
    val g2 = modelEstimates(zipf(500))
    g1.foreach { case (k, v) => assert(est(("g1", k)) === v) }
    g2.foreach { case (k, v) => assert(est(("g2", k)) === v) }
  }
}
