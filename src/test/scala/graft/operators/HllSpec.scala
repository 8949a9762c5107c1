package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.TestSpark

class HllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference model: the Scaladoc's formulas, straight-line Scala. */
  private def modelEstimate(hashes: Seq[Long]): Double = {
    val regs = new Array[Int](Hll.M)
    hashes.foreach { h =>
      val b = (h % 64).toInt
      val w = h / 64
      val tz = if (w == 0L) 64 else java.lang.Long.numberOfTrailingZeros(w)
      val rho = math.min(tz + 1, Hll.RhoCap)
      if (rho > regs(b)) regs(b) = rho
    }
    val t = regs.map(m => 1L << (Hll.RhoCap - m)).sum
    0.709 * 4096.0 * 70368744177664.0 / t.toDouble
  }

  private def h56(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(14), 16)
  }

  test("estimate equals the straight-line model exactly (it is the spec)") {
    import spark.implicits._
    val hashes = (0 until 5000).map(i => h56(s"item:${i % 1700}"))
    val df = hashes.map(h => ("g", h)).toDF("g", "h")
    val got = Hll.approxDistinct(df, Seq("g"), "h")
      .select("est_distinct").as[Double].head()
    assert(got === modelEstimate(hashes))
  }

  test("estimate is duplicate-insensitive and within HLL error bounds") {
    import spark.implicits._
    for (n <- Seq(100, 1000, 20000)) {
      val once = (0 until n).map(i => ("g", h56(s"v:$i"))).toDF("g", "h")
      val thrice = (0 until 3 * n).map(i => ("g", h56(s"v:${i % n}")))
        .toDF("g", "h")
      val e1 = Hll.approxDistinct(once, Seq("g"), "h")
        .select("est_distinct").as[Double].head()
      val e3 = Hll.approxDistinct(thrice, Seq("g"), "h")
        .select("est_distinct").as[Double].head()
      assert(e1 === e3, s"duplicates moved the estimate at n=$n")
      // 1.04/sqrt(64) ~ 13% standard error; allow 4 sigma
      assert(math.abs(e1 - n) / n < 0.52, s"estimate $e1 vs true $n")
    }
  }

  test("registers merge by max across shards (mergeable-sketch contract)") {
    import spark.implicits._
    val a = (0 until 800).map(i => ("g", h56(s"v:$i"))).toDF("g", "h")
    val b = (400 until 1200).map(i => ("g", h56(s"v:$i"))).toDF("g", "h")
    val whole = Hll.approxDistinct(a.union(b), Seq("g"), "h")
      .select("est_distinct").as[Double].head()
    val merged = Hll.estimate(
      Hll.registers(a, Seq("g"), "h").union(Hll.registers(b, Seq("g"), "h"))
        .groupBy("g", "b").agg(max("m").as("m")),
      Seq("g")).select("est_distinct").as[Double].head()
    assert(whole === merged)
  }
}
