package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference: textbook Levenshtein DP. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      d = lev(sa, sb) if d <= k
    } yield (ia, ib, d)).toSet

  private def viaSpark(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] = {
    import spark.implicits._
    FuzzyJoin.pairs(rows.toDF("id", "s"), "id", "s", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("pairs match brute force on random word-ish strings, k=1 and k=2") {
    val rnd = new scala.util.Random(11)
    val vocab = Seq("red", "blue", "bolt", "gear", "ring", "widget", "gizmo")
    val rows = (0L until 120L).map { i =>
      val w = Seq.fill(2 + rnd.nextInt(2))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
      // perturb ~half: delete, substitute, or insert one char
      val s =
        if (rnd.nextBoolean() || w.isEmpty) w
        else rnd.nextInt(3) match {
          case 0 => val p = rnd.nextInt(w.length); w.take(p) + w.drop(p + 1)
          case 1 => val p = rnd.nextInt(w.length)
            w.updated(p, ('a' + rnd.nextInt(26)).toChar)
          case _ => val p = rnd.nextInt(w.length + 1)
            w.take(p) + ('a' + rnd.nextInt(26)).toChar + w.drop(p)
        }
      (i, s)
    }
    for (k <- Seq(1, 2))
      assert(viaSpark(rows, k) === brute(rows, k), s"k=$k")
  }

  test("short strings (below k+1 chars), duplicates, and empties are exact") {
    val rows: Seq[(Long, String)] = Seq(
      0L -> "", 1L -> "a", 2L -> "b", 3L -> "ab", 4L -> "ab",
      5L -> "abc", 6L -> "xy", 7L -> "", 8L -> "ba")
    for (k <- Seq(1, 2))
      assert(viaSpark(rows, k) === brute(rows, k), s"k=$k")
  }

  test("pairs and neighborProfile are exact on duplicate-heavy input") {
    // low-cardinality column: 8 distinct strings over 90 rows — the shape
    // that must NOT explode candidate generation (dedup-first contract)
    val rnd = new scala.util.Random(7)
    val vocab = Seq("red bolt", "red bolz", "red  bolt", "blue gear",
      "blue gea", "zzz", "zz", "qqqqqq")
    val rows = (0L until 90L).map(i => (i, vocab(rnd.nextInt(vocab.size))))
    for (k <- Seq(1, 2)) {
      assert(viaSpark(rows, k) === brute(rows, k), s"pairs k=$k")
      val bruteProfile = rows.map { case (id, s) =>
        val nbs = rows.collect {
          case (j, t) if j != id && lev(s, t) <= k => j
        }
        (id, nbs.size.toLong, if (nbs.isEmpty) -1L else nbs.min)
      }.toSet
      import spark.implicits._
      val got = FuzzyJoin.neighborProfile(rows.toDF("id", "s"), "id", "s", k)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(got === bruteProfile, s"profile k=$k")
    }
  }

  test("neighborProfile counts both directions and keeps isolated ids") {
    import spark.implicits._
    val df = Seq(1L -> "abcd", 2L -> "abce", 3L -> "abcf", 4L -> "zzzzzz")
      .toDF("id", "s")
    val got = FuzzyJoin.neighborProfile(df, "id", "s", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 2L), (2L, 2L, 1L), (3L, 2L, 1L), (4L, 0L, -1L)))
  }
}
