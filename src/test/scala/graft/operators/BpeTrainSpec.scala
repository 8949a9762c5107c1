package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** BPE training on the classic Sennrich-style toy vocabulary, with the
  * expected merge sequence computed by hand:
  *   low×5  lower×2  newest×6  widest×3
  *   pair counts: es 9, st 9, we 8, lo 7, ow 7, ne 6, ew 6, wi 3, id 3,
  *   de 3, er 2  →  merge 1 = (e,s) (tie with st broken lexicographically),
  *   merge 2 = (es,t) 9, merge 3 = (l,o) 7 (tie with ow).
  */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def toyWc() = {
    import spark.implicits._
    Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("w", "c")
  }

  test("learned merges match the hand computation, ties lexicographic") {
    val merges = BpeTrain.train(toyWc(), 3)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o")))
  }

  test("merge application is leftmost non-overlapping") {
    import spark.implicits._
    val df = Seq(("aaa", 1L)).toDF("w", "c")
    // one (a,a) merge over "aaa" must give ["aa","a"], not ["aa","aa"]
    val merges = BpeTrain.train(df, 1)
    assert(merges === Seq(("a", "a")))
    assert(BpeTrain.encodeWord("aaa", merges) === Seq("aa", "a"))
    assert(BpeTrain.encodeWord("aaaa", merges) === Seq("aa", "aa"))
  }

  test("encode applies merges in rank order; distributed encode agrees") {
    val merges = BpeTrain.train(toyWc(), 4)
    // "lowest" shares the es/est merges learned from newest/widest
    val direct = BpeTrain.encodeWord("lowest", merges)
    assert(direct.mkString("|").contains("est") || direct.contains("es"),
      s"expected a learned subword in $direct")
    assert(direct.mkString === "lowest") // lossless
    import spark.implicits._
    val dist = BpeTrain.encode(Seq("lowest", "newest").toDF("w"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(dist("lowest") === direct.toList)
    assert(dist("newest").mkString === "newest")
  }

  test("training stops early when no pair repeats") {
    import spark.implicits._
    val df = Seq(("ab", 1L), ("cd", 1L)).toDF("w", "c")
    assert(BpeTrain.train(df, 10) === Seq.empty)
  }

  test("hybrid local path learns the identical merge sequence as distributed") {
    import spark.implicits._
    // a vocabulary rich enough to exercise ties, overlaps, and early pairs
    // dying as merges consume them
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L),
      ("aaa", 4L), ("aaaa", 2L), ("banana", 7L), ("bandana", 1L),
      ("mississippi", 3L), ("abracadabra", 2L)).toDF("w", "c")
    val viaLocal = BpeTrain.train(wc, 12) // vocab 10 ≤ threshold → local path
    val viaDist = BpeTrain.train(wc, 12, localThreshold = 0L) // force distributed
    assert(viaLocal === viaDist)
    assert(viaLocal.length === 12)
    // and the collected-rows entry point agrees with both
    val rows = wc.as[(String, Long)].collect()
    assert(BpeTrain.trainLocal(rows, 12) === viaDist)
  }

  test("local path stops early when no pair repeats") {
    assert(BpeTrain.trainLocal(Array(("ab", 1L), ("cd", 1L)), 10) === Seq.empty)
  }

  test("pairCounts matches the first training statistic") {
    val pc = BpeTrain.pairCounts(toyWc()).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(pc.take(2).toSeq === Seq("es" -> 9L, "st" -> 9L))
    assert(pc.toMap.apply("we") === 8L)
    assert(pc.toMap.apply("lo") === 7L)
  }
}
