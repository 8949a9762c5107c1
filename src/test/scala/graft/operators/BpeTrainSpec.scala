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
    val viaDist = BpeTrain.trainDistributed(wc, 12) // reference implementation
    assert(viaLocal === viaDist)
    assert(viaLocal.length === 12)
    // and the collected-rows entry point agrees with both
    val rows = wc.as[(String, Long)].collect()
    assert(BpeTrain.trainLocal(rows, 12) === viaDist)
  }

  test("local path stops early when no pair repeats") {
    assert(BpeTrain.trainLocal(Array(("ab", 1L), ("cd", 1L)), 10) === Seq.empty)
  }

  test("local and distributed agree on supplementary and non-ASCII code points") {
    import spark.implicits._
    // 𝕒 (U+1D552, a surrogate pair in UTF-16) must be ONE symbol on both
    // paths, and count ties must break in UTF-8/code-point order — ｚ
    // (U+FF5A) sorts BELOW 𝕒 in UTF-8 order but ABOVE it in raw UTF-16
    // code-unit order, so a tie between pairs led by them is the exact
    // spot where a Java-String comparison would diverge
    val wc = Seq(("𝕒𝕓é", 4L), ("é𝕒𝕓", 3L), ("ｚq", 5L), ("𝕒x", 5L),
      ("naïve", 2L), ("ｚqｚq", 1L)).toDF("w", "c")
    val viaLocal = BpeTrain.train(wc, 6)
    val viaDist = BpeTrain.trainDistributed(wc, 6)
    assert(viaLocal === viaDist)
    // surrogate-safe symbols: every learned merge side is whole code points
    viaLocal.foreach { case (a, b) =>
      Seq(a, b).foreach(s => assert(!Character.isSurrogate(s.head) ||
        s.codePointCount(0, s.length) * 2 === s.length, s"split surrogate in ($a,$b)"))
    }
    // encode round-trips the supplementary word losslessly
    assert(BpeTrain.encodeWord("𝕒𝕓é", viaLocal).mkString === "𝕒𝕓é")
  }

  test("frequency-floor training is certified exact on an inert-tail corpus") {
    import spark.implicits._
    // head: disjoint two-letter words with well-separated counts, so every
    // decision gap is ≥300 and no ties arise; tail: 6 hapax words whose
    // total pair mass is Σ c·(|w|-1) = 6·1·2 = 12 — strictly below every
    // gap, so the certificate must hold and the sequence must equal
    // FULL-vocabulary training
    val head = Seq(("ab", 1000L), ("cd", 700L), ("ef", 400L))
    val tail = Seq("xqj", "zvk", "wmh", "ytc", "rpd", "lfg").map((_, 1L))
    val wc = (head ++ tail).toDF("w", "c")
    val res = BpeTrain.trainWithFloor(wc, 3, headLimit = 3L)
    assert(res.headWords === 3L)
    assert(res.floor === 400L)
    assert(res.tailMass === 12L)
    assert(res.minGap > res.tailMass, s"gap ${res.minGap} vs tail ${res.tailMass}")
    assert(res.certifiedExact, res.toString)
    assert(res.merges === Seq(("a", "b"), ("c", "d"), ("e", "f")))
    // identity with full-vocab training (local AND the distributed
    // reference — the tail is provably inert)
    val full = BpeTrain.train(wc, 3)
    assert(res.merges === full)
    assert(res.merges === BpeTrain.trainDistributed(wc, 3))
    // and train() routes through the floor path above the threshold
    assert(BpeTrain.train(wc, 3, localThreshold = 3L) === full)
  }

  test("frequency-floor reports uncertified when the tail could matter") {
    import spark.implicits._
    // tail mass 40 dwarfs the head's decision gaps — the result must
    // still train (standard floor approximation) but NOT claim exactness
    val wc = (Seq(("abab", 5L), ("cdcd", 4L)) ++
      (1 to 20).map(i => (s"q${i}z${i}", 1L))).toDF("w", "c")
    val res = BpeTrain.trainWithFloor(wc, 3, headLimit = 2L)
    assert(res.merges.nonEmpty)
    assert(!res.certifiedExact, res.toString)
  }

  test("pairCounts matches the first training statistic") {
    val pc = BpeTrain.pairCounts(toyWc()).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(pc.take(2).toSeq === Seq("es" -> 9L, "st" -> 9L))
    assert(pc.toMap.apply("we") === 8L)
    assert(pc.toMap.apply("lo") === 7L)
  }
}
