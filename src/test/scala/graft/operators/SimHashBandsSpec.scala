package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** Pins the pigeonhole-exhaustiveness contract of [[SimHashBands]] against
  * brute force, at the historical 3-band presets AND the generalized
  * N-band splits ([[SimHashBands.splitW]]) the media gate's recall dial
  * uses: for every band count b and maxDist ≤ b-1, hammingPairsW must
  * return EXACTLY the brute-force pair set (superset by pigeonhole,
  * subset by the Hamming post-filter), each pair exactly once (the
  * first-matching-band dedup generalizes past 3 bands).
  */
class SimHashBandsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic signatures with a planted near-dup structure: pairs at
    * controlled Hamming distances 0..6 plus splitmix-scrambled fillers. */
  private def sigs(bits: Int, n: Int): Seq[(Long, Long)] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val mask = (1L << bits) - 1
    (0 until n).map { i =>
      val base = mix(i / 4) & mask // 4 ids share a base signature...
      val d = i % 4 * 2            // ...at distances 0, 2, 4, 6
      val flipped = (0 until d).foldLeft(base)((s, j) =>
        s ^ (1L << ((mix(i * 64 + j) & 0x7fffffffL) % bits).toInt))
      (i.toLong, flipped)
    }
  }

  private def brute(rows: Seq[(Long, Long)], maxDist: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb).toLong if h <= maxDist
    } yield (ia, ib, h)).toSet

  test("splitW reproduces the presets and partitions the bits") {
    assert(SimHashBands.splitW(56, 3) === SimHashBands.Split56)
    assert(SimHashBands.splitW(63, 3) === SimHashBands.Split63)
    for (bits <- Seq(56, 63, 64); b <- 2 to 8) {
      val w = SimHashBands.splitW(bits, b)
      assert(w.sum === bits && w.length === b && w.max - w.min <= 1, s"$bits/$b -> $w")
    }
    assertThrows[IllegalArgumentException](SimHashBands.splitW(63, 1))
  }

  test("hammingPairsW equals brute force, each pair once, for b in 3..5 and all legal maxDist") {
    import spark.implicits._
    for (bits <- Seq(56, 63)) {
      val rows = sigs(bits, 120)
      val df = rows.toDF("doc_id", "simhash")
      for (b <- 3 to 5; maxDist <- 0 to b - 1) {
        val got = SimHashBands
          .hammingPairsW(df, "doc_id", maxDist, SimHashBands.splitW(bits, b))
          .as[(Long, Long, Long)].collect()
        assert(got.length === got.toSet.size,
          s"bits=$bits b=$b d=$maxDist emitted a pair twice")
        assert(got.toSet === brute(rows, maxDist),
          s"bits=$bits b=$b d=$maxDist pair set mismatch")
      }
    }
  }

  test("maxDist beyond bands-1 is rejected") {
    import spark.implicits._
    val df = sigs(63, 8).toDF("doc_id", "simhash")
    assertThrows[IllegalArgumentException](
      SimHashBands.hammingPairsW(df, "doc_id", 3, SimHashBands.Split63))
    assertThrows[IllegalArgumentException](
      SimHashBands.hammingPairsW(df, "doc_id", 4, SimHashBands.splitW(63, 4)))
  }
}
