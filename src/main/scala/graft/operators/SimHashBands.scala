package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact pigeonhole band split behind Hamming≤d candidate joins: a pair
  * within Hamming distance d differs in at most d bands, so with b ≥ d+1
  * bands at least one band matches exactly — the banded equi-join's
  * candidates are a superset of all qualifying pairs. ONE definition shared
  * by the q49 battery query, PipelineScaleProbe, and ScaleLinearitySpec,
  * because the exactness argument couples the band count to the distance
  * threshold: changing either alone silently breaks the superset property.
  *
  * The historical 3-band presets stay the defaults ([[Split56]] 19+19+18
  * for the 56-bit text simhash, [[Split63]] 21+21+21 for the 63-bit image
  * pHash); [[splitW]] derives an even b-band split for callers that need
  * exhaustiveness past Hamming 2 (e.g. the media gate at maxDist 3 — the
  * probe-measured pHash jitter distribution centers near 2.7). More bands
  * = shorter bands = more candidate collisions: band count is the standard
  * LSH recall/cost dial, and the Hamming post-filter keeps the result set
  * exact either way.
  */
object SimHashBands {

  /** Max Hamming distance the DEFAULT 3-band split is exhaustive for. */
  val MaxHamming = 2

  /** Band widths for the 56-bit text simhash. */
  val Split56: Seq[Int] = Seq(19, 19, 18)

  /** Band widths for the 63-bit image pHash. */
  val Split63: Seq[Int] = Seq(21, 21, 21)

  /** An even `nBands`-way split of `bits` signature bits (wider bands
    * first), exhaustive for Hamming ≤ nBands-1. splitW(63, 3) == Split63;
    * splitW(56, 3) == Split56. */
  def splitW(bits: Int, nBands: Int): Seq[Int] = {
    require(nBands >= 2 && nBands <= bits, s"need 2..$bits bands, got $nBands")
    val base = bits / nBands
    val extra = bits % nBands
    Seq.tabulate(nBands)(j => if (j < extra) base + 1 else base)
  }

  private def bandValW(sig: Column, j: Int, widths: Seq[Int]): Column = {
    val off = widths.take(j).sum
    // Catalyst doesn't fold shiftright-by-0; keep band 0 a bare mask
    val shifted = if (off == 0) sig else shiftright(sig, off)
    shifted.bitwiseAND(lit((1L << widths(j)) - 1))
  }

  /** The value of band `j` (0..2) of a 56-bit signature column. */
  def bandVal(simhash: Column, j: Int): Column = bandValW(simhash, j, Split56)

  /** (idCol, simhash, band, band_val): 3 band rows per signature row. */
  def bands(sims: DataFrame, idCol: String): DataFrame =
    bandsW(sims, idCol, Split56)

  /** [[bands]] under an explicit band-widths split (any length ≥ 2):
    * widths.length band rows per signature row. */
  def bandsW(sims: DataFrame, idCol: String, widths: Seq[Int]): DataFrame = {
    require(widths.length >= 2, s"need >= 2 bands, got $widths")
    sims.select(col(idCol), col("simhash"),
      posexplode(array(widths.indices.map(j =>
        bandValW(col("simhash"), j, widths)): _*)))
      .toDF(idCol, "simhash", "band", "band_val")
  }

  /** All pairs (a < b by `idCol`) within Hamming distance `maxDist`
    * (≤ [[MaxHamming]]), each emitted once: a pair colliding in several
    * bands is kept only by its FIRST matching band (cheap bit-compare
    * filter), so no dedup shuffle over the candidate set is needed.
    * Output: (doc_a, doc_b, hamming). */
  def hammingPairs(sims: DataFrame, idCol: String, maxDist: Int): DataFrame =
    hammingPairsW(sims, idCol, maxDist, Split56)

  /** [[hammingPairs]] under an explicit band-widths split (the widths
    * must cover every bit the signatures can set; exhaustive for
    * maxDist ≤ widths.length - 1). */
  def hammingPairsW(sims: DataFrame, idCol: String, maxDist: Int,
      widths: Seq[Int]): DataFrame = {
    require(maxDist <= widths.length - 1,
      s"${widths.length}-band split is exhaustive only up to Hamming " +
        s"${widths.length - 1}, got $maxDist")
    val b = bandsW(sims, idCol, widths)
    val sa = col("a.simhash"); val sb = col("b.simhash")
    def bv(c: Column, j: Int) = bandValW(c, j, widths)
    // keep a colliding pair only in its FIRST matching band: band j
    // survives iff every earlier band differs
    val firstMatchOnly = widths.indices.map { j =>
      (0 until j).foldLeft(col("a.band") === j: Column)(
        (acc, p) => acc && bv(sa, p) =!= bv(sb, p))
    }.reduce(_ || _)
    b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.band_val") === col("b.band_val") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .where(firstMatchOnly)
      .withColumn("hamming", bit_count(sa.bitwiseXOR(sb)).cast("long"))
      .where(col("hamming") <= maxDist)
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"), col("hamming"))
  }
}
