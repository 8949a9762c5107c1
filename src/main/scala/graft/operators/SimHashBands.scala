package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The exact 3-band pigeonhole split behind Hamming≤2 candidate joins: a
  * pair within Hamming distance 2 differs in at most 2 bands, so at least
  * one of 3 bands matches exactly — the banded equi-join's candidates are
  * a superset of all qualifying pairs. ONE definition shared by the q49
  * battery query, PipelineScaleProbe, and ScaleLinearitySpec, because the
  * exactness argument couples the band count to the distance threshold:
  * changing either alone silently breaks the superset property.
  *
  * Two widths presets: [[Split56]] (19+19+18) for the 56-bit text simhash,
  * [[Split63]] (21+21+21) for the 63-bit image pHash
  * ([[graft.multimodal.Multimodal.phash64]]).
  */
object SimHashBands {

  /** Max Hamming distance any 3-band split is exhaustive for. */
  val MaxHamming = 2

  /** Band widths for the 56-bit text simhash. */
  val Split56: Seq[Int] = Seq(19, 19, 18)

  /** Band widths for the 63-bit image pHash. */
  val Split63: Seq[Int] = Seq(21, 21, 21)

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

  /** [[bands]] under an explicit 3-band widths split. */
  def bandsW(sims: DataFrame, idCol: String, widths: Seq[Int]): DataFrame =
    sims.select(col(idCol), col("simhash"),
      posexplode(array(bandValW(col("simhash"), 0, widths),
        bandValW(col("simhash"), 1, widths), bandValW(col("simhash"), 2, widths))))
      .toDF(idCol, "simhash", "band", "band_val")

  /** All pairs (a < b by `idCol`) within Hamming distance `maxDist`
    * (≤ [[MaxHamming]]), each emitted once: a pair colliding in several
    * bands is kept only by its FIRST matching band (cheap bit-compare
    * filter), so no dedup shuffle over the candidate set is needed.
    * Output: (doc_a, doc_b, hamming). */
  def hammingPairs(sims: DataFrame, idCol: String, maxDist: Int): DataFrame =
    hammingPairsW(sims, idCol, maxDist, Split56)

  /** [[hammingPairs]] under an explicit 3-band widths split (the widths
    * must cover every bit the signatures can set). */
  def hammingPairsW(sims: DataFrame, idCol: String, maxDist: Int,
      widths: Seq[Int]): DataFrame = {
    require(maxDist <= MaxHamming,
      s"3-band split is exhaustive only up to Hamming $MaxHamming, got $maxDist")
    require(widths.length == 3, s"need exactly 3 bands, got $widths")
    val b = bandsW(sims, idCol, widths)
    val sa = col("a.simhash"); val sb = col("b.simhash")
    def bv(c: Column, j: Int) = bandValW(c, j, widths)
    b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.band_val") === col("b.band_val") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .where(col("a.band") === 0 ||
        (col("a.band") === 1 && bv(sa, 0) =!= bv(sb, 0)) ||
        (col("a.band") === 2 && bv(sa, 0) =!= bv(sb, 0) &&
          bv(sa, 1) =!= bv(sb, 1)))
      .withColumn("hamming", bit_count(sa.bitwiseXOR(sb)).cast("long"))
      .where(col("hamming") <= maxDist)
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"), col("hamming"))
  }
}
