package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The exact 3-band split (19+19+18 bits) behind the SimHash Hamming≤2
  * candidate join: by pigeonhole a pair within Hamming distance 2 differs
  * in at most 2 bands, so at least one band matches exactly — the banded
  * equi-join's candidates are a superset of all qualifying pairs. ONE
  * definition shared by the q49 battery query, PipelineScaleProbe, and
  * ScaleLinearitySpec, because the exactness argument couples the band
  * boundaries to the distance threshold: changing either alone silently
  * breaks the superset property.
  */
object SimHashBands {

  /** Max Hamming distance the 3-band split is exhaustive for. */
  val MaxHamming = 2

  /** The value of band `j` (0..2) of a 56-bit signature column. */
  def bandVal(simhash: Column, j: Int): Column = j match {
    case 0 => simhash.bitwiseAND(lit((1L << 19) - 1))
    case 1 => shiftright(simhash, 19).bitwiseAND(lit((1L << 19) - 1))
    case _ => shiftright(simhash, 38).bitwiseAND(lit((1L << 18) - 1))
  }

  /** (idCol, simhash, band, band_val): 3 band rows per signature row. */
  def bands(sims: DataFrame, idCol: String): DataFrame =
    sims.select(col(idCol), col("simhash"),
      posexplode(array(bandVal(col("simhash"), 0),
        bandVal(col("simhash"), 1), bandVal(col("simhash"), 2))))
      .toDF(idCol, "simhash", "band", "band_val")

  /** All pairs (a < b by `idCol`) within Hamming distance `maxDist`
    * (≤ [[MaxHamming]]), each emitted once: a pair colliding in several
    * bands is kept only by its FIRST matching band (cheap bit-compare
    * filter), so no dedup shuffle over the candidate set is needed.
    * Output: (doc_a, doc_b, hamming). */
  def hammingPairs(sims: DataFrame, idCol: String, maxDist: Int): DataFrame = {
    require(maxDist <= MaxHamming,
      s"3-band split is exhaustive only up to Hamming $MaxHamming, got $maxDist")
    val b = bands(sims, idCol)
    val sa = col("a.simhash"); val sb = col("b.simhash")
    b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.band_val") === col("b.band_val") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .where(col("a.band") === 0 ||
        (col("a.band") === 1 && bandVal(sa, 0) =!= bandVal(sb, 0)) ||
        (col("a.band") === 2 && bandVal(sa, 0) =!= bandVal(sb, 0) &&
          bandVal(sa, 1) =!= bandVal(sb, 1)))
      .withColumn("hamming", bit_count(sa.bitwiseXOR(sb)).cast("long"))
      .where(col("hamming") <= maxDist)
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"), col("hamming"))
  }
}
