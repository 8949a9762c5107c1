package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join: salt the skewed (large) side with a random
  * salt in [0, saltFactor), replicate the other side across every salt
  * value, and join on keys + salt. Hot keys spread over `saltFactor`
  * reducers at the cost of replicating the small side `saltFactor` times —
  * the classic remedy when one join key dominates a shuffle and AQE's
  * skew-join splitting isn't available or sufficient.
  */
object SaltedJoin {

  /** Join types where replicating `other` is sound: every replica of an
    * `other` row either matches (same result as unsalted) or is dropped.
    * Right/full outer would emit each unmatched `other` row saltFactor
    * times — one per replica — so they are rejected. */
  private val SoundJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross")

  def join(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    require(SoundJoinTypes.contains(joinType.toLowerCase),
      s"salted join is only sound for inner/left/left_semi/left_anti/cross; " +
        s"'$joinType' would emit unmatched rows of the replicated side " +
        s"$saltFactor times")
    val salted = skewed.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = other.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }
}
