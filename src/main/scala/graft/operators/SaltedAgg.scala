package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-phase aggregation (the salting pattern the 100 TB
  * design calls for when a handful of hot keys dominate a shuffle).
  *
  * Phase 1 groups by (keys, salt) — hot keys split across `saltFactor`
  * reducers; phase 2 merges the partials by keys alone. Use for aggregates
  * with an exact partial/merge decomposition (sum, count, min, max).
  * For non-decomposable aggregates prefer AQE skew handling
  * (spark.sql.adaptive.skewJoin) or rethink the query.
  *
  * Note Spark's hash aggregation already does map-side partial combine,
  * which absorbs most skew for aggregation specifically; explicit salting
  * matters when the per-key state is large (collect-type aggregates) or
  * for skewed JOIN keys (there: salt one side, explode the other).
  */
object SaltedAgg {

  final case class SaltedSpec(partial: Column, merge: String => Column, name: String)

  def sumLong(c: String): SaltedSpec =
    SaltedSpec(sum(col(c)).as(s"_p_$c"), p => sum(col(p)).as(s"sum_$c"), s"_p_$c")
  def countAll(as: String = "cnt"): SaltedSpec =
    SaltedSpec(count(lit(1)).as("_p_cnt"), p => sum(col(p)).as(as), "_p_cnt")
  def minLong(c: String): SaltedSpec =
    SaltedSpec(min(col(c)).as(s"_p_min_$c"), p => min(col(p)).as(s"min_$c"), s"_p_min_$c")
  def maxLong(c: String): SaltedSpec =
    SaltedSpec(max(col(c)).as(s"_p_max_$c"), p => max(col(p)).as(s"max_$c"), s"_p_max_$c")

  def aggregate(df: DataFrame, keys: Seq[String], saltFactor: Int, specs: SaltedSpec*): DataFrame = {
    require(saltFactor > 0)
    val salted = df.withColumn("_salt", pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(specs.head.partial, specs.tail.map(_.partial): _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(specs.head.merge(specs.head.name), specs.tail.map(s => s.merge(s.name)): _*)
  }
}
