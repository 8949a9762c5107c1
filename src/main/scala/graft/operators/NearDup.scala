package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram-Jaccard near-duplicate detection as a scale-safe two-phase plan
  * (SURVEY.md §2.3 "North-star: dedup"; no reference counterpart — matdb has
  * no text operators).
  *
  * Phase 1 — candidate generation: inverted-index equi-join on shingles
  * (explode → self-join on the shingle, never doc×doc). The join input drops
  * shingles whose document frequency exceeds `dfCap`: one corpus-wide hot
  * shingle ("of the and …") shared by k docs would otherwise emit k²/2
  * candidate pairs on a single join key — the quadratic-skew scale-killer.
  * With the cap, per-shingle fan-out is bounded by dfCap²/2.
  *
  * Phase 2 — exact verify: shared-shingle counts and Jaccard are recomputed
  * over the FULL shingle sets, restricted (broadcast semi-join) to the
  * candidate pairs — so the cap never distorts a reported similarity, it can
  * only drop pairs whose every shared shingle is hotter than dfCap. Such a
  * pair cannot be ruled out in theory, but at any realistic cap it would be
  * a cluster of >dfCap near-identical docs sharing no rarer shingle; exact
  * dedup (q45) catches the identical-copy case first. The correctness oracle
  * replays the same cap, making the gate exact by construction.
  */
object NearDup {

  /** (id, g): exploded DISTINCT word n-gram shingles of `textCol`. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val tok = df.select(col(idCol), split(lower(col(textCol)), "\\s+").as("ws"))
      .where(size(col("ws")) >= n)
    tok.select(col(idCol),
      explode(array_distinct(transform(
        sequence(lit(0), size(col("ws")) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(col("ws"), i + k + 1)): _*)))).as("g"))
  }

  /** Distinct candidate pairs (doc_a < doc_b) from the df-capped inverted
    * index over `ex` = (id, g). */
  def candidatePairs(ex: DataFrame, idCol: String, dfCap: Long): DataFrame = {
    val capped = ex
      .withColumn("_df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .where(col("_df") <= dfCap)
      .drop("_df")
    capped.as("a").join(capped.as("b"),
        col("a.g") === col("b.g") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
  }

  /** Exact Jaccard over full shingle sets, restricted to `cand` pairs. */
  def verifiedJaccard(ex: DataFrame, cand: DataFrame, idCol: String): DataFrame = {
    val sizes = ex.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val shared = ex.select(col(idCol).as("doc_a"), col("g"))
      .join(broadcast(cand), Seq("doc_a"))
      .join(ex.select(col(idCol).as("doc_b"), col("g")), Seq("doc_b", "g"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col(idCol).as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col(idCol).as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
  }

  /** End-to-end: near-dup pairs with exact Jaccard >= `minJaccard`. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double, dfCap: Long): DataFrame = {
    val ex = shingles(df, idCol, textCol)
    verifiedJaccard(ex, candidatePairs(ex, idCol, dfCap), idCol)
      .where(col("jaccard") >= minJaccard)
  }
}
