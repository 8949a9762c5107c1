package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine-replayable Count-Min sketch.
  *
  * Point-frequency estimation for heavy-hitter queries over keys too
  * numerous to count exactly in memory. Like [[Hll]] (q102), the sketch is
  * DEFINED in portable integer arithmetic over the battery's 56-bit md5
  * hash, so every counter — and therefore every estimate — replays
  * bit-for-bit in ANSI SQL (battery q104's DuckDB oracle): the entire
  * pipeline is int64 sums and mins, no floating point anywhere.
  *
  *   slot_i(x) = md5_56(i || ':' || x) mod W      i in 0..D-1
  *   C[i][s]   = Σ rows with slot_i(x) = s        (one counter matrix)
  *   est(x)    = min_i C[i][slot_i(x)]            (classic CM upper bound)
  *
  * Guarantees: est(x) ≥ true(x) always (counters only ever add); with
  * D=4, W=256, overestimation per row is bounded by ~2n/W with probability
  * ≥ 1 - (1/2)^4 per the standard Markov argument (Cormode & Muthukrishnan,
  * "An improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 55(1), 2005).
  *
  * Scale shape: [[sketch]] is explode(D) → groupBy-sum — map-side partial
  * aggregation collapses every partition to ≤ D·W rows per group before
  * the shuffle, the mergeable-sketch contract (sketches of disjoint shards
  * combine by elementwise +, which IS the sum aggregate). [[estimate]]
  * joins probe keys against the ≤ D·W·|groups| counter rows — a broadcast
  * join at any corpus size. At 100 TB the network moves kilobytes per
  * group either way.
  */
object CountMin {

  /** Hash-row count (D): estimate = min over D independent counters. */
  val Depth = 4

  /** Counter columns per row (W). D·W = 1024 counters per group. */
  val Width = 256

  /** 56-bit md5 hash of `i || ':' || key`, mod W — row i's slot for a key.
    * Positive by construction (14 hex chars = 56 bits), so `%` and `pmod`
    * agree across engines. */
  private def slot(keyCol: Column, i: Int): Column =
    conv(substring(md5(concat_ws(":", lit(i.toString), keyCol.cast("string"))),
      1, 14), 16, 10).cast("long") % Width

  private def exploded(df: DataFrame, groupCols: Seq[String], keyCol: String)
      : DataFrame = {
    val g = groupCols.map(col)
    val pairs = (0 until Depth).map { i =>
      struct(lit(i).as("i"), slot(col(keyCol), i).as("slot"))
    }
    df.select(g ++ Seq(col(keyCol), explode(array(pairs: _*)).as("_is")): _*)
      .select(g ++ Seq(col(keyCol), col("_is.i").as("i"), col("_is.slot").as("slot")): _*)
  }

  /** Per-group CM counters (groupCols..., i, slot, c) — only occupied
    * slots appear; absent ⇒ 0 ([[estimate]] coalesces). One scan, two
    * aggregates: rows pre-aggregate to (key, n) BEFORE the D-way hash
    * explode, so the md5 slot hashes run once per DISTINCT key instead of
    * once per row (C[i][s] = Σ_k n(k)·[slot_i(k)=s] — the weighted sum is
    * the same counter matrix bit-for-bit). At any scale the explode then
    * fans out O(distinct keys), not O(rows). */
  def sketch(df: DataFrame, groupCols: Seq[String], keyCol: String): DataFrame = {
    val g = groupCols.map(col)
    val pre = df.groupBy((groupCols :+ keyCol).map(col): _*)
      .agg(count(lit(1)).as("_n"))
    val pairs = (0 until Depth).map { i =>
      struct(lit(i).as("i"), slot(col(keyCol), i).as("slot"))
    }
    pre.select(g ++ Seq(col("_n"), explode(array(pairs: _*)).as("_is")): _*)
      .groupBy(g ++ Seq(col("_is.i").as("i"), col("_is.slot").as("slot")): _*)
      .agg(sum(col("_n")).as("c"))
  }

  /** Estimated frequency for each DISTINCT key in `probes`
    * (groupCols..., keyCol, est_cnt). The sketch side is ≤ D·W rows per
    * group — broadcast it. A key hitting an absent slot is provably
    * unseen: its estimate is 0. */
  def estimate(sketchDf: DataFrame, probes: DataFrame,
      groupCols: Seq[String], keyCol: String): DataFrame = {
    val g = groupCols.map(col)
    val keyed = exploded(probes.select((groupCols :+ keyCol).map(col): _*).distinct(),
      groupCols, keyCol)
    keyed.join(broadcast(sketchDf), groupCols ++ Seq("i", "slot"), "left")
      .groupBy((groupCols :+ keyCol).map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("est_cnt"))
  }
}
