package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine-replayable HyperLogLog.
  *
  * Spark's built-in `approx_count_distinct` (HLL++) is implementation-
  * specific: no other engine can reproduce its estimate, so a correctness
  * gate can only check it rows-only (battery q37). This sketch instead
  * DEFINES the estimator in portable integer arithmetic over a caller-
  * supplied 56-bit hash, so the whole sketch — registers, sum, estimate —
  * replays bit-for-bit in ANSI SQL (battery q102's DuckDB oracle) and the
  * estimate is hash-exact across engines:
  *
  *   bucket  = h % 64                 (m = 64 registers)
  *   w       = h div 64               (the remaining 50 hash bits)
  *   rho(w)  = least(tz(w) + 1, 46)   tz via bit_count((w & -w) - 1);
  *                                    w = 0 → bit_count(-1) = 64 → capped
  *   M_j     = max rho per bucket     (duplicate-insensitive by max)
  *   T       = Σ_j 2^(46 - M_j)       absent buckets count M_j = 0
  *   E       = 0.709 · m² · 2^46 / T  (α₁₆₊ constant for m = 64)
  *
  * Exactness of the replay: every register is a small integer; T is a sum
  * of powers of two bounded by 64·2^46 = 2^52, so T is EXACT in an int64
  * AND in a double (the rho cap at 46 exists precisely for this — no
  * integer wider than 52 bits ever crosses to floating point, the battery's
  * cross-engine rule). The final expression multiplies three double
  * literals left-associatively and divides once — IEEE-identical in any
  * engine. The cap costs nothing statistically: a register exceeds 46 with
  * probability 2⁻⁴⁶ per item.
  *
  * Scale shape: `registers` is a plain groupBy-max — map-side partial
  * aggregation reduces every partition to ≤ 64·|groups| rows before the
  * shuffle, the canonical mergeable-sketch contract (registers from
  * disjoint shards combine by max). The estimate step touches only
  * register rows. At 100 TB the network moves kilobytes per group.
  *
  * Standard error is 1.04/√64 ≈ 13% (m is kept small so the whole
  * register set is eyeball-able in tests; raise M/RhoCap together for
  * production accuracy — any m with m·2^RhoCap ≤ 2^52 preserves the
  * exact-replay argument).
  */
object Hll {

  /** Register count (m). */
  val M = 64

  /** Rho cap: keeps the register sum ≤ m·2^RhoCap = 2^52, exact in double. */
  val RhoCap = 46

  private val EmptyTerm = 1L << RhoCap // absent bucket's 2^(RhoCap - 0)

  /** Per-group HLL registers (groupCols..., b, m) from a non-negative
    * 56-bit hash column. Only occupied buckets appear; [[estimate]]
    * accounts for the absent ones. */
  def registers(df: DataFrame, groupCols: Seq[String], hashCol: String)
      : DataFrame = {
    val g = groupCols.map(col)
    df.select(g :+ col(hashCol).as("_h"): _*)
      .withColumn("b", expr("_h % 64"))
      .withColumn("w", expr("_h div 64"))
      .withColumn("rho",
        expr(s"least(bit_count((w & -w) - 1) + 1, $RhoCap)").cast("int"))
      .groupBy(g :+ col("b"): _*)
      .agg(max(col("rho")).as("m"))
  }

  /** Per-group estimate (groupCols..., est_distinct DOUBLE) from
    * [[registers]] output. */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    regs.groupBy(g: _*)
      .agg((sum(expr(s"shiftleft(cast(1 as bigint), $RhoCap - m)")) +
        (lit(M.toLong) - count(lit(1))) * lit(EmptyTerm)).as("t"))
      .select(g :+
        (lit(0.709) * lit(4096.0) * lit(70368744177664.0) /
          col("t").cast("double")).as("est_distinct"): _*)
  }

  /** Convenience: estimate distinct `hashCol` values per group. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], hashCol: String)
      : DataFrame =
    estimate(registers(df, groupCols, hashCol), groupCols)
}
