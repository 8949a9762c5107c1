package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine-replayable fixed-bin histogram quantiles —
  * the third mergeable sketch in the family ([[Hll]] q102 distinct counts,
  * [[CountMin]] q104 point frequencies; this one, battery q107, rank
  * statistics).
  *
  * Spark's `percentile_approx` (KLL-ish) and DuckDB's `approx_quantile`
  * (t-digest) are implementation-specific and order-sensitive — neither
  * can reproduce the other, so they gate rows-only at best. This sketch
  * instead DEFINES the estimator over a fixed power-of-two binning:
  *
  *   bin(x)   = floor(x / w)            w a power of two ⇒ x/w is EXACT
  *                                      in IEEE binary64 (exponent shift),
  *                                      so the bin id is engine-identical
  *                                      even for fractional inputs
  *   H[b]     = row count per bin       (one groupBy-sum; mergeable by +)
  *   q(p)     = lower edge (b·w) of the first bin where the cumulative
  *              count reaches ceil(p · n)   — pure int64 arithmetic
  *
  * `ceil(p·n)` is computed as the integer `(n·num + den - 1) div den`
  * with p = num/den rational, so no float touches the rank either. The
  * estimate's error is bounded by the bin width w — the caller picks the
  * resolution/size trade (bins are only materialized when occupied).
  *
  * Scale shape: [[histogram]] is one map-side-combining aggregate — each
  * partition collapses to ≤ |occupied bins| rows per group before the
  * shuffle. [[quantiles]] runs over bin rows only (a per-group sorted
  * cumulative scan of ≤ bins rows — a window over the SKETCH, never the
  * data). At 100 TB the network moves kilobytes per group, and the
  * histograms of disjoint shards merge by elementwise sum, so the sketch
  * composes with incremental ingest exactly like the other two.
  */
object HistQuantile {

  /** Per-group occupied-bin histogram (groupCols..., bin, cnt) with
    * `bin = floor(x / w)`. `w` MUST be a power of two (asserted) so the
    * division is exact across engines. */
  def histogram(df: DataFrame, groupCols: Seq[String], xCol: String,
      w: Long): DataFrame = {
    require(w > 0 && (w & (w - 1)) == 0, s"bin width must be a power of two, got $w")
    val g = groupCols.map(col)
    df.select(g :+ floor(col(xCol).cast("double") / lit(w.toDouble)).cast("long").as("bin"): _*)
      .groupBy(g :+ col("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a histogram: for each (num, den) rational
    * probability, the LOWER EDGE of the first bin whose cumulative count
    * reaches ceil(num/den · n). Output: (groupCols..., p_num, p_den, est).
    * Runs entirely over bin rows — the window partitions per group and
    * scans ≤ |occupied bins| rows. */
  def quantiles(hist: DataFrame, groupCols: Seq[String], w: Long,
      ps: Seq[(Int, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val win = Window.partitionBy(g: _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(win))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(g: _*)))
    val probes = ps.map { case (num, den) =>
      struct(lit(num).as("p_num"), lit(den).as("p_den"))
    }
    cum.select(g ++ Seq(col("bin"), col("cum"), col("n"),
        explode(array(probes: _*)).as("p")): _*)
      .select(g ++ Seq(col("bin"), col("cum"), col("n"),
        col("p.p_num").as("p_num"), col("p.p_den").as("p_den")): _*)
      // rank = ceil(p*n) in pure integers: (n*num + den - 1) div den
      .withColumn("rank",
        expr("(n * p_num + p_den - 1) div p_den"))
      .where(col("cum") >= col("rank"))
      .groupBy(g ++ Seq(col("p_num"), col("p_den")): _*)
      .agg(min(col("bin")).as("_b"))
      .select(g ++ Seq(col("p_num"), col("p_den"),
        (col("_b") * lit(w)).cast("long").as("est")): _*)
  }
}
