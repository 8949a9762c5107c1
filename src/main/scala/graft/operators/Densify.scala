package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-memory range densification, shared by [[GapFill]] (grid
  * generation) and [[RangeJoin]] (interval-to-bucket replication).
  *
  * A bare `explode(sequence(lo, hi))` materializes the WHOLE span as one
  * array value inside a single row before the generator runs — a
  * pathological key (a sensor spanning 10 years at second grain is
  * 3·10^8 cells) builds a multi-GB array in one executor row, an OOM
  * cliff unrelated to data volume. The fix is two bounded generators:
  * explode the span's SLICE INDICES (span/65536 + 1 values), then each
  * slice explodes its own ≤ 65536-cell sub-range. Per-row transient
  * memory is capped at ~0.5 MB regardless of span; output rows are
  * identical (each value of [lo, hi] exactly once, slices are disjoint).
  * Two levels bound spans up to 65536² ≈ 4·10^9 cells per ~0.5 MB row —
  * beyond any real grain choice; the caller's grain is still the cost
  * model for OUTPUT size, which is unchanged.
  */
private[operators] object Densify {

  /** Max cells materialized per generated row (inner `sequence` bound). */
  val SliceCells = 65536L

  /** Append `out` = one row per LONG value in the inclusive range
    * `[lo, hi]`, exploded in bounded slices. Rows with `lo > hi` follow
    * `sequence`'s descending semantics per slice — callers that permit
    * such rows (RangeJoin's `lo > hi` intervals "match nothing") must
    * drop the junk through their residual predicate, exactly as with the
    * single-sequence form. */
  def explodeRange(df: DataFrame, lo: Column, hi: Column, out: String,
      slice: Long = SliceCells): DataFrame = {
    require(slice > 0, s"slice must be positive, got $slice")
    // floorDiv (exact, negative-safe — the chunk-routing division) sizes
    // the slice count; inner bounds are computed from lo upward and
    // clamped to hi BEFORE any addition past hi, so nothing overflows
    val sliced = df
      .withColumn("_dn_lo", lo)
      .withColumn("_dn_hi", hi)
      .withColumn("_dn_s", explode(sequence(lit(0L),
        graft.core.MatSchema.chunkKeyCol(col("_dn_hi") - col("_dn_lo"), slice))))
    def innerLo = col("_dn_lo") + col("_dn_s") * lit(slice)
    sliced
      .withColumn(out, explode(sequence(innerLo,
        innerLo + least(col("_dn_hi") - innerLo, lit(slice - 1)))))
      .drop("_dn_lo", "_dn_hi", "_dn_s")
  }
}
