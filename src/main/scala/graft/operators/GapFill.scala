package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resample + gap fill — regularize an irregular per-key series
  * onto a fixed grid (the reference's domain is a sensor-log timeseries
  * store, /root/reference/README.md:3-8 and example/src/sensor_log.rs; a
  * sensor that reports irregularly is the rule, and every downstream
  * consumer wants a dense grid).
  *
  * Semantics per key:
  *   1. DOWNSAMPLE — bucket each observation to its grain cell
  *      (`floorDiv(ts, grain)`, the exact integral floor division shared
  *      with the chunk-routing write path — never double `floor(a/b)`) and
  *      reduce each (key, cell) to one value with `cellAgg`;
  *   2. DENSIFY — generate every cell in the key's observed span
  *      [min cell, max cell] (`sequence` + `explode`: O(output) rows,
  *      produced distributed, never on the driver);
  *   3. FILL — forward-fill (last observation carried forward) and
  *      optionally linear interpolation between the surrounding
  *      observations. The grid spans each key's own [first, last]
  *      observation, so every cell has an observation on both sides:
  *      `val_ff` is never null and interpolation is always well-defined
  *      (the null-guards in the fill expressions are belt-and-braces).
  *
  * Fill uses the cumulative-count group trick — `count(v) OVER (ORDER BY
  * cell)` ignores nulls, so its value identifies "the run of cells since
  * the last observation" — rather than `last(..., ignoreNulls)` window
  * semantics, because the same formulation runs verbatim in any ANSI
  * engine (the DuckDB oracle replays it exactly; q144).
  *
  * Scale: one shuffle to the (key, cell) grain (map-side combinable
  * aggregate), one join back onto the grid at the same grain, then
  * per-key windows — everything partitions by key; no per-key state ever
  * materializes on the driver, and a key's cost is its own span, so the
  * operator survives a 100 TB corpus with millions of keys. Window cost
  * is per-key-span sort; a single pathological key spanning years at
  * millisecond grain is the caller's grain choice, not a skew cliff.
  */
object GapFill {

  /** @param df       input observations
    * @param keys     series identity columns
    * @param tsCol    numeric (long) time column, e.g. epoch nanos
    * @param grain    cell width in `tsCol` units (> 0)
    * @param cellAgg  aggregate reducing a cell's observations to ONE value
    *                 (e.g. exact-decimal avg); its result type should be
    *                 numeric if `interpolate` is on
    * @param interpolate also emit `val_lerp` (linear interpolation)
    * @return keys ++ (cell_ts LONG — the cell's start in tsCol units,
    *         observed INT 1/0, val_ff — cellAgg result carried forward,
    *         val_lerp DOUBLE when interpolate)
    */
  def resample(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      grain: Long,
      cellAgg: Column,
      interpolate: Boolean = false): DataFrame = {
    require(grain > 0, s"grain must be positive, got $grain")
    val kCols = keys.map(col)
    val cell = graft.core.MatSchema.chunkKeyCol(col(tsCol), grain).as("_cell")

    // 1. downsample: one row per (key, cell) — partial aggregation collapses
    //    each input partition's cells before the shuffle
    val obs = df.groupBy((kCols :+ cell): _*).agg(cellAgg.as("_v"))

    // 2. densify: each key's span, exploded to the full grid — in BOUNDED
    //    slices ([[Densify.explodeRange]]): grid size == output size, and
    //    per-row transient memory is capped regardless of a key's span (a
    //    10-year key at second grain must not build a 3·10^8-element
    //    array in one row before the generator runs)
    val span = obs.groupBy(kCols: _*)
      .agg(min(col("_cell")).as("_lo"), max(col("_cell")).as("_hi"))
    val grid = Densify.explodeRange(span, col("_lo"), col("_hi"), "_cell")
      .select(kCols :+ col("_cell"): _*)

    // 3. join observations back (left: gaps stay null), then fill
    val joined = grid.join(obs, keys :+ "_cell", "left")

    val byKey = Window.partitionBy(kCols: _*)
    val fwd = byKey.orderBy(col("_cell"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = byKey.orderBy(col("_cell").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // cumulative non-null count = id of the run since the last observation;
    // the run's single observed value broadcasts to its gap cells
    val marked = joined
      .withColumn("_gf", count(col("_v")).over(fwd))
      .withColumn("_gb", count(col("_v")).over(bwd))
    val runF = Window.partitionBy(kCols :+ col("_gf"): _*)
    val runB = Window.partitionBy(kCols :+ col("_gb"): _*)
    val filled = marked
      .withColumn("_ff", max(col("_v")).over(runF))
      .withColumn("_fc", max(when(col("_v").isNotNull, col("_cell"))).over(runF))
      .withColumn("_nx", max(col("_v")).over(runB))
      .withColumn("_nc", max(when(col("_v").isNotNull, col("_cell"))).over(runB))

    val base = Seq(
      (col("_cell") * grain).as("cell_ts"),
      when(col("_v").isNotNull, 1).otherwise(0).as("observed"),
      col("_ff").as("val_ff"))
    val lerp =
      if (!interpolate) Seq.empty[Column]
      else Seq(
        when(col("_v").isNotNull, col("_v").cast("double"))
          .when(col("_ff").isNotNull && col("_nx").isNotNull,
            // fixed operand order — IEEE-identical across engines
            col("_ff").cast("double") +
              (col("_nx").cast("double") - col("_ff").cast("double")) *
              (col("_cell") - col("_fc")).cast("double") /
              (col("_nc") - col("_fc")).cast("double"))
          .as("val_lerp"))
    filled.select(kCols ++ base ++ lerp: _*)
  }
}
