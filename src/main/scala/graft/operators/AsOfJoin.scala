package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `rightTs <= leftTs` within the same key group (timeseries enrichment;
  * SURVEY.md §2.3 joins row).
  *
  * Spark-first formulation: tag both sides, union, and take a running
  * `last(..., ignoreNulls)` over one window ordered by (ts, side) — a
  * single shuffle on the keys, linear in rows. A naive formulation
  * (theta-join on `r.ts <= l.ts` + argmax) explodes quadratically per key
  * and is never competitive at scale. Ties (equal timestamps) resolve as
  * right-row-visible (<=), matching DuckDB's ASOF JOIN.
  */
object AsOfJoin {

  /** @param left      left (probe) side
    * @param right     right (reference) side
    * @param keys      equi-join key columns present on both sides
    * @param leftTs    ordering column on the left
    * @param rightTs   ordering column on the right (same type as leftTs)
    * @param rightCols right columns to carry to the output (renamed as given)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Map[String, String]): DataFrame = {
    val ts = "_asof_ts"
    val side = "_asof_side"
    val l = left.withColumn(ts, col(leftTs)).withColumn(side, lit(0))
    val r = right.withColumn(ts, col(rightTs)).withColumn(side, lit(1))

    // All carried right columns travel in ONE struct so they always resolve
    // from the SAME right row, and a genuinely NULL right value stays NULL
    // instead of falling through to an older right row (a per-column
    // last(..., ignoreNulls) would do both wrongly). The struct itself is
    // non-null on right rows even when every field is null.
    val payload = "_asof_payload"
    val rStruct = struct(rightCols.map { case (from, to) => col(from).as(to) }.toSeq: _*)
    val lNorm = l.select(
      (keys.map(col) ++ Seq(col(ts), col(side))) ++
        left.columns.filterNot(c => keys.contains(c)).map(col) :+
        lit(null).cast(r.select(rStruct).schema.head.dataType).as(payload): _*)
    val rNorm = r.select(
      (keys.map(col) ++ Seq(col(ts), col(side))) ++
        left.columns.filterNot(c => keys.contains(c)).map(c => lit(null).as(c)) :+
        rStruct.as(payload): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col(side).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lNorm.unionByName(rNorm)
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
    val expanded = rightCols.values.foldLeft(filled) { (df, c) =>
      df.withColumn(c, col(payload).getField(c))
    }
    expanded.where(col(side) === 0).drop(ts, side, payload)
  }
}
