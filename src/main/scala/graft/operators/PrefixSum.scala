package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum (running total) — the scan primitive behind
  * sequence packing, global offsets, and cumulative quotas. A naive
  * `sum() OVER (ORDER BY k)` window plans a SinglePartition exchange: the
  * entire table flows through ONE task — the classic scale-killer. This
  * formulation computes the same values with a range partition:
  *
  *   1. range-partition by the order column (equal work per partition);
  *   2. per-partition running totals (window WITHIN partition — parallel);
  *   3. per-partition grand totals → triangular broadcast join → each
  *      partition's global offset (P rows, driver-free);
  *   4. global running total = local running total + partition offset.
  *
  * Same shape as `Ingest.denseRankIds` (rank instead of sum), including
  * its determinism discipline: the partitioned input is materialized ONCE
  * (eager `localCheckpoint`) because the range partitioner SAMPLES — two
  * executions of the subtree may pick different boundaries, and offsets
  * from run A with rows from run B would interleave wrongly. The computed
  * running totals themselves are boundary-invariant, which is what makes
  * the operator deterministic (and oracle-replayable by a plain windowed
  * sum). The per-partition window uses a RANGE frame, so TIED order keys
  * all receive the running total including their whole tie group — the
  * same deterministic semantics as a plain `sum() OVER (ORDER BY k)`
  * (whose default frame is RANGE); a ROWS frame would order tied rows
  * arbitrarily and hand them differing, run-varying totals. Callers
  * needing strictly per-row totals must order by a unique key. */
object PrefixSum {

  /** Adds `cumCol` = inclusive running total of `valueCol` over rows
    * ordered by `orderCol`. Input columns pass through. */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String,
      cumCol: String = "cum"): DataFrame = {
    val ranged = df.repartitionByRange(col(orderCol))
      .withColumn("_pid", spark_partition_id().cast("long"))
    val snap = ranged.withColumn("_local",
        sum(col(valueCol)).over(Window.partitionBy(col("_pid"))
          .orderBy(col(orderCol))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint()
    val totals = snap.groupBy(col("_pid")).agg(sum(col(valueCol)).as("_t"))
    val offsets = totals.as("a")
      .join(broadcast(totals.as("b")), col("b._pid") < col("a._pid"), "left")
      .groupBy(col("a._pid").as("_pid"))
      .agg(coalesce(sum(col("b._t")), lit(0L)).as("_off"))
    snap.join(broadcast(offsets), "_pid")
      .withColumn(cumCol, col("_local") + col("_off"))
      .drop("_pid", "_local")
  }
}
