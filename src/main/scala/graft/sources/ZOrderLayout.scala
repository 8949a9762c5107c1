package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-dimensional clustering by Morton (Z-order) value — the layout
  * maintenance pass for tables filtered on more than one key (the
  * OPTIMIZE ZORDER of Delta/Iceberg, done as a plain write-time sort; cf.
  * the single-dimension [[RangedGraft]] layout, which this generalizes
  * for point/range predicates on EITHER of two keys).
  *
  * Rows are range-partitioned AND sorted by the interleaved
  * [[graft.functions.ZOrder2]] key, so each output file covers a small
  * z-curve segment — a bounded rectangle-ish region of (a, b) space — and
  * parquet's per-file/row-group min-max stats on the ORIGINAL columns
  * prune scans for predicates on either one. Nothing at read time is
  * custom: the layout alone concentrates matching rows into few files,
  * ordinary pushdown does the rest (ZOrderSpec measures the
  * concentration vs a single-key sort).
  *
  * Scale shape: one range exchange (sampled boundaries) + local sort per
  * write — the same cost as any clustered write; reads are pruned scans
  * with zero extra work. Keys must be non-negative and < 2^32 (wider keys
  * should be rank- or bucket-reduced first — at 100 TB the usual recipe
  * is z-ordering on coarse buckets of the raw keys).
  */
object ZOrderLayout {

  /** Write `df` clustered by the z-order of two long-typed dimensions. */
  def write(df: DataFrame, dimA: String, dimB: String, path: String,
      files: Int): Unit = {
    graft.functions.ZOrder2.register(df.sparkSession)
    df.withColumn("_z", graft.functions.ZOrder2.zorder2(
        col(dimA).cast("long"), col(dimB).cast("long")))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
