package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed/co-located join path (SURVEY.md §9.2 #3): persist a table
  * hash-bucketed AND sorted on its join key so that repeated fact-fact
  * equi-joins and aggregations on that key run with ZERO exchanges on
  * either side — the shuffle is paid once at write time, not per query.
  *
  * Spark only honors bucket metadata through the catalog
  * (`DataFrameWriter.bucketBy` requires `saveAsTable`), so this is the
  * catalog-table interop for graft data: export a resolved snapshot
  * (`db.snapshot()`) or any DataFrame once, query it many times.
  * BucketingSpec pins the exchange-free join plan and result parity with
  * the shuffled join.
  *
  * At 100 TB: two fact tables bucketed into the same bucket count on the
  * same key co-locate partition-for-partition; a 1000-executor join reads
  * both sides bucket-aligned with no network phase. Pick `buckets` so a
  * bucket's largest table slice fits an executor core's working memory
  * (e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket per table — size down
  * with wider clusters).
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted catalog parquet table. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit = {
    require(keys.nonEmpty, "bucket keys must be non-empty")
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** The bucketed table, bucket metadata intact (must be read via the
    * catalog name — `spark.read.parquet(path)` would drop bucketing). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
