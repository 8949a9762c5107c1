package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{MatSchema, Scan}

/** The bucketed graft layout: the same table semantics as [[graft.core.MatDb]]
  * (immutable per-transaction segments, newest-wins MVCC resolution, snapshot
  * reads / time travel), stored as ONE Spark catalog table that is
  * Hive-partitioned by transaction id and hash-bucketed + sorted on the
  * dimensions — so the flagship read path needs NO shuffle at all
  * (SURVEY.md §9.3 #1).
  *
  * Why this shape (and not the plain-directory layout of [[graft.core]]):
  *   - every append pays ONE hash shuffle on the dimension key at write time
  *     (`bucketBy` routes rows to their bucket);
  *   - because the bucket function and count are fixed table-wide, bucket i
  *     of EVERY transaction holds the same key slice — all versions of a key
  *     are co-located by construction;
  *   - the scan therefore reports `HashPartitioning(dims, buckets)` and the
  *     MVCC dedup aggregate (`Scan.dedup`, the same one the directory layout
  *     uses after an exchange) plans with ZERO Exchange — shuffled bytes for
  *     the resolve drop from ~live-rows to zero;
  *   - `_txn_id` is a Hive partition column, so snapshot/time-travel
  *     visibility (`_txn_id <= asOf`) is directory-level partition PRUNING —
  *     the reference's horizon rule (database.rs:85-89) as metadata, not IO.
  *
  * This is the read-heavy counterpart of the directory layout: writes are
  * strictly more expensive (a shuffle per append vs. chunk-key routing), so
  * ingest-heavy tables keep the [[graft.core.MatDb]] path and read-heavy
  * tables export here — at 100 TB "shuffle once at write, never at read" is
  * the right side of the trade for any table queried more than once.
  * BucketedGraftSpec pins the zero-Exchange dedup plan, the partition-pruned
  * asOf, and row-for-row parity with the MatDb resolve.
  *
  * Semantics note: one `append` = one committed transaction; duplicate keys
  * within a single append resolve arbitrarily (same contract as one
  * `Transaction.addRows` batch). The catalog's table-creation commit is the
  * atomic visibility flip (`saveAsTable` appends register files + partition
  * atomically at the metastore).
  *
  * SINGLE WRITER per table: txn ids come from a read-then-write over the
  * partition listing, so two concurrent appenders (e.g. a streaming sink
  * plus a manual backfill) can land under the SAME txn id — two logical
  * transactions merged, arbitrary resolution between their overlapping
  * keys. Same contract as the reference (database.rs:74-79) and the
  * directory layout's rename protocol; the manifest protocol's
  * expectedBase conflict detection is the roadmap fix (SURVEY §9.4 #4).
  */
object BucketedGraft {

  /** Create an empty bucketed graft table. `buckets` is fixed for the
    * table's lifetime (it IS the co-location contract). Pick it like a
    * shuffle partition count for the table's full size: largest per-bucket
    * slice ≈ table_size / buckets should fit an executor core's working
    * memory. */
  def create(spark: SparkSession, name: String, schema: MatSchema, buckets: Int): Unit = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], fullStruct(schema))
    write(empty, name, schema, buckets, SaveMode.ErrorIfExists)
  }

  /** Commit `df` as one new transaction; returns its txn id, or None when
    * the batch was empty. An empty write leaves no `_txn_id` partition —
    * no transaction exists, and handing out its id anyway would let the
    * NEXT append commit under the same number (the returned id would alias
    * two callers' transactions). Checked AFTER the write from partition
    * metadata, so non-empty batches aren't computed twice. */
  def append(spark: SparkSession, name: String, schema: MatSchema, df: DataFrame,
      buckets: Int): Option[Long] = {
    val txn = nextTxnId(spark, name)
    val batch = df.select(schema.columnNames.map(col): _*)
      .withColumn(Scan.SeqCol, lit(0L))
      .withColumn(Scan.TxnCol, lit(txn))
    write(batch, name, schema, buckets, SaveMode.Append)
    if (spark.sql(s"SHOW PARTITIONS $name").collect()
        .exists(_.getString(0) == s"${Scan.TxnCol}=$txn")) Some(txn)
    else None
  }

  /** Newest version of every key point, resolved with zero exchanges.
    * `asOf` = snapshot-horizon / time-travel visibility via partition
    * pruning on `_txn_id`. */
  def snapshot(spark: SparkSession, name: String, schema: MatSchema,
      asOf: Option[Long] = None): DataFrame = {
    val t = spark.table(name)
    Scan.dedup(asOf.fold(t)(a => t.where(col(Scan.TxnCol) <= a)), schema)
  }

  /** Key-ordered resolved scan. The one exchange left is the range
    * partitioning of the RESOLVED rows for global order — the dedup itself
    * stays bucket-local (the directory layout needs the same exchange and
    * could not skip the dedup shuffle). */
  def orderedScan(spark: SparkSession, name: String, schema: MatSchema,
      asOf: Option[Long] = None): DataFrame =
    snapshot(spark, name, schema, asOf).orderBy(schema.dimNames.map(col): _*)

  /** Next transaction id = max committed + 1, from partition METADATA
    * (no data files touched — the reference's directory-scan txn-id
    * recovery, database.rs:123-126, as a catalog listing). */
  def nextTxnId(spark: SparkSession, name: String): Long = {
    val parts = spark.sql(s"SHOW PARTITIONS $name").collect()
    val ids = parts.map(_.getString(0)).flatMap { p =>
      p.split("=") match {
        case Array(Scan.TxnCol, v) => Some(v.toLong)
        case _ => None
      }
    }
    if (ids.isEmpty) 1L else ids.max + 1L
  }

  /** Compact the table: rewrite the resolved snapshot as ONE transaction
    * (counterpart of [[graft.core.MatDb.compact]]). A long-lived writer —
    * the streaming sink especially — accumulates one `_txn_id` partition
    * and one bucket-file set per commit, which grows every partition
    * listing and every snapshot's file scan; compaction collapses them to
    * a single partition. Same caveat as the directory layout: time travel
    * to pre-compaction transactions is gone. The snapshot is staged to a
    * temp directory first (Spark refuses to overwrite a table from a plan
    * that reads it). Returns the surviving transaction's id. */
  def compact(spark: SparkSession, name: String, schema: MatSchema, buckets: Int): Long = {
    val txn = nextTxnId(spark, name)
    val staging = java.nio.file.Files.createTempDirectory("graft-bucketed-compact")
    val stagingData = staging.resolve("data").toString
    try {
      snapshot(spark, name, schema)
        .withColumn(Scan.SeqCol, lit(0L))
        .withColumn(Scan.TxnCol, lit(txn))
        .write.parquet(stagingData)
      write(spark.read.parquet(stagingData), name, schema, buckets, SaveMode.Overwrite)
      txn
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(staging.toFile)
    }
  }

  /** Drop the table AND its files. Catalog entries are session-scoped
    * under the default in-memory catalog, but the managed location
    * persists on disk — a stale directory from a previous session would
    * fail the next [[create]]'s ErrorIfExists write. The location comes
    * from the catalog when the table is registered, else from the
    * configured warehouse path (never a hardcoded relative guess). */
  def drop(spark: SparkSession, name: String): Unit = {
    val catalog = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(name)
    val loc: java.io.File =
      if (catalog.tableExists(ident)) new java.io.File(catalog.getTableMetadata(ident).location)
      else {
        val wh = spark.sessionState.conf.warehousePath
        val base = if (wh.contains(":")) new java.io.File(java.net.URI.create(wh).getPath)
          else new java.io.File(wh)
        new java.io.File(base, name.toLowerCase(java.util.Locale.ROOT))
      }
    spark.sql(s"DROP TABLE IF EXISTS $name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    if (loc.exists()) rm(loc)
  }

  private def fullStruct(schema: MatSchema): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(schema.toStructType.fields.map(_.copy(nullable = true)) ++
      Seq(StructField(Scan.SeqCol, LongType), StructField(Scan.TxnCol, LongType)))
  }

  private def write(df: DataFrame, name: String, schema: MatSchema, buckets: Int,
      mode: SaveMode): Unit = {
    df.write.mode(mode).format("parquet")
      .option("compression", "zstd")
      .partitionBy(Scan.TxnCol)
      .bucketBy(buckets, schema.dimNames.head, schema.dimNames.tail: _*)
      .sortBy(schema.dimNames.head, schema.dimNames.tail: _*)
      .saveAsTable(name)
  }
}
