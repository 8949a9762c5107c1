package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTablePartition}
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
  * == Concurrency contract (round 5) ==
  *
  * Txn-id ALLOCATION is concurrency-safe: ids are claimed with a
  * put-if-absent partition creation at the metastore
  * (`createPartitions(ignoreIfExists = false)` throws on an existing
  * partition and is atomic both in Spark's in-memory catalog and in a Hive
  * metastore) — the same shape as the manifest protocol's `Files.createLink`
  * publish (Storage.ManifestProtocol). Two concurrent appenders — e.g. a
  * streaming sink plus a manual backfill — therefore get DISTINCT,
  * sequential ids and can never merge two logical transactions under one
  * number (the reference's in-process allocation, database.rs:74-79, has no
  * such guard). The claim loop also makes append cost independent of table
  * age: the candidate id comes from a `graft.maxTxn` table-property hint
  * (one metastore getTable call), not from listing all partitions; the
  * listing runs only to (re)seed a missing or stale hint. A writer that
  * claims an id and dies leaves an EMPTY partition: invisible to reads (no
  * files), never reused (the claim stands), swept by [[compact]].
  *
  * What remains single-writer-ish: the DATA write under two simultaneously
  * in-flight appends shares the table's Hadoop `_temporary` staging
  * directory, whose job-commit cleanup is not concurrency-safe in
  * stock committers — claims serialize the IDS, not the file moves. Run
  * overlapping writers against a concurrency-safe committer, or serialize
  * the write phase (a streaming sink's micro-batches already are). And
  * [[compact]] aborts if any transaction committed between its snapshot
  * read and its rewrite (detected from the partition listing), but the
  * detect-then-overwrite window cannot be fully closed at a
  * last-writer-wins metastore — stop the stream, or call compact at the
  * stream's own serialization point (inside foreachBatch), when compacting
  * a streamed table.
  */
object BucketedGraft {

  /** Table property holding the highest committed txn id — an O(1)
    * allocation hint so append cost does not grow with the number of
    * transactions. Advisory only: the partition CLAIM is what makes an id
    * unique, so a stale or lost hint costs extra claim probes, never
    * correctness. */
  val MaxTxnProp = "graft.maxTxn"

  /** Create an empty bucketed graft table. `buckets` is fixed for the
    * table's lifetime (it IS the co-location contract). Pick it like a
    * shuffle partition count for the table's full size: largest per-bucket
    * slice ≈ table_size / buckets should fit an executor core's working
    * memory. */
  def create(spark: SparkSession, name: String, schema: MatSchema, buckets: Int): Unit = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], fullStruct(schema))
    write(empty, name, schema, buckets, SaveMode.ErrorIfExists)
    setMaxTxnHint(spark, name, 0L)
  }

  /** Commit `df` as one new transaction; returns its txn id, or None when
    * the batch was empty. An empty write leaves an empty claimed partition —
    * no data, so no transaction is visible to any read — and the claim is
    * dropped so the id returns to the pool. Checked AFTER the write from the
    * partition's file listing, so non-empty batches aren't computed twice. */
  def append(spark: SparkSession, name: String, schema: MatSchema, df: DataFrame,
      buckets: Int): Option[Long] = {
    val txn = claimTxnId(spark, name)
    val batch = df.select(schema.columnNames.map(col): _*)
      .withColumn(Scan.SeqCol, lit(0L))
      .withColumn(Scan.TxnCol, lit(txn))
    write(batch, name, schema, buckets, SaveMode.Append)
    if (partitionHasData(spark, name, txn)) {
      setMaxTxnHint(spark, name, txn)
      Some(txn)
    } else {
      dropClaim(spark, name, txn)
      None
    }
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

  /** Expose the RESOLVED table to Spark SQL as a temp view — SQL over the
    * bucketed layout with the zero-exchange resolve intact (views inline
    * their plan, so `SELECT ... FROM <view>` composes with the bucket
    * partitioning exactly like the DataFrame API; the raw catalog table
    * `name` stays available for provenance queries). `asOf` pins the view
    * to a snapshot horizon. */
  def registerResolvedView(spark: SparkSession, name: String, schema: MatSchema,
      viewName: String, asOf: Option[Long] = None): Unit =
    snapshot(spark, name, schema, asOf).createOrReplaceTempView(viewName)

  /** Atomically claim the next free transaction id by creating its (empty)
    * `_txn_id` partition with put-if-absent semantics at the metastore.
    * The first candidate comes from the `graft.maxTxn` hint; a lost race or
    * stale hint re-probes from the authoritative partition listing. Returns
    * the claimed id — callers own it exclusively. */
  def claimTxnId(spark: SparkSession, name: String): Long = {
    val (db, table) = dbTable(spark, name)
    val ext = spark.sharedState.externalCatalog
    var candidate = math.max(maxTxnHint(spark, name).getOrElse(listMaxTxn(spark, name)), 0L) + 1L
    var claimed = -1L
    while (claimed < 0) {
      try {
        ext.createPartitions(db, table,
          Seq(CatalogTablePartition(Map(Scan.TxnCol -> candidate.toString),
            CatalogStorageFormat.empty)),
          ignoreIfExists = false)
        claimed = candidate
      } catch {
        case _: org.apache.spark.sql.catalyst.analysis.PartitionsAlreadyExistException =>
          // lost the race (or the hint was stale): re-probe from the real max
          candidate = math.max(candidate, listMaxTxn(spark, name)) + 1L
      }
    }
    claimed
  }

  /** Highest committed transaction id from partition METADATA (no data
    * files touched — the reference's directory-scan txn-id recovery,
    * database.rs:123-126, as a catalog listing). O(#transactions) names:
    * this is the discovery/probe API; the append path allocates through
    * [[claimTxnId]]'s O(1) hint instead. */
  def nextTxnId(spark: SparkSession, name: String): Long = listMaxTxn(spark, name) + 1L

  /** Compact the table: rewrite the resolved snapshot as ONE transaction
    * (counterpart of [[graft.core.MatDb.compact]]). A long-lived writer —
    * the streaming sink especially — accumulates one `_txn_id` partition
    * and one bucket-file set per commit, which grows every partition
    * listing and every snapshot's file scan; compaction collapses them to
    * a single partition (sweeping any dead claim partitions with it). Same
    * caveat as the directory layout: time travel to pre-compaction
    * transactions is gone. The snapshot is staged to a temp directory
    * first (Spark refuses to overwrite a table from a plan that reads it).
    *
    * Concurrent-append safety: the compaction txn id is CLAIMED up front
    * (so no appender can take it), and immediately before the overwrite
    * the partition listing is re-checked — any transaction that committed
    * after the snapshot was taken aborts the compaction with
    * IllegalStateException (nothing overwritten; the staged copy is
    * discarded, the claim dropped). The residual check-to-overwrite window
    * is documented in the object scaladoc. Returns the surviving
    * transaction's id.
    *
    * `beforeCheck` is a test seam: invoked after the snapshot is staged and
    * before the concurrent-append re-check (production callers leave the
    * default no-op). */
  def compact(spark: SparkSession, name: String, schema: MatSchema, buckets: Int,
      beforeCheck: () => Unit = () => ()): Long = {
    val base = listTxnIds(spark, name).toSet
    val txn = claimTxnId(spark, name)
    val staging = java.nio.file.Files.createTempDirectory("graft-bucketed-compact")
    val stagingData = staging.resolve("data").toString
    try {
      snapshot(spark, name, schema)
        .withColumn(Scan.SeqCol, lit(0L))
        .withColumn(Scan.TxnCol, lit(txn))
        .write.parquet(stagingData)
      beforeCheck()
      val now = listTxnIds(spark, name).toSet - txn
      if (now != base) {
        dropClaim(spark, name, txn)
        throw new IllegalStateException(
          s"compact aborted: transactions ${(now -- base).toSeq.sorted.mkString(",")} " +
            s"committed concurrently (overwriting would discard them); " +
            s"stop the writer or compact at its serialization point")
      }
      write(spark.read.parquet(stagingData), name, schema, buckets, SaveMode.Overwrite)
      setMaxTxnHint(spark, name, txn)
      txn
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(staging.toFile)
    }
  }

  /** Zero-copy SHALLOW CLONE of a bucketed table ([[graft.core.MatDb.shallowClone]]
    * ported to the metastore layout): create the target with the same
    * schema/bucketing, hard-link every committed `_txn_id` partition's
    * files into the target's location, and register the partitions —
    * no data bytes copied, and writes/compaction on either side never
    * affect the other (links pin the shared bytes). Dead claim partitions
    * (no files) are not carried. */
  def shallowClone(spark: SparkSession, srcName: String, dstName: String,
      schema: MatSchema, buckets: Int): Unit = {
    create(spark, dstName, schema, buckets)
    val catalog = spark.sessionState.catalog
    def loc(n: String) = java.nio.file.Paths.get(
      catalog.getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(n))
        .location)
    val (srcLoc, dstLoc) = (loc(srcName), loc(dstName))
    val (dstDb, dstTable) = dbTable(spark, dstName)
    val ext = spark.sharedState.externalCatalog
    val txns = listTxnIds(spark, srcName).sorted
    txns.foreach { txn =>
      val part = s"${Scan.TxnCol}=$txn"
      val from = srcLoc.resolve(part)
      if (java.nio.file.Files.isDirectory(from)) {
        graft.core.Storage.linkOrCopyTree(
          graft.core.Storage.casStore(srcLoc), from, dstLoc.resolve(part))
        ext.createPartitions(dstDb, dstTable,
          Seq(CatalogTablePartition(Map(Scan.TxnCol -> txn.toString),
            CatalogStorageFormat.empty)),
          ignoreIfExists = false)
      }
    }
    txns.maxOption.foreach(setMaxTxnHint(spark, dstName, _))
  }

  /** Resolved-snapshot statistics for a bucketed table
    * ([[graft.core.MatDb.analyze]] ported to the metastore layout): one
    * aggregate over the resolved snapshot computes the post-MVCC row count
    * and actual logical size (variable-width columns measured, not
    * defaultSize-priced), persisted as CATALOG statistics
    * (`alterTableStats`) — Catalyst then prices the relation by the
    * resolved estimate instead of raw multi-version file bytes, the same
    * broadcast-unlocking effect as the directory layout's GraftStatsScan.
    * Returns (rowCount, sizeBytes). Stale-stats note: catalog statistics
    * are a point-in-time snapshot; re-run after significant writes (the
    * metastore has no watermark to auto-invalidate against). */
  def analyze(spark: SparkSession, name: String, schema: MatSchema): (Long, Long) = {
    import org.apache.spark.sql.types.{ArrayType, BinaryType, StringType}
    val snap = snapshot(spark, name, schema)
    val struct = schema.toStructType
    val (varCols, fixedCols) = struct.fields.partition(f => f.dataType match {
      case StringType | BinaryType | _: ArrayType => true
      case _ => false
    })
    val varAggs = varCols.toSeq.map { f =>
      val measured = f.dataType match {
        case at: ArrayType =>
          size(col(f.name)).cast("long") * lit(at.elementType.defaultSize.toLong)
        case _ => octet_length(col(f.name)).cast("long")
      }
      sum(coalesce(measured, lit(0L))).as(s"_sz_${f.name}")
    }
    val aggs = count(lit(1)).as("_n") +: varAggs
    val row = snap.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getLong(0)
    val varBytes = varCols.indices.map(i =>
      if (row.isNullAt(1 + i)) 0L else row.getLong(1 + i)).sum
    val bytes = n * fixedCols.map(_.dataType.defaultSize.toLong).sum + varBytes
    val (db, table) = dbTable(spark, name)
    spark.sharedState.externalCatalog.alterTableStats(db, table,
      Some(org.apache.spark.sql.catalyst.catalog.CatalogStatistics(
        BigInt(bytes), Some(BigInt(n)))))
    // a cached relation would keep pricing the old stats
    spark.sessionState.catalog.refreshTable(
      spark.sessionState.sqlParser.parseTableIdentifier(name))
    (n, bytes)
  }

  /** Drop the table AND its files. Catalog entries are session-scoped
    * under the default in-memory catalog, but the managed location
    * persists on disk — a stale directory from a previous session would
    * fail the next [[create]]'s ErrorIfExists write. The location comes
    * from the catalog when the table is registered, else from the
    * configured warehouse path (never a hardcoded relative guess). */
  def drop(spark: SparkSession, name: String): Unit = {
    val catalog = spark.sessionState.catalog
    val ident = TableIdentifier(name)
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

  // ---- metastore plumbing --------------------------------------------------

  private def dbTable(spark: SparkSession, name: String): (String, String) = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
    (ident.database.getOrElse(spark.sessionState.catalog.getCurrentDatabase), ident.table)
  }

  private def listTxnIds(spark: SparkSession, name: String): Seq[Long] = {
    val (db, table) = dbTable(spark, name)
    spark.sharedState.externalCatalog.listPartitionNames(db, table).flatMap { p =>
      p.split("=") match {
        case Array(Scan.TxnCol, v) => Some(v.toLong)
        case _ => None
      }
    }
  }

  private def listMaxTxn(spark: SparkSession, name: String): Long = {
    val ids = listTxnIds(spark, name)
    if (ids.isEmpty) 0L else ids.max
  }

  private def maxTxnHint(spark: SparkSession, name: String): Option[Long] = {
    val (db, table) = dbTable(spark, name)
    spark.sharedState.externalCatalog.getTable(db, table)
      .properties.get(MaxTxnProp).map(_.toLong)
  }

  /** Advance the `graft.maxTxn` hint (monotonic; plain read-modify-write —
    * a lost update only staleness the hint, claims keep ids unique). */
  private def setMaxTxnHint(spark: SparkSession, name: String, txn: Long): Unit = {
    val (db, table) = dbTable(spark, name)
    val ext = spark.sharedState.externalCatalog
    val t = ext.getTable(db, table)
    val current = t.properties.get(MaxTxnProp).map(_.toLong).getOrElse(-1L)
    if (txn > current)
      ext.alterTable(t.copy(properties = t.properties + (MaxTxnProp -> txn.toString)))
  }

  /** Does the claimed partition contain any data file? (Hidden files and
    * commit markers don't count.) One directory listing — O(files in this
    * one partition), not O(table). Goes through the Hadoop FileSystem of
    * the partition's own URI, NOT java.io.File: a false negative here
    * would make [[append]] drop-with-purge a batch that actually landed,
    * so this check must be correct on hdfs://, s3a://, etc., same as the
    * write path that produced the files. */
  private def partitionHasData(spark: SparkSession, name: String, txn: Long): Boolean = {
    val (db, table) = dbTable(spark, name)
    val part = spark.sharedState.externalCatalog
      .getPartition(db, table, Map(Scan.TxnCol -> txn.toString))
    part.storage.locationUri.exists { uri =>
      val path = new org.apache.hadoop.fs.Path(uri)
      val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
      try fs.listStatus(path).exists { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      } catch { case _: java.io.FileNotFoundException => false }
    }
  }

  private def dropClaim(spark: SparkSession, name: String, txn: Long): Unit = {
    val (db, table) = dbTable(spark, name)
    spark.sharedState.externalCatalog.dropPartitions(db, table,
      Seq(Map(Scan.TxnCol -> txn.toString)),
      ignoreIfNotExists = true, purge = false, retainData = false)
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
