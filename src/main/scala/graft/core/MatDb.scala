package graft.core

import java.nio.file.Path
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A graft table: a directory of immutable parquet segments plus a schema
  * document — the reference's `Database` (database.rs:20-27) re-imagined as a
  * mini table format (structurally a proto-Delta; SURVEY.md §7.0).
  *
  * Concurrency model matches the reference: single writer process, txn ids
  * allocated in-process (database.rs:74-79). Readers are snapshot-isolated:
  * a transaction sees only segments with `txnId < horizon` taken at open
  * (database.rs:68-72, 85-89), which doubles as time travel via [[asOf]].
  */
final class MatDb private (
    val spark: SparkSession,
    val root: Path,
    val schema: MatSchema,
    initialCommitted: Seq[SegmentId],
    firstTxnId: Long) {

  // Committed-segment set + next txn id; guarded by `this` (driver-side only).
  private var committed: Vector[SegmentId] = initialCommitted.toVector.sorted
  private val nextTxnId = new AtomicLong(firstTxnId)

  def committedSegments: Seq[SegmentId] = synchronized(committed)

  private[core] def allocateTxnId(): Long = nextTxnId.getAndIncrement()

  private[core] def register(ids: Seq[SegmentId]): Unit = synchronized {
    committed = (committed ++ ids).sorted
  }

  /** Open a new snapshot-isolated transaction. Horizon = all txns committed
    * so far (reference: database.rs:68-72). */
  def newTransaction(): Transaction = synchronized {
    new Transaction(this, committed, nextTxnId.get())
  }

  /** Read-only snapshot of the table: newest version of each key point, in
    * no particular order (add `.orderBy` for the reference's key-ordered
    * scan). `asOfTxn` gives time travel: only segments with txnId <= asOfTxn. */
  def snapshot(asOfTxn: Option[Long] = None): DataFrame = {
    val visible = synchronized(committed).filter(s => asOfTxn.forall(s.txnId <= _))
    Scan.resolve(spark, root, schema, visible, extra = Nil)
  }

  def asOf(txnId: Long): DataFrame = snapshot(Some(txnId))

  /** Key-ordered full scan — the reference's one query operator
    * (scan.rs:183-238): newest version per key, ordered by dimensions. */
  def orderedScan(): DataFrame = {
    import org.apache.spark.sql.functions.col
    snapshot().orderBy(schema.dimNames.map(col): _*)
  }

  /** Expose the resolved snapshot to Spark SQL as a temp view — the §7.1
    * "sql" module: the entire SQL surface (joins, windows, CTEs, …) then
    * applies to graft tables for free. */
  def registerView(name: String, asOfTxn: Option[Long] = None): Unit =
    snapshot(asOfTxn).createOrReplaceTempView(name)

  /** Compact the table: rewrite the resolved snapshot as one new
    * transaction, then drop the superseded segments. Counterpart of Delta's
    * OPTIMIZE+VACUUM; the reference accumulates segments forever.
    *
    * Crash-safe ordering: the rewrite commits through the normal protocol
    * first (its rows outrank every older version in the MVCC resolution), so
    * a crash before the deletes only leaves redundant — never missing —
    * data, and the next compact reclaims it. Caveat (documented): time
    * travel to transactions older than the compaction is gone, and
    * single-writer semantics apply as everywhere else.
    *
    * Returns the compaction transaction id, or -1 if the table was empty. */
  def compact(): Long = {
    val txn = newTransaction()
    txn.addRows(snapshot())
    txn.commit()
    txn.id match {
      case None => -1L // empty table, nothing rewritten
      case Some(cid) =>
        val old = synchronized {
          val (stale, keep) = committed.partition(_.txnId < cid)
          committed = keep
          stale
        }
        old.foreach(s => Storage.delete(root, s, tmp = false))
        cid
    }
  }
}

object MatDb {
  /** Create a new table directory (reference: database.rs:35-50). */
  def create(spark: SparkSession, schema: MatSchema, path: String): MatDb = {
    val root = Storage.rootPath(path)
    Storage.writeSchema(root, schema)
    new MatDb(spark, root, schema, Seq.empty, 1L)
  }

  /** Open an existing table: load schema, sweep leftovers, rebuild the
    * committed set and next txn id (reference: database.rs:52-66, 100-127). */
  def open(spark: SparkSession, path: String): MatDb = {
    val root = Storage.rootPath(path)
    val schema = Storage.readSchema(root)
    val (committed, nextTxn) = Storage.recover(root)
    new MatDb(spark, root, schema, committed, nextTxn)
  }

  def createOrOpen(spark: SparkSession, schema: MatSchema, path: String): MatDb = {
    val root = Storage.rootPath(path)
    if (java.nio.file.Files.exists(Storage.schemaPath(root))) open(spark, path)
    else create(spark, schema, path)
  }
}
