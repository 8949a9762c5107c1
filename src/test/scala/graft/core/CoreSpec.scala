package graft.core

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // catalog + SQL time travel need the analyzer rule (GraftCatalogSpec);
      // the same entry a production session would set
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The FINAL adaptive physical plan as text — AQE's echoed "Initial
    * Plan" is stripped so `contains("Exchange")`-style assertions judge
    * the plan that actually ran, not the pre-reoptimization one. Shared
    * by every spec that pins a plan shape (one place to fix when the
    * plan-string format shifts across Spark versions). */
  def finalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head

  /** Run `df` and assert its final plan contains no Exchange. */
  def assertNoExchange(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
    df.collect()
    val plan = finalPlan(df)
    assert(!plan.contains("Exchange"), s"$what must not shuffle:\n$plan")
  }
}

/** End-to-end core-engine behaviors, run once per commit protocol (the
  * rename protocol of the reference and the object-store-safe manifest
  * protocol must be indistinguishable through the public API). The first
  * test reproduces the reference's integration scenario
  * (reference: tests/matdb.rs:54-75): 100×100 grid, mid-txn flush, in-txn
  * visibility, commit, fresh-txn visibility, and the dirty-directory re-run
  * relying on upsert dedup. */
abstract class CoreProtocolBehaviors(protocolName: String,
    storeName: String = "posix")
    extends AnyFunSuite with BeforeAndAfterAll {
  protected lazy val spark = TestSpark.spark

  protected def tmpDir(): String =
    Files.createTempDirectory(s"graft-core-$protocolName-$storeName").toString

  protected def create(path: String): MatDb =
    MatDb.create(spark, schema, path, protocolName, storeName)

  private def grid(n: Int, m: Int, valueOf: (Int, Int) => Long): Seq[Seq[Any]] =
    for (t <- 0 until n; s <- 0 until m)
      yield Seq(t.toLong, s.toLong, valueOf(t, s))

  protected val schema = MatSchema(
    Seq(Dimension("time", 50), Dimension("sensor_id", 10)),
    Seq(ValueCol("value")))

  test("matdb integration scenario: insert grid, flush, query, commit, reopen, dirty rerun") {
    val path = tmpDir()
    val db = MatDb.createOrOpen(spark, schema, path, protocolName, storeName)
    assert(db.protocol.name === protocolName)

    val txn = db.newTransaction()
    // sensors 0-49 before the flush, 50-99 after
    txn.addRowsSeq(grid(100, 50, (t, s) => (t * 1000 + s).toLong))
    txn.flush() // mid-txn spill, reference tests/matdb.rs:32-34
    txn.addRowsSeq(
      for (t <- 0 until 100; s <- 50 until 100)
        yield Seq[Any](t.toLong, s.toLong, (t * 1000 + s).toLong))
    // query inside the txn sees both flushed and buffered rows
    assert(txn.query().count() === 10000)
    txn.commit()

    // fresh txn after commit sees all rows
    val txn2 = db.newTransaction()
    assert(txn2.query().count() === 10000)
    txn2.rollback()

    // reopen from disk (protocol is self-describing)
    val db2 = MatDb.open(spark, path)
    assert(db2.protocol.name === protocolName)
    assert(db2.snapshot().count() === 10000)

    // dirty re-run: re-insert the same keys with new values; upsert dedup
    // keeps the count at 10000 and the NEW values win
    val txn3 = db2.newTransaction()
    txn3.addRowsSeq(grid(100, 100, (t, s) => 777L))
    txn3.commit()
    val snap = db2.snapshot()
    assert(snap.count() === 10000)
    import org.apache.spark.sql.functions._
    assert(snap.agg(countDistinct(col("value"))).head().getLong(0) === 1L)
    assert(snap.agg(max(col("value"))).head().getLong(0) === 777L)
  }

  test("ordered scan yields key order") {
    val path = tmpDir()
    val db = create(path)
    val txn = db.newTransaction()
    txn.addRowsSeq(Seq(Seq(5L, 1L, 10L), Seq(1L, 2L, 20L), Seq(1L, 1L, 30L), Seq(120L, 7L, 40L)))
    txn.commit()
    val rows = db.orderedScan().collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq === Seq((1L, 1L), (1L, 2L), (5L, 1L), (120L, 7L)))
  }

  test("ordered scan resolves MVCC and ships ONE exchange, not two") {
    val path = tmpDir()
    val db = create(path)
    val t1 = db.newTransaction()
    t1.addRowsSeq(Seq(Seq(1L, 1L, 10L), Seq(2L, 1L, 20L)))
    t1.commit()
    val t2 = db.newTransaction()
    t2.addRowsSeq(Seq(Seq(1L, 1L, 11L))) // upsert of (1,1)
    t2.commit()
    val scan = db.orderedScan()
    // newest version per key, key-ordered
    assert(scan.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq((1L, 1L, 11L), (2L, 1L, 20L)))
    // the single range exchange clusters equal keys for the dedup
    // aggregate AND satisfies the final sort — snapshot().orderBy would
    // move the table twice (hash for the groupBy, range for the sort)
    // AQE prints the final plan first and the pre-adaptive one after —
    // count exchanges in the final section only
    val plan = scan.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = plan.linesIterator.count(_.trim.startsWith("+- Exchange"))
    assert(plan.contains("rangepartitioning"), plan)
    assert(exchanges === 1, s"expected exactly one Exchange:\n$plan")
  }

  test("newest txn wins across commits; later batch wins within txn") {
    val path = tmpDir()
    val db = create(path)
    val t1 = db.newTransaction()
    t1.addRowsSeq(Seq(Seq(1L, 1L, 100L)))
    t1.commit()
    val t2 = db.newTransaction()
    t2.addRowsSeq(Seq(Seq(1L, 1L, 200L)))
    t2.addRowsSeq(Seq(Seq(1L, 1L, 300L))) // later batch, same txn
    t2.flush()
    t2.addRowsSeq(Seq(Seq(1L, 1L, 400L))) // buffered after flush
    t2.commit()
    val vals = db.snapshot().collect().map(_.getLong(2))
    assert(vals.toSeq === Seq(400L))
  }

  test("snapshot isolation: txn opened before a commit does not see it") {
    val path = tmpDir()
    val db = create(path)
    val t1 = db.newTransaction()
    t1.addRowsSeq(Seq(Seq(1L, 1L, 1L)))
    t1.commit()
    val reader = db.newTransaction() // horizon fixed here
    val t2 = db.newTransaction()
    t2.addRowsSeq(Seq(Seq(2L, 2L, 2L)))
    t2.commit()
    assert(reader.query().count() === 1)       // does not see t2
    assert(db.snapshot().count() === 2)        // fresh snapshot does
    reader.rollback()
  }

  test("time travel asOf") {
    val path = tmpDir()
    val db = create(path)
    val t1 = db.newTransaction(); t1.addRowsSeq(Seq(Seq(1L, 1L, 1L))); t1.commit()
    val t2 = db.newTransaction(); t2.addRowsSeq(Seq(Seq(1L, 1L, 2L), Seq(3L, 3L, 3L))); t2.commit()
    assert(db.asOf(1L).collect().map(_.getLong(2)).toSeq === Seq(1L))
    assert(db.snapshot().count() === 2)
  }

  test("rollback and crash recovery drop uncommitted segments") {
    val path = tmpDir()
    val db = create(path)
    val t1 = db.newTransaction(); t1.addRowsSeq(Seq(Seq(1L, 1L, 1L))); t1.commit()
    // rollback path
    val t2 = db.newTransaction(); t2.addRowsSeq(Seq(Seq(2L, 2L, 2L))); t2.flush(); t2.rollback()
    assert(db.snapshot().count() === 1)
    // crash path: flushed-but-uncommitted segment left behind, then reopen
    // sweeps it (and the crashed txn still burned its id)
    val t3 = db.newTransaction(); t3.addRowsSeq(Seq(Seq(3L, 3L, 3L))); t3.flush()
    val crashedId = t3.id.get
    val db2 = MatDb.open(spark, path)
    assert(db2.snapshot().count() === 1)
    val t4 = db2.newTransaction(); t4.addRowsSeq(Seq(Seq(4L, 4L, 4L))); t4.commit()
    assert(t4.id.get > crashedId)
  }

  test("overwrite replaces contents: absent keys are gone, not upserted around") {
    import spark.implicits._
    val path = tmpDir()
    val db = create(path)
    val t1 = db.newTransaction()
    t1.addRowsSeq(Seq(Seq(1L, 1L, 10L), Seq(2L, 2L, 20L), Seq(3L, 3L, 30L)))
    t1.commit()
    val cid = db.overwrite(
      Seq((1L, 1L, 11L), (9L, 9L, 90L)).toDF("time", "sensor_id", "value"))
    assert(cid > 0)
    val got = db.snapshot().collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got === Map(1L -> 11L, 9L -> 90L)) // keys 2 and 3 are gone
    // survives reopen; old segment dirs were deleted
    assert(MatDb.open(spark, path).snapshot().count() === 2)
    assert(db.committedSegments.forall(_.txnId == cid))
  }

  test("chunk-range predicate prunes and returns correct rows") {
    val path = tmpDir()
    val db = create(path)
    val txn = db.newTransaction()
    txn.addRowsSeq(grid(200, 10, (t, s) => t.toLong))
    txn.commit()
    val t2 = db.newTransaction()
    val pred = Scan.chunkRange(schema, "time", Some(60L), Some(119L))
    val got = t2.query(Some(pred))
    assert(got.count() === 60 * 10)
    t2.rollback()
  }

  test("compact rewrites to one transaction and drops superseded segments") {
    val path = tmpDir()
    val db = create(path)
    for (i <- 1 to 3) {
      val t = db.newTransaction()
      t.addRowsSeq(Seq(Seq(i.toLong, 1L, i * 10L), Seq(0L, 0L, i.toLong)))
      t.commit()
    }
    assert(db.committedSegments.map(_.txnId).distinct.size === 3)
    val before = db.snapshot().collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cid = db.compact()
    assert(cid > 0)
    assert(db.committedSegments.map(_.txnId).distinct === Seq(cid))
    val after = db.snapshot().collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(after === before)
    assert(after((0L, 0L)) === 3L) // upserted value survived compaction
    // reopen from disk agrees; a later txn still upserts over the compacted data
    val db2 = MatDb.open(spark, path)
    assert(db2.snapshot().count() === before.size)
    val t = db2.newTransaction(); t.addRowsSeq(Seq(Seq(0L, 0L, 99L))); t.commit()
    assert(db2.snapshot().where("time = 0 and sensor_id = 0").head().getLong(2) === 99L)
  }

  test("stale pre-DROP handle cannot commit dropped-column bytes (no re-ADD resurrection)") {
    val path = tmpDir()
    val two = MatSchema(
      Seq(Dimension("time", 50), Dimension("sensor_id", 10)),
      Seq(ValueCol("v"), ValueCol("w")))
    val db = MatDb.create(spark, two, path, protocolName)
    val t0 = db.newTransaction()
    t0.addRowsSeq(Seq(Seq(1L, 1L, 10L, 100L)))
    t0.commit()
    // stale handle captured BEFORE the drop: its schema still carries 'w'
    // and its next txn id (2) is about to be superseded by other writers
    val stale = MatDb.open(spark, path)
    for (i <- 2 to 3) { // other writers advance history past stale's ids
      val t = db.newTransaction()
      t.addRowsSeq(Seq(Seq(i.toLong, 1L, i * 10L, i * 100L)))
      t.commit()
    }
    // another writer drops 'w' and compacts — the tombstone lifts, so
    // nothing on disk remembers 'w' ever existed
    val (cur, ver) = Storage.readSchemaVersioned(db.root)
    assert(Storage.casSchema(db.root, ver,
      cur.copy(values = cur.values.filterNot(_.name == "w"), dropped = Seq("w"))))
    val post = MatDb.open(spark, path)
    post.compact()
    post.vacuum() // clear superseded dirs so the stale write itself succeeds
    assert(Storage.readSchema(db.root).dropped.isEmpty, "compact lifts the tombstone")
    // the stale handle's commit (txn id 2 — BELOW the baseline, carrying
    // w's bytes) must fail LOUDLY, not land silently-outranked segments
    val txn = stale.newTransaction()
    txn.addRowsSeq(Seq(Seq(2L, 2L, 20L, 200L)))
    val err = intercept[java.util.ConcurrentModificationException](txn.commit())
    assert(err.getMessage.contains("w"))
    // nothing committed; a post-drop handle sees only the compacted rows
    val fresh = MatDb.open(spark, path)
    assert(fresh.snapshot().count() === 3)
    // and the segment directory holds no uncommitted leftovers carrying 'w'
    assert(fresh.snapshot().columns.toSeq === Seq("time", "sensor_id", "v"))
  }

  test("history lists committed segments for time-travel discovery") {
    val path = tmpDir()
    val db = create(path)
    for (i <- 1 to 2) {
      val t = db.newTransaction(); t.addRowsSeq(Seq(Seq(i.toLong, 1L, 1L))); t.commit()
    }
    val h = db.history().collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(h.map(_._1).distinct.sorted.toSeq === Seq(1L, 2L))
    assert(db.history().schema.fieldNames.toSeq
      === Seq("txn_id", "seg_num", "path", "commit_ts"))
  }

  test("committing an empty batch leaves the table fully readable") {
    val path = tmpDir()
    val db = create(path)
    val t1 = db.newTransaction()
    t1.addRowsSeq(Seq(Seq(1L, 1L, 10L)))
    t1.commit()
    // empty DataFrame committed: flush writes a data-file-less segment
    val t2 = db.newTransaction()
    t2.addRows(db.snapshot().where("value < 0")) // empty
    t2.commit()
    assert(db.snapshot().count() === 1)
    assert(MatDb.open(spark, path).snapshot().count() === 1)
  }

  test("registerView exposes the table to full Spark SQL") {
    val path = tmpDir()
    val db = create(path)
    val t = db.newTransaction()
    t.addRowsSeq(Seq(Seq(1L, 1L, 10L), Seq(2L, 1L, 20L), Seq(2L, 2L, 30L)))
    t.commit()
    db.registerView("sensors")
    val byId = spark.sql(
      "SELECT sensor_id, sum(value) s, count(*) c FROM sensors GROUP BY 1 ORDER BY 1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(byId.toSeq === Seq((1L, 30L, 2L), (2L, 30L, 1L)))
  }
}

/** Rename protocol (reference-parity default) + rename-only invariants. */
class CoreSpec extends CoreProtocolBehaviors("rename") {

  test("partial commit: committed-looking segment without segment 0 is ignored") {
    val path = tmpDir()
    val db = create(path)
    val t1 = db.newTransaction(); t1.addRowsSeq(Seq(Seq(1L, 1L, 1L))); t1.commit()
    val fakeTxn = 99L
    val seg1 = SegmentId(fakeTxn, 1)
    Files.createDirectories(Storage.segmentPath(Storage.rootPath(path), seg1, tmp = false))
    val db3 = MatDb.open(spark, path)
    assert(db3.committedSegments.forall(_.txnId != fakeTxn))
  }

  test("schema json round trip") {
    val s2 = MatSchema.fromJson(schema.json)
    assert(s2 === schema)
  }

  test("storage segment name encode/decode") {
    assert(Storage.segmentDirName(SegmentId(255, 2), tmp = false) === "000000ff.00000002")
    assert(Storage.decode("000000ff.00000002") === Some((SegmentId(255, 2), false)))
    assert(Storage.decode("000000ff.00000002.tmp") === Some((SegmentId(255, 2), true)))
    assert(Storage.decode("schema.json") === None)
  }
}

/** Manifest protocol + manifest-only invariants. */
class CoreManifestSpec extends CoreProtocolBehaviors("manifest") {

  test("visibility comes from the manifest, not the directory listing") {
    val path = tmpDir()
    val db = create(path)
    val t1 = db.newTransaction(); t1.addRowsSeq(Seq(Seq(1L, 1L, 1L))); t1.commit()
    // a segment directory that no manifest references must stay invisible
    // (this is what makes writes to final names safe pre-commit)...
    val t2 = db.newTransaction(); t2.addRowsSeq(Seq(Seq(2L, 2L, 2L))); t2.flush()
    val orphan = Storage.segmentPath(Storage.rootPath(path), SegmentId(t2.id.get, 0), tmp = false)
    assert(Files.isDirectory(orphan)) // written at its FINAL name already
    assert(db.snapshot().count() === 1) // ...but not visible
    // reopen: a YOUNG never-referenced dir is indistinguishable from a
    // LIVE concurrent writer's in-flight claim — recovery leaves it alone
    // (grace window) but it stays invisible, and its txn id is burned
    val db2 = MatDb.open(spark, path)
    assert(db2.snapshot().count() === 1)
    assert(Files.exists(orphan), "recovery must not sweep a possibly-live claim")
    val t3 = db2.newTransaction(); t3.addRowsSeq(Seq(Seq(3L, 3L, 3L))); t3.commit()
    assert(t3.id.get > t2.id.get, "a skipped orphan still burns its txn id")
    // once the claim AGES past the retention it is provably crashed: swept.
    // The segment carries a `_claim` wall-clock stamp (round 11 — so a
    // long-running write can't be mistaken for an expired orphan just
    // because its directory mtime went stale); aging means rewriting the
    // stamp, not the mtime.
    Files.write(orphan.resolve(Storage.ClaimFile),
      String.valueOf(System.currentTimeMillis() - Storage.claimRetentionMs - 60000L)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - Storage.recoveryGraceMs - 60000L))
    val db3 = MatDb.open(spark, path)
    assert(!Files.exists(orphan), "an aged orphan is a crashed claim — swept")
    assert(db3.snapshot().count() === 2)
    // superseded COMMITS (referenced by an older manifest) are never
    // mistaken for claims: compact + vacuum removes them immediately
    val preCompact = db3.committedSegments
      .map(s => Storage.segmentPath(Storage.rootPath(path), s, tmp = false))
    db3.compact()
    assert(db3.vacuum() === preCompact.size)
    assert(preCompact.forall(!Files.exists(_)))
  }

  test("optimistic multi-writer: append commits merge, replace and id collisions abort") {
    import spark.implicits._
    val path = tmpDir()
    val db1 = create(path)
    val t1 = db1.newTransaction(); t1.addRowsSeq(Seq(Seq(1L, 1L, 1L))); t1.commit()

    // writer 2 opens the same table and appends; writer 1's view (and its
    // txn-id floor) is now stale
    val db2 = MatDb.open(spark, path)
    val t2 = db2.newTransaction(); t2.addRowsSeq(Seq(Seq(2L, 2L, 2L))); t2.commit()

    // writer 1's next transaction allocates the id writer 2 just committed:
    // it must ABORT (the committed segment directory is the claim — the
    // flush refuses the occupied final path), never clobber
    intercept[Exception] {
      val t3 = db1.newTransaction(); t3.addRowsSeq(Seq(Seq(3L, 3L, 3L))); t3.commit()
    }
    assert(MatDb.open(spark, path).snapshot().count() === 2) // both commits intact

    // commit-level defense in depth: replaying an already-committed id
    // aborts with a conflict even if a directory check were bypassed
    intercept[java.util.ConcurrentModificationException] {
      Storage.ManifestProtocol.commit(Storage.rootPath(path),
        Seq(SegmentId(t2.id.get, 0)), Seq(SegmentId(t2.id.get, 0)))
    }

    // a writer that refreshes its view proceeds past the collision, and
    // every prior commit survives
    val db3 = MatDb.open(spark, path)
    val t4 = db3.newTransaction(); t4.addRowsSeq(Seq(Seq(4L, 4L, 4L))); t4.commit()
    assert(MatDb.open(spark, path).snapshot().count() === 3)

    // the primitive the race handling rests on: publishing a version is
    // put-if-absent (POSIX rename would silently REPLACE — createLink
    // fails instead), so the loser of a concurrent publish observes the
    // failure rather than clobbering the winner's manifest
    val root = Storage.rootPath(path)
    import scala.jdk.CollectionConverters._
    val nextVersion = Files.list(root.resolve("_log")).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".json"))
      .map(n => java.lang.Long.parseLong(n.stripSuffix(".json"), 16)).max + 1
    assert(Storage.ManifestProtocol.tryWriteManifest(root, nextVersion, Seq(SegmentId(99L, 0))))
    assert(!Storage.ManifestProtocol.tryWriteManifest(root, nextVersion, Seq.empty))
  }

  test("compact defers deletion; vacuum sweeps superseded segments") {
    val path = tmpDir()
    val db = create(path)
    for (i <- 1 to 2) {
      val t = db.newTransaction(); t.addRowsSeq(Seq(Seq(i.toLong, 1L, i * 10L))); t.commit()
    }
    val oldDirs = db.committedSegments
      .map(s => Storage.segmentPath(Storage.rootPath(path), s, tmp = false))
    db.compact()
    // superseded dirs still on disk (a reader mid-scan can finish)...
    assert(oldDirs.forall(Files.isDirectory(_)))
    assert(db.snapshot().count() === 2) // ...and invisible to new snapshots
    // explicit GC removes exactly them
    assert(db.vacuum() === oldDirs.size)
    assert(oldDirs.forall(!Files.exists(_)))
    assert(db.snapshot().count() === 2)
  }

  test("replace commit is a single manifest swap; empty overwrite truncates") {
    import spark.implicits._
    val path = tmpDir()
    val db = create(path)
    val t1 = db.newTransaction(); t1.addRowsSeq(Seq(Seq(1L, 1L, 1L))); t1.commit()
    db.overwrite(Seq.empty[(Long, Long, Long)].toDF("time", "sensor_id", "value"))
    assert(db.snapshot().count() === 0)
    assert(MatDb.open(spark, path).snapshot().count() === 0)
    // the table still accepts new transactions after a truncate
    val t2 = db.newTransaction(); t2.addRowsSeq(Seq(Seq(5L, 5L, 5L))); t2.commit()
    assert(db.snapshot().count() === 1)
  }
}

/** Manifest protocol over the SIMULATED OBJECT STORE ([[ObjectStoreSim]]):
  * the full protocol behaviors suite runs unchanged with only conditional
  * put + overwrite put — no hard links, no atomic rename, no native
  * directories. This is the CasStore seam's port-compatibility proof: a
  * real S3/GCS binding implements the same four primitives. */
class CoreObjectStoreSpec extends CoreProtocolBehaviors("manifest", "objectsim") {

  test("the store marker routes commits through ObjectStoreSim") {
    val path = tmpDir()
    val db = create(path)
    val t1 = db.newTransaction(); t1.addRowsSeq(Seq(Seq(1L, 1L, 1L))); t1.commit()
    val root = Storage.rootPath(path)
    assert(Files.readAllLines(root.resolve("_store")).get(0) === "objectsim")
    // claims are marker objects, not bare directories
    val seg = db.committedSegments.head
    assert(Files.exists(
      Storage.segmentPath(root, seg, tmp = false).resolve("_dirclaim")))
  }

  test("shallow clone over the object store copies bytes (no links) and stays independent") {
    import spark.implicits._
    val path = tmpDir()
    val db = create(path)
    val t1 = db.newTransaction()
    t1.addRowsSeq(Seq(Seq(1L, 1L, 10L), Seq(2L, 2L, 20L))); t1.commit()
    val dst = tmpDir() + "/clone"
    val clone = MatDb.shallowClone(spark, path, dst)
    // the clone carries the store marker and the data
    assert(Files.readAllLines(
      Storage.rootPath(dst).resolve("_store")).get(0) === "objectsim")
    assert(clone.snapshot().count() === 2)
    // copies, not links: the clone's parquet files have link count 1
    val cloneSeg = Storage.segmentPath(Storage.rootPath(dst),
      clone.committedSegments.head, tmp = false)
    val aFile = Files.walk(cloneSeg).filter(p =>
      p.toString.endsWith(".parquet")).findFirst().get()
    assert(Files.getAttribute(aFile, "unix:nlink").asInstanceOf[Integer] === 1,
      "object-store clone must copy bytes, not hard-link them")
    // independence both ways
    val t2 = clone.newTransaction(); t2.addRowsSeq(Seq(Seq(3L, 3L, 30L))); t2.commit()
    assert(clone.snapshot().count() === 3)
    assert(MatDb.open(spark, path).snapshot().count() === 2)
  }
}
