package graft.core

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row deletes as MVCC tombstones: a delete is an ordinary newest-wins
  * version (`_del = true`, values null) that routes, commits, recovers and
  * time-travels exactly like an insert; the resolve aggregate retires the
  * key post-resolve (Scan.dedup). The reference has no delete at all (its
  * only write is add_values, transaction.rs:67-85) — this is the missing
  * half of upsert, engine-extension not parity. */
class DeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = MatSchema(
    Seq(Dimension("t", 50), Dimension("sensor", 10)), Seq(ValueCol("v")))

  private def batch(rows: Seq[(Long, Long, Long)]) = {
    import org.apache.spark.sql.types._
    val st = StructType(Seq(StructField("t", LongType), StructField("sensor", LongType),
      StructField("v", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 3), st)
  }

  private def keyBatch(keys: Seq[(Long, Long)]) = {
    import org.apache.spark.sql.types._
    val st = StructType(Seq(StructField("t", LongType), StructField("sensor", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(keys.map(k => Row(k._1, k._2)), 2), st)
  }

  private def freshDb(name: String): MatDb = {
    val dir = Files.createTempDirectory(s"graft-delete-$name")
    val db = MatDb.create(spark, schema, dir.toString)
    val txn = db.newTransaction()
    txn.addRows(batch((0L until 100L).map(i => (i, i % 10, 1L))))
    txn.commit()
    db
  }

  test("deleteRows tombstones keys; delete-then-reinsert resurrects; time travel sees pre-delete") {
    val db = freshDb("basic")
    // txn 2: delete keys 10..19
    val del = db.newTransaction()
    del.deleteRows(keyBatch((10L until 20L).map(i => (i, i % 10))))
    // own tombstones are visible to the txn's snapshot before commit
    assert(del.query().count() === 90)
    del.commit()
    assert(db.snapshot().count() === 90)
    assert(db.snapshot().where(col("t") === 15).count() === 0)
    // time travel before the deleting txn still sees the rows
    assert(db.asOf(1L).count() === 100)
    assert(db.asOf(1L).where(col("t") === 15).count() === 1)
    // txn 3: reinsert key 15 — newest wins over the tombstone
    val re = db.newTransaction()
    re.addRows(batch(Seq((15L, 5L, 7L))))
    re.commit()
    val snap = db.snapshot()
    assert(snap.count() === 91)
    assert(snap.where(col("t") === 15).head().getLong(2) === 7L)
    // the tombstoned horizon is itself time-travelable
    assert(db.asOf(2L).count() === 90)
  }

  test("deleteWhere applies value predicates POST-resolve; within-txn seq ordering holds") {
    val db = freshDb("where")
    // txn 2 overwrites keys 0..9 to v=2: their v=1 versions are superseded
    val up = db.newTransaction()
    up.addRows(batch((0L until 10L).map(i => (i, i % 10, 2L))))
    up.commit()
    // delete where v = 1 must doom only keys whose CURRENT value is 1
    val del = db.newTransaction()
    del.deleteWhere(col("v") === 1L)
    del.commit()
    val snap = db.snapshot()
    assert(snap.count() === 10, "only the 10 freshly-overwritten keys survive")
    assert(snap.agg(min(col("v")), max(col("v"))).head() === Row(2L, 2L))

    // within one txn, later batches win: delete then re-add in the SAME txn
    val mix = db.newTransaction()
    mix.deleteRows(keyBatch(Seq((0L, 0L))))
    mix.addRows(batch(Seq((0L, 0L, 99L))))
    assert(mix.query().where(col("t") === 0).head().getLong(2) === 99L)
    mix.rollback()
    val mix2 = db.newTransaction()
    mix2.addRows(batch(Seq((1L, 1L, 99L))))
    mix2.deleteRows(keyBatch(Seq((1L, 1L))))
    assert(mix2.query().where(col("t") === 1).count() === 0,
      "a later delete batch must beat an earlier insert batch in the same txn")
    mix2.rollback()
  }

  test("tombstones survive crash-free reopen and are erased by compaction") {
    val db = freshDb("compact")
    val del = db.newTransaction()
    del.deleteRows(keyBatch((0L until 50L).map(i => (i, i % 10))))
    del.commit()
    // reopen: tombstones persist
    val reopened = MatDb.open(spark, db.root.toString)
    assert(reopened.snapshot().count() === 50)
    // compaction rewrites the RESOLVED live rows; deleted keys stay deleted
    // and the physical tombstone rows disappear with the old segments
    reopened.compact()
    val afterCompact = MatDb.open(spark, db.root.toString)
    assert(afterCompact.snapshot().count() === 50)
    assert(afterCompact.snapshot().where(col("t") < 50).count() === 0)
  }

  test("segments written WITHOUT a _del column (pre-delete format) read unchanged") {
    val db = freshDb("legacy")
    // simulate a legacy table: strip _del out of every committed data file
    val segDirs = java.nio.file.Files.list(db.root).iterator()
    val buf = scala.collection.mutable.Buffer[java.nio.file.Path]()
    while (segDirs.hasNext) {
      val p = segDirs.next()
      if (Files.isDirectory(p) && Storage.decode(p.getFileName.toString).isDefined) buf += p
    }
    assert(buf.nonEmpty, s"no segment dirs under ${db.root}")
    buf.foreach { seg =>
      val rows = spark.read.parquet(seg.toString) // partition cols inferred
      assert(rows.columns.contains(Scan.DelCol))
      val legacy = rows.drop(Scan.DelCol).collect()
      val legacySchema = org.apache.spark.sql.types.StructType(
        rows.schema.fields.filterNot(_.name == Scan.DelCol))
      val chunkCols = rows.columns.filter(_.startsWith(Scan.ChunkPrefix))
      Storage.deleteRecursively(seg)
      spark.createDataFrame(spark.sparkContext.parallelize(legacy.toSeq, 2), legacySchema)
        .write.partitionBy(chunkCols.toIndexedSeq: _*).parquet(seg.toString)
    }
    val reopened = MatDb.open(spark, db.root.toString)
    assert(reopened.snapshot().count() === 100, "legacy segments must read as live rows")
    // and deletes LAYER onto the legacy data: null _del coalesces to live,
    // the new tombstone wins newest-wins
    val del = reopened.newTransaction()
    del.deleteRows(keyBatch(Seq((0L, 0L), (1L, 1L))))
    del.commit()
    assert(reopened.snapshot().count() === 98)
  }

  test("deleting a nonexistent key is a harmless no-op version") {
    val db = freshDb("noop")
    val del = db.newTransaction()
    del.deleteRows(keyBatch(Seq((5000L, 0L))))
    del.commit()
    assert(db.snapshot().count() === 100)
    // the tombstone exists in history but resolves to nothing
    assert(db.asOf(2L).where(col("t") === 5000).count() === 0)
  }
}
