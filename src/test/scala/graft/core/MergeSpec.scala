package graft.core

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** UPDATE and MERGE as MVCC upserts (battery q106's operators): an update
  * is a new version of the recomputed row, a merge is the clause algebra
  * over at most one key-join — `(Update, Insert)` is the ZERO-join upsert
  * fast path that newest-wins resolution gives for free. */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = MatSchema(
    Seq(Dimension("k", 50)), Seq(ValueCol("v")))

  private def batch(rows: Seq[(Long, Long)]) = {
    import org.apache.spark.sql.types._
    val st = StructType(Seq(StructField("k", LongType), StructField("v", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2), st)
  }

  private def freshDb(name: String): MatDb = {
    val dir = Files.createTempDirectory(s"graft-merge-$name")
    val db = MatDb.create(spark, schema, dir.toString)
    val txn = db.newTransaction()
    txn.addRows(batch((0L until 10L).map(i => (i, i * 10L)))) // k0..9 -> v=10k
    txn.commit()
    db
  }

  private def snap(db: MatDb): Map[Long, Long] =
    db.snapshot().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("updateWhere rewrites matched rows as new versions; dims are unassignable") {
    val db = freshDb("upd")
    val txn = db.newTransaction()
    txn.updateWhere(col("v") >= 50L, Map("v" -> (col("v") + lit(1L))))
    txn.commit()
    val s = snap(db)
    assert(s(4L) === 40L && s(5L) === 51L && s(9L) === 91L)
    // pre-update horizon intact
    assert(db.asOf(1L).where(col("k") === 9L).head().getLong(1) === 90L)
    val t2 = db.newTransaction()
    val err = intercept[IllegalArgumentException](
      t2.updateWhere(lit(true), Map("k" -> lit(0L))))
    assert(err.getMessage.contains("dimension"))
    t2.rollback()
  }

  test("mergeRows clause algebra: all four live combinations") {
    import MergeAction._
    val db = freshDb("alg")
    val src = batch(Seq((8L, 800L), (9L, 900L), (20L, 2000L), (21L, 2100L)))

    // (Update, Insert): plain upsert
    val t1 = db.newTransaction(); t1.mergeRows(src, Update, Insert); t1.commit()
    val s1 = snap(db)
    assert(s1(8L) === 800L && s1(20L) === 2000L && s1.size === 12)

    // (Update, Ignore): update-only — new key 30 must NOT appear
    val t2 = db.newTransaction()
    t2.mergeRows(batch(Seq((8L, 8L), (30L, 3000L))), Update, Ignore); t2.commit()
    val s2 = snap(db)
    assert(s2(8L) === 8L && !s2.contains(30L) && s2.size === 12)

    // (Ignore, Insert): insert-if-absent — existing key 9 keeps its value
    val t3 = db.newTransaction()
    t3.mergeRows(batch(Seq((9L, 9L), (30L, 3000L))), Ignore, Insert); t3.commit()
    val s3 = snap(db)
    assert(s3(9L) === 900L && s3(30L) === 3000L && s3.size === 13)

    // (Delete, Insert): matched keys tombstone, unmatched insert
    val t4 = db.newTransaction()
    t4.mergeRows(batch(Seq((30L, 0L), (40L, 4000L))), Delete, Insert); t4.commit()
    val s4 = snap(db)
    assert(!s4.contains(30L) && s4(40L) === 4000L && s4.size === 13)
  }

  test("mergeUpdate combines target and source columns through the aliased join") {
    val db = freshDb("comb")
    import org.apache.spark.sql.types._
    val st = StructType(Seq(StructField("k", LongType), StructField("bonus", LongType)))
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(2L, 5L), Row(3L, 7L), Row(99L, 1L)), 2), st)
    val txn = db.newTransaction()
    txn.mergeUpdate(src, Map("v" -> (col("t.v") + col("s.bonus"))))
    txn.commit()
    val s = snap(db)
    assert(s(2L) === 25L && s(3L) === 37L && s(4L) === 40L)
    assert(!s.contains(99L), "unmatched source rows are ignored")
    assert(s.size === 10)
  }

  test("merge sees own in-transaction writes (snapshot includes the buffer)") {
    import MergeAction._
    val db = freshDb("own")
    val txn = db.newTransaction()
    txn.addRows(batch(Seq((50L, 500L))))
    // insert-if-absent against the snapshot INCLUDING the uncommitted k50
    txn.mergeRows(batch(Seq((50L, 1L), (51L, 510L))), Ignore, Insert)
    txn.commit()
    val s = snap(db)
    assert(s(50L) === 500L && s(51L) === 510L)
  }
}
