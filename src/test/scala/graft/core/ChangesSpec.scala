package graft.core

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MatDb.changesBetween — the CDC read side (battery q108): minimal
  * I/U/D delta between two horizons, and the round-trip law with the
  * apply side: replica@from + changes(from,to) = table@to. */
class ChangesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = MatSchema(
    Seq(Dimension("k", 50)), Seq(ValueCol("v")))

  private def batch(rows: Seq[(Long, Long)]) = {
    import org.apache.spark.sql.types._
    val st = StructType(Seq(StructField("k", LongType), StructField("v", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2), st)
  }

  private def keyBatch(keys: Seq[Long]) = {
    import org.apache.spark.sql.types._
    val st = StructType(Seq(StructField("k", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(keys.map(Row(_)), 2), st)
  }

  /** txn1: k0..9 = 10k; txn2: k0 -> 1, k1 -> 10 (same value), k20 new;
    * txn3: delete k2, k21 insert+delete k30 (net nothing). */
  private def freshDb(name: String): MatDb = {
    val dir = Files.createTempDirectory(s"graft-changes-$name")
    val db = MatDb.create(spark, schema, dir.toString)
    val t1 = db.newTransaction()
    t1.addRows(batch((0L until 10L).map(i => (i, i * 10L)))); t1.commit()
    val t2 = db.newTransaction()
    t2.addRows(batch(Seq((0L, 1L), (1L, 10L), (20L, 200L)))); t2.commit()
    val t3 = db.newTransaction()
    t3.addRows(batch(Seq((21L, 210L), (30L, 300L))))
    t3.deleteRows(keyBatch(Seq(2L, 30L)))
    t3.commit()
    db
  }

  private def collect(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Option[Long])] =
    df.collect().map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

  test("minimal I/U/D delta: rewrites-to-same-value and insert+delete emit nothing") {
    val db = freshDb("delta")
    val full = collect(db.changesBetween(1L, 3L))
    assert(full === Set(
      ("U", 0L, Some(1L)),      // changed value
      ("I", 20L, Some(200L)),   // new key (txn2)
      ("I", 21L, Some(210L)),   // new key (txn3)
      ("D", 2L, None)))         // deleted key
    // k1 rewritten to the SAME value -> silent; k30 insert+delete -> silent

    // sub-ranges
    assert(collect(db.changesBetween(2L, 3L)) ===
      Set(("I", 21L, Some(210L)), ("D", 2L, None)))
    assert(collect(db.changesBetween(1L, 2L)) ===
      Set(("U", 0L, Some(1L)), ("I", 20L, Some(200L))))
    // empty window
    assert(db.changesBetween(3L, 3L).count() === 0)
  }

  test("delete-then-reinsert crosses the horizon as I; includeOld pre-images") {
    val db = freshDb("redo")
    val t4 = db.newTransaction()
    t4.addRows(batch(Seq((2L, 999L)))) // re-insert the key txn3 deleted
    t4.commit()
    def rows(from: Long, to: Long): Map[Long, (String, Option[Long], Option[Long])] =
      db.changesBetween(from, to, includeOld = true).collect().map { r =>
        r.getLong(1) -> ((r.getString(0),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
      }.toMap
    // (3,4]: k2 was DELETED at the from-horizon — the old state is not
    // live, so the re-insert is an I with a null pre-image (a tombstone
    // carries nothing to retract)
    assert(rows(3L, 4L) === Map(2L -> (("I", Some(999L), None))))
    // (1,4]: k2 was live at 1 (v=20) — delete+reinsert inside the range
    // collapses to ONE U carrying the horizon pre-image
    assert(rows(1L, 4L).get(2L) === Some(("U", Some(999L), Some(20L))))
    // (1,3]: the D row carries the deleted value as its pre-image and
    // null value columns
    assert(rows(1L, 3L).get(2L) === Some(("D", None, Some(20L))))
    // U pre-image: k0 rewrote 0 -> 1 in txn2
    assert(rows(1L, 2L).get(0L) === Some(("U", Some(1L), Some(0L))))
    // I pre-image is null for never-seen keys
    assert(rows(1L, 2L).get(20L) === Some(("I", Some(200L), None)))
  }

  test("round trip: replica@from + changes = table@to (cdc apply law)") {
    val db = freshDb("rt")
    // replica seeded from snapshot@1
    val dir = Files.createTempDirectory("graft-changes-replica")
    val replica = MatDb.create(spark, schema, dir.toString)
    val s1 = replica.newTransaction(); s1.addRows(db.asOf(1L)); s1.commit()
    // apply the delta exactly as cdcApplySink would: deletes + upserts
    val delta = db.changesBetween(1L, 3L).cache()
    try {
      val txn = replica.newTransaction()
      txn.deleteRows(delta.where(col("op") === "D").select(col("k")))
      txn.addRows(delta.where(col("op") =!= "D"))
      txn.commit()
    } finally delta.unpersist()
    val want = db.asOf(3L).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = replica.snapshot().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
  }
}
