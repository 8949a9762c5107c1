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

  // ---- replace-kind commits in / around the range --------------------------
  //
  // A TRUNCATE / INSERT OVERWRITE / compact() inside (from, to] wipes keys
  // WITHOUT touching any range segment (segment-less or manifest-shaped
  // removal), so the O(delta) touched-keys path can never see them: the
  // guard must detect the replace from manifest metadata and fall back to
  // the two-snapshot diff (or refuse loudly once history is vacuumed).
  // Manifest protocol throughout — under renames the replaced state is
  // physically destroyed at commit time (documented append-only contract).

  private def manifestDb(name: String): MatDb = {
    val dir = Files.createTempDirectory(s"graft-changes-$name")
    MatDb.create(spark, schema, dir.toString, "manifest")
  }

  private def opsByKey(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (String, Option[Long])] =
    df.collect().map(r => r.getLong(1) -> ((r.getString(0),
      if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap

  private def roundTrip(db: MatDb, from: Long, to: Long, name: String): Unit = {
    val dir = Files.createTempDirectory(s"graft-changes-replica-$name")
    val replica = MatDb.create(spark, schema, dir.toString)
    val s = replica.newTransaction(); s.addRows(db.asOf(from)); s.commit()
    val delta = db.changesBetween(from, to).cache()
    try {
      val txn = replica.newTransaction()
      txn.deleteRows(delta.where(col("op") === "D").select(col("k")))
      txn.addRows(delta.where(col("op") =!= "D"))
      txn.commit()
    } finally delta.unpersist()
    val want = db.asOf(to).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = replica.snapshot().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want, s"replica@$from + changes($from,$to] must equal table@$to")
  }

  test("TRUNCATE in range: wiped keys emit D rows; replica law holds") {
    val db = manifestDb("trunc")
    val t1 = db.newTransaction()
    t1.addRows(batch((0L until 5L).map(i => (i, i * 10L)))); t1.commit() // txn1
    db.overwrite(batch(Nil).limit(0))                                    // txn2: truncate
    val t3 = db.newTransaction()
    t3.addRows(batch(Seq((3L, 333L), (20L, 200L)))); t3.commit()         // txn3
    val ops = opsByKey(db.changesBetween(1L, 3L))
    assert(ops === Map(
      0L -> (("D", None)), 1L -> (("D", None)), 2L -> (("D", None)),
      4L -> (("D", None)),            // wiped by the truncate, untouched since
      3L -> (("U", Some(333L))),      // wiped then re-inserted with a new value
      20L -> (("I", Some(200L)))))
    roundTrip(db, 1L, 3L, "trunc")
    // range ABOVE the truncate: plain O(delta) path, old state is empty
    assert(opsByKey(db.changesBetween(2L, 3L)) ===
      Map(3L -> (("I", Some(333L))), 20L -> (("I", Some(200L)))))
  }

  test("INSERT OVERWRITE in range: removed keys emit D, kept-equal keys stay silent") {
    val db = manifestDb("ovw")
    val t1 = db.newTransaction()
    t1.addRows(batch(Seq((0L, 1L), (1L, 2L), (2L, 3L)))); t1.commit() // txn1
    // overwrite keeps k1 at the SAME value, changes k2, drops k0, adds k7
    db.overwrite(batch(Seq((1L, 2L), (2L, 99L), (7L, 70L))))          // txn2
    val ops = opsByKey(db.changesBetween(1L, 2L))
    assert(ops === Map(
      0L -> (("D", None)),
      2L -> (("U", Some(99L))),
      7L -> (("I", Some(70L)))))
    // pre-images ride the two-set path too
    val withOld = db.changesBetween(1L, 2L, includeOld = true).collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(withOld === Map(0L -> Some(1L), 2L -> Some(3L), 7L -> None))
    roundTrip(db, 1L, 2L, "ovw")
  }

  test("compact() in range: folded-away tombstones still emit D rows") {
    val db = manifestDb("compact")
    val t1 = db.newTransaction()
    t1.addRows(batch((0L until 5L).map(i => (i, i)))); t1.commit() // txn1
    val t2 = db.newTransaction()
    t2.deleteRows(keyBatch(Seq(1L))); t2.commit()                  // txn2: tombstone k1
    db.compact()                                                   // txn3: erases the tombstone
    val t4 = db.newTransaction()
    t4.addRows(batch(Seq((9L, 90L)))); t4.commit()                 // txn4
    val ops = opsByKey(db.changesBetween(1L, 4L))
    assert(ops === Map(1L -> (("D", None)), 9L -> (("I", Some(90L)))))
    roundTrip(db, 1L, 4L, "compact")
  }

  test("checkpoint BELOW the range keeps the O(delta) path, even after vacuum") {
    val db = manifestDb("ckptlow")
    val t1 = db.newTransaction()
    t1.addRows(batch((0L until 5L).map(i => (i, i)))); t1.commit() // txn1
    val t2 = db.newTransaction()
    t2.addRows(batch(Seq((7L, 70L)))); t2.commit()                 // txn2
    assert(db.checkpoint(1L) === 1L) // fold txn1 into a baseline
    // the fold's recorded boundary (txn 1) exonerates it for from >= 1 —
    // and the answer must survive vacuuming the pre-fold history, because
    // the O(delta) path never needs it (the baseline carries txn 1 itself)
    db.vacuum()
    assert(opsByKey(db.changesBetween(1L, 2L)) === Map(7L -> (("I", Some(70L)))))
    assert(db.changesBetween(2L, 2L).count() === 0)
  }

  test("checkpoint INSIDE the range: erased tombstones emit D via the two-set diff") {
    val db = manifestDb("ckptin")
    val t1 = db.newTransaction()
    t1.addRows(batch((0L until 5L).map(i => (i, i)))); t1.commit() // txn1
    val t2 = db.newTransaction()
    t2.deleteRows(keyBatch(Seq(0L))); t2.commit()                  // txn2: tombstone k0
    assert(db.checkpoint(2L) === 2L) // folds txn1+txn2, erases the tombstone
    val t3 = db.newTransaction()
    t3.addRows(batch(Seq((9L, 90L)))); t3.commit()                 // txn3
    val ops = opsByKey(db.changesBetween(1L, 3L))
    assert(ops === Map(0L -> (("D", None)), 9L -> (("I", Some(90L)))))
    roundTrip(db, 1L, 3L, "ckptin")
  }

  test("replace in range with vacuumed history refuses loudly") {
    val db = manifestDb("refuse")
    val t1 = db.newTransaction()
    t1.addRows(batch((0L until 5L).map(i => (i, i)))); t1.commit() // txn1
    db.overwrite(batch(Seq((9L, 90L))))                            // txn2: replace
    db.vacuum() // pre-replace state gone: the true delta is unrecoverable
    val e = intercept[IllegalStateException](db.changesBetween(1L, 2L).collect())
    assert(e.getMessage.contains("replace-kind commit"))
    assert(e.getMessage.contains("rebuild"))
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
