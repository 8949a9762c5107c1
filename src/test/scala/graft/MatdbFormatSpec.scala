package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Dimension, MatDb, MatSchema, TestSpark, ValueCol}
import graft.ingest.MatdbFormat

/** Round-trip + resolution semantics for the reference's binary database
  * format (ejrh/matdb). The fixture databases are written by our own
  * encoder, which follows segment.rs:138-200 / block.rs:136-199 byte for
  * byte — the decode tests exercise tags, footers, zstd frames, dense-block
  * missing cells, multi-segment MVCC, and .tmp exclusion. */
class MatdbFormatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val schema = MatSchema(
    Seq(Dimension("time", 50), Dimension("sensor_id", 10)), Seq(ValueCol("value")))

  test("schema.json parses the reference serde shape both ways") {
    val json = """{"dimensions":[{"name":"time","chunk_size":50},{"name":"sensor_id","chunk_size":10}],"values":[{"name":"value"}]}"""
    val s = MatdbFormat.parseSchemaJson(json)
    assert(s.dimNames === Seq("time", "sensor_id"))
    assert(s.dimensions.map(_.chunkSize) === Seq(50L, 10L))
    assert(s.valueNames === Seq("value"))
    assert(MatdbFormat.parseSchemaJson(MatdbFormat.schemaJson(s)).dimNames === s.dimNames)
  }

  test("write + read a matdb database: dense blocks, missing cells, MVCC across txns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("matdb-fmt").toString

    // txn 1: a sparse grid (missing cells within chunks) spanning 4 chunks
    val rows1 = (for { t <- 0L until 100L by 3; s <- 0L until 20L by 7 } yield (t, s, t * 100 + s))
    MatdbFormat.writeDatabase(rows1.toDF("time", "sensor_id", "value"), dir, schema, txnId = 1)
    // txn 2: upsert a subset with new values + one brand-new key
    val rows2 = Seq((0L, 0L, 999999L), (3L, 7L, 888888L), (42L, 5L, 777777L))
    MatdbFormat.writeDatabase(rows2.toDF("time", "sensor_id", "value"), dir, schema, txnId = 2)
    // a .tmp segment (crashed txn) must be ignored
    Files.write(java.nio.file.Paths.get(dir, "00000003.00000000.tmp"), Array[Byte](1, 2, 3))

    val raw = MatdbFormat.readRaw(spark, dir)
    assert(raw.count() === rows1.size + rows2.size)
    assert(raw.select("_txn_id").distinct().collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))

    val resolved = MatdbFormat.readDatabase(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = (rows1.map(r => (r._1, r._2) -> r._3).toMap
      ++ rows2.map(r => (r._1, r._2) -> r._3).toMap)
    assert(resolved === expected) // newest txn wins; new key present; others intact
  }

  test("migrate a matdb database into a graft table") {
    import spark.implicits._
    val src = Files.createTempDirectory("matdb-fmt-src").toString
    val dst = Files.createTempDirectory("graft-migrated").toString
    val rows = Seq((1L, 1L, 10L), (2L, 3L, 20L), (60L, 1L, 30L))
    MatdbFormat.writeDatabase(rows.toDF("time", "sensor_id", "value"), src, schema)

    val db = MatdbFormat.migrate(spark, src, dst)
    val got = db.orderedScan().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 1L, 10L), (2L, 3L, 20L), (60L, 1L, 30L)))
    // and the migrated table is a full graft table (time travel etc. work)
    assert(MatDb.open(spark, dst).snapshot().count() === 3)
  }

  test("export a graft table back to the matdb format (round trip)") {
    import spark.implicits._
    val gpath = Files.createTempDirectory("graft-exp").toString
    val mpath = Files.createTempDirectory("matdb-exp").toString
    val db = MatDb.create(spark, schema, gpath)
    val t = db.newTransaction()
    t.addRows(Seq((5L, 2L, 50L), (55L, 2L, 51L), (5L, 12L, 52L)).toDF("time", "sensor_id", "value"))
    t.commit()

    MatdbFormat.writeDatabase(db.snapshot(), mpath, schema)
    val back = MatdbFormat.readDatabase(spark, mpath)
      .orderBy("time", "sensor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(back.toSeq === Seq((5L, 2L, 50L), (5L, 12L, 52L), (55L, 2L, 51L)))
  }
}
