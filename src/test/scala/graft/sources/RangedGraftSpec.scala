package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Dimension, MatDb, MatSchema, TestSpark, ValueCol}

/** The ranged layout: ordered MVCC scan with ZERO exchanges (dedup AND
  * global sort), row parity with the directory-layout resolve, ascending
  * output without any exchange in the plan. */
class RangedGraftSpec extends AnyFunSuite {
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

  test("ordered scan: zero exchanges, key order, parity with MatDb resolve") {
    val dir = Files.createTempDirectory("graft-ranged").toString
    val b1 = (0L until 200L).map(i => (i, i % 10, 1L))
    val b2 = (0L until 100L).map(i => (i, i % 10, 2L))
    val b3 = (50L until 75L).map(i => (i, i % 10, 3L)) ++
      (200L until 220L).map(i => (i, i % 10, 3L))

    RangedGraft.create(spark, dir, schema,
      RangedGraft.boundariesFromSample(batch(b1), "t", pieces = 4))
    assert(RangedGraft.append(spark, dir, schema, batch(b1)) === 1L)
    assert(RangedGraft.append(spark, dir, schema, batch(b2)) === 2L)
    assert(RangedGraft.append(spark, dir, schema, batch(b3)) === 3L)

    // parity oracle: directory-layout MatDb over the same commits
    val mdir = Files.createTempDirectory("graft-ranged-parity").toString
    val db = MatDb.create(spark, schema, mdir)
    Seq(b1, b2, b3).foreach { b =>
      val txn = db.newTransaction(); txn.addRows(batch(b)); txn.commit()
    }
    val expected = db.orderedScan().collect().map(_.toSeq)

    val ord = RangedGraft.orderedScan(spark, dir, schema)
    val got = ord.collect()
    assert(got.map(_.toSeq).toSeq === expected.toSeq, "ordered rows must match MatDb")
    assert(got.length === 220)
    // newest-wins spot checks
    val byKey = got.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byKey(60L) === 3L && byKey(80L) === 2L && byKey(150L) === 1L)

    // THE plan property: dedup AND global sort with NO exchange anywhere
    // (MatDb.orderedScan needs one range exchange; bucketed needs one for
    // the sort) — the declared range partitioning satisfies both
    TestSpark.assertNoExchange(ord, "ranged ordered scan")
    assert(TestSpark.finalPlan(ord).contains("Sort"),
      "global order must still be enforced (as a local sort)")

    // time travel composes: asOf 1 sees only b1, still exchange-free
    val asOf1 = RangedGraft.orderedScan(spark, dir, schema, asOf = Some(1L))
    val rows1 = asOf1.collect()
    assert(rows1.length === 200 && rows1.forall(_.getLong(2) == 1L))
    TestSpark.assertNoExchange(asOf1, "ranged asOf ordered scan")

    // unordered snapshot: the dedup alone is exchange-free too
    TestSpark.assertNoExchange(
      RangedGraft.snapshot(spark, dir, schema), "ranged snapshot dedup")
  }

  test("empty pieces and single-piece tables stay correct") {
    val dir = Files.createTempDirectory("graft-ranged-edge").toString
    // bounds far beyond the data: all rows land in piece 0; pieces 1..2 empty
    RangedGraft.create(spark, dir, schema, Seq(1000L, 2000L))
    RangedGraft.append(spark, dir, schema, batch((0L until 30L).map(i => (i, i % 3, 7L))))
    val rows = RangedGraft.orderedScan(spark, dir, schema).collect()
    assert(rows.length === 30 && rows.head.getLong(0) === 0L && rows.last.getLong(0) === 29L)

    val single = Files.createTempDirectory("graft-ranged-one").toString
    RangedGraft.create(spark, single, schema, Seq.empty) // one piece, no bounds
    RangedGraft.append(spark, single, schema, batch(Seq((5L, 1L, 1L), (3L, 0L, 2L))))
    val one = RangedGraft.orderedScan(spark, single, schema).collect()
    assert(one.map(_.getLong(0)).toSeq === Seq(3L, 5L))

    // boundaries from an EMPTY sample degrade to one piece, not an NPE
    assert(RangedGraft.boundariesFromSample(
      batch(Nil), "t", pieces = 4) === Seq.empty)
  }

  test("null leading dimension routes to piece 0 and sorts first (ASC nulls-first)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-ranged-null").toString
    RangedGraft.create(spark, dir, schema, Seq(50L, 120L))
    val st = StructType(Seq(StructField("t", LongType), StructField("sensor", LongType),
      StructField("v", LongType)))
    val rows = Seq(Row(10L, 0L, 1L), Row(null, 0L, 2L), Row(130L, 1L, 3L), Row(60L, 2L, 4L))
    RangedGraft.append(spark, dir, schema,
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), st))
    val ord = RangedGraft.orderedScan(spark, dir, schema)
    val got = ord.collect()
    // the declared RangePartitioning(t ASC) sorts nulls FIRST — a null
    // landing in the last piece would silently break this order
    assert(got.map(r => Option(r.get(0)).map(_.toString).getOrElse("null")).toSeq ===
      Seq("null", "10", "60", "130"))
    TestSpark.assertNoExchange(ord, "ranged ordered scan with null dim")
  }

  test("shallowClone links files; analyze reports resolved + per-piece rows") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    val dir = Files.createTempDirectory("graft-ranged-clone").toString
    RangedGraft.create(spark, dir, schema, Seq(100L))
    RangedGraft.append(spark, dir, schema,
      batch((0L until 150L).map(i => (i, i % 10, 1L))))
    RangedGraft.append(spark, dir, schema,
      batch((0L until 50L).map(i => (i, i % 10, 2L))))
    // analyze: resolved count 150 (50 keys have 2 versions), pieces split at 100
    val (n, _) = RangedGraft.analyze(spark, dir, schema)
    assert(n === 150L)
    val statsTxt = JFiles.readString(JPaths.get(dir).resolve("_stats.json"))
    assert(statsTxt.contains(""""piece_rows":[100,50]"""), statsTxt)
    // clone: identical reads, hard-linked files, independent appends
    val dst = Files.createTempDirectory("graft-ranged-clone-dst").toString + "/t"
    RangedGraft.shallowClone(spark, dir, dst)
    def rows(p: String) = RangedGraft.orderedScan(spark, p, schema)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(rows(dst) === rows(dir))
    val aFile = JFiles.walk(JPaths.get(dst)).filter(p =>
      p.toString.endsWith(".parquet")).findFirst().get()
    assert(JFiles.getAttribute(aFile, "unix:nlink").asInstanceOf[Integer] >= 2,
      "ranged clone must hard-link data files")
    RangedGraft.append(spark, dst, schema, batch(Seq((500L, 0L, 9L))))
    assert(RangedGraft.snapshot(spark, dst, schema).count() === 151)
    assert(RangedGraft.snapshot(spark, dir, schema).count() === 150)
  }

  test("analyzed statistics PRICE the ranged read: small analyzed side broadcasts") {
    val big = Files.createTempDirectory("graft-ranged-big").toString
    val small = Files.createTempDirectory("graft-ranged-small").toString
    RangedGraft.create(spark, big, schema, Seq(100L))
    RangedGraft.create(spark, small, schema, Seq(100L))
    RangedGraft.append(spark, big, schema,
      batch((0L until 5000L).map(i => (i, i % 10, i))))
    RangedGraft.append(spark, small, schema,
      batch((0L until 40L).map(i => (i, i % 10, i * 2))))
    def join() = {
      val b = RangedGraft.snapshot(spark, big, schema)
      val s = RangedGraft.snapshot(spark, small, schema)
        .select(col("t"), col("sensor"), col("v").as("w"))
      b.join(s, Seq("t", "sensor"))
    }
    // the pricing decision is STATIC (AQE can still flip SMJ→BHJ at
    // runtime from actual shuffle sizes — that is not what this test
    // pins), so assert on the initial physical plan before execution
    def staticPlan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    // UNANALYZED: a LogicalRDD prices at defaultSizeInBytes (effectively
    // infinite), so neither side can broadcast statically
    assert(!staticPlan(join()).contains("BroadcastHashJoin"),
      s"without stats the ranged join must not plan a broadcast:\n${staticPlan(join())}")
    // ANALYZED small side: raw logical size reaches the LogicalRDD stats
    // and the static strategy flips to a broadcast join, same rows
    RangedGraft.analyze(spark, small, schema)
    val after = join()
    assert(staticPlan(after).contains("BroadcastHashJoin"),
      s"the analyzed small ranged side must plan a broadcast:\n${staticPlan(after)}")
    val rows = after.collect()
    assert(rows.length === 40)
    assert(rows.forall(r => r.getLong(3) === r.getLong(0) * 2))
    // a later append INVALIDATES the stamp (watermark mismatch): pricing
    // must never under-estimate a grown table into a broadcast
    RangedGraft.append(spark, small, schema, batch(Seq((999L, 0L, 1L))))
    assert(!staticPlan(join()).contains("BroadcastHashJoin"),
      "stale stats must not price a grown table")
  }
}
