package graft.core

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The read-optimized baseline fast path: after checkpoint/optimize the
  * visible set is ONE segment holding the resolved snapshot (one live row
  * per key, no tombstones — `_unique` marker), so reads skip the MVCC
  * resolve entirely: no aggregate, no exchange, value predicates pushed
  * into parquet. Any later commit falls back to the full resolve. */
class UniqueScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDb(): MatDb = {
    val dir = Files.createTempDirectory("graft-uniq").toString
    MatDb.create(spark,
      MatSchema(Seq(Dimension("k", 10)), Seq(ValueCol("v"))), dir, "manifest")
  }

  private def build(db: MatDb): Unit = {
    import spark.implicits._
    val t1 = db.newTransaction()
    t1.addRows((0L until 20L).map(k => (k, k)).toDF("k", "v")); t1.commit()
    val t2 = db.newTransaction()
    t2.addRows((0L until 10L).map(k => (k, 100L + k)).toDF("k", "v")); t2.commit()
    val t3 = db.newTransaction()
    t3.deleteRows(Seq(15L).toDF("k")); t3.commit()
  }

  private def state(db: MatDb, asOf: Option[Long] = None): Map[Long, Long] =
    db.snapshot(asOf).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("an optimized table scans with no resolve aggregate and no exchange") {
    val db = freshDb(); build(db)
    val pre = state(db)
    assert(TestSpark.finalPlan(db.snapshot()).contains("HashAggregate"),
      "multi-version tables must resolve")
    db.optimize()
    assert(state(db) === pre, "the fold changes nothing observable")
    val plan = TestSpark.finalPlan(db.snapshot())
    assert(!plan.contains("HashAggregate") && !plan.contains("Exchange"),
      s"unique baseline must scan bare:\n$plan")
    // value predicate pushes into parquet — impossible above a resolve
    val vq = db.snapshot().where(col("v") === 104L)
    assert(vq.count() === 1)
    val vplan = TestSpark.finalPlan(vq)
    assert(vplan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("EqualTo(v,104)")),
      s"value predicate must reach the scan:\n$vplan")
    // time travel AT the baseline is the same fast set; the fold reclaimed
    // history below it
    assert(state(db, Some(db.txnWatermark)) === pre)
  }

  test("a commit after the fold falls back to the full resolve") {
    import spark.implicits._
    val db = freshDb(); build(db)
    db.optimize()
    val t = db.newTransaction()
    t.addRows(Seq((3L, 999L)).toDF("k", "v")); t.commit()
    val plan = TestSpark.finalPlan(db.snapshot())
    assert(plan.contains("HashAggregate"), "two visible txns must resolve")
    assert(state(db)(3L) === 999L)
  }

  test("the SQL catalog read goes bare on a unique baseline and resolves after DML") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-uniq-cat")
    spark.conf.set("spark.sql.catalog.guq", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.guq.root", root.toString)
    val db = MatDb.create(spark,
      MatSchema(Seq(Dimension("k", 10)), Seq(ValueCol("v"))),
      root.resolve("t").toString, "manifest")
    build(db)
    val before = spark.sql("SELECT * FROM guq.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    db.optimize()
    val q = spark.sql("SELECT * FROM guq.t")
    val plan = TestSpark.finalPlan(q)
    assert(!plan.contains("max_by") && !plan.contains("HashAggregate"),
      s"catalog read over a unique baseline must skip the resolve:\n$plan")
    assert(q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === before)
    // DML through SQL: the next read resolves again and sees the change
    spark.sql("UPDATE guq.t SET v = 777 WHERE k = 2")
    val after = spark.sql("SELECT * FROM guq.t")
    assert(TestSpark.finalPlan(after).contains("HashAggregate"))
    assert(after.where(col("k") === 2L).collect()(0).getLong(1) === 777L)
  }
}
