package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Dimension, MatDb, MatSchema, TestSpark, ValueCol}

/** SQL-native graft reads through the DSv2 catalog: `SELECT ... FROM
  * gcat.t` resolves MVCC newest-wins, `VERSION AS OF n` ≡ `asOf(n)`,
  * provenance stays hidden from `SELECT *`, dimension predicates push below
  * the dedup into the scan while value predicates stay above it. */
class GraftCatalogSpec extends AnyFunSuite {
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

  // one catalog root per suite run; the catalog object is instantiated once
  // per session, so the root is fixed before first use
  private lazy val root = {
    val dir = Files.createTempDirectory("graft-catalog-spec")
    spark.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.root", dir.toString)
    dir
  }

  private def mkTable(name: String): MatDb = {
    val db = MatDb.create(spark, schema, root.resolve(name).toString)
    // txn 1: keys 0..99 at v=1; txn 2: keys 0..49 at v=2; txn 3: 25..29 at
    // v=3 plus new keys 100..109
    Seq(
      (0L until 100L).map(i => (i, i % 10, 1L)),
      (0L until 50L).map(i => (i, i % 10, 2L)),
      (25L until 30L).map(i => (i, i % 10, 3L)) ++
        (100L until 110L).map(i => (i, i % 10, 3L))
    ).foreach { rows =>
      val txn = db.newTransaction(); txn.addRows(batch(rows)); txn.commit()
    }
    db
  }

  test("SELECT * resolves newest-wins and hides provenance; VERSION AS OF = asOf") {
    val db = mkTable("tt")
    val sqlRows = spark.sql("SELECT * FROM gcat.tt")
    assert(sqlRows.columns.toSeq === Seq("t", "sensor", "v"),
      "SELECT * must expose the logical schema only")
    assert(sqlRows.collect().toSet === db.snapshot().collect().toSet)
    val byKey = sqlRows.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byKey(27L) === 3L && byKey(40L) === 2L && byKey(80L) === 1L && byKey(105L) === 3L)
    assert(sqlRows.count() === 110)

    // SQL time travel matches the API at every horizon
    (1L to 3L).foreach { v =>
      val sql = spark.sql(s"SELECT * FROM gcat.tt VERSION AS OF $v")
      assert(sql.collect().toSet === db.asOf(v).collect().toSet, s"VERSION AS OF $v")
    }
    assert(spark.sql("SELECT * FROM gcat.tt VERSION AS OF 1").count() === 100)

    // aggregates and ORDER BY compose over the resolved view
    val agg = spark.sql(
      "SELECT v, count(*) AS n FROM gcat.tt GROUP BY v ORDER BY v").collect()
    assert(agg.map(r => r.getLong(0) -> r.getLong(1)).toSeq ===
      Seq(1L -> 50L, 2L -> 45L, 3L -> 15L))
  }

  test("value predicates stay above the dedup; dimension predicates reach the scan") {
    mkTable("sem")
    // key 10 was overwritten to v=2 in txn 2: filtering on its SUPERSEDED
    // value must return nothing (pre-dedup filtering would resurrect it)
    assert(spark.sql("SELECT * FROM gcat.sem WHERE t = 10 AND v = 1").count() === 0)
    assert(spark.sql("SELECT * FROM gcat.sem WHERE t = 10 AND v = 2").count() === 1)

    // dimension predicate: pushed below the aggregate into the parquet scan
    val dimq = spark.sql("SELECT * FROM gcat.sem WHERE t >= 60 AND t <= 70")
    assert(dimq.count() === 11)
    val plan = dimq.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(t,60)") && plan.contains("PushedFilters"),
      s"dimension predicate must reach the parquet scan:\n$plan")
    // ...and ChunkPruneRule derives the chunk-key partition filter from it
    assert(plan.contains("PartitionFilters: [isnotnull(_ck_t"),
      s"derived chunk predicate must appear as a partition filter:\n$plan")

    // value predicate must NOT appear in the scan's pushed filters
    val valq = spark.sql("SELECT * FROM gcat.sem WHERE v = 2")
    val vplan = valq.queryExecution.executedPlan.toString
    assert(!vplan.contains("PushedFilters: [IsNotNull(v)"),
      s"value predicate must stay above the dedup:\n$vplan")
    assert(valq.count() === 45)
  }

  test("catalog lists graft tables; missing table and TIMESTAMP AS OF fail clearly") {
    mkTable("listed")
    val tables = spark.sql("SHOW TABLES IN gcat").collect().map(_.getString(1)).toSet
    assert(tables.contains("listed"))
    val miss = intercept[Exception](spark.sql("SELECT * FROM gcat.nope").collect())
    assert(miss.getMessage.toLowerCase.contains("table"))
    val ts = intercept[Exception](
      spark.sql("SELECT * FROM gcat.listed TIMESTAMP AS OF '2026-01-01'").collect())
    assert(ts.getMessage.contains("VERSION AS OF") ||
      ts.getMessage.contains("timestamp"))
  }
}
