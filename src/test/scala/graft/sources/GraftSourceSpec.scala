package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

class GraftSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("format(\"graft\") write creates a table; read sees resolved rows; asOf time travels") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-src").toString

    Seq((1L, 1L, 10L), (2L, 1L, 20L)).toDF("time", "sensor_id", "value")
      .write.format("graft").option("dimensions", "time:50,sensor_id:10").save(path)
    Seq((1L, 1L, 11L)).toDF("time", "sensor_id", "value")
      .write.format("graft").mode("append").save(path)

    val df = spark.read.format("graft").load(path)
    assert(df.schema.fieldNames.toSeq === Seq("time", "sensor_id", "value"))
    val rows = df.orderBy("time").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.toSeq === Seq((1L, 11L), (2L, 20L))) // upsert resolved

    val old = spark.read.format("graft").option("asOf", "1").load(path)
    assert(old.orderBy("time").collect().map(_.getLong(2)).toSeq === Seq(10L, 20L))

    // SQL over the source
    df.createOrReplaceTempView("graft_tbl")
    assert(spark.sql("SELECT sum(value) FROM graft_tbl").head().getLong(0) === 31L)
  }

  test("save modes honor the Spark contract: overwrite replaces, error throws, ignore no-ops") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-src-modes").toString
    def read() = spark.read.format("graft").load(path)
      .orderBy("time").collect().map(r => (r.getLong(0), r.getLong(2)))

    Seq((1L, 1L, 10L), (2L, 1L, 20L)).toDF("time", "sensor_id", "value")
      .write.format("graft").option("dimensions", "time:50,sensor_id:10").save(path)

    // Overwrite: keys absent from the new data are GONE (not upserted around)
    Seq((2L, 1L, 99L)).toDF("time", "sensor_id", "value")
      .write.format("graft").mode("overwrite").save(path)
    assert(read().toSeq === Seq((2L, 99L)))

    intercept[IllegalStateException] {
      Seq((3L, 1L, 30L)).toDF("time", "sensor_id", "value")
        .write.format("graft").mode("errorifexists").save(path)
    }
    Seq((3L, 1L, 30L)).toDF("time", "sensor_id", "value")
      .write.format("graft").mode("ignore").save(path)
    assert(read().toSeq === Seq((2L, 99L))) // ignored, unchanged
  }

  test("value predicates apply AFTER version resolution, never before") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-src-valpred").toString
    Seq((1L, 1L, 5L)).toDF("time", "sensor_id", "value")
      .write.format("graft").option("dimensions", "time:50,sensor_id:10").save(path)
    Seq((1L, 1L, 99L)).toDF("time", "sensor_id", "value")
      .write.format("graft").mode("append").save(path)
    // newest version of key (1,1) has value=99; a pre-dedup value filter
    // would let the superseded (1,1,5) row win dedup of the filtered subset
    val got = spark.read.format("graft").load(path)
      .where(org.apache.spark.sql.functions.col("value") === 5L).collect()
    assert(got.isEmpty, got.mkString(","))
  }

  test("dimension filters and projection push through the RDD boundary to parquet") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("graft-src-pushdown").toString
    (0L until 100L).map(i => (i, i % 7, i * 10, i + 1))
      .toDF("time", "sensor_id", "v1", "v2")
      .write.format("graft").option("dimensions", "time:50,sensor_id:10").save(path)

    // outer plan: the V1 relation records the pushed filters
    val outer = spark.read.format("graft").load(path)
      .where(col("time") >= 60L).select("time", "v1")
    val outerPlan = outer.queryExecution.executedPlan.toString
    assert(outerPlan.contains("PushedFilters") &&
      outerPlan.contains("GreaterThanOrEqual(time,60)"), outerPlan)
    assert(outer.collect().length === 40)

    // inner plan (what buildScan actually executes): the dimension predicate
    // reaches the parquet scan as PushedFilters AND as a _ck_time partition
    // filter (ChunkPruneRule); the projection prunes the unused value column
    // out of the scan entirely (dimensions stay — they are the dedup key)
    val rel = new GraftRelation(spark.sqlContext, MatDb.open(spark, path), None)
    val inner = rel.innerFrame(Array("time", "v1"),
      Array(org.apache.spark.sql.sources.GreaterThanOrEqual("time", 60L)))
    val p = inner.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(time,60)"), p)
    assert(p.contains("PartitionFilters") && p.contains("_ck_time"), p)
    assert(!p.contains("v2"), p)
    assert(inner.collect().length === 40)
  }

  test("sizeInBytes reports real on-disk size, so small graft tables auto-broadcast") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val path = Files.createTempDirectory("graft-src-stats").toString
    (0L until 50L).map(k => (k, k, k * 10)).toDF("time", "sensor_id", "value")
      .write.format("graft").option("dimensions", "time:50,sensor_id:10").save(path)

    val dim = spark.read.format("graft").load(path)
    val stats = dim.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(stats > 0 && stats < 10L * 1024 * 1024,
      s"a KB-scale graft table must report KB-scale stats, got $stats")
    assert(stats === BigInt(MatDb.open(spark, path).visibleBytes()))

    // join against a big side WITHOUT a broadcast hint: the STATIC plan
    // (pre-AQE — what a 100 TB run commits to before any shuffle lands)
    // must already pick a broadcast join off those statistics
    val big = spark.range(100000).select(col("id").as("time"),
      (col("id") * 2).as("payload"))
    val joined = big.join(dim, "time")
    val initial = joined.queryExecution.sparkPlan.toString
    assert(initial.contains("BroadcastHashJoin") && !initial.contains("SortMergeJoin"),
      s"small graft side must broadcast in the initial plan:\n$initial")
    assert(joined.count() === 50L)
  }

  test("ANALYZE prices the resolved relation: a multi-version dim broadcasts only with fresh stats") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val path = Files.createTempDirectory("graft-src-analyze").toString
    val db = MatDb.create(spark,
      MatSchema(Seq(Dimension("time", 100000), Dimension("sensor_id", 100000)),
        Seq(ValueCol("value"))), path)
    // 2000 keys × 25 versions: raw on-disk bytes price EVERY version
    (0 until 25).foreach { i =>
      val t = db.newTransaction()
      t.addRows((0L until 2000L).map(k => (k, k, k * 31 + i)).toDF("time", "sensor_id", "value"))
      t.commit()
    }
    val raw = db.visibleBytes()
    val (n, analyzed) = db.analyze()
    assert(n === 2000L)
    assert(analyzed < raw / 2,
      s"resolved estimate ($analyzed) must undercut the 25-version raw bytes ($raw)")
    // per-dimension min/max persisted alongside
    val props = Storage.readProps(Storage.rootPath(path))
    assert(props("graft.stats.dim.time.min") === "0" &&
      props("graft.stats.dim.time.max") === "1999")

    def dim() = spark.read.format("graft").load(path)
    assert(dim().queryExecution.optimizedPlan.stats.sizeInBytes === BigInt(analyzed))

    val big = spark.range(100000).select(col("id").as("time"), col("id").as("sensor_id"),
      (col("id") * 2).as("payload"))
    val threshold = (analyzed + raw) / 2 // between resolved and raw pricing
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
      val withStats = big.join(dim(), Seq("time", "sensor_id"))
        .queryExecution.sparkPlan.toString
      assert(withStats.contains("BroadcastHashJoin"),
        s"fresh ANALYZE stats must unlock the broadcast:\n$withStats")

      // any later commit invalidates: pricing falls back to raw bytes (the
      // safe over-estimate), which sits above the threshold again
      val t = db.newTransaction()
      t.addRows(Seq((5000L, 5000L, 1L)).toDF("time", "sensor_id", "value")); t.commit()
      val stale = big.join(dim(), Seq("time", "sensor_id"))
        .queryExecution.sparkPlan.toString
      assert(!stale.contains("BroadcastHashJoin"),
        s"stale stats must not under-price a changed table:\n$stale")
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }
}
