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
}
