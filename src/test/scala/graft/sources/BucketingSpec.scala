package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** The co-located join path: both sides bucketed+sorted on the join key →
  * the sort-merge join plans with NO Exchange on either side (and no
  * per-query Sort beyond reading the sorted buckets), and returns exactly
  * the rows of the shuffled join. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed fact-fact join runs with zero exchanges and exact parity") {
    // clean any leftovers from an aborted prior run (dropped catalog entry
    // can leave the managed location behind)
    Seq("li_b", "ord_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val sf = "/root/testdata/sf0.001"
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))

    Bucketing.writeBucketed(lineitem, "li_b", Seq("l_orderkey"), buckets = 8)
    Bucketing.writeBucketed(
      orders.withColumnRenamed("o_orderkey", "l_orderkey"), "ord_b", Seq("l_orderkey"), buckets = 8)
    // at sf0.001 the planner would broadcast the tiny side (and skip the
    // bucket metadata entirely); disable broadcast to exercise the plan
    // shape that matters at scale, where neither fact side broadcasts
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.readBucketed(spark, "li_b")
        .join(Bucketing.readBucketed(spark, "ord_b"), "l_orderkey")
      val expected = lineitem
        .join(orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")

      assert(joined.count() === expected.count())
      assert(joined.exceptAll(expected).count() === 0L)
      assert(expected.exceptAll(joined).count() === 0L)

      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"unexpected join strategy:\n$plan")
      // the co-location comes from the bucket-aware scans
      assert(plan.contains("Bucketed: true"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevAqe.fold(spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
