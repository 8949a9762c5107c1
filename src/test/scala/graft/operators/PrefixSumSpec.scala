package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** The distributed prefix sum: same values as the naive single-partition
  * window, WITHOUT the single-partition exchange. */
class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("running totals equal the naive window; no SinglePartition exchange") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1L to 5000L).map(k => (k, rnd.nextInt(100).toLong)).toDF("k", "v")
      .repartition(7) // scrambled input partitioning

    val got = PrefixSum.runningTotal(rows, "k", "v")
      .select(col("k"), col("cum")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = rows.withColumn("cum",
        sum(col("v")).over(Window.orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("k"), col("cum")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === naive)

    // THE plan property: the naive form funnels everything through ONE
    // partition; the operator's windows all partition by _pid
    val df = PrefixSum.runningTotal(rows, "k", "v")
    df.collect()
    val plan = TestSpark.finalPlan(df)
    assert(!plan.contains("SinglePartition"),
      s"prefix sum must not plan a SinglePartition exchange:\n$plan")
  }

  test("tied order keys receive their whole tie group's total (RANGE frame semantics)") {
    import spark.implicits._
    // k=5 appears twice: both rows must carry the same cum (prior + both
    // values), exactly like a plain `sum() OVER (ORDER BY k)` whose default
    // RANGE frame includes the full tie group — and deterministically so
    val rows = Seq((1L, 10L), (5L, 1L), (5L, 2L), (9L, 4L)).toDF("k", "v")
    val got = PrefixSum.runningTotal(rows, "k", "v")
      .select(col("k"), col("cum")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === Seq((1L, 10L), (5L, 13L), (5L, 13L), (9L, 17L)))
  }

  test("empty and single-row inputs") {
    import spark.implicits._
    assert(PrefixSum.runningTotal(Seq.empty[(Long, Long)].toDF("k", "v"), "k", "v")
      .count() === 0)
    val one = PrefixSum.runningTotal(Seq((7L, 3L)).toDF("k", "v"), "k", "v").collect()
    assert(one.length === 1 && one.head.getAs[Long]("cum") === 3L)
  }
}
