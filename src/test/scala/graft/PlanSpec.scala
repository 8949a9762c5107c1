package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Plan-shape guards: the physical plans that make the battery scale must
  * not silently regress (lost broadcast, lost pushdown, hash->sort
  * aggregate fallback). Checks run at sf0.001 — plan shape, not timing. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("star join broadcasts its dimension tables") {
    val p = plan("q09_star_join_agg")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("range filter pushes to the parquet scan") {
    val p = plan("q04_range_prune")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"), p)
  }

  test("pricing summary aggregates with hash aggregation, not sort") {
    val p = plan("q16_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("cosine top-k broadcasts the query vectors") {
    val p = plan("q50_cosine_topk")
    assert(p.contains("Broadcast"), p)
  }

  test("semi and anti joins plan as semi/anti, not inner+distinct") {
    assert(plan("q12_semi_join").contains("LeftSemi"), plan("q12_semi_join"))
    assert(plan("q13_anti_join").contains("LeftAnti"), plan("q13_anti_join"))
  }

  test("core MVCC dedup stays on HashAggregate with partition+data filters") {
    val path = Files.createTempDirectory("graft-planspec").toString
    val schema = MatSchema(Seq(Dimension("k", 10)), Seq(ValueCol("v")))
    val db = MatDb.create(spark, schema, path)
    val t = db.newTransaction()
    t.addRowsSeq((0L until 100L).map(i => Seq[Any](i, i)))
    t.commit()
    val p = db.snapshot().queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
  }
}
