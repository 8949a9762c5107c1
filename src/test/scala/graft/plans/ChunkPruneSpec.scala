package graft.plans

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

class ChunkPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = MatSchema(
    Seq(Dimension("time", 50), Dimension("sensor_id", 10)),
    Seq(ValueCol("value")))

  test("plain dimension predicates gain chunk-key partition filters via the rule") {
    GraftPlans.enable(spark)
    val path = Files.createTempDirectory("graft-prune").toString
    val db = MatDb.create(spark, schema, path)
    val txn = db.newTransaction()
    txn.addRowsSeq(for (t <- 0 until 200; s <- 0 until 5)
      yield Seq[Any](t.toLong, s.toLong, t.toLong))
    txn.commit()

    // user writes ONLY the dimension predicate — no manual chunkRange
    val q = db.snapshot().where(col("time") >= 60 && col("time") <= 119)
    assert(q.count() === 60 * 5)

    // (the extensions-injected copy of the rule runs inside the main
    // optimizer fixed point, so constraint inference may prepend an
    // isnotnull(_ck_time) conjunct — match the bounds, not the position)
    val plan = q.queryExecution.executedPlan.toString
    val pf = plan.linesIterator
      .find(l => l.contains("PartitionFilters: [") && l.contains("_ck_time")).getOrElse("")
    assert(pf.contains(">= 1)") && pf.contains("<= 2)"), plan)

    // equality predicate too
    val q2 = db.snapshot().where(col("time") === 75)
    assert(q2.count() === 5)
    val plan2 = q2.queryExecution.executedPlan.toString
    assert(plan2.linesIterator.exists(l =>
      l.contains("PartitionFilters: [") && l.contains("_ck_time")), plan2)

    // correctness unchanged with predicates the rule ignores
    assert(db.snapshot().where(col("value") > 100).count() === 99 * 5)
  }
}
