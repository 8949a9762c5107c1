package graft.core

import java.nio.file.Files
import org.scalacheck.{Gen, rng}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based check (SURVEY.md §5): for arbitrary transaction workloads
  * — random batches, duplicate keys, mid-txn flushes, rollbacks — the
  * engine's resolved snapshot equals an in-memory last-writer-wins model,
  * and the ordered scan is sorted. Deterministic ScalaCheck generators
  * (fixed seeds) keep the suite reproducible; Spark runs per scenario, so
  * the sample count is small but each scenario is adversarial (tiny key
  * grid to force heavy version collisions). */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = MatSchema(
    Seq(Dimension("time", 7), Dimension("sensor_id", 3)),
    Seq(ValueCol("value")))

  // one batch: rows over a deliberately tiny key grid
  private val rowGen: Gen[Seq[Any]] = for {
    t <- Gen.choose(0L, 20L)
    s <- Gen.choose(0L, 3L)
    v <- Gen.choose(-1000000L, 1000000L)
  } yield Seq[Any](t, s, v)

  private val batchGen: Gen[List[Seq[Any]]] = Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, rowGen))

  private case class TxnPlan(batches: List[List[Seq[Any]]], flushAfter: Set[Int], rollback: Boolean)

  private val txnGen: Gen[TxnPlan] = for {
    nb <- Gen.choose(1, 4)
    batches <- Gen.listOfN(nb, batchGen)
    flushes <- Gen.someOf(0 until nb)
    rollback <- Gen.frequency(4 -> false, 1 -> true)
  } yield TxnPlan(batches, flushes.toSet, rollback)

  private val workloadGen: Gen[List[TxnPlan]] = Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, txnGen))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("resolved snapshot equals last-writer-wins model under random workloads") {
    for (seed <- 1L to 6L) {
      val workload = sample(workloadGen, seed)
      val path = Files.createTempDirectory(s"graft-prop-$seed").toString
      val db = MatDb.create(spark, schema, path)
      val model = scala.collection.mutable.Map.empty[(Long, Long), Long]

      workload.foreach { plan =>
        val txn = db.newTransaction()
        val txnModel = scala.collection.mutable.Map.empty[(Long, Long), Long]
        plan.batches.zipWithIndex.foreach { case (batch, i) =>
          txn.addRowsSeq(batch)
          batch.foreach { case Seq(t: Long, s: Long, v: Long) =>
            txnModel((t, s)) = v
          }
          if (plan.flushAfter.contains(i)) txn.flush()
        }
        if (plan.rollback) txn.rollback()
        else { txn.commit(); model ++= txnModel }
      }

      val got = db.snapshot().collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === model.toMap, s"seed=$seed workload=$workload")

      // ordered scan is sorted by the composite key
      val keys = db.orderedScan().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(keys === keys.sorted, s"seed=$seed")

      // a random chunk-range query agrees with the filtered model
      val (lo, hi) = (sample(Gen.choose(0L, 10L), seed * 31), sample(Gen.choose(10L, 20L), seed * 37))
      val t2 = db.newTransaction()
      val ranged = t2.query(Some(Scan.chunkRange(schema, "time", Some(lo), Some(hi))))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      t2.rollback()
      assert(ranged === model.filter { case ((t, _), _) => t >= lo && t <= hi }.toMap, s"seed=$seed")

      // reopened database agrees (recovery path)
      val reopened = MatDb.open(spark, path).snapshot().count()
      assert(reopened === model.size.toLong, s"seed=$seed")
    }
  }

  test("batch-internal duplicate keys resolve to a value from that batch") {
    val path = Files.createTempDirectory("graft-prop-dup").toString
    val db = MatDb.create(spark, schema, path)
    val txn = db.newTransaction()
    // same key three times in ONE batch: winner is unspecified among the
    // three (documented), but must be one of them
    txn.addRowsSeq(Seq(Seq(1L, 1L, 10L), Seq(1L, 1L, 20L), Seq(1L, 1L, 30L)))
    txn.commit()
    val v = db.snapshot().head().getLong(2)
    assert(Set(10L, 20L, 30L).contains(v))
    assert(db.snapshot().count() === 1)
  }
}
