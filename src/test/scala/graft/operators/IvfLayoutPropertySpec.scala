package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.core.TestSpark

/** Property check for the LSM bucket layout: random maintenance histories
  * — upserts (including bucket moves), deletes, delete+reinsert of the
  * same id, interleaved compactions — folded into a [[IvfIndex]] layout
  * and compared after EVERY fold against a driver-side model
  * (id → vector). The newest-generation-wins resolution, tombstone
  * routing into left buckets, auto-compaction, and idempotent
  * re-application (a replayed fold) are all exercised by construction.
  * Deterministic seeds — failures replay. */
class IvfLayoutPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vecOf(id: Long, flip: Int): Seq[Double] = {
    // deterministic unit-ish vector; `flip` rotates it between axes so an
    // update usually MOVES buckets
    val a = Array.fill(4)(0.01 * ((id + flip) % 7))
    a(((id + flip) % 4).toInt) = 1.0
    a.toSeq
  }

  private def df(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def resolvedState(path: String): Map[Long, Seq[Double]] =
    IvfIndex.readLayout(spark, s"$path/corpus", "vec_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap

  test("LSM layout equals the model after every random fold, replay, and compaction") {
    for (seed <- Seq(5, 19)) {
      val rnd = new scala.util.Random(seed)
      val path = java.nio.file.Files.createTempDirectory(s"graft-ivfprop-$seed").toString
      val init = (0L until 30L).map(id => id -> vecOf(id, 0))
      val centroids = IvfIndex
        .train(df(init), "vec_id", "embedding", k = 4, iters = 3).map(_.toSeq).toSeq
      IvfIndex.writeIndex(df(init), "vec_id", "embedding", centroids, path)
      var model: Map[Long, Seq[Double]] = init.toMap
      // normalized model (the layout stores normalized vectors)
      def normed(m: Map[Long, Seq[Double]]): Map[Long, Seq[Double]] = m.map {
        case (id, v) =>
          val n = math.sqrt(v.map(x => x * x).sum)
          id -> v.map(_ / n)
      }
      val saved = sys.props.get("graft.index.delta.maxpending")
      sys.props("graft.index.delta.maxpending") = "3" // force mid-history folds
      try {
        (1 to 8).foreach { step =>
          val ups = (0 until rnd.nextInt(4))
            .map(_ => rnd.nextInt(36).toLong).distinct
            .map(id => id -> vecOf(id, 1 + rnd.nextInt(3)))
          val dels = (0 until rnd.nextInt(3))
            .map(_ => rnd.nextInt(36).toLong).distinct
            .filterNot(ups.map(_._1).contains)
          IvfIndex.maintainIndex(spark, path, "vec_id",
            df(ups), df(dels.map(d => d -> Seq.empty[Double])).select(col("vec_id")))
          model = (model ++ ups.toMap) -- dels
          if (rnd.nextInt(3) == 0 && step > 1) {
            // a REPLAYED fold (the crash-retry case) must be a no-op
            IvfIndex.maintainIndex(spark, path, "vec_id",
              df(ups), df(dels.map(d => d -> Seq.empty[Double])).select(col("vec_id")))
          }
          val got = resolvedState(path)
          val want = normed(model)
          assert(got.keySet === want.keySet,
            s"seed $seed step $step: live ids diverged")
          got.foreach { case (id, v) =>
            val w = want(id)
            assert(v.zip(w).forall { case (a, b) => math.abs(a - b) < 1e-12 },
              s"seed $seed step $step id $id: stored vector diverged")
          }
        }
        // explicit compaction at the end preserves the state exactly
        IvfIndex.compactLayout(spark, s"$path/corpus", "vec_id")
        assert(IvfIndex.deltaGens(s"$path/corpus").isEmpty)
        assert(resolvedState(path).keySet === model.keySet)
      } finally {
        saved match {
          case Some(v) => sys.props("graft.index.delta.maxpending") = v
          case None    => sys.props.remove("graft.index.delta.maxpending"); ()
        }
      }
    }
  }
}
