package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** IVF drift metric (IndexStats + IvfIndex.driftRatio): the re-train
  * advisory for fixed-centroid index maintenance. Runs tools.DriftProbe's
  * deterministic scenario at small scale and pins each phase's DIRECTION
  * (the full-size numbers live in bench/drift_probe.json):
  * in-distribution maintenance keeps the ratio ≈ 1 with recall intact,
  * distribution shift sends the ratio far past the advisory threshold
  * while recall degrades, and a re-train + writeIndex rebuild resets the
  * baseline and restores recall. */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("drift ratio tracks distribution shift and resets on rebuild") {
    val steps = graft.tools.DriftProbe.run(spark,
      dim = 16, nCenters = 4, perCenter = 30, batches = 2, seed = 7L)
    val same = steps.filter(_.phase == "same")
    val shifted = steps.filter(_.phase == "shifted")
    val rebuilt = steps.filter(_.phase == "rebuilt")
    assert(same.nonEmpty && shifted.nonEmpty && rebuilt.nonEmpty)
    // phase 1: in-distribution — ratio stays near 1, recall stays high
    assert(same.forall(_.driftRatio < 2.0),
      s"in-distribution maintenance must not trip the advisory: $same")
    assert(same.forall(_.recall >= 0.9), s"recall must hold in-distribution: $same")
    // phase 2: shift — the metric crosses the threshold AND recall sags
    assert(shifted.last.driftRatio > 3.0,
      s"a shifted distribution must raise the drift ratio: ${shifted.last}")
    assert(shifted.last.recall < same.map(_.recall).min,
      s"shift must degrade recall below the in-distribution floor: ${shifted.last}")
    // phase 3: rebuild — baseline resets, recall restores
    assert(rebuilt.last.driftRatio < 2.0,
      s"a rebuild must reset the drift baseline: ${rebuilt.last}")
    assert(rebuilt.last.recall >= 0.9,
      s"a rebuild must restore recall: ${rebuilt.last}")
  }

  test("the advisory fires on shift and retrain() restores the geometry") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // deterministic two-cluster corpus: unit vectors near axis `axis` with
    // a small repeating jitter (no RNG — replay-stable)
    def vecs(ids: Range, axis: Int): org.apache.spark.sql.DataFrame =
      ids.map { i =>
        val a = Array.fill(4)(0.001 * (i % 7))
        a(axis) = 1.0
        (i.toLong, a.toSeq)
      }.toDF("vec_id", "embedding")
    val none = vecs(0 until 0, 0).select(col("vec_id"))
    val path = java.nio.file.Files.createTempDirectory("graft-drift-adv").toString
    val corpusA = vecs(0 until 40, 0)
    val centroids = IvfIndex.train(corpusA, "vec_id", "embedding", k = 2, iters = 3)
      .map(_.toSeq).toSeq
    IvfIndex.writeIndex(corpusA, "vec_id", "embedding", centroids, path)
    // in-distribution fold: same jitter law -> ratio ~ 1, advisory silent
    IvfIndex.maintainIndex(spark, path, "vec_id", vecs(40 until 50, 0), none)
    assert(IvfIndex.driftAdvisory(path).isEmpty,
      s"in-distribution fold must not trip the advisory: ${IvfIndex.driftRatio(path)}")
    // SHIFT: vectors on an orthogonal axis — sqdist to every trained
    // centroid is ~2, far above the jitter-scale baseline
    IvfIndex.maintainIndex(spark, path, "vec_id", vecs(100 until 140, 2), none)
    assert(IvfIndex.driftRatio(path).exists(_ >= IvfIndex.driftWarnThreshold))
    val advisory = IvfIndex.driftAdvisory(path)
    assert(advisory.exists(_.contains("retrain")),
      s"the shift must produce a re-train advisory, got $advisory")
    // the remedy: retrain() re-trains on the CURRENT (maintained) corpus
    // and rebuilds — baseline resets, advisory clears
    IvfIndex.retrain(spark, path, iters = 3)
    assert(IvfIndex.driftAdvisory(path).isEmpty, "retrain must reset the baseline")
    assert(IvfIndex.deltaGens(s"$path/corpus").isEmpty, "a rebuild leaves no deltas")
    // post-shift data is now IN distribution for the new geometry
    IvfIndex.maintainIndex(spark, path, "vec_id", vecs(140 until 150, 2), none)
    assert(IvfIndex.driftRatio(path).forall(_ < IvfIndex.driftWarnThreshold),
      s"the new geometry must absorb post-shift folds: ${IvfIndex.driftRatio(path)}")
    // and the rebuilt index still answers: the shifted ids are findable
    val got = IvfIndex.searchIndex(spark, path, vecs(100 until 102, 2),
      "vec_id", "embedding", nprobe = 2, k = 3)
    assert(got.count() > 0)
  }

  test("stats log: write resets, maintains append, ratio needs a baseline") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idxstats").toString
    assert(IvfIndex.driftRatio(dir).isEmpty)
    IndexStats.append(dir, "train", 100L, 0.5)
    assert(IvfIndex.driftRatio(dir).isEmpty, "one row is not a ratio")
    IndexStats.append(dir, "maintain", 10L, 1.0)
    assert(IvfIndex.driftRatio(dir).contains(2.0))
    IndexStats.append(dir, "maintain", 10L, 0.25)
    assert(IvfIndex.driftRatio(dir).contains(0.5), "latest row wins")
    val rows = IndexStats.read(dir)
    assert(rows.map(_.seq) == Seq(0L, 1L, 2L) &&
      rows.map(_.phase) == Seq("train", "maintain", "maintain"))
    IndexStats.reset(dir)
    assert(IndexStats.read(dir).isEmpty && IvfIndex.driftRatio(dir).isEmpty)
  }
}
