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
