package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark
import graft.tools.RecallProbe

/** Recall floors for the two approximate streaming dedup gates, asserted
  * on the SAME deterministic planted-duplicate construction the
  * [[graft.tools.RecallProbe]] tool reports (fixed seed, fixed texts) —
  * the property specs prove the gates match their candidate models; this
  * spec proves the models themselves catch planted near-dups:
  *
  *   - semantic gate at d=256: nprobe=2 must catch ≥95% of jittered
  *     duplicates at every jitter radius up to the tau boundary, never
  *     lose to nprobe=1, and never falsely drop a novel vector (the
  *     full-size probe measures 0.997-1.0 / 0 false drops);
  *   - media gate: brightness-jittered PNG re-encodes must land within
  *     the banded join's Hamming bound often enough to be useful — ≥60%
  *     at maxDist=2 on these worst-case noise-like renders (the probe
  *     measures 0.70; real structured images do better, MultimodalSpec
  *     pins the per-edit invariances).
  */
class RecallProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("semantic gate: nprobe=2 recall floor on planted jittered duplicates at d=256") {
    val pts = RecallProbe.semanticRecall(spark, d = 256, nHist = 600,
      nPlanted = 120, nNovel = 60, k = 16, tau = 0.99,
      epsList = Seq(0.05, 0.12), nprobes = Seq(1, 2), seed = 41L)
    // the construction must actually plant true duplicates
    pts.foreach(p => assert(p.trueDups >= p.planted * 9 / 10,
      s"planting degenerated: $p"))
    val byEps = pts.groupBy(_.eps)
    byEps.foreach { case (eps, ps) =>
      val p1 = ps.find(_.nprobe == 1).get
      val p2 = ps.find(_.nprobe == 2).get
      assert(p2.recall >= 0.95, s"nprobe=2 recall floor broke at eps=$eps: $p2")
      assert(p2.recall >= p1.recall - 1e-12,
        s"probing MORE buckets lost recall at eps=$eps: $p1 vs $p2")
      ps.foreach(p => assert(p.falseDrops === 0, s"novel vector falsely dropped: $p"))
    }
  }

  test("media gate: brightness-jitter Hamming stays within the banded bound often enough") {
    // same 300-doc population as the committed artifact: pHash stability
    // is strongly content-dependent (a 120-doc prefix of this family
    // measures 0.26 — floors on a different subset would pin nothing)
    val pts = RecallProbe.mediaRecall(spark, nDocs = 300,
      deltas = Seq(16), maxDists = Seq(2))
    val p = pts.head
    assert(p.recall >= 0.65, s"media recall floor broke: $p")
    assert(p.meanHamming <= 8.0, s"pHash moved implausibly far under brightness: $p")
  }

  test("media gate realizes the pigeonhole bound, and more bands buy recall") {
    // same 300-doc delta=16 population; 60 docs keep the spec cheap while
    // staying on the artifact's construction (per-doc determinism)
    val dists = RecallProbe.mediaRecall(spark, nDocs = 60,
      deltas = Seq(16), maxDists = Seq(2, 4))
    val gates = RecallProbe.mediaGateRecall(spark, nDocs = 60, delta = 16,
      settings = Seq((2, 3), (4, 5)))
    // the banded plan is exhaustive, not probabilistic: every doc whose
    // own jitter Hamming is within maxDist MUST drop (missed = 0), and
    // drop-recall can only exceed the within-range fraction (cross-doc
    // and intra-batch near-matches are legitimate extra drops)
    dists.zip(gates).foreach { case (d, g) =>
      assert(d.maxDist === g.maxDist)
      assert(g.missed === 0,
        s"gate lost in-range pairs the pigeonhole guarantees: $d vs $g")
      assert(g.recall >= d.recall - 1e-12, s"gate under-dropped: $d vs $g")
    }
    val r3 = gates.find(_.bands == 3).get.recall
    val r5 = gates.find(_.bands == 5).get.recall
    assert(r5 > r3,
      s"5-band maxDist=4 should beat 3-band maxDist=2 on jitter centered near 2.7: $r3 vs $r5")
  }
}
