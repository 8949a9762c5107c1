package graft.streaming

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** Property check for [[Streams.semanticNoveltyFilter]] against an
  * in-memory model on random low-dimensional corpora:
  *
  *   - the surviving set EQUALS the model: a batch vector survives iff no
  *     history vector in one of its nprobe nearest buckets has cosine ≥
  *     tau, and no smaller-id batch vector whose PRIMARY bucket is among
  *     its nprobe probed buckets has cosine ≥ tau — the same probe rule
  *     on both checks (assignment = argmax dot against the centroid list,
  *     first index on ties — array_position semantics);
  *   - idempotence: filtering the survivors again against the same
  *     history changes nothing (the fixpoint a crash-replay relies on,
  *     in the no-self-copy direction);
  *   - monotonicity in tau: a looser threshold never drops MORE rows.
  */
class SemanticFilterPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dim = 4
  private val vecGen: Gen[Seq[Double]] =
    Gen.listOfN(dim, Gen.choose(-1.0, 1.0)).map(_.map(x => math.rint(x * 8) / 8.0))
      .suchThat(v => v.exists(_ != 0.0)).map(_.toSeq)
  private def corpusGen(n0: Int, n1: Int): Gen[List[Seq[Double]]] =
    Gen.choose(n0, n1).flatMap(n => Gen.listOfN(n, vecGen))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
  private def cosine(a: Seq[Double], b: Seq[Double]): Double =
    dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
  private def assign(v: Seq[Double], cents: Seq[Seq[Double]]): Int = {
    val ds = cents.map(dot(v, _))
    ds.indexOf(ds.max) // first max — array_position semantics
  }
  private def probes(v: Seq[Double], cents: Seq[Seq[Double]]): Set[Int] = {
    val ds = cents.map(dot(v, _))
    val b1 = ds.indexOf(ds.max)
    val rest = ds.filter(_ != ds.max)
    val b2 = if (rest.isEmpty) b1 else ds.indexOf(rest.max)
    Set(b1, b2)
  }

  /** The model the distributed filter must reproduce exactly. */
  private def model(batch: Seq[(Long, Seq[Double])], hist: Seq[(Long, Seq[Double], Int)],
      cents: Seq[Seq[Double]], tau: Double): Set[Long] =
    batch.filter { case (id, v) =>
      val pb = probes(v, cents)
      val histHit = hist.exists { case (_, hv, hb) => pb(hb) && cosine(hv, v) >= tau }
      val intraHit = batch.exists { case (oid, ov) =>
        oid < id && pb(assign(ov, cents)) && cosine(ov, v) >= tau
      }
      !histHit && !intraHit
    }.map(_._1).toSet

  test("filter equals the brute-force model; idempotent; monotone in tau") {
    import spark.implicits._
    for (seed <- 1L to 6L) {
      val cents = sample(corpusGen(2, 4), seed * 100 + 1).distinct
      val histV = sample(corpusGen(4, 10), seed * 100 + 2)
      val batchV = sample(corpusGen(4, 10), seed * 100 + 3)
      val hist = histV.zipWithIndex.map { case (v, i) =>
        (i.toLong, v, assign(v, cents)) }
      val batch = batchV.zipWithIndex.map { case (v, i) => (100L + i, v) }
      val histDf = hist.toDF("vec_id", "embedding", "bucket")
      val batchDf = batch.toDF("vec_id", "embedding")
      for (tau <- Seq(0.6, 0.9)) {
        val got = Streams.semanticNoveltyFilter(batchDf, histDf,
          "vec_id", "embedding", cents, tau)
        val gotIds = got.select("vec_id").as[Long].collect().toSet
        val want = model(batch, hist, cents, tau)
        assert(gotIds === want, s"seed=$seed tau=$tau cents=$cents")
        // idempotence on the survivor set
        val again = Streams.semanticNoveltyFilter(
          got, histDf, "vec_id", "embedding", cents, tau)
          .select("vec_id").as[Long].collect().toSet
        assert(again === gotIds, s"not a fixpoint at seed=$seed tau=$tau")
      }
      // monotone: everything surviving at the TIGHTER tau (more pairs
      // qualify as dups at lower tau... looser = higher tau here) — a
      // HIGHER tau admits fewer near-dup hits, so survivors grow
      val lo = model(batch, hist, cents, 0.6)
      val hi = model(batch, hist, cents, 0.9)
      assert(lo.subsetOf(hi), s"monotonicity broke at seed=$seed")
    }
  }
}
