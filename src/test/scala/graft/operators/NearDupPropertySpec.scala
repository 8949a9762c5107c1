package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** Property check for [[NearDup.cappedJaccardPairs]] against an in-memory
  * model on adversarial corpora (tiny vocabulary → dense shingle sharing):
  *
  *   - with a cap no shingle reaches, the result EQUALS brute-force
  *     all-pairs Jaccard over every pair sharing >= 1 shingle;
  *   - with a biting cap, the result is exactly { pairs sharing >= 1
  *     BELOW-cap shingle }, and each reported Jaccard is still the exact
  *     full-set value (the hot-shingle correction term at work).
  */
class NearDupPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val wordGen = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
  private val docGen: Gen[String] =
    Gen.choose(3, 12).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
  private val corpusGen: Gen[List[String]] =
    Gen.choose(5, 12).flatMap(n => Gen.listOfN(n, docGen))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def shingleSet(text: String): Set[String] = {
    val ws = text.toLowerCase.split("\\s+").toSeq
    if (ws.size < 3) Set.empty
    else (0 to ws.size - 3).map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}").toSet
  }

  /** In-memory model: pairs sharing >= 1 below-cap shingle, exact Jaccard
    * over FULL sets. */
  private def model(texts: Seq[String], dfCap: Long): Map[(Long, Long), Double] = {
    val sets = texts.zipWithIndex.map { case (t, i) => i.toLong -> shingleSet(t) }.toMap
    val df = sets.values.flatten.groupBy(identity).map { case (g, occ) => g -> occ.size }
    val cold = df.filter(_._2 <= dfCap).keySet
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      if (sets(a) & sets(b) & cold).nonEmpty
    } yield {
      val shared = (sets(a) & sets(b)).size
      (a, b) -> shared.toDouble / (sets(a).size + sets(b).size - shared)
    }).toMap
  }

  test("capped Jaccard pairs equal the exact model, capped and uncapped") {
    import spark.implicits._
    for (seed <- 1L to 4L; dfCap <- Seq(1000L, 3L)) {
      val texts = sample(corpusGen, seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = NearDup.jaccardPairs(docs, "doc_id", "text", minJaccard = 0.0, dfCap = dfCap)
        .collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard"))
        .toMap
      // the bare (id, g) input path computes sizes by aggregation instead
      // of carrying them through the join — same answer required
      val gotBare = NearDup
        .cappedJaccardPairs(NearDup.shingles(docs, "doc_id", "text"), "doc_id", dfCap)
        .collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard"))
        .toMap
      assert(gotBare === got, s"carried-size vs aggregated-size mismatch (seed=$seed cap=$dfCap)")
      val want = model(texts, dfCap)
      assert(got.keySet === want.keySet, s"seed=$seed cap=$dfCap texts=$texts")
      want.foreach { case (k, j) =>
        assert(math.abs(got(k) - j) < 1e-12, s"seed=$seed cap=$dfCap pair=$k")
      }
    }
  }
}
