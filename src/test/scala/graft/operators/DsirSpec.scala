package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** DSIR importance selection ([[Dsir]]): the exact integer fixed-point
  * log2 kernel, the zero-score invariant for identical corpora, and
  * end-to-end selection preferring target-like documents. */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side reference of the shift-and-square chain. */
  private def refL(n: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    var m = if (e <= 30) n << (30 - e) else n >> (e - 30)
    var acc = e.toLong
    for (_ <- 1 to Dsir.FracBits) {
      val t = (m * m) >> 30
      if (t >= (1L << 31)) { acc = acc * 2 + 1; m = t >> 1 }
      else { acc = acc * 2; m = t }
    }
    acc
  }

  test("log2fp matches the integer reference and tracks log2 within 4/65536") {
    val ns = Seq(1L, 2L, 3L, 5L, 7L, 100L, 12345L, 999983L,
      1L << 30, (1L << 30) + 1, (1L << 40) + 12345, (1L << 52) - 1)
    val out = Dsir.withLog2fp(ns.toDF("n"), "n", "l")
      .select("n", "l").as[(Long, Long)].collect().toMap
    ns.foreach { n =>
      assert(out(n) === refL(n), s"n=$n")
      val ideal = math.log(n.toDouble) / math.log(2.0) * (1L << Dsir.FracBits)
      assert(math.abs(out(n) - ideal) <= 4.0, s"n=$n l=${out(n)} ideal=$ideal")
    }
    // powers of two are exact: mantissa stays 2^30, every fractional bit 0
    (0 to 52).foreach { k =>
      assert(refL(1L << k) === k.toLong << Dsir.FracBits)
    }
  }

  test("identical target and raw corpora give all-zero bucket scores") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "alpha delta"), (4L, "beta beta zeta")).toDF("doc_id", "text")
    val sc = Dsir.bucketScores(docs, docs, "text", 64)
    assert(sc.count() === 64)
    assert(sc.where(col("score") =!= 0L).count() === 0,
      "np==nq and dp==dq must cancel exactly")
  }

  test("selection prefers target-like documents; scoring joins broadcast") {
    val target = (1 to 50).map(i => (i.toLong, "alpha bravo charlie alpha"))
      .toDF("doc_id", "text")
    val raw = ((101 to 110).map(i => (i.toLong, "alpha bravo charlie delta")) ++
      (201 to 210).map(i => (i.toLong, "zulu yankee xray whiskey")))
      .toDF("doc_id", "text")
    val sc = Dsir.bucketScores(target, raw, "text", 128)
    val scored = Dsir.scoreDocs(raw, sc, "doc_id", "text", 128)
    val top = Dsir.select(scored, "doc_id", 10).collect()
    assert(top.map(_.getLong(0)).toSet === (101L to 110L).toSet,
      "the alpha-like half must outscore the zulu half")
    val zuluBest = scored.where(col("doc_id") >= 200).agg(max(col("dsir_score")))
      .head().getLong(0)
    val alphaWorst = scored.where(col("doc_id") < 200).agg(min(col("dsir_score")))
      .head().getLong(0)
    assert(alphaWorst > zuluBest)
    scored.collect() // materialize, then check the final adaptive plan
    val plan = TestSpark.finalPlan(scored)
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"the 128-row score table must broadcast:\n$plan")
    // token-scale side: exactly ONE shuffle (the per-doc sum, map-side
    // partial first) — the per-(doc, bucket) pre-count shape would show a
    // second doc-keyed exchange. The remaining exchanges in the plan
    // belong to the CONSTANT-size score-table build (`buckets` rows).
    val docShuffles = plan.split("\n").count(_.contains("hashpartitioning(doc_id"))
    assert(docShuffles === 1,
      s"scoring is one token-side shuffle (the per-doc sum), got $docShuffles:\n$plan")
    assert(plan.contains("partial_sum"), "the per-doc sum must combine map-side")
  }

  test("bigram features separate phrase order that unigrams cannot see") {
    val target = (1 to 40).map(i => (i.toLong, "alpha bravo charlie delta"))
      .toDF("doc_id", "text")
    // A keeps the target's phrases; B has the SAME unigram multiset with
    // every adjacency broken — unigram scores must tie, bigram scores must
    // separate them
    val raw = Seq((101L, "alpha bravo charlie delta"),
      (201L, "alpha charlie bravo delta")).toDF("doc_id", "text")
    def scoreMap(n: Int): Map[Long, Long] = {
      val sc = Dsir.bucketScores(target, raw, "text", 256, ngrams = n)
      Dsir.scoreDocs(raw, sc, "doc_id", "text", 256, ngrams = n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val uni = scoreMap(1)
    assert(uni(101L) === uni(201L), s"unigrams cannot rank word order: $uni")
    val bi = scoreMap(2)
    assert(bi(101L) > bi(201L),
      s"bigrams must prefer the target's phrase order: $bi")
  }

  test("log2fp SQL fragment mirrors the column chain (structural pin)") {
    val sql = Dsir.log2fpSqlCtes("bucket", "kind")
    assert(sql.contains("CAST(length(bin(n)) - 1 AS BIGINT) AS acc"))
    assert(sql.contains(s"WHERE j < ${Dsir.FracBits}"))
    assert(sql.contains(s"acc AS l FROM it WHERE j = ${Dsir.FracBits})"))
    assert(sql.contains("bucket, kind,"), "extra columns must thread through")
  }
}
