package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.TestSpark

/** graft.operators.Bm25 — battery q105's operator. The fixed-point score
  * is its own spec: a straight-line Scala model must reproduce every
  * score exactly, and the classic IR sanity properties must hold. */
class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val corpus = Seq(
    (1L, "spark merge join hash merge merge"),
    (2L, "vector scan filter vector table row"),
    (3L, "merge vector batch batch data data data"),
    (4L, "the a of and or but"),
    (5L, "batch"),
    (6L, "merge merge merge merge merge merge merge merge"))

  /** Straight-line model of the Scaladoc formulas. */
  private def model(terms: Seq[String]): Map[Long, (Long, Long)] = {
    val toks = corpus.map { case (id, t) => id -> t.toLowerCase.split("\\s+").toSeq }
    val n = toks.size.toDouble
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val df = terms.distinct.map { t => t -> toks.count(_._2.contains(t)) }.toMap
    toks.flatMap { case (id, ws) =>
      val dl = ws.size.toDouble
      val contribs = terms.distinct.flatMap { t =>
        val tf = ws.count(_ == t).toDouble
        if (tf == 0) None
        else {
          val w = ((n - df(t)) + 0.5) / (df(t) + 0.5)
          val tfn = (tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl))
          Some(math.floor((tfn * w) * 1048576.0).toLong)
        }
      }
      if (contribs.isEmpty) None else Some(id -> (contribs.sum, contribs.size.toLong))
    }.toMap
  }

  private def run(terms: Seq[String], k: Int = 10): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text")
    val (p, l, d) = Bm25.index(df, "doc_id", "text")
    Bm25.search(p, l, d, terms, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("scores equal the straight-line model exactly (it is the spec)") {
    val got = run(Seq("merge", "vector", "batch"))
    val want = model(Seq("merge", "vector", "batch"))
    assert(got.map(r => r._1 -> ((r._2, r._3))).toMap === want)
    // ordering: score desc, doc_id asc — a total order
    val resorted = got.sortBy(r => (-r._2, r._1))
    assert(got === resorted)
  }

  test("only docs containing at least one query term appear; k truncates") {
    val got = run(Seq("merge"))
    assert(got.map(_._1).toSet === Set(1L, 3L, 6L), "docs without the term must not score")
    assert(run(Seq("merge"), k = 2).size === 2)
    assert(run(Seq("no-such-term")).isEmpty)
  }

  test("higher tf wins between same-length docs; rare terms outweigh common ones") {
    // doc 6 is pure repetition of 'merge' — it must outrank doc 1
    val merged = run(Seq("merge"))
    assert(merged.head._1 === 6L)
    // 'batch' (df 2) beats 'merge' (df 3) per occurrence at equal tf/dl:
    // doc 5 is a one-word doc of the rarer term — top under a joint query
    // against a one-word hypothetical... instead assert the weight order
    // via scores: doc 3 (has batch x2 + merge + vector) outranks doc 1
    // (merge x3) under the joint query
    val joint = run(Seq("merge", "vector", "batch"))
    val scores = joint.map(r => r._1 -> r._2).toMap
    assert(scores(3L) > scores(1L))
  }

  test("duplicate query terms do not double-count") {
    assert(run(Seq("merge", "merge")) === run(Seq("merge")))
  }
}
