package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** Planted-document cases for the Gopher rule battery: each rule is
  * violated by exactly one crafted document, with the published default
  * stop set, so a threshold or regex regression flips a visible bit. */
class GopherRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 60 clean words incl. >=2 default stop words, mean word length in 3..10
  private val clean = (Seq("the", "with") ++
    Seq.fill(58)("word")).mkString(" ")

  private def bits(rows: (Long, String)*): Map[Long, Map[String, Long]] = {
    import spark.implicits._
    val df = GopherRules.ruleBits(rows.toDF("doc_id", "text"))
    df.collect().map { r =>
      r.getLong(0) -> df.columns.drop(1).zipWithIndex.map {
        case (c, i) => c -> r.getLong(i + 1)
      }.toMap
    }.toMap
  }

  test("clean document passes every rule") {
    val b = bits(1L -> clean)(1L)
    assert(b.filter(_._1.startsWith("r_")).values.forall(_ === 1L), b)
    assert(b("keep") === 1L)
    assert(b("n_words") === 60L)
  }

  test("each planted violation flips exactly its own rule") {
    val tooShort = "the with word"                         // r_wc
    val longWords = (Seq("the", "with") ++
      Seq.fill(58)("supercalifragilistic")).mkString(" ")  // r_wlen (>10)
    val symbols = (Seq("the", "with") ++ Seq.fill(48)("word") ++
      Seq.fill(10)("#")).mkString(" ")                     // r_sym (10/60 > 1/10)
    val bullets = (Seq("the with word word word") ++
      Seq.fill(11)("- item word word word")).mkString("\n") // r_bullet (11/12 lines)
    // 4 of 12 lines end in "..." — over the 30% line cap (40 > 36) while
    // the 4 ellipses stay under the symbol-ratio cap (40 <= 60 words)
    val ellipses = (Seq("the with word word word") ++
      Seq.fill(7)("word word word word word") ++
      Seq.fill(4)("word word word word trailing...")).mkString("\n")
    val numeric = (Seq("the", "with") ++ Seq.fill(28)("word") ++
      Seq.fill(30)("12345")).mkString(" ")                 // r_alpha (30/60 < 4/5)
    val noStops = Seq.fill(60)("word").mkString(" ")       // r_stop
    val all = bits(1L -> tooShort, 2L -> longWords, 3L -> symbols,
      4L -> bullets, 5L -> ellipses, 6L -> numeric, 7L -> noStops)
    val expectFail = Map(1L -> "r_wc", 2L -> "r_wlen", 3L -> "r_sym",
      4L -> "r_bullet", 5L -> "r_ell", 6L -> "r_alpha", 7L -> "r_stop")
    expectFail.foreach { case (id, failing) =>
      val b = all(id)
      assert(b(failing) === 0L, s"doc $id should fail $failing: $b")
      assert(b("keep") === 0L, s"doc $id keep: $b")
      // symbol tokens aren't alphabetic and "..." lines change nothing else:
      // every rule other than the planted one (and r_wc for the short doc,
      // whose 3 words also satisfy the other ratios) stays green
      val others = b.filter(t => t._1.startsWith("r_") && t._1 != failing)
      val tolerated: Set[String] = id match {
        case 3L => Set("r_alpha") // '#' tokens count against alpha ratio too
        case _ => Set.empty
      }
      others.foreach { case (k, v) =>
        if (!tolerated(k)) assert(v === 1L, s"doc $id unexpectedly fails $k: $b")
      }
    }
  }

  test("stop list is parametric: corpus-localized set changes only r_stop") {
    import spark.implicits._
    val text = (Seq("a", "a", "the") ++ Seq.fill(57)("word")).mkString(" ")
    val df = Seq(1L -> text).toDF("doc_id", "text")
    val published = GopherRules.ruleBits(df).collect().head
    val localized = GopherRules.ruleBits(df,
      stopWords = Seq("the", "a", "to", "of", "and", "that", "have", "with"))
      .collect().head
    val iStop = GopherRules.ruleBits(df).columns.indexOf("r_stop")
    assert(published.getLong(iStop) === 0L)  // only "the" from the default set
    assert(localized.getLong(iStop) === 1L)  // "a" + "the" = 2 distinct
  }
}
