package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TestSpark
import graft.tools.ScaleUp

/** Pins the clone-scaled fixture's ISOLATION invariants — the properties
  * that make sf1 bench/oracle numbers measure the operators rather than
  * the clone construction. Both pins are regressions: factor-10 data
  * built without them handed q84 ten identical copies of every part name
  * (quadratic candidate inflation: 25+ min of levenshtein at sf1) and
  * chained the document copies into a 9k-doc SimHash mega-cluster whose
  * transitive-closure oracle needs 82M reach pairs.
  *
  * Linearity of the scaled workload itself (candidate/pair volume per
  * corpus size) is ScaleLinearitySpec's job on the PipelineScaleProbe
  * corpus; this spec pins that ScaleUp's cross-copy structure cannot
  * create work that never existed in the base data.
  */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Src = "/root/testdata/sf0.01"
  private val Factor = 3

  private def copyOf(id: org.apache.spark.sql.Column) =
    floor(id / ScaleUp.KeyStride)

  private lazy val tables = ScaleUp.scaledTables(spark, Src, Factor).toMap

  test("key columns shift into disjoint per-copy ranges, preserving join fanout") {
    val base = spark.read.parquet(s"$Src/lineitem.parquet").count()
    val li = tables("lineitem")
    assert(li.count() === Factor * base)
    // every FK follows its PK into the same copy: a cross-copy join would
    // change fanout vs the base data
    val orders = tables("orders").select(col("o_orderkey"), col("o_custkey"))
    val joined = li.select(col("l_orderkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .where(copyOf(col("l_orderkey")) =!= copyOf(col("o_custkey")))
    assert(joined.count() === 0L)
  }

  test("no cross-copy SimHash near-dup pairs: copies have disjoint vocabularies") {
    graft.functions.TextOps.register(spark)
    val sims = tables("documents").select(col("doc_id"),
      graft.functions.TextOps.simhash56Col(split(lower(col("text")), "\\s+"))
        .as("simhash"))
    val pairs = graft.operators.SimHashBands.hammingPairs(sims, "doc_id", maxDist = 2)
      .persist()
    try {
      val cross = pairs.where(copyOf(col("doc_a")) =!= copyOf(col("doc_b"))).count()
      assert(cross === 0L, "cross-copy SimHash pairs re-chain the copies " +
        "into mega-clusters that exist only in the fixture")
      // copy 0 is byte-identical to the base corpus — its pair set is
      // exactly the base's. Tagged copies keep the same token-overlap
      // structure but BORDERLINE pairs (base Hamming 3-4) legitimately
      // drift across the <=2 threshold under relabeled token hashes
      // (PipelineScaleProbe documents the same property), so per-copy
      // counts are pinned to a band, not equality.
      val basePairs = graft.operators.SimHashBands.hammingPairs(
        spark.read.parquet(s"$Src/documents.parquet").select(col("doc_id"),
          graft.functions.TextOps.simhash56Col(split(lower(col("text")), "\\s+"))
            .as("simhash")), "doc_id", maxDist = 2).count()
      val copy0 = pairs.where(copyOf(col("doc_a")) === 0 &&
        copyOf(col("doc_b")) === 0).count()
      assert(copy0 === basePairs)
      val total = pairs.count()
      assert(total >= basePairs && total <= 3L * Factor * basePairs,
        s"per-copy pair volume out of band: $total vs base $basePairs x $Factor")
    } finally pairs.unpersist()
  }

  test("no cross-copy fuzzy name pairs: per-copy suffixes are edit distance >= 2 apart") {
    val pairs = graft.operators.FuzzyJoin.pairs(
      tables("part").select(col("p_partkey"), col("p_name")),
      "p_partkey", "p_name", maxDist = 1).persist()
    try {
      val cross = pairs.where(copyOf(col("id_a")) =!= copyOf(col("id_b"))).count()
      assert(cross === 0L, "cross-copy fuzzy pairs mean the q84 candidate " +
        "volume grows quadratically in the clone factor")
      val basePairs = graft.operators.FuzzyJoin.pairs(
        spark.read.parquet(s"$Src/part.parquet").select(col("p_partkey"), col("p_name")),
        "p_partkey", "p_name", maxDist = 1).count()
      assert(pairs.count() === Factor * basePairs)
    } finally pairs.unpersist()
  }

  test("no cross-copy exact text fingerprint matches") {
    graft.functions.Fingerprint64.register(spark)
    val fps = tables("documents").select(col("doc_id"),
      graft.functions.Fingerprint64.fingerprint64(col("text")).as("fp"))
    val cross = fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .where(copyOf(col("a.doc_id")) =!= copyOf(col("b.doc_id")))
    assert(cross.count() === 0L)
  }
}
