package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.TestSpark

class BloomDigestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fps(ids: Range, salt: String) = {
    import spark.implicits._
    ids.map(i => s"$salt-doc-$i").toDF("fp")
  }

  test("no false negatives: every digested fingerprint is maybeSeen") {
    val hist = fps(0 until 3000, "h")
    val digest = BloomDigest.build(hist, "fp", expectedItems = 3000, fpp = 0.01)
    assert(BloomDigest.maybeSeen(hist, digest, "fp").count() === 3000)
    assert(BloomDigest.definitelyNovel(hist, digest, "fp").count() === 0)
  }

  test("false positive rate on disjoint probes stays near the target") {
    val hist = fps(0 until 5000, "h")
    val digest = BloomDigest.build(hist, "fp", expectedItems = 5000, fpp = 0.01)
    val novel = fps(0 until 5000, "n")
    val maybes = BloomDigest.maybeSeen(novel, digest, "fp").count()
    assert(maybes <= 5000 * 0.05, s"fpp blowout: $maybes/5000 flagged maybe")
  }

  test("digest novelty filter is exactly the plain anti-join, overlap and all") {
    val hist = fps(0 until 2000, "x")
    // batch: half overlap history, half novel, plus duplicate batch rows
    val batch = fps(1000 until 3000, "x")
      .union(fps(1500 until 1600, "x"))
      .withColumn("payload", length(col("fp")))
    val digest = BloomDigest.build(hist, "fp", expectedItems = 2000, fpp = 0.01)
    val got = BloomDigest.noveltyFilter(batch, hist, digest, "fp")
      .collect().map(_.getString(0)).sorted
    val want = batch.join(hist, Seq("fp"), "left_anti")
      .collect().map(_.getString(0)).sorted
    assert(got.length === want.length && got.sameElements(want))
  }

  test("digest survives a parquet round trip; incremental union stays sound") {
    val histA = fps(0 until 400, "a")
    val histB = fps(0 until 400, "b")
    val dir = java.nio.file.Files.createTempDirectory("bloomdigest").toString
    BloomDigest.build(histA, "fp", expectedItems = 800).write
      .mode("overwrite").parquet(dir)
    // incremental update: old words ∪ new batch's words, re-bit_or'd.
    // geometry must match — derive it from the persisted digest.
    val persisted = spark.read.parquet(dir)
    val bBits = BloomDigest.build(histB, "fp", expectedItems = 800)
    val merged = persisted.unionByName(bBits)
      .groupBy("word")
      .agg(bit_or(col("bits")).as("bits"),
        max(col("m_bits")).as("m_bits"), max(col("n_hashes")).as("n_hashes"))
    assert(BloomDigest.definitelyNovel(histA.union(histB), merged, "fp")
      .count() === 0)
  }

  test("empty history digest passes everything as novel") {
    val digest = BloomDigest.build(fps(0 until 0, "h"), "fp", expectedItems = 1)
    val batch = fps(0 until 50, "b")
    assert(BloomDigest.noveltyFilter(batch, fps(0 until 0, "h"), digest, "fp")
      .count() === 50)
  }
}
