package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** CI-sized version of PipelineScaleProbe's linearity argument: cloning
  * the corpus with per-clone hashed vocabularies (within-clone near-dup
  * structure preserved, zero cross-clone token overlap) must scale every
  * dedup stage's OUTPUT exactly linearly in the clone count. A quadratic
  * join or an uncapped hot key shows up as super-linear pair counts. */
class ScaleLinearitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // the probe's generator, shared so this spec pins the construction the
  // probe actually measures
  private def cloned(copies: Int): DataFrame =
    graft.tools.PipelineScaleProbe.clonedCorpus(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"), col("text")), copies)

  private def jaccardPairs(docs: DataFrame): Long =
    NearDup.jaccardPairs(docs, "doc_id", "text", minJaccard = 0.25, dfCap = 100L).count()

  private def hammingPairs(docs: DataFrame): DataFrame = {
    graft.functions.TextOps.register(spark)
    val sims = docs.select(col("doc_id"),
      graft.functions.TextOps.simhash56Col(split(lower(col("text")), "\\s+")).as("simhash"))
    SimHashBands.hammingPairs(sims, "doc_id", maxDist = 2)
  }

  test("near-dup pair counts scale linearly and never cross clones") {
    val nBase = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    val one = cloned(1)
    val three = cloned(3)
    // Jaccard shares actual shingles, so clone counts replicate EXACTLY
    val j1 = jaccardPairs(one)
    val j3 = jaccardPairs(three)
    assert(j1 > 0, "test premise: the base corpus has planted near-dups")
    assert(j3 === 3 * j1, s"jaccard pairs must be clone-local: $j1 -> $j3")
    // SimHash borderline outcomes depend on each clone's vocabulary
    // hashes, so per-clone counts vary — the exact anti-quadratic property
    // is that NO pair crosses clones (cross-clone signatures are
    // independent 56-bit points; hamming<=2 odds ~1e-13)
    val h3 = hammingPairs(three)
    assert(h3.count() > 0)
    val crossClone = h3
      .where((col("doc_a") / nBase).cast("long") =!= (col("doc_b") / nBase).cast("long"))
      .count()
    assert(crossClone === 0L, s"$crossClone simhash pairs crossed clones")
  }

  test("passage dedup scales linearly; decontamination overlap is clone-local") {
    val nBase = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    val one = cloned(1)
    val three = cloned(3)

    // q70's passage stage: duplicated 10-token chunks replicate exactly
    // per clone (clone vocabularies are disjoint, so chunks cannot collide
    // across clones — super-linear growth would mean they do)
    def dupChunkRows(docs: DataFrame): Long = {
      val chh = docs
        .select(col("doc_id"), split(lower(col("text")), "\\s+").as("ws"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, (size(ws)+9) div 10 - 1)," +
            " c -> array_join(slice(ws, c*10+1, 10), ' '))")).as("chunk"))
      chh.groupBy(col("chunk")).agg(count(lit(1)).as("n"))
        .where(col("n") > 1)
        .agg(coalesce(sum(col("n")), lit(0L))).head.getLong(0)
    }
    val d1 = dupChunkRows(one)
    val d3 = dupChunkRows(three)
    assert(d1 > 0, "test premise: the base corpus has duplicated passages")
    assert(d3 === 3 * d1, s"dup passages must be clone-local: $d1 -> $d3")

    // q75's duplicated-substring spans: clone vocabularies are disjoint,
    // so duplicated 5-token windows (and the spans they merge into) are
    // clone-local and replicate exactly
    def dupSpans(docs: DataFrame): Long = {
      graft.functions.TextOps.register(spark)
      val hx = docs
        .select(col("doc_id"),
          posexplode(graft.functions.TextOps.gramsCol(col("text"), lit(5))))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("i"),
          graft.functions.TextOps.h56Col(col("col")).as("h"))
      val dup = hx.groupBy(col("h")).agg(count(lit(1)).as("c"))
        .where(col("c") > 1).select(col("h"))
      val byI = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("i"))
      val run = byI.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      hx.join(dup, Seq("h")).select(col("doc_id"), col("i"))
        .withColumn("brk",
          when(col("i") - lag(col("i"), 1).over(byI) <= 4, 0).otherwise(1))
        .withColumn("gid", sum(col("brk")).over(run))
        .groupBy(col("doc_id"), col("gid")).agg(count(lit(1)))
        .count()
    }
    val s1 = dupSpans(one)
    val s3 = dupSpans(three)
    assert(s1 > 0, "test premise: the base corpus has duplicated substrings")
    assert(s3 === 3 * s1, s"dup spans must be clone-local: $s1 -> $s3")

    // q69's candidate stage: train-eval shared-shingle pairs never cross
    // clones (each clone hash-splits its own ids, but shingles are
    // clone-disjoint, so any cross-clone pair is an index-join bug)
    val exh = NearDup.shingles(three, "doc_id", "text")
    val exc = exh.join(broadcast(NearDup.hotShingles(exh, 100L)), Seq("g"), "left_anti")
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 14), 16, 10)
      .cast("long") % 10
    val pairs = exc.where(bucket =!= 9).as("t")
      .join(exc.where(bucket === 9).as("e"), col("t.g") === col("e.g"))
      .select(col("t.doc_id").as("tid"), col("e.doc_id").as("eid")).distinct()
    assert(pairs.count() > 0)
    val cross = pairs
      .where((col("tid") / nBase).cast("long") =!= (col("eid") / nBase).cast("long"))
      .count()
    assert(cross === 0L, s"$cross decontamination pairs crossed clones")
  }

  test("packing conserves token mass at scale; chunking and prefix pairs replicate") {
    val one = cloned(1)
    val three = cloned(3)

    // q79's sequence packing: exact mass/shape invariants that hold at ANY
    // scale — total contributed tokens == total corpus tokens, sequence
    // count == ceil(total/512), and every sequence but the last is FULL
    def packed(docs: DataFrame) = {
      val tok = docs.select(col("doc_id"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("n"))
      val total = tok.agg(sum(col("n"))).head.getLong(0)
      val spans = PrefixSum.runningTotal(tok, "doc_id", "n")
        .select(col("doc_id"), col("cum"), (col("cum") - col("n")).as("lo"))
        .withColumn("seq_id",
          explode(sequence(expr("lo div 512"), expr("(cum - 1) div 512"))))
        .select(col("seq_id"),
          (least(col("cum"), (col("seq_id") + 1) * 512) -
            greatest(col("lo"), col("seq_id") * 512)).as("tok_in_seq"))
      (total, spans)
    }
    val (t3, sp3) = packed(three)
    val (t1, _) = packed(one)
    assert(t3 === 3 * t1, "cloned corpus must have exactly 3x the tokens")
    assert(sp3.agg(sum(col("tok_in_seq"))).head.getLong(0) === t3,
      "packing must conserve token mass exactly")
    val seqTotals = sp3.groupBy(col("seq_id")).agg(sum(col("tok_in_seq")).as("t"))
    val nSeq = seqTotals.count()
    assert(nSeq === (t3 + 511) / 512, "sequence count == ceil(total/512)")
    assert(seqTotals.where(col("t") =!= 512).count() <= 1,
      "every sequence except possibly the last is full")

    // q80's chunking is per-document: clone 3x -> exactly 3x chunk rows
    def chunks(docs: DataFrame): Long = docs
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        when(col("n") <= 64, lit(0L)).otherwise(expr("(n - 64 + 47) div 48")))))
      .count()
    val c1 = chunks(one)
    val c3 = chunks(three)
    assert(c1 > 0 && c3 === 3 * c1, s"chunk rows must replicate: $c1 -> $c3")

    // prefix filtering stays lossless on the cloned corpus, and its pairs
    // are clone-local (prefixes share no shingles across clones)
    val tau = 0.3
    val exact3 = NearDup.jaccardPairs(three, "doc_id", "text",
      minJaccard = tau, dfCap = 1000000L).count()
    val prefix3 = NearDup.jaccardPairsPrefix(three, "doc_id", "text", tau).count()
    assert(exact3 > 0, "test premise: pairs exist at tau=0.3")
    assert(prefix3 === exact3, s"prefix must stay lossless at scale: $prefix3 vs $exact3")
    val prefix1 = NearDup.jaccardPairsPrefix(one, "doc_id", "text", tau).count()
    assert(prefix3 === 3 * prefix1, s"prefix pairs must be clone-local: $prefix1 -> $prefix3")
  }
}
