package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("asOf join picks the most recent right row at or before each left ts") {
    import spark.implicits._
    val trades = Seq((1L, 10L, "t1"), (1L, 25L, "t2"), (2L, 5L, "t3"))
      .toDF("sym", "ts", "trade")
    val quotes = Seq((1L, 8L, 100.0), (1L, 10L, 101.0), (1L, 20L, 102.0), (2L, 9L, 50.0))
      .toDF("sym", "qts", "px")
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts", "qts",
      Map("px" -> "quote_px", "qts" -> "quote_ts"))
      .orderBy("sym", "ts")
      .collect().map(r => (r.getAs[Long]("sym"), r.getAs[String]("trade"),
        Option(r.getAs[java.lang.Double]("quote_px")).map(_.toDouble),
        Option(r.getAs[java.lang.Long]("quote_ts")).map(_.toLong)))
    assert(out.toSeq === Seq(
      (1L, "t1", Some(101.0), Some(10L)), // tie at ts=10: quote visible (<=)
      (1L, "t2", Some(102.0), Some(20L)),
      (2L, "t3", None, None)))            // no quote at or before ts=5
  }

  test("asOf join: NULL right values do not fall through to older right rows") {
    import spark.implicits._
    val left = Seq((1L, 30L)).toDF("sym", "ts")
    // newest quote at ts=20 has px=NULL: the join must carry (NULL, 20),
    // not resurrect px=100.0 from the older ts=10 row
    val right = Seq((1L, 10L, Some(100.0)), (1L, 20L, None))
      .toDF("sym", "qts", "px")
    val out = AsOfJoin.asOf(left, right, Seq("sym"), "ts", "qts",
      Map("px" -> "quote_px", "qts" -> "quote_ts")).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Any]("quote_px") === null)
    assert(out(0).getAs[Long]("quote_ts") === 20L)
  }

  test("salted join rejects join types that would duplicate the replicated side") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((2L, "y")).toDF("k", "w")
    intercept[IllegalArgumentException] {
      SaltedJoin.join(a, b, Seq("k"), saltFactor = 4, joinType = "full_outer")
    }
    intercept[IllegalArgumentException] {
      SaltedJoin.join(a, b, Seq("k"), saltFactor = 4, joinType = "right")
    }
  }

  test("salted join equals plain join under heavy key skew") {
    import spark.implicits._
    val facts = spark.range(50000).select(lit(1L).as("k"), col("id").as("v"))
      .unionByName(spark.range(100).select((col("id") + 2).as("k"), col("id").as("v")))
    val dim = Seq((1L, "hot"), (2L, "cold"), (3L, "cold")).toDF("k", "label")
    val salted = SaltedJoin.join(facts, dim, Seq("k"), saltFactor = 8)
    val plain = facts.join(dim, Seq("k"))
    assert(salted.count() === plain.count())
    assert(salted.groupBy("label").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
      === plain.groupBy("label").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap)
  }

  test("near-dup df cap bounds candidate pairs under a planted hot shingle") {
    import spark.implicits._
    // 60 docs all sharing one hot 3-gram phrase, otherwise pairwise disjoint;
    // plus one genuine near-dup pair sharing most of their (rare) shingles
    val crowd = (1 to 60).map(i =>
      (i.toLong, s"common hot phrase w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"))
    val dupA = (1000L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val dupB = (1001L, "alpha beta gamma delta epsilon zeta eta theta iota lambda")
    val docs = (crowd :+ dupA :+ dupB).toDF("doc_id", "text")
    val ex = NearDup.shingles(docs, "doc_id", "text")

    // uncapped: the hot shingle alone emits 60*59/2 crowd pairs
    val uncapped = NearDup.candidatePairs(ex, "doc_id", dfCap = 10000L).count()
    assert(uncapped >= 60L * 59 / 2)
    // capped: the hot shingle is dropped from the join; only genuinely
    // shared rare shingles generate candidates
    val capped = NearDup.candidatePairs(ex, "doc_id", dfCap = 50L)
    assert(capped.count() === 1)
    // ...and the verified output still finds the real near-dup pair with
    // its EXACT Jaccard (computed over full shingle sets, cap-independent)
    val pairs = NearDup.jaccardPairs(docs, "doc_id", "text",
      minJaccard = 0.25, dfCap = 50L).collect()
    assert(pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq
      === Seq((1000L, 1001L)))
    assert(math.abs(pairs.head.getAs[Double]("jaccard") - 7.0 / 9.0) < 1e-12)
  }

  test("prefix filtering at tau=0.8: identical pairs to the exact path, smaller index") {
    import spark.implicits._
    // real corpus + planted high-similarity clones: take 40 documents and
    // clone 8 of them with one word changed (J well above 0.8), plus the
    // crowd/hot-shingle structure so the prefix must also survive skew
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).orderBy("doc_id").limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val clones = base.take(8).map { case (id, t) =>
      val words = t.split(" ")
      (id + 100000L, (words.dropRight(1) :+ "xqzclone").mkString(" "))
    }
    val docs = (base ++ clones).toSeq.toDF("doc_id", "text")

    val tau = 0.8
    // exact baseline: uncapped inverted index (cap high enough to be a no-op)
    val exact = NearDup.jaccardPairs(docs, "doc_id", "text",
        minJaccard = tau, dfCap = 1000000L)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("shared"), r.getAs[Double]("jaccard"))).toSet
    val prefix = NearDup.jaccardPairsPrefix(docs, "doc_id", "text", tau)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("shared"), r.getAs[Double]("jaccard"))).toSet
    assert(exact.nonEmpty, "planted clones must produce tau>=0.8 pairs")
    assert(prefix === exact,
      "prefix filtering must be lossless at its threshold (same pairs, same exact Jaccard)")

    // the point of the exercise: the candidate index shrinks by ~tau
    val ex = NearDup.shinglesWithSize(docs, "doc_id", "text")
    val full = ex.count().toDouble
    val pfx = NearDup.prefixIndex(ex, "doc_id", tau).count().toDouble
    info(f"prefix index rows: ${pfx.toLong} of ${full.toLong} (${pfx / full * 100}%.1f%%)")
    assert(pfx / full < 0.35, s"tau=0.8 prefix should drop >65% of index rows ($pfx of $full)")
  }

  test("adaptive df cap separates the hot-shingle head from the body") {
    import spark.implicits._
    // same planted-skew corpus as above: body shingle dfs are 1-2, the
    // planted stop-shingle's df is 60 — a Zipf-shaped gap the quantile
    // rule must land inside
    val crowd = (1 to 60).map(i =>
      (i.toLong, s"common hot phrase w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"))
    val dupA = (1000L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val dupB = (1001L, "alpha beta gamma delta epsilon zeta eta theta iota lambda")
    val docs = (crowd :+ dupA :+ dupB).toDF("doc_id", "text")
    val ex = NearDup.shingles(docs, "doc_id", "text")

    val cap = NearDup.adaptiveDfCap(ex, quantile = 0.99, headroom = 4.0, floorCap = 8L)
    assert(cap >= 8L && cap < 60L, s"cap=$cap must sit between body (df<=2) and head (df=60)")
    // with the derived cap, candidate generation is skew-bounded and the
    // genuine near-dup pair still surfaces with its exact Jaccard
    assert(NearDup.candidatePairs(ex, "doc_id", cap).count() === 1)

    // floor: a corpus with no hot head must not cap real signal — the
    // default floor (64) exceeds every df here, so nothing is dropped
    val uniform = NearDup.shingles(Seq(dupA, dupB).toDF("doc_id", "text"), "doc_id", "text")
    assert(NearDup.adaptiveDfCap(uniform) === 64L)
    // empty index (docs below the shingle width): floor, not an NPE
    val empty = NearDup.shingles(Seq((1L, "too short")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(NearDup.adaptiveDfCap(empty) === 64L)
    val pairs = NearDup.jaccardPairsAdaptive(Seq(dupA, dupB).toDF("doc_id", "text"),
      "doc_id", "text", minJaccard = 0.25).collect()
    assert(pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq
      === Seq((1000L, 1001L)))
    assert(math.abs(pairs.head.getAs[Double]("jaccard") - 7.0 / 9.0) < 1e-12)
  }

  test("salted aggregation equals plain aggregation under heavy key skew") {
    import spark.implicits._
    // one hot key with 100k rows, many cold keys
    val hot = spark.range(100000).select(lit(1L).as("k"), col("id").as("v"))
    val cold = spark.range(1000).select((col("id") + 10).as("k"), col("id").as("v"))
    val df = hot.unionByName(cold)
    val salted = SaltedAgg.aggregate(df, Seq("k"), saltFactor = 16,
      SaltedAgg.sumLong("v"), SaltedAgg.countAll(), SaltedAgg.maxLong("v"))
    val plain = df.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"), max("v").as("max_v"))
    assert(salted.count() === plain.count())
    val s = salted.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val p = plain.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(s.toSeq === p.toSeq)
  }
}
