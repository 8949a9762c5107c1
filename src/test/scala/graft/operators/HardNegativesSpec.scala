package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.TestSpark

/** graft.operators.HardNegatives — battery q116's operator. The mined set
  * must equal the brute-force definition (band filter + rank) computed
  * straight-line, stay strictly inside the band, and never return the
  * anchor itself. */
class HardNegativesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vecs(n: Int, d: Int, seed: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => i.toLong -> Seq.fill(d)(rnd.nextGaussian()))
  }

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    def dot(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).foldLeft(0.0) { case (s, (p, q)) => s + p * q }
    dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
  }

  test("mined negatives equal the straight-line band-rank definition") {
    import spark.implicits._
    val data = vecs(200, 16, seed = 5)
    val df = data.toDF("vec_id", "emb")
    val (k, lo, hi) = (7, 0.1, 0.6)
    val anchors = df.where($"vec_id" < 4)
      .select($"vec_id".as("qid"), $"emb".as("qe"))
    val corpus = df.select($"vec_id", $"emb".as("ce"))
    val got = HardNegatives.mine(anchors, corpus, k, lo, hi)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val want = (for {
      (qid, qe) <- data.take(4)
      ranked = data.filter(_._1 != qid)
        .map { case (id, ce) => (id, cos(qe, ce)) }
        .filter { case (_, s) => s >= lo && s < hi }
        .sortBy { case (id, s) => (-s, id) }
        .take(k).zipWithIndex
      ((id, _), i) <- ranked
    } yield (qid, id, (i + 1).toLong)).toSet
    assert(got === want)
  }

  test("mineUnbounded under full probing equals the broadcast path row-for-row") {
    import spark.implicits._
    val data = vecs(200, 16, seed = 11)
    val df = data.toDF("vec_id", "emb")
    val (k, lo, hi) = (6, 0.1, 0.6)
    val anchors = df.where($"vec_id" < 25)
      .select($"vec_id".as("qid"), $"emb".as("qe"))
    val corpus = df.select($"vec_id", $"emb".as("ce"))
    // arbitrary centroids: under FULL probing the result is centroid-
    // independent (every pair is scored exactly once)
    val centroids = data.take(5).map(_._2)
    val exact = HardNegatives.mine(anchors, corpus, k, lo, hi)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val unbounded = HardNegatives.mineUnbounded(anchors, corpus, k, lo, hi,
      centroids, nprobe = centroids.size)
    val got = unbounded.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got === exact, "full probing must reproduce the exact path bit-for-bit")
  }

  test("mineUnbounded broadcasts NEITHER side (anchors may exceed the broadcast cap)") {
    import spark.implicits._
    val df = vecs(150, 8, seed = 13).toDF("vec_id", "emb")
    val anchors = df.select($"vec_id".as("qid"), $"emb".as("qe"))
    val corpus = df.select($"vec_id", $"emb".as("ce"))
    val centroids = vecs(4, 8, seed = 14).map(_._2)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // forbid Spark's SIZE-based auto-broadcast: any BroadcastExchange left
    // in the plan would have to come from a hint in OUR code — the thing
    // this test forbids (the exact path hints broadcast(anchors); the
    // unbounded path must not)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val d = HardNegatives.mineUnbounded(anchors, corpus, 3, 0.1, 0.9,
        centroids, nprobe = 2)
      d.collect()
      val plan = TestSpark.finalPlan(d)
      assert(!plan.contains("BroadcastExchange"),
        s"unbounded mining must not broadcast either side:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("band, self-exclusion, and k bounds hold structurally") {
    import spark.implicits._
    val df = vecs(300, 8, seed = 9).toDF("vec_id", "emb")
    val rows = HardNegatives.mine(
      df.where($"vec_id" < 10).select($"vec_id".as("qid"), $"emb".as("qe")),
      df.select($"vec_id", $"emb".as("ce")),
      k = 5, lo = 0.2, hi = 0.8).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) !== r.getLong(1), "anchor must not be its own negative")
      val s = r.getDouble(2)
      assert(s >= 0.2 && s < 0.8, s"score $s escaped the band")
      assert(r.getLong(3) >= 1L && r.getLong(3) <= 5L)
    }
  }
}
