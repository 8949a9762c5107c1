package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** Recall of the trained IVF index against the brute-force oracle (probing
  * all k buckets IS brute force, so the baseline reuses the same scoring
  * path). The driver's synthetic embeddings are near-uniform on the sphere
  * (verified offline with a numpy sweep) — essentially unclustered — which
  * bounds any IVF-style index on THIS data: measured recall@5 ≈ 0.82 at
  * nprobe=2 and ≈ 0.90 at nprobe=3 (k=8, 500 vectors). The floors below
  * assert those minus a small margin plus the monotone probe→recall trade;
  * clustered real-world corpora sit strictly higher at equal probes. */
class IvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("trained IVF: recall floors vs brute force, monotone in nprobe") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 10)
    val centroids = IvfIndex.train(emb, "vec_id", "embedding", k = 8, iters = 8)
      .map(_.toSeq).toSeq
    assert(centroids.size === 8)
    // every centroid is unit-norm (spherical k-means invariant)
    centroids.foreach { c =>
      assert(math.abs(c.map(x => x * x).sum - 1.0) < 1e-9)
    }

    def top5(nprobe: Int) =
      IvfIndex.searchTopK(emb, queries, "vec_id", "embedding", centroids, nprobe, k = 5)
        .select(col("qid"), col("vec_id"))
    val truth = top5(nprobe = 8) // all buckets probed = exact
    val truthN = truth.count()
    assert(truthN === 50) // 10 queries x top-5

    def recall(nprobe: Int): Double =
      top5(nprobe).intersect(truth).count().toDouble / truthN
    val r2 = recall(2)
    val r3 = recall(3)
    assert(r2 >= 0.75, s"recall@5 nprobe=2 was $r2")
    assert(r3 >= 0.85, s"recall@5 nprobe=3 was $r3")
    assert(r3 >= r2, s"recall must not degrade with more probes: $r2 -> $r3")
  }
}

/** q37's HLL sketch has no DuckDB oracle (rows-only in the battery); this
  * pins its accuracy instead: approx_count_distinct must land within 5% of
  * the exact distinct count per group on sf0.01 (q17 is the exact
  * counterpart over the same grouping). */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct within 5% of exact per group on sf0.01") {
    val rows = graft.SparkEntry.queries("q37_approx_distinct")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"group ${r.get(0)}: approx $approx vs exact $exact")
    }
  }
}
