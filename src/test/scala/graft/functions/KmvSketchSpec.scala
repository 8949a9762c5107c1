package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.TestSpark

/** graft.functions.KmvSketch — battery q113's aggregate. The sketch IS its
  * spec: "the k smallest distinct values", so a straight-line Scala model
  * must reproduce it exactly regardless of row order, duplication, or
  * partitioning, and the KMV union law (merge of sketches = sketch of
  * union) must hold exactly — that law is what makes per-partition
  * sketches composable into corpus-level cardinality estimates. */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def model(hs: Seq[Long], k: Int): Seq[Long] =
    hs.distinct.sorted.take(k)

  private def data(n: Int, distinct: Int, seed: Int): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    val pool = Seq.fill(distinct)(rnd.nextLong() & ((1L << 56) - 1)).distinct
    Seq.fill(n)(pool(rnd.nextInt(pool.size)))
  }

  test("sketch = the k smallest distinct values, exactly (duplicates, any partitioning)") {
    import spark.implicits._
    KmvSketch.register(spark)
    val k = 64
    val hs = data(n = 20000, distinct = 1000, seed = 42)
    for (parts <- Seq(1, 13)) {
      val got = hs.toDF("h").repartition(parts)
        .agg(KmvSketch.kmvCol(col("h"), k)).collect()(0)
        .getSeq[Long](0)
      assert(got === model(hs, k))
    }
  }

  test("under-full sketch is the whole distinct set, ascending") {
    import spark.implicits._
    KmvSketch.register(spark)
    val hs = data(n = 500, distinct = 37, seed = 7)
    val got = hs.toDF("h").agg(KmvSketch.kmvCol(col("h"), 128)).collect()(0)
      .getSeq[Long](0)
    assert(got === model(hs, 128))
    assert(got.size === hs.distinct.size)
  }

  test("union law: merging per-group sketches equals the sketch of the union") {
    import spark.implicits._
    KmvSketch.register(spark)
    val k = 64
    val a = data(n = 5000, distinct = 700, seed = 1)
    val b = data(n = 5000, distinct = 700, seed = 2)
    // the aggregate's own merge path IS exercised by multi-partition
    // aggregation; here we additionally pin the set-algebra law the q113
    // union row relies on: sketch(A ∪ B) = kSmallest(sketch(A) ∪ sketch(B))
    val skA = a.toDF("h").agg(KmvSketch.kmvCol(col("h"), k)).collect()(0).getSeq[Long](0)
    val skB = b.toDF("h").agg(KmvSketch.kmvCol(col("h"), k)).collect()(0).getSeq[Long](0)
    val mergedDriverSide = (skA ++ skB).distinct.sorted.take(k)
    val skU = (a ++ b).toDF("h").agg(KmvSketch.kmvCol(col("h"), k)).collect()(0).getSeq[Long](0)
    assert(skU === mergedDriverSide)
  }

  test("estimator lands within KMV's theoretical error on a filled sketch") {
    import spark.implicits._
    KmvSketch.register(spark)
    val k = 256
    val distinct = 50000
    val hs = data(n = 100000, distinct = distinct, seed = 11)
    val trueD = hs.distinct.size
    val sk = hs.toDF("h").agg(KmvSketch.kmvCol(col("h"), k)).collect()(0).getSeq[Long](0)
    assert(sk.size === k)
    val est = (k - 1).toDouble * math.pow(2.0, 56) / sk.last.toDouble
    // std error ~ 1/sqrt(k-1) ≈ 6.3% at k=256; 4σ bound on fixed seed
    assert(math.abs(est - trueD) / trueD < 0.25,
      s"estimate $est vs true $trueD drifts beyond 25%")
  }

  test("NULL hashes are ignored, like any aggregate input") {
    import spark.implicits._
    KmvSketch.register(spark)
    val df = Seq[Option[Long]](Some(5L), None, Some(3L), None, Some(5L)).toDF("h")
    val got = df.agg(KmvSketch.kmvCol(col("h"), 8)).collect()(0).getSeq[Long](0)
    assert(got === Seq(3L, 5L))
  }
}
