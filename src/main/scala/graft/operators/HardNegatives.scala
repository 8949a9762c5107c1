package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hard-negative mining for contrastive/embedding training data: for each
  * anchor, the k candidates with the HIGHEST cosine inside a band
  * `[lo, hi)` — similar enough to be informative negatives, strictly below
  * the near-duplicate ceiling `hi` (above it they are positives/dups and
  * poison the loss; SemDeDup's complement). The third member of the
  * similarity family: q50's top-k takes the most similar, SemDeDup drops
  * them, this keeps the band just under them.
  *
  * Exact path (this method): anchors broadcast against the corpus, cosine
  * in the same codegen `vec_dot` left-fold the whole battery uses, band
  * filter BEFORE ranking (the filter kills ~99% of pairs, so the top-k
  * aggregate sees only band survivors), ranking via the O(k)
  * [[graft.functions.TopKScored]] aggregate — map-side ≤ k rows per
  * anchor, no per-anchor sort, ties (score desc, id asc) identical to the
  * `row_number()` window form the oracle uses.
  *
  * Scale shape: cost is |anchors| × |corpus| scoring — right for a
  * bounded anchor sample (the common mining setup: a training batch of
  * anchors against a candidate pool). For anchor sets too large to
  * broadcast, [[mineUnbounded]] runs the same band filter + TopKScored
  * over an [[IvfIndex]] bucket join with NO broadcast on either side —
  * exact under full probing, bucket-local under partial probing.
  */
object HardNegatives {

  /** anchors: (qid BIGINT, qe ARRAY<DOUBLE>); corpus: (vec_id BIGINT,
    * ce ARRAY<DOUBLE>). Returns (qid, vec_id, score, rn), rn 1..k by
    * descending cosine within [lo, hi), the anchor itself excluded. */
  def mine(anchors: DataFrame, corpus: DataFrame, k: Int,
      lo: Double, hi: Double): DataFrame = {
    require(k > 0 && lo < hi, s"need k > 0 and lo < hi: k=$k lo=$lo hi=$hi")
    val spark = anchors.sparkSession
    graft.functions.TopKScored.register(spark)
    graft.functions.VectorOps.register(spark)
    import graft.functions.VectorOps.dotCol
    // score spelled exactly as the battery's cosine queries (q50):
    // dot / sqrt(dot_q * dot_c) — one expression shape, one hash
    val score = dotCol(col("qe"), col("ce")) /
      sqrt(dotCol(col("qe"), col("qe")) * dotCol(col("ce"), col("ce")))
    val banded = broadcast(anchors).join(corpus, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), score.as("score"))
      .where(col("score") >= lo && col("score") < hi)
    rank(banded, k)
  }

  /** [[mine]] for anchor sets TOO LARGE TO BROADCAST — the IVF composition
    * the exact path's scaladoc documents: both sides bucket on the same
    * centroid set (corpus rows to their ONE nearest bucket, anchors
    * exploded to their `nprobe` nearest), the pairing is a plain
    * bucket-keyed SHUFFLE join (neither side broadcast, no hint — Spark
    * picks sort-merge/shuffled-hash), then the identical band filter and
    * O(k) TopKScored ranking. Each (anchor, candidate) pair arises at most
    * once (a candidate lives in exactly one bucket), so no dedup pass.
    *
    * Guarantee: with `nprobe = centroids.size` every pair is scored and
    * the output EQUALS [[mine]] row-for-row (HardNegativesSpec pins it) —
    * full probing is the exact mode for unbounded anchors. Smaller
    * `nprobe` trades recall for reading only probed buckets, the same
    * locality trade as IVF search (q53/q98). Scores use the SAME raw
    * cosine expression as [[mine]], so the two paths are bit-identical
    * where they overlap. */
  def mineUnbounded(anchors: DataFrame, corpus: DataFrame, k: Int,
      lo: Double, hi: Double, centroids: Seq[Seq[Double]], nprobe: Int): DataFrame = {
    require(k > 0 && lo < hi, s"need k > 0 and lo < hi: k=$k lo=$lo hi=$hi")
    require(nprobe >= 1 && nprobe <= centroids.size,
      s"nprobe must be in [1, ${centroids.size}]: $nprobe")
    val spark = anchors.sparkSession
    graft.functions.TopKScored.register(spark)
    graft.functions.VectorOps.register(spark)
    import graft.functions.VectorOps.dotCol
    // bucket on NORMALIZED vectors (centroid geometry), score on the RAW
    // ones with mine()'s exact expression — the temp column keeps the two
    // concerns apart
    val cand = IvfIndex.assign(
      corpus.withColumn("_nv", IvfIndex.normalized(col("ce"))), "_nv", centroids)
      .drop("_nv")
    val q = IvfIndex.probes(
      anchors.withColumn("_nq", IvfIndex.normalized(col("qe"))), "_nq", centroids, nprobe)
      .drop("_nq")
    val score = dotCol(col("qe"), col("ce")) /
      sqrt(dotCol(col("qe"), col("qe")) * dotCol(col("ce"), col("ce")))
    val banded = q.join(cand, Seq("bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), score.as("score"))
      .where(col("score") >= lo && col("score") < hi)
    rank(banded, k)
  }

  /** Shared band→top-k tail: O(k) per-anchor ranking, ties (score desc,
    * id asc) identical to the oracle's row_number() form. */
  private def rank(banded: DataFrame, k: Int): DataFrame =
    banded.groupBy(col("qid"))
      .agg(graft.functions.TopKScored.topkCol(col("vec_id"), col("score"), k).as("tk"))
      .select(col("qid"), posexplode(col("tk")))
      .select(col("qid"), col("col.id").as("vec_id"), col("col.score").as("score"),
        (col("pos") + 1).cast("long").as("rn"))
}
