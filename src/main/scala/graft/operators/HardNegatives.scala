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
  * broadcast, compose the same band filter + TopKScored over
  * [[IvfIndex]]-probed buckets (search k' >> k, then band-filter), which
  * trades the exact guarantee for per-bucket locality exactly as q53/q98
  * do for positives.
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
    banded.groupBy(col("qid"))
      .agg(graft.functions.TopKScored.topkCol(col("vec_id"), col("score"), k).as("tk"))
      .select(col("qid"), posexplode(col("tk")))
      .select(col("qid"), col("col.id").as("vec_id"), col("col.score").as("score"),
        (col("pos") + 1).cast("long").as("rn"))
  }
}
