package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance self-join — entity-resolution-grade fuzzy matching
  * (near-identical titles, names, product strings) for corpus dedup,
  * where shingle/SimHash similarity is too coarse for short fields. The
  * reference's dedup story stops at equality (scan.rs key merge); this is
  * the standard companion for the short-field case at pipeline scale.
  *
  * Algorithm: segment-signature pigeonhole in the PassJoin family (Li,
  * Deng, Feng: "PASS-JOIN: A Partition-based Method for Similarity
  * Joins", VLDB'12). Each string of length L splits into k+1 contiguous
  * segments with fixed L-determined boundaries; if ed(s,t) ≤ k, at least
  * one segment of s occurs VERBATIM in t, shifted by at most k (k edits
  * cannot touch all k+1 segments, and each edit shifts positions by ≤1).
  * Index side emits k+1 segment rows per string; probe side emits
  * substrings at the segment positions (±k shift) of every candidate
  * peer length in [L−k, L+k]. An equi-join on (peerLen, segIdx, text)
  * yields candidates — an inverted-index hash join, never all-pairs —
  * and `levenshtein` (threshold variant: early-exit DP) verifies
  * exactly. Probe fan-out is ≤ (2k+1)²(k+1) rows per string (18 at k=1):
  * linear in corpus size with a small constant.
  *
  * Scale notes: the signature join shuffles on short segment text, so a
  * stop-word segment can skew a bucket — AQE skew-join splits it, and
  * correctness never depends on a cap (the join is exact, unlike the
  * df-capped Jaccard index in [[NearDup]] where dropping hot shingles
  * needs a correction pass). Strings shorter than k+1 chars produce
  * empty segments whose buckets pair only short-with-short — bounded by
  * the short-string population, and every candidate still passes
  * levenshtein verification.
  */
object FuzzyJoin {

  /** Unordered pairs (id_a < id_b, dist) with edit distance ≤ maxDist.
    * Exact — the segment scheme generates a superset of the true pairs
    * and verification filters precisely. Ids must be unique. */
  def pairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1 (use plain equality for 0)")
    val k = maxDist
    val base = df.select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
      .withColumn("len", length(col("s")))

    // fixed segmentation of a length-pl string into k+1 pieces: the first
    // (pl mod (k+1)) segments get one extra char. Both sides derive
    // boundaries from the PEER length column so schemes agree exactly.
    def q(pl: Column): Column = floor(pl / (k + 1)).cast("int")
    def r(pl: Column): Column = pmod(pl, lit(k + 1))
    def segLen(pl: Column, i: Column): Column =
      q(pl) + when(i < r(pl), 1).otherwise(0)
    def segStart(pl: Column, i: Column): Column =
      i * q(pl) + least(i, r(pl))

    // index: each string's own segments under its own length's scheme
    val index = base
      .select(col("id").as("id_i"), col("s").as("s_i"), col("len").as("pl"),
        explode(sequence(lit(0), lit(k))).as("seg"))
      .withColumn("sig", col("s_i").substr(
        segStart(col("pl"), col("seg")) + 1, segLen(col("pl"), col("seg"))))
      .select("id_i", "s_i", "pl", "seg", "sig")

    // probe: substrings where a peer of length pl ∈ [len−k, len+k] could
    // have left segment `seg`, shifted by at most k
    val probe = base
      .select(col("id").as("id_p"), col("s").as("s_p"), col("len").as("lp"),
        explode(sequence(col("len") - k, col("len") + k)).as("pl"))
      .where(col("pl") >= 0)
      .withColumn("seg", explode(sequence(lit(0), lit(k))))
      .withColumn("sl", segLen(col("pl"), col("seg")))
      .withColumn("sh", explode(sequence(lit(-k), lit(k))))
      .withColumn("st", segStart(col("pl"), col("seg")) + col("sh"))
      .where(col("st") >= 0 && col("st") + col("sl") <= col("lp"))
      .withColumn("sig", col("s_p").substr(col("st") + 1, col("sl")))
      .select("id_p", "s_p", "pl", "seg", "sig")

    val cand = index.join(probe, Seq("pl", "seg", "sig"))
      .where(col("id_i") =!= col("id_p"))
      .select(
        least(col("id_i"), col("id_p")).as("id_a"),
        greatest(col("id_i"), col("id_p")).as("id_b"),
        when(col("id_i") < col("id_p"), col("s_i")).otherwise(col("s_p")).as("s_a"),
        when(col("id_i") < col("id_p"), col("s_p")).otherwise(col("s_i")).as("s_b"))
      .distinct()

    // threshold levenshtein early-exits the DP and returns -1 above k
    cand.withColumn("dist", levenshtein(col("s_a"), col("s_b"), k))
      .where(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Per-id fuzzy-neighbor profile over the WHOLE input (ids with no
    * neighbor included with n_fuzzy = 0): neighbor count and minimum
    * neighbor id — the grouping key a keep-one fuzzy dedup cuts on. */
  def neighborProfile(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    val p = pairs(df, idCol, strCol, maxDist)
    val sym = p.select(col("id_a").as("id"), col("id_b").as("nb"))
      .union(p.select(col("id_b").as("id"), col("id_a").as("nb")))
    df.select(col(idCol).cast("long").as("id"))
      .join(sym.groupBy("id")
        .agg(count(lit(1)).as("n_fuzzy"), min(col("nb")).as("nn_id")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("n_fuzzy"), lit(0L)).as("n_fuzzy"),
        col("nn_id"))
  }
}
