package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * linear in DISTINCT-string count with a small constant.
  *
  * DEDUP-FIRST: candidate generation and verification run over the
  * distinct strings only (one representative per duplicate group). A
  * low-cardinality column therefore cannot explode the signature join:
  * a corpus of n rows over m distinct strings costs the PassJoin of m
  * strings plus output-bound expansion, never Σ(bucket row-counts)²
  * levenshtein calls. Without this, a 200k-row column with 640 distinct
  * values (real catalog data is full of such columns) generates ~7·10⁸
  * candidate verifications for ~3·10⁷ true pairs; with it, the verify
  * work is the 640-string PassJoin. Duplicate groups re-enter exactly:
  * [[pairs]] expands representative pairs to id pairs (plus the
  * distance-0 pairs inside each group) — output-bound by definition —
  * while [[neighborProfile]] never materializes id pairs at all,
  * combining per-group counts instead.
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

  /** Unordered representative pairs over UNIQUE strings: (id_a < id_b,
    * s_a, s_b, dist) with 1 ≤ dist ≤ k (inputs are distinct, so 0 never
    * occurs). The segment scheme generates a superset of the true pairs
    * and threshold levenshtein verifies precisely. */
  private def distinctPairs(dStrings: DataFrame, k: Int): DataFrame = {
    val base = dStrings.withColumn("len", length(col("s")))

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
  }

  /** Unordered pairs (id_a < id_b, dist) with edit distance ≤ maxDist,
    * INCLUDING the distance-0 pairs inside each duplicate-string group.
    * Exact and output-bound: representative pairs come from the distinct-
    * string PassJoin, then expand through each group's id list. Ids must
    * be unique. */
  def pairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1 (use plain equality for 0)")
    val base = df.select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
    val reps = base.groupBy("s").agg(min(col("id")).as("id"))
      .select(col("id"), col("s"))
    val dp = distinctPairs(reps, maxDist)
    // expand: every id of group s_a × every id of group s_b, once each
    // (dp holds each unordered string pair once, groups are disjoint)
    val cross = dp
      .join(base.select(col("id").as("ia"), col("s").as("s_a")), Seq("s_a"))
      .join(base.select(col("id").as("ib"), col("s").as("s_b")), Seq("s_b"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("dist"))
    // distance-0 pairs: unordered id pairs within each duplicate group
    val zero = base.as("x")
      .join(base.as("y"), col("x.s") === col("y.s") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        lit(0).as("dist"))
    cross.union(zero)
  }

  /** Per-id fuzzy-neighbor profile over the WHOLE input (ids with no
    * neighbor included with n_fuzzy = 0): neighbor count and minimum
    * neighbor id — the grouping key a keep-one fuzzy dedup cuts on.
    *
    * Never materializes id-level pairs (whose count is quadratic in
    * duplicate-group size): per-group counts and the two smallest ids
    * per group are enough — a row's neighbor count is (own group − 1) +
    * Σ sizes of groups within distance, and its min neighbor id is the
    * least of the other ids in its group and the neighbor groups' minima.
    * Full-data cost: one hash-partition window pass on the string plus
    * one join back on the same key; everything else is distinct-string
    * sized. */
  def neighborProfile(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
    val w = Window.partitionBy("s").orderBy("id")
    val wc = Window.partitionBy("s")
    val ranked = base.select(col("s"), col("id"),
      row_number().over(w).as("rn"), count(lit(1)).over(wc).as("cnt"))
    val groups = ranked.where(col("rn") <= 2).groupBy("s").agg(
      max(col("cnt")).as("gcnt"),
      min(when(col("rn") === 1, col("id"))).as("min1"),
      min(when(col("rn") === 2, col("id"))).as("min2"))
    val dp = distinctPairs(
      groups.select(col("min1").as("id"), col("s")), maxDist)
    // group-level external neighbor stats, keyed back to the string; a
    // neighbor group's min id IS its representative (min1), so the min
    // external neighbor id is min(nb)
    val sym = dp.select(col("s_a").as("s"), col("id_b").as("nb"))
      .union(dp.select(col("s_b").as("s"), col("id_a").as("nb")))
    val ext = sym
      .join(groups.select(col("min1").as("nb"), col("gcnt").as("nb_cnt")),
        Seq("nb"))
      .groupBy("s")
      .agg(sum(col("nb_cnt")).as("ext_cnt"), min(col("nb")).as("ext_min"))
    val gext = groups.join(ext, Seq("s"), "left")
    ranked.join(gext, Seq("s"))
      .select(col("id"),
        (col("gcnt") - 1 + coalesce(col("ext_cnt"), lit(0L))).as("n_fuzzy"),
        least(
          when(col("id") === col("min1"), col("min2")).otherwise(col("min1")),
          col("ext_min")).as("nn_id"))
  }
}
